package graft

/** Open-text validation of the Cavnar-Trenkle trigram classifier: the
  * 22-language / 8-script holdout fixture (authored prose, outside the
  * stopword lists the profiles are built from) must classify to its true
  * language on every row — the same 100% bar the `lang_id_holdout` catalog
  * entry's oracle pins, checked here without a SparkSession for fast
  * feedback. */
class LangIdHoldoutCheck extends org.scalatest.funsuite.AnyFunSuite {
  test("holdout rows classify to their true language (22 langs, 8 scripts)") {
    val rows = graft.queries.LangIdHoldoutFixture.rows
    val codes = graft.queries.LangIdHoldoutFixture.codes.toArray
    assert(codes.length == 22)
    val misses = rows.flatMap { case (id, code, text) =>
      val got = graft.pipeline.LangId.classify(text, codes)
      if (got != code) Some(s"$id true=$code got=$got") else None
    }
    assert(misses.isEmpty, misses.mkString("; "))
  }
}
