package graft

/** Catalog-wide analysis smoke test: every `SparkEntry.queries` entry must
  * BUILD and ANALYZE against the real testdata layout. This is the guard
  * against silent schema drift — when the driver regenerated
  * `/root/testdata` with `ts: timestamp[us]` (previously TIMESTAMP(NANOS)
  * read as long), three datetime entries started throwing at plan time and
  * fell out of the correctness report with no marker. Touching
  * `.queryExecution.analyzed` forces full analysis (type checks included)
  * without executing the plan; entries whose builders are eager (derived
  * contracts, mutation pipelines) simply run at sf0.001, which is tiny.
  */
class CatalogSmokeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("every catalog entry analyzes against sf0.001") {
    assume(new java.io.File(s"$dir/events.parquet").exists(), "testdata not present")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, dir).queryExecution.analyzed
        None
      } catch {
        case e: Throwable =>
          Some(s"$name → ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" "))
      }
    }
    assert(failures.isEmpty, s"${failures.size} entries fail analysis:\n" +
      failures.mkString("\n"))
  }

  test("every catalog entry with an oracle has a query and vice-versa coverage is recorded") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    val orphans = o.diff(q)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
