package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiling main — contents change per investigation; numbers are
  * never recorded, only the conclusions (SCALEPROBE notes). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $n ${(System.nanoTime() - t0) / 1e9}%.3f"); r
    }
    // current investigation: repeated parquet metadata (listing + footer
    // schema) cost per spark.read.parquet call, vs per-job overhead
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    })
    // warm the session
    SparkEntry.queries("knn_dot")(spark, dir).count()

    // 1. metadata-only: repeated spark.read.parquet of the embeddings table
    val p = s"$dir/embeddings.parquet"
    time("read.parquet x1 first")(spark.read.parquet(p))
    time("read.parquet x20")((1 to 20).foreach(_ => spark.read.parquet(p)))
    // 2. same for a written collection dir (typical fixture path)
    val cpath = "/tmp/graft_runtime/endp_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    SparkEntry.queries("collection_count_endpoint")(spark, dir).count()
    time("read.parquet coll x20")((1 to 20).foreach(_ => spark.read.parquet(cpath)))
    // 3. tiny job cost: count over a cached-in-page-cache parquet scan
    val df = spark.read.parquet(p)
    time("count job x1")(df.count())
    time("count job x10")((1 to 10).foreach(_ => spark.read.parquet(p).count()))
    time("count job noread x10")((1 to 10).foreach(_ => df.count()))
    // 4. a representative api entry, repeated warm, with job counts
    for (n <- Seq("api_upsert_update_mode", "api_get_point", "scroll_orderby_datetime");
         rep <- 1 to 3) {
      val j0 = jobs.get()
      time(s"$n rep$rep")(SparkEntry.queries(n)(spark, dir).count())
      println(s"  jobs=${jobs.get() - j0}")
    }
    spark.stop()
  }
}
