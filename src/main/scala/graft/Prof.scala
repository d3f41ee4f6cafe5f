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
    // current investigation: duplicated expensive-kernel subtrees in the
    // pair-join dedup operators (shingle base recomputed per reference?)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet(): Unit
    })
    SparkEntry.queries("knn_dot")(spark, dir).count()
    for (n <- args.drop(1).toSeq match {
           case Nil => Seq("ngram_jaccard", "duplicate_passages",
             "neardup_components", "dedup_representatives", "minhash_lsh",
             "scenario_training_pipeline", "mutation_pipeline")
           case ks => ks
         };
         rep <- 1 to 3) {
      val j0 = jobs.get(); val t0 = tasks.get()
      time(s"$n rep$rep")(SparkEntry.queries(n)(spark, dir).count())
      println(s"  jobs=${jobs.get() - j0} tasks=${tasks.get() - t0}")
    }
    spark.stop()
  }
}
