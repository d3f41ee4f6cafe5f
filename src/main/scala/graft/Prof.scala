package graft
import org.apache.spark.sql.SparkSession

/** Scratch profiling main — contents change per investigation; numbers are
  * never recorded, only the conclusions (SCALEPROBE notes). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $n ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    // current investigation: admit() probe cost in chained mode-upserts
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) taskMs.addAndGet(te.taskInfo.duration): Unit
    })
    for (n <- Seq("api_upsert_update_mode", "upsert_update_modes");
         rep <- 1 to 3) {
      val j0 = jobs.get(); val t0 = taskMs.get()
      time(s"$n rep$rep")(SparkEntry.queries(n)(spark, dir).count())
      Thread.sleep(300)
      println(s"  jobs=${jobs.get() - j0} taskMs=${taskMs.get() - t0}")
    }
    spark.stop()
  }
}
