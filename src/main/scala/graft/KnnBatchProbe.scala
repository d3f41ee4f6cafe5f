package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Dot
import graft.ops.{Search, TopK}

/** Head-to-head probe for the two batch-KNN reduction shapes at scale
  * (N×Q scored rows → per-query top-k):
  *
  *  - window: `row_number over (partition by qid)` — Spark ≥ 3.5 inserts
  *    `WindowGroupLimit(Partial)` below the exchange, so only ≤ k rows per
  *    (mapper, query) are shuffled, but each mapper first SORTS its N×Q/P
  *    scored rows.
  *  - agg: `groupBy(qid).agg(TopKAgg)` — ObjectHashAggregate partial
  *    combine, O(log k) heap insert per row, no sort, same shuffle bound.
  *
  * Reports wall seconds AND actual shuffle write bytes/records per run
  * (stage-level task metrics), which is the evidence that NEITHER path
  * exchanges the full N×Q row set. Defaults: N=1M dim-64 points, Q=64,
  * k=10, 2 reps (first warms, second reported).
  */
object KnnBatchProbe {

  final class ShuffleMeter extends SparkListener {
    val bytes = new AtomicLong
    val records = new AtomicLong
    val rows = new AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    def reset(): Unit = { bytes.set(0); records.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "1000000").toLong
    val q = sys.env.getOrElse("SPARK_GRAFT_PROBE_Q", "64").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_PROBE_K", "10").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = s"/tmp/graft_runtime/knnprobe_n${n}_d64"
    if (!new java.io.File(path + "/_SUCCESS").exists()) {
      spark.range(n).toDF("vec_id")
        .withColumn("embedding", transform(sequence(lit(1), lit(64)), i =>
          (pmod(xxhash64(col("vec_id"), i), lit(1000000)).cast("double") /
            lit(1000000.0d) - lit(0.5d)).cast("float")))
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    }
    val e = spark.read.parquet(path)
    val queries = e.filter(col("vec_id") < q)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    def scored: DataFrame = e.crossJoin(broadcast(queries))
      .withColumn("score",
        round(Search.scoreExpr(Dot, col("embedding"), col("qvec")), 6))

    // window formulation inlined (Search.knnBatch now dispatches Long ids
    // to the aggregator, so the window arm must be spelled out here)
    def windowTopK: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      scored
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("score").desc, col("vec_id").asc)))
        .filter(col("_rn") <= k)
        .select(col("query_id"), col("vec_id"), col("score"),
          col("_rn").as("rank"))
    }

    val variants: Seq[(String, () => Long)] = Seq(
      "window" -> (() => windowTopK.count()),
      "agg" -> (() =>
        TopK.batchTopK(scored, "query_id", "vec_id", k,
          largerBetter = true).count()))

    // parity first: both reductions must produce the identical result set
    val w = windowTopK
      .select(col("query_id"), col("vec_id"), col("score"), col("rank").cast("int").as("rank"))
    val a = TopK.batchTopK(scored, "query_id", "vec_id", k, largerBetter = true)
    val diff = w.exceptAll(a).count() + a.exceptAll(w).count()
    println(s"""{"parity_diff_rows": $diff, "n": $n, "q": $q, "k": $k}""")

    variants.foreach { case (name, run) =>
      var out = Seq.empty[String]
      (1 to reps).foreach { rep =>
        meter.reset()
        val t0 = System.nanoTime()
        val rows = run()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let async listener events drain
        out = out :+ f"""{"variant":"$name","rep":$rep,"sec":$sec%.3f,"rows":$rows,"shuffle_bytes":${meter.bytes.get},"shuffle_records":${meter.records.get}}"""
      }
      out.foreach(println)
    }
    spark.stop()
  }
}
