package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — contents change per investigation; numbers are
  * never recorded, only the conclusions (SCALEPROBE notes). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](n: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"PROF $n ${(System.nanoTime()-t0)/1e9}%.2f"); r }

    // bare streaming near-dup ingest (the Bench operatorOnly shape)
    def streamingBare(): Unit = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_sndp_prof")
      val corpus = Tables.load(spark, dir, "documents")
        .select(col("doc_id").as("id"), col("text").as("payload"))
      val coll = graft.storage.Collection.create(spark, base.resolve("coll").toString,
        graft.sources.CollectionConfig(idCol = "id", payloadCol = "payload"),
        corpus.limit(0))
      val stream = MemoryStream[(Long, String)]
      val q = graft.streaming.Streaming.nearDupUpsertStream(
        stream.toDF().toDF("id", "payload"), coll, "id", "payload",
        base.resolve("keys").toString, base.resolve("ckpt").toString,
        trigger = Trigger.ProcessingTime(0))
      val rows = corpus.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      rows.grouped(math.max(1, (rows.length + 2) / 3)).foreach { b =>
        stream.addData(b); q.processAllAvailable()
      }
      q.stop()
      coll.read().select("id").count(): Unit
    }
    time("warm")(SparkEntry.queries("knn_dot")(spark, dir).count())
    time("streaming_bare_1")(streamingBare())
    time("streaming_bare_2")(streamingBare())
    time("streaming_bare_3")(streamingBare())
    spark.stop()
  }
}
