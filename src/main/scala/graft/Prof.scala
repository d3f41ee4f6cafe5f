package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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
    time("warm")(SparkEntry.queries("knn_dot")(spark, dir).count())
    time("batch_update_ops_1")(SparkEntry.queries("batch_update_ops")(spark, dir).count())
    time("batch_update_ops_2")(SparkEntry.queries("batch_update_ops")(spark, dir).count())
    time("bm25_idf_search_1")(SparkEntry.queries("bm25_idf_search")(spark, dir).count())
    time("bm25_idf_search_2")(SparkEntry.queries("bm25_idf_search")(spark, dir).count())
    time("ngram_jaccard")(SparkEntry.queries("ngram_jaccard")(spark, dir).count())
    time("quant_pq_1")(SparkEntry.queries("quantized_pq_rescore")(spark, dir).count())
    time("quant_pq_2")(SparkEntry.queries("quantized_pq_rescore")(spark, dir).count())
    spark.stop()
  }
}
