package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fetch one embedding vector by id (driver-side; qdrant's
    * recommend-by-id resolve step, `lib/collection/src/collection/query.rs:456`). */
  def embeddingOf(spark: SparkSession, dir: String, vecId: Long): Seq[Double] =
    load(spark, dir, "embeddings")
      .filter(col("vec_id") === vecId)
      .select("embedding")
      .head().getSeq[Float](0).toSeq.map(_.toDouble)
}
