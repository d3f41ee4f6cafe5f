package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.storage.Collection

/** Structured-Streaming ingestion. qdrant's "streaming" is an ordered
  * update queue (WAL append → async apply, SURVEY.md §2.7 — no event-time
  * semantics); the Spark mapping is micro-batch `foreachBatch` upserts:
  * each batch applies atomically, later batches win per id. */
object Streaming {

  /** Continuous upsert of a point stream into a collection. */
  def upsertStream(
      stream: DataFrame,
      collection: Collection,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) collection.upsert(batch)
      }
      .start()

  /** Streaming exact dedup (north-star pipeline op): drop repeats of a key
    * within the watermark horizon. */
  def dedupStream(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Windowed event-rate aggregation over a point-update stream — the
    * monitoring view a 100 TB ingest pipeline runs alongside upserts. */
  def rateByWindow(
      stream: DataFrame,
      tsCol: String,
      windowLength: String,
      watermark: String,
      groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    stream.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), windowLength) +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("n"))
  }
}
