package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.model._

/** Distance matrix: sample points, compute pairwise similarities within the
  * sample, keep the top `limitPerSample` neighbors per sampled point.
  * Ref `lib/collection/src/collection/distance_matrix.rs:28-250`.
  *
  * qdrant samples randomly then KNNs each sample against the sample set
  * (`HasId` filter). Batch shape: the sample is small (default 10,
  * `distance_matrix.rs:42-44`), so a broadcast self-join + per-row window is
  * the right plan at any scale — only sample×sample pairs materialize.
  */
object DistanceMatrix {

  /** `samplePred` selects the sample deterministically (callers wanting the
    * serving behavior can pass a seeded random id set). */
  def pairs(
      points: DataFrame,
      idCol: String,
      vecCol: String,
      metric: Metric,
      samplePred: Column,
      limitPerSample: Int = 3): DataFrame = {
    val sample = points.filter(samplePred)
      .select(col(idCol).as("id_a"), col(vecCol).as("_va"))
    val other = points.filter(samplePred)
      .select(col(idCol).as("id_b"), col(vecCol).as("_vb"))
    val dir = (c: Column) => if (metric.largerBetter) c.desc else c.asc
    val scored = sample.join(broadcast(other), col("id_a") =!= col("id_b"))
      .withColumn("score",
        round(VectorFunctions.score(metric, col("_va"), col("_vb")), 6))
    val w = Window.partitionBy(col("id_a")).orderBy(dir(col("score")), col("id_b").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= limitPerSample)
      .orderBy(col("id_a").asc, dir(col("score")), col("id_b").asc)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** CSR-style offsets encoding of [[pairs]] (the `_offsets` response form):
    * one row per sample id with neighbor ids and scores as rank-ordered
    * arrays (collect_list order is indeterminate, so sort by explicit rank). */
  def offsets(pairsDf: DataFrame, largerBetter: Boolean = true): DataFrame = {
    val dir = (c: Column) => if (largerBetter) c.desc else c.asc
    val w = Window.partitionBy(col("id_a")).orderBy(dir(col("score")), col("id_b").asc)
    pairsDf
      .withColumn("_rn", row_number().over(w))
      .groupBy(col("id_a"))
      .agg(sort_array(collect_list(struct(col("_rn"), col("id_b"), col("score")))).as("_s"))
      .select(col("id_a"),
        transform(col("_s"), x => x.getField("id_b")).as("ids"),
        transform(col("_s"), x => x.getField("score")).as("scores"))
      .orderBy(col("id_a").asc)
  }
}
