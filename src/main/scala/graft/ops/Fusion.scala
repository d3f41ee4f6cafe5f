package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion over prefetch result lists (collection-level merge stage,
  * SURVEY.md §3.1 step 8). Sources are small ranked lists (≤ prefetch
  * limit), so single-partition windows are the right plan shape — the heavy
  * lifting happened in the per-source searches.
  */
object Fusion {

  /** A fusion input: a scored list plus its ordering direction. */
  final case class Source(df: DataFrame, largerBetter: Boolean = true)

  private def rankWindow(s: Source, idCol: String) =
    Window.orderBy(
      if (s.largerBetter) col("score").desc else col("score").asc,
      col(idCol).asc)

  /** Reciprocal Rank Fusion.
    * Per source list, contribution of the item at 1-based position `pos` is
    * `1 / (pos/weight + k − 1)` (k defaults to 2); scores are summed per id
    * and sorted descending. Ref
    * `lib/segment/src/common/reciprocal_rank_fusion.rs:32-100`.
    */
  def rrf(
      sources: Seq[Source],
      idCol: String,
      k: Int = 2,
      weights: Option[Seq[Double]] = None,
      limit: Int = 10): DataFrame = {
    require(weights.forall(_.length == sources.length),
      "Number of weights in RRF should match number of prefetches")
    val ws = weights.getOrElse(Seq.fill(sources.length)(1.0))
    val contribs = sources.zip(ws).map { case (s, w) =>
      val pos = row_number().over(rankWindow(s, idCol)).cast("double")
      val contrib =
        if (w <= 0.0) lit(0.0d)
        else lit(1.0d) / (pos / lit(w) + lit(k.toDouble - 1.0))
      s.df.select(col(idCol), contrib.as("contrib"))
    }
    contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(round(sum(col("contrib")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(limit)
  }

  /** Distribution-Based Score Fusion: normalize each list to [0,1] using
    * μ±3σ (sample std-dev) as extremes, then weighted sum per id.
    * Singleton lists and σ=0 normalize to 0.5.
    * Ref `lib/segment/src/common/score_fusion.rs:10-160` (`distr_norm` :149).
    *
    * The reference feeds `score_fusion` uniformly larger-better scores
    * (`ScoredPoint.score` is similarity-oriented for every metric, incl.
    * Euclid). Engine sources that rank smaller-better (raw distances) are
    * negated before normalization so that a better point always earns a
    * higher DBSF contribution, matching the reference's orientation.
    */
  def dbsf(
      sources: Seq[Source],
      idCol: String,
      weights: Option[Seq[Double]] = None,
      limit: Int = 10): DataFrame = {
    val ws = weights.getOrElse(Seq.fill(sources.length)(1.0))
    val normalized = sources.zip(ws).map { case (src, w) =>
      val s = if (src.largerBetter) src
        else src.copy(df = src.df.withColumn("score", negate(col("score"))))
      val stats = s.df.agg(
        avg(col("score")).as("m"),
        coalesce(stddev_samp(col("score")), lit(0.0d)).as("sd"),
        count(lit(1)).as("n"))
      val ns = when(col("n") === 1 || col("sd") === 0.0d, lit(0.5d))
        .otherwise((col("score") - (col("m") - lit(3.0d) * col("sd"))) /
          (lit(6.0d) * col("sd")))
      s.df.crossJoin(broadcast(stats))
        .select(col(idCol), (ns * lit(w)).as("contrib"))
    }
    normalized.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(round(sum(col("contrib")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(limit)
  }
}
