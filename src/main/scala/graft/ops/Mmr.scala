package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Maximal Marginal Relevance diversity rerank.
  *
  * Ref `lib/shard/src/query/mmr/mod.rs:42-280`: candidates = `candidatesLimit`
  * nearest (with vectors); greedy loop picks first the max-relevance point,
  * then repeatedly argmax of `λ·sim(q,p) − (1−λ)·max_{s∈selected} sim(p,s)`
  * over *internal* similarities; returned points keep their ORIGINAL query
  * score, in selection order.
  *
  * Inherently sequential over ≤ candidatesLimit rows → collect to the driver
  * and loop (qdrant does the same at collection level, post-merge). The
  * distributed part is the candidate search that feeds this.
  */
object Mmr {

  private def simInternal(metric: Metric, a: Array[Double], b: Array[Double]): Double =
    metric match {
      case Dot => a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      case Cosine =>
        val d = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
        val na = math.sqrt(a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * a(i)))
        val nb = math.sqrt(b.indices.foldLeft(0.0)((acc, i) => acc + b(i) * b(i)))
        d / (na * nb)
      case Euclid =>
        -a.indices.foldLeft(0.0)((acc, i) => acc + (a(i) - b(i)) * (a(i) - b(i)))
      case Manhattan =>
        -a.indices.foldLeft(0.0)((acc, i) => acc + math.abs(a(i) - b(i)))
    }

  /** `candidates`: (id, score, vector) rows — the top `candidatesLimit` hits
    * of the underlying query, scores already rounded. Returns (id, score,
    * position) in MMR selection order. Ties break on first-seen (candidate
    * rank order), which is deterministic given the ordered input. */
  def rerank(
      spark: SparkSession,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      metric: Metric,
      query: Seq[Double],
      lambda: Double,
      limit: Int): DataFrame = {
    val idType = candidates.schema(idCol).dataType // Long or UUID-string ids
    val rows = candidates.select(col(idCol), col("score"), col(vecCol)).collect()
    val ids = rows.map(_.get(0))
    val scores = rows.map(_.getDouble(1))
    val vecs = rows.map(_.getSeq[Float](2).toArray.map(_.toDouble))
    val q = query.toArray
    val n = rows.length

    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (n > 0 && limit > 0) {
      if (n < 2) selected += 0
      else {
        val rel = vecs.map(v => simInternal(metric, v, q))
        val simCache = scala.collection.mutable.Map.empty[(Int, Int), Double]
        def pairSim(i: Int, j: Int): Double = {
          val key = if (i < j) (i, j) else (j, i)
          simCache.getOrElseUpdate(key, simInternal(metric, vecs(i), vecs(j)))
        }
        val remaining = scala.collection.mutable.LinkedHashSet(0 until n: _*)
        val first = remaining.maxBy(rel)
        selected += first; remaining -= first
        while (selected.length < limit && remaining.nonEmpty) {
          val best = remaining.maxBy { c =>
            val maxSel = selected.map(s => pairSim(c, s)).max
            lambda * rel(c) - (1.0 - lambda) * maxSel
          }
          selected += best; remaining -= best
        }
      }
    }
    val out = selected.zipWithIndex.map { case (idx, pos) =>
      Row(ids(idx), scores(idx), pos + 1)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(
        StructField(idCol, idType), StructField("score", DoubleType),
        StructField("position", IntegerType))))
  }
}
