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
  * score, in selection order. The reference computes MMR over
  * `VectorInternal` — vector-kind-agnostic, so sparse spaces rerank the
  * same way with the sparse intersect-dot as the similarity.
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

  /** Sparse intersect-dot over sorted index arrays (the `SparseVector`
    * scoring contract, `sparse_vector.rs` — merge over the intersection). */
  private def sparseDotOf(ai: Array[Long], av: Array[Double],
      bi: Array[Long], bv: Array[Double]): Double = {
    var i = 0; var j = 0; var acc = 0.0
    while (i < ai.length && j < bi.length) {
      if (ai(i) == bi(j)) { acc += av(i) * bv(j); i += 1; j += 1 }
      else if (ai(i) < bi(j)) i += 1
      else j += 1
    }
    acc
  }

  /** The greedy MMR selection over n candidates: `rel` = sim(query, c),
    * `pairSimRaw` = sim(c_i, c_j). Returns selected candidate indices in
    * selection order. Ties break on first-seen (candidate rank order),
    * which is deterministic given the ordered input. */
  private def greedySelect(n: Int, limit: Int, lambda: Double,
      rel: Int => Double, pairSimRaw: (Int, Int) => Double,
      /** dense/sparse similarities are symmetric, so the pair cache keys
        * by the UNORDERED pair; MaxSim is not — the reference computes
        * `scorers[candidate].score_point(selected)` (candidate as the
        * query side, `lazy_matrix.rs:56-68`), so the multivec caller keys
        * by direction. */
      symmetric: Boolean = true): Seq[Int] = {
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (n > 0 && limit > 0) {
      if (n < 2) selected += 0
      else {
        val simCache = scala.collection.mutable.Map.empty[(Int, Int), Double]
        def pairSim(i: Int, j: Int): Double = {
          val key = if (symmetric && i > j) (j, i) else (i, j)
          simCache.getOrElseUpdate(key, pairSimRaw(i, j))
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
    selected.toSeq
  }

  private def selectionFrame(spark: SparkSession, idCol: String,
      idType: DataType, ids: Array[Any], scores: Array[Double],
      selected: Seq[Int]): DataFrame = {
    val out = selected.zipWithIndex.map { case (idx, pos) =>
      Row(ids(idx), scores(idx), pos + 1)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField(idCol, idType), StructField("score", DoubleType),
        StructField("position", IntegerType))))
  }

  /** `candidates`: (id, score, vector) rows — the top `candidatesLimit` hits
    * of the underlying query, scores already rounded. Returns (id, score,
    * position) in MMR selection order. */
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
    val rel = vecs.map(v => simInternal(metric, v, q))
    val selected = greedySelect(rows.length, limit, lambda,
      rel, (i, j) => simInternal(metric, vecs(i), vecs(j)))
    selectionFrame(spark, idCol, idType, ids, scores, selected)
  }

  /** Multivector-space MMR: `candidates` = (id, score, matrix) rows; both
    * the relevance and the pairwise similarity are MaxSim
    * (`mmr/mod.rs:102-140` scores the volatile multi-dense storage with the
    * standard scorer). Pairwise direction: CANDIDATE matrix as the query
    * side against the selected matrix (`lazy_matrix.rs:56-68`) — MaxSim is
    * asymmetric, so the greedy loop must not canonicalize the pair. */
  def rerankMulti(
      spark: SparkSession,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      metric: Metric,
      query: Seq[Seq[Double]],
      lambda: Double,
      limit: Int): DataFrame = {
    val idType = candidates.schema(idCol).dataType
    val rows = candidates.select(col(idCol), col("score"), col(vecCol)).collect()
    val ids = rows.map(_.get(0))
    val scores = rows.map(_.getDouble(1))
    val mats: Array[Array[Array[Double]]] = rows.map(
      _.getSeq[scala.collection.Seq[Float]](2)
        .map(_.iterator.map(_.toDouble).toArray).toArray)
    val q = query.map(_.toArray).toArray
    def maxSimOf(qm: Array[Array[Double]], stored: Array[Array[Double]]): Double =
      qm.foldLeft(0.0)((acc, r) =>
        acc + stored.iterator.map(t => simInternal(metric, r, t)).max)
    val rel = mats.map(m => maxSimOf(q, m))
    val selected = greedySelect(rows.length, limit, lambda,
      rel, (c, s) => maxSimOf(mats(c), mats(s)), symmetric = false)
    selectionFrame(spark, idCol, idType, ids, scores, selected)
  }

  /** Sparse-space MMR: `candidates` = (id, score, _qidx, _qval) rows with
    * the candidate's stored sparse vector; similarities are the sparse
    * intersect-dot, both query-to-candidate and pairwise. */
  def rerankSparse(
      spark: SparkSession,
      candidates: DataFrame,
      idCol: String,
      qIndices: Seq[Long],
      qValues: Seq[Double],
      lambda: Double,
      limit: Int): DataFrame = {
    val idType = candidates.schema(idCol).dataType
    val rows = candidates
      .select(col(idCol), col("score"), col("_qidx"), col("_qval")).collect()
    val ids = rows.map(_.get(0))
    val scores = rows.map(_.getDouble(1))
    // stored indices: array<bigint> canonically, array<int> on legacy
    // directly-seeded tables — promote per element
    val idx = rows.map(_.getSeq[Any](2).iterator.map {
      case i: Int => i.toLong
      case l: Long => l
    }.toArray)
    val vals = rows.map(_.getSeq[Float](3).toArray.map(_.toDouble))
    val qi = qIndices.toArray
    val qv = qValues.toArray
    val rel = rows.indices.map(i => sparseDotOf(idx(i), vals(i), qi, qv))
    val selected = greedySelect(rows.length, limit, lambda,
      rel, (i, j) => sparseDotOf(idx(i), vals(i), idx(j), vals(j)))
    selectionFrame(spark, idCol, idType, ids, scores, selected)
  }
}
