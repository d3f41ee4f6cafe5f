package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.filters.{FieldResolver, FilterCompiler}
import graft.model._
import graft.functions.VectorFunctions._

/** Core vector search operators (the qdrant "universal query" read surface).
  *
  * Execution model: declarative exact scan. A single-query top-k plans as
  * `TakeOrderedAndProject` (per-partition partial top-k, no full shuffle);
  * batch queries broadcast the query side and use a per-query window. At
  * cluster scale the scan parallelizes over parquet splits and only k rows
  * per partition cross the wire — the same shape qdrant's
  * segment→shard→collection merge collapses into (SURVEY.md §3.1).
  */
object Search {

  /** Internal similarity (pre-postprocess), used by recommend/discover/context
    * scoring. Euclid → −Σd², Manhattan → −Σ|d| (larger always better).
    * Ref `lib/segment/src/spaces/simple.rs:36-121`. */
  def simInternal(metric: Metric, v: Column, q: Column): Column = metric match {
    case Dot       => dot(v, q)
    case Cosine    => cosine(v, q)
    case Euclid    => -graft.functions.VecKernels.l2sq(v, q)
    case Manhattan => -manhattanDist(v, q)
  }

  /** User-visible score (post-processed): Euclid → sqrt, Manhattan → abs. */
  def scoreExpr(metric: Metric, v: Column, q: Column): Column =
    graft.functions.VectorFunctions.score(metric, v, q)

  /** NULLS LAST in both directions: a point lacking the scored vector
    * produces a NULL score and must never outrank a scored one (Spark's
    * default asc = nulls FIRST would put unscorable points on top for
    * smaller-better metrics). */
  private def orderCols(scoreCol: Column, idCol: Column, largerBetter: Boolean): Seq[Column] =
    Seq(if (largerBetter) scoreCol.desc_nulls_last else scoreCol.asc_nulls_last,
      idCol.asc)

  /** Generic "score, filter, threshold, top-(k+offset)" pipeline shared by all
    * scoring queries. `largerBetter` controls both ordering and the
    * threshold direction (strict, ref `types.rs:363-369`). */
  def scoredTopK(
      points: DataFrame,
      idCol: String,
      score: Column,
      largerBetter: Boolean,
      filter: Option[Column] = None,
      k: Int = 10,
      offset: Int = 0,
      scoreThreshold: Option[Double] = None,
      extraCols: Seq[String] = Nil,
      roundTo: Int = 6): DataFrame = {
    val base = filter.fold(points)(points.filter)
    val scored = base
      .withColumn("score", round(score, roundTo))
      .select((Seq(idCol, "score") ++ extraCols).map(col): _*)
    val thresholded = scoreThreshold.fold(scored) { t =>
      scored.filter(if (largerBetter) col("score") > t else col("score") < t)
    }
    val ord = orderCols(col("score"), col(idCol), largerBetter)
    // Optional-vector exclusion lives at the INPUT (vector-column
    // isNotNull from the callers — pushable to the scan): a filter on the
    // computed score would either be substituted below the projection
    // (2× kernel evals per row) or, placed above the limit, break
    // TakeOrderedAndProject's single-stage executeCollect fast path
    // (measured +25% on knn). NULLS LAST ordering is the belt-and-braces
    // for callers scoring arbitrary expressions.
    val top = thresholded.orderBy(ord: _*).limit(offset + k)
    if (offset == 0) top
    else {
      // tiny (k+offset rows): single-partition window is fine
      top.withColumn("_rn", row_number().over(Window.orderBy(ord: _*)))
        .filter(col("_rn") > offset).drop("_rn")
        .orderBy(ord: _*)
    }
  }

  /** Nearest-k by metric with optional filter / threshold / offset.
    * Ref `QueryEnum::Nearest` `lib/shard/src/query/query_enum.rs:10`. */
  def knn(
      points: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      metric: Metric,
      filter: Option[Filter] = None,
      resolver: Option[FieldResolver] = None,
      k: Int = 10,
      offset: Int = 0,
      scoreThreshold: Option[Double] = None,
      extraCols: Seq[String] = Nil): DataFrame = {
    val q = typedLit(query)
    val pred = filter.map(f => new FilterCompiler(resolver.get).compile(f))
    // points lacking the queried vector are excluded — the reference has no
    // entry for them in that vector's storage (`test_optional_vectors.py`);
    // the guard is a plain scan predicate (PushedFilters: IsNotNull)
    val guard = col(vecCol).isNotNull
    scoredTopK(points, idCol, scoreExpr(metric, col(vecCol), q), metric.largerBetter,
      Some(pred.fold(guard)(_ && guard)), k, offset, scoreThreshold, extraCols)
  }

  /** Per-query top-k reduction over a scored (queryId, id, score) stream —
    * the batch-KNN merge stage. Map-side bounded either way: LongType ids
    * reduce through [[TopK.TopKAgg]] (ObjectHashAggregate partial combine —
    * each mapper ships ONE ≤ k-entry heap buffer per query, O(log k) insert
    * per row, no sort); other id types use the window form, which Spark
    * ≥ 3.5 also bounds below the exchange via `WindowGroupLimit(Partial)`
    * but pays a per-partition sort of all scored rows first (measured
    * 2-3× slower at 1M×64q — `graft.KnnBatchProbe`, SCALEPROBE_r09.md;
    * shuffle volume is partitions×Q×k for BOTH, never N×Q). */
  def batchRank(
      scored: DataFrame,
      queryIdCol: String,
      idCol: String,
      k: Int,
      largerBetter: Boolean): DataFrame =
    scored.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        // callers guard unscorable rows at the INPUT (vector isNotNull on
        // the scan — pushable); a filter on the computed score here would
        // be substituted below the projection and double the kernel work
        TopK.batchTopK(scored, queryIdCol, idCol, k, largerBetter)
      case _ =>
        val ord = orderCols(col("score"), col(idCol), largerBetter)
        scored
          .withColumn("_rn", row_number().over(
            Window.partitionBy(col(queryIdCol)).orderBy(ord: _*)))
          .filter(col("_rn") <= k)
          .filter(col("score").isNotNull) // post-window: ≤ Q·k rows
          .select(col(queryIdCol), col(idCol), col("score"), col("_rn").as("rank"))
    }

  /** Batch nearest-k: one top-k per row of `queries` (cols: queryIdCol,
    * queryVecCol). The 100 TB shape: the query side is broadcast, the big
    * side streams once, and the reduction is map-side bounded
    * ([[batchRank]] — ≤ k rows per mapper per query cross the wire). */
  def knnBatch(
      points: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      metric: Metric,
      k: Int = 10): DataFrame = {
    // optional-vector guard at the INPUT: pushes to the scan, unlike a
    // post-scoring null filter (which would re-evaluate the kernel)
    val scored = points.filter(col(vecCol).isNotNull)
      .crossJoin(broadcast(queries))
      .withColumn("score", round(scoreExpr(metric, col(vecCol), col(queryVecCol)), 6))
    batchRank(scored, queryIdCol, idCol, k, metric.largerBetter)
  }

  /** Recommend, `avg_vector` strategy: search vector =
    * avg(positives) + (avg(positives) − avg(negatives)), elementwise.
    * Ref `lib/collection/src/recommendations.rs:34-130` (merge at :105).
    * Vector arithmetic happens at the driver (inputs are tiny). */
  def recommendAvgVector(positives: Seq[Seq[Double]], negatives: Seq[Seq[Double]]): Seq[Double] = {
    require(positives.nonEmpty, "recommend requires at least one positive")
    val dim = positives.head.length
    def avg(vs: Seq[Seq[Double]]): Seq[Double] =
      if (vs.isEmpty) Seq.fill(dim)(0.0)
      else (0 until dim).map(i => vs.map(_(i)).sum / vs.length)
    val p = avg(positives)
    if (negatives.isEmpty) p
    else {
      val n = avg(negatives)
      (0 until dim).map(i => p(i) + (p(i) - n(i)))
    }
  }

  /** `average_vector` recommend over MULTIVECTORS (`avg_vectors` multi arm
    * + `merge_positive_and_negative_avg`,
    * `lib/collection/src/recommendations.rs:59-70,121-124`): the "average"
    * of multi-dense examples is their CONCATENATION, and negatives append
    * NEGATED — MaxSim then scores the merged matrix. */
  def recommendAvgMultiQuery(
      positives: Seq[Seq[Seq[Double]]],
      negatives: Seq[Seq[Seq[Double]]]): Seq[Seq[Double]] = {
    require(positives.nonEmpty,
      "Positive vectors should not be empty with `average` strategy")
    positives.flatten ++ negatives.flatten.map(_.map(-_))
  }

  /** `average_vector` recommend over SPARSE vectors (`avg_vectors` sparse
    * arm + the sparse merge, `recommendations.rs:55-58,87-91,119-120`):
    * values aggregate per dim over the index UNION (missing = 0), divide
    * by example count, then merge as `2·avg_pos − avg_neg` per union dim. */
  def recommendAvgSparseQuery(
      positives: Seq[(Seq[Long], Seq[Double])],
      negatives: Seq[(Seq[Long], Seq[Double])]): (Seq[Long], Seq[Double]) = {
    require(positives.nonEmpty,
      "Positive vectors should not be empty with `average` strategy")
    def avg(vs: Seq[(Seq[Long], Seq[Double])]): Map[Long, Double] = {
      val sums = vs.flatMap { case (is, xs) => is.zip(xs) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      sums.view.mapValues(_ / vs.length).toMap
    }
    val p = avg(positives)
    val merged =
      if (negatives.isEmpty) p
      else {
        val n = avg(negatives)
        (p.keySet ++ n.keySet).map(d =>
          d -> (2 * p.getOrElse(d, 0.0) - n.getOrElse(d, 0.0))).toMap
      }
    val dims = merged.keys.toSeq.sorted
    (dims, dims.map(merged))
  }

  /** Recommend, `best_score`: if max(sim(pos)) > max(sim(neg)) then
    * σ(max_pos) else −σ(max_neg), with σ = scaled fast sigmoid; always
    * larger-better. Ref `reco_query.rs:63-90`, `query_enum.rs:31-40`. */
  def bestScoreExpr(
      metric: Metric, v: Column,
      positives: Seq[Seq[Double]], negatives: Seq[Seq[Double]]): Column = {
    require(positives.nonEmpty || negatives.nonEmpty,
      "recommend requires at least one example")
    bestScoreCombine(positives.map(p => simInternal(metric, v, typedLit(p))),
      negatives.map(n => simInternal(metric, v, typedLit(n))))
  }

  /** The best_score combine over per-example similarity columns — shared
    * by the dense metric form and the sparse-dot form (the reference's
    * `RecoBestScoreQuery` is similarity-representation-agnostic).
    * positives are OPTIONAL (`test_recommendation_multivector.py::
    * test_multi_best_score_works_with_only_negatives`): with none, every
    * point scores −σ(max_neg) — ranked by least-bad negative match. */
  def bestScoreCombine(posSims: Seq[Column], negSims: Seq[Column]): Column = {
    val maxPos = posSims.reduceOption((a, b) => greatest(a, b))
      .getOrElse(lit(Double.NegativeInfinity))
    val maxNeg = negSims.reduceOption((a, b) => greatest(a, b))
      .getOrElse(lit(Double.NegativeInfinity))
    when(maxPos > maxNeg, scaledFastSigmoid(maxPos))
      .otherwise(-scaledFastSigmoid(maxNeg))
  }

  /** Recommend, `sum_scores`: Σ sim(pos) − Σ sim(neg).
    * Ref `reco_query.rs` (`RecoSumScoresQuery`). */
  def sumScoresExpr(
      metric: Metric, v: Column,
      positives: Seq[Seq[Double]], negatives: Seq[Seq[Double]]): Column =
    sumScoresCombine(positives.map(p => simInternal(metric, v, typedLit(p))),
      negatives.map(n => simInternal(metric, v, typedLit(n))))

  /** The sum_scores combine over per-example similarity columns. */
  def sumScoresCombine(posSims: Seq[Column], negSims: Seq[Column]): Column =
    posSims.reduceOption(_ + _).getOrElse(lit(0.0d)) -
      negSims.reduceOption(_ + _).getOrElse(lit(0.0d))

  /** Discover: Σ_pairs sign(sim(pos)−sim(neg)) + σ(sim(target)); integer rank
    * dominates, target similarity tiebreaks within (0,1).
    * Ref `discover_query.rs:44-74`. */
  def discoverExpr(
      metric: Metric, v: Column,
      target: Seq[Double], pairs: Seq[(Seq[Double], Seq[Double])]): Column =
    discoverCombine(simInternal(metric, v, typedLit(target)),
      pairs.map { case (p, n) =>
        (simInternal(metric, v, typedLit(p)), simInternal(metric, v, typedLit(n)))
      })

  /** The discover combine over per-example similarity columns — shared by
    * the dense metric form and the sparse-dot form. */
  def discoverCombine(targetSim: Column,
      pairSims: Seq[(Column, Column)]): Column = {
    val rank = pairSims.map { case (sp, sn) =>
      when(sp > sn, 1).when(sp < sn, -1).otherwise(0)
    }.reduceOption((a, b) => a + b).getOrElse(lit(0))
    rank.cast("double") + scaledFastSigmoid(targetSim)
  }

  /** Relevance feedback, `naive` strategy:
    * `a·sim(target) + Σ_pairs (Δscore^b · c)·(sim(pos) − sim(neg))` where
    * pairs are all ordered feedback permutations with feedback-score
    * difference Δscore > 0 (margin 0). Pair extraction happens at the
    * driver (feedback lists are tiny); the per-point score is one Catalyst
    * expression. Ref `lib/segment/src/vector_storage/query/feedback_query.rs`
    * (`extract_context_pairs` :118-145, `score_by` :195-230);
    * `FeedbackStrategy::Naive` `collection_query.rs:202-220`. */
  def feedbackNaiveExpr(
      metric: Metric, v: Column,
      target: Seq[Double],
      feedback: Seq[(Seq[Double], Double)],
      a: Double, b: Double, c: Double): Column =
    feedbackNaiveCombine(simInternal(metric, v, typedLit(target)),
      feedback.map { case (fv, sc) =>
        (simInternal(metric, v, typedLit(fv)), sc)
      }, a, b, c)

  /** The naive-feedback combine over per-example similarity columns —
    * shared by the dense metric form and the multivector MaxSim form (the
    * reference's custom queries are scorer-representation-agnostic,
    * `query_scorer/multi_custom_query_scorer.rs`). */
  def feedbackNaiveCombine(targetSim: Column,
      feedbackSims: Seq[(Column, Double)],
      a: Double, b: Double, c: Double): Column = {
    val pairs = for {
      ((si, wi), i) <- feedbackSims.zipWithIndex
      ((sj, wj), j) <- feedbackSims.zipWithIndex
      if i != j && wi - wj > 0.0
    } yield lit(math.pow(wi - wj, b) * c) * (si - sj)
    lit(a) * targetSim + pairs.reduceOption(_ + _).getOrElse(lit(0.0d))
  }

  /** f32 machine epsilon — the MARGIN in context loss
    * (`context_query.rs:54`). */
  val ContextMargin: Double = math.ulp(1.0f).toDouble

  /** Context: Σ_pairs fastSigmoid(min(sim(pos)−sim(neg)−ε, 0)) — zero inside
    * the "good zone", negative outside. Ref `context_query.rs:36-120`. */
  def contextExpr(
      metric: Metric, v: Column,
      pairs: Seq[(Seq[Double], Seq[Double])]): Column =
    contextCombine(pairs.map { case (p, n) =>
      (simInternal(metric, v, typedLit(p)), simInternal(metric, v, typedLit(n)))
    })

  /** The context combine over per-pair similarity columns. */
  def contextCombine(pairSims: Seq[(Column, Column)]): Column =
    pairSims.map { case (sp, sn) =>
      val diff = sp - sn - lit(ContextMargin)
      fastSigmoid(least(diff, lit(0.0d)))
    }.reduceOption(_ + _).getOrElse(lit(0.0d))
}
