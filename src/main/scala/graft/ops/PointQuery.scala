package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.filters.{FieldResolver, FilterCompiler}
import graft.model._

/** The universal query API: a prefetch DAG where each node runs its own
  * sub-query and the parent rescoring runs over the union of child results.
  *
  * Mirrors qdrant's `CollectionPrefetch`/`ShardQueryRequest` planning
  * (`lib/collection/src/operations/universal_query/collection_query.rs:510-545`,
  * `lib/shard/src/query/planned_query.rs:14-120`,
  * `lib/collection/src/shards/local_shard/query.rs:203-300`): Fusion and
  * Formula are only valid with prefetches; Vector/OrderBy/Sample leaves
  * execute as searches/scrolls; rescoring over children is a semi-join on
  * candidate ids.
  *
  * Spark shape: children produce small (≤ limit) ranked lists; the parent
  * rescore semi-joins the points table on those ids — broadcast-sized by
  * construction, so nested DAGs never re-scan more than the leaves did.
  */
object PointQuery {

  sealed trait Scoring
  final case class Nearest(vecCol: String, metric: Metric, query: Seq[Double]) extends Scoring
  final case class RecommendBest(vecCol: String, metric: Metric,
      positives: Seq[Seq[Double]], negatives: Seq[Seq[Double]]) extends Scoring
  final case class RecommendSum(vecCol: String, metric: Metric,
      positives: Seq[Seq[Double]], negatives: Seq[Seq[Double]]) extends Scoring
  final case class RecommendAvg(vecCol: String, metric: Metric,
      positives: Seq[Seq[Double]], negatives: Seq[Seq[Double]]) extends Scoring
  final case class DiscoverQ(vecCol: String, metric: Metric,
      target: Seq[Double], pairs: Seq[(Seq[Double], Seq[Double])]) extends Scoring
  final case class ContextQ(vecCol: String, metric: Metric,
      pairs: Seq[(Seq[Double], Seq[Double])]) extends Scoring
  final case class MaxSimQ(vecCol: String, metric: Metric,
      queryVecs: Seq[Seq[Double]]) extends Scoring
  /** Relevance feedback, naive strategy (`FeedbackStrategy::Naive`). */
  final case class FeedbackQ(vecCol: String, metric: Metric,
      target: Seq[Double], feedback: Seq[(Seq[Double], Double)],
      a: Double, b: Double, c: Double) extends Scoring
  /** Sparse-dot leaf over a tokens column: Σ_terms weight·tf(term) — the
    * per-row form of [[graft.index.SparseIndex.search]]'s TF×weight scoring,
    * usable as a prefetch leaf (the sparse half of the canonical hybrid
    * dense+sparse→RRF query, `tests/openapi/test_query.py`). Query terms are
    * few, so the score is one codegen'd projection — no posting join. */
  final case class SparseDotQ(tokensCol: String, terms: Seq[(String, Double)])
      extends Scoring
  /** Sparse-dot leaf over a true sparse vector column
    * (struct<indices: array<int>, values: array<float>>, the
    * `SparseVector` storage form — `sparse_vector.rs:17-22`). Dot over
    * intersecting indices, larger-better, only rows with ≥ 1 matching dim
    * (the posting-join candidate semantics). */
  final case class SparseStructQ(sparseCol: String,
      qIndices: Seq[Long], qValues: Seq[Double]) extends Scoring
  /** Recommend over a SPARSE `using` space (the reference's recommend
    * accepts sparse example vectors/ids like any `VectorInput`,
    * `recommendations.rs`): strategy ∈ average_vector / best_score /
    * sum_scores, combined exactly as the dense forms but with the sparse
    * intersect-dot as the per-example similarity. Candidates are rows
    * sharing ≥ 1 dim with ANY example (the merged posting-join set). */
  final case class RecommendSparse(sparseCol: String, strategy: String,
      positives: Seq[(Seq[Long], Seq[Double])],
      negatives: Seq[(Seq[Long], Seq[Double])]) extends Scoring
  /** Recommend over a MULTIVECTOR `using` space
    * (`test_recommendation_multivector.py`; the reference's `RecoQuery` is
    * vector-kind-agnostic): each example is a token matrix — by-id
    * examples resolve the stored matrix, inline dense examples expand to
    * 1-token matrices (`TryFrom<VectorInternal> for
    * MultiDenseVectorInternal`, `data_types/vectors.rs:176-190`) — and
    * the per-example similarity is MaxSim. `average_vector` merges the
    * examples into ONE matrix (positives concatenated, negative rows
    * negated — `recommendations.rs:59-70,121-124`); best_score /
    * sum_scores combine per-example MaxSim scores like the dense forms. */
  final case class RecommendMulti(vecCol: String, metric: Metric,
      strategy: String,
      positives: Seq[Seq[Seq[Double]]],
      negatives: Seq[Seq[Seq[Double]]]) extends Scoring
  /** Discover / Context / relevance feedback over a MULTIVECTOR `using`
    * space — the reference's custom queries score any vector kind
    * (`MultiCustomQueryScorer`,
    * `vector_storage/query_scorer/multi_custom_query_scorer.rs`): the
    * per-example similarity is MaxSim, combined by the same rank / margin /
    * weighted-pair formulas as the dense forms. */
  final case class DiscoverMulti(vecCol: String, metric: Metric,
      target: Seq[Seq[Double]],
      pairs: Seq[(Seq[Seq[Double]], Seq[Seq[Double]])]) extends Scoring
  final case class ContextMulti(vecCol: String, metric: Metric,
      pairs: Seq[(Seq[Seq[Double]], Seq[Seq[Double]])]) extends Scoring
  final case class FeedbackMulti(vecCol: String, metric: Metric,
      target: Seq[Seq[Double]], feedback: Seq[(Seq[Seq[Double]], Double)],
      a: Double, b: Double, c: Double) extends Scoring
  /** Discover / Context over a SPARSE `using` space — the same rank /
    * margin combines as the dense forms, with the sparse intersect-dot as
    * the per-example similarity (sparse `VectorInput`s are first-class in
    * the reference's discover surface, `query_enum.rs`). */
  final case class DiscoverSparse(sparseCol: String,
      target: (Seq[Long], Seq[Double]),
      pairs: Seq[((Seq[Long], Seq[Double]), (Seq[Long], Seq[Double]))])
      extends Scoring
  final case class ContextSparse(sparseCol: String,
      pairs: Seq[((Seq[Long], Seq[Double]), (Seq[Long], Seq[Double]))])
      extends Scoring
  final case class OrderByField(field: String, asc: Boolean,
      startFrom: Option[Any] = None) extends Scoring
  /** A node with NO `query` — a plain scroll in id order
    * (`planned_query.rs:189`: `query: None` → scroll without order; the
    * `{"prefetch": {"limit": 1000}}` form of `test_query.py`). */
  case object ScrollById extends Scoring
  final case class SampleRandom(seed: Long) extends Scoring
  /** rrf or dbsf over prefetches; `rrfK` = the RRF k parameter (wire form
    * `RrfQuery.rrf.k`, `schema.rs:726-729`; default 2,
    * `reciprocal_rank_fusion.rs:14`). */
  final case class FusionQ(kind: String, weights: Option[Seq[Double]] = None,
      rrfK: Option[Int] = None) extends Scoring
  final case class FormulaQ(ast: Formula.Expr, defaultScore: Double = 0.0) extends Scoring
  final case class MmrQ(vecCol: String, metric: Metric, query: Seq[Double],
      lambda: Double) extends Scoring
  /** MMR over a SPARSE `using` space — the reference's MMR is
    * vector-kind-agnostic (`lib/shard/src/query/mmr/mod.rs:42-170` computes
    * similarities over `VectorInternal`, sparse included); pairwise sims
    * are the sparse intersect-dot. */
  final case class MmrSparseQ(sparseCol: String, qIndices: Seq[Long],
      qValues: Seq[Double], lambda: Double) extends Scoring
  /** MMR over a MULTIVECTOR `using` space — the reference's MMR builds a
    * volatile storage of the candidate matrices and scores with the
    * standard MaxSim scorer (`mmr/mod.rs:102-140`,
    * `new_volatile_multi_dense_vector_storage`); pairwise similarity is
    * MaxSim with the CANDIDATE as the query side
    * (`LazyMatrix.compute_similarity`: `scorers[i].score_point(j)`). */
  final case class MmrMultiQ(vecCol: String, metric: Metric,
      query: Seq[Seq[Double]], lambda: Double) extends Scoring

  /** Wire `SearchParams` (`types.rs:573-618`): `exact` / `quantization.
    * ignore` bypass the quantized two-phase route, `quantization.rescore
    * = false` returns the approx ranking without the exact second phase,
    * `oversampling` sizes the approx candidate pool. `hnsw_ef` and
    * `indexed_only` are accepted and ignored (serving-index knobs —
    * BASELINE.json scopes online ANN out). Interpreted by the
    * quantization-aware executor (`storage/Collection.knn`); inert for
    * plain-table execution, which is always exact. */
  final case class SearchParams(
      exact: Boolean = false,
      quantIgnore: Boolean = false,
      rescore: Boolean = true,
      oversampling: Option[Double] = None,
      /** Per-request recall knob (`hnsw_ef`): overrides the declared IVF
        * nprobe on an ANN-indexed collection. */
      hnswEf: Option[Int] = None,
      /** `params.idf` (`IdfParams`, `types.rs:689-745`): which population
        * sparse IDF statistics compute over. None = parameter absent;
        * Some(None) = explicit `"global"` (same as absent);
        * Some(Some(f)) = `{"corpus": <filter>}` — N and per-dim document
        * frequencies come from the points matching f, INDEPENDENT of the
        * retrieval filter. Only applicable to an idf-modified sparse
        * space — anywhere else the request REJECTS rather than silently
        * ignoring a scoring-changing knob (`query_context.rs:31-39`). */
      idf: Option[Option[Filter]] = None)

  final case class Query(
      scoring: Scoring,
      prefetches: Seq[Query] = Nil,
      filter: Option[Filter] = None,
      limit: Int = 10,
      offset: Int = 0,
      scoreThreshold: Option[Double] = None,
      params: Option[SearchParams] = None,
      /** Same-collection point ids referenced as vector inputs anywhere in
        * the request (root AND nested prefetches; ids resolved through a
        * foreign `lookup_from` collection are exempt). The reference
        * EXCLUDES these from the results by merging `must_not HasId(ids)`
        * into the root filter (`collection_query.rs:523-531`
        * `exclude_referenced_ids`, applied at `:701-705`; asserted by
        * `tests/openapi/test_query_full.py:160`). Kept OUT of [[filter]]
        * until [[resolveExclusion]] so the strict-mode gate counts only the
        * USER's conditions — the reference injects after verification. */
      excludeIds: Seq[Any] = Nil)

  /** Merge the collected referenced-id exclusion into the root filter
    * (ref `exclude_referenced_ids`, `collection_query.rs:523-531`). The
    * root filter propagates into every prefetch leaf at execution
    * (`planned_query.rs:325` merges the global filter into all prefetches),
    * so one root-level injection covers the whole DAG. Idempotent: the
    * merged query carries no excludeIds. */
  def resolveExclusion(q: Query): Query =
    if (q.excludeIds.isEmpty) q
    else q.copy(
      filter = Filter.mergeOpts(
        Some(Filter(mustNot = Seq(HasId(q.excludeIds)))), q.filter),
      excludeIds = Nil)

  /** Score expression + larger-better orientation for a scoring LEAF —
    * shared by the DAG executor and the group-by endpoint (any scorable
    * root can group, `query/groups` over nearest/recommend/discover/
    * context/feedback/maxsim/sparse). */
  private[graft] def scoringExpr(s: Scoring): (Column, Boolean) = s match {
    case Nearest(vc, m, qv) =>
      (Search.scoreExpr(m, col(vc), typedLit(qv)), m.largerBetter)
    case RecommendAvg(vc, m, pos, neg) =>
      (Search.scoreExpr(m, col(vc), typedLit(Search.recommendAvgVector(pos, neg))),
        m.largerBetter)
    case RecommendBest(vc, m, pos, neg) =>
      (Search.bestScoreExpr(m, col(vc), pos, neg), true)
    case RecommendSum(vc, m, pos, neg) =>
      (Search.sumScoresExpr(m, col(vc), pos, neg), true)
    case DiscoverQ(vc, m, t, pairs) =>
      (Search.discoverExpr(m, col(vc), t, pairs), true)
    case ContextQ(vc, m, pairs) =>
      (Search.contextExpr(m, col(vc), pairs), true)
    case MaxSimQ(vc, m, qvs) =>
      (graft.functions.VectorFunctions.maxSim(m, col(vc), qvs), true)
    case FeedbackQ(vc, m, t, fb, a, b, c) =>
      (Search.feedbackNaiveExpr(m, col(vc), t, fb, a, b, c), true)
    case SparseDotQ(tc, terms) =>
      (terms.map { case (t, w) =>
        lit(w) * size(filter(col(tc), x => x === lit(t))).cast("double")
      }.reduce(_ + _), true)
    case SparseStructQ(sc, qi, qv) =>
      (graft.functions.VectorFunctions.sparseDot(
        col(s"$sc.indices"), col(s"$sc.values"), qi, qv), true)
    case RecommendSparse(sc, strategy, pos, neg) =>
      def sim(q: (Seq[Long], Seq[Double])): Column =
        graft.functions.VectorFunctions.sparseDot(
          col(s"$sc.indices"), col(s"$sc.values"), q._1, q._2)
      strategy match {
        case "average_vector" =>
          val (qi, qv) = Search.recommendAvgSparseQuery(pos, neg)
          (graft.functions.VectorFunctions.sparseDot(
            col(s"$sc.indices"), col(s"$sc.values"), qi, qv), true)
        case "best_score" =>
          (Search.bestScoreCombine(pos.map(sim), neg.map(sim)), true)
        case "sum_scores" =>
          (Search.sumScoresCombine(pos.map(sim), neg.map(sim)), true)
        case other =>
          throw new IllegalArgumentException(s"unknown recommend strategy '$other'")
      }
    case RecommendMulti(vc, m, strategy, pos, neg) =>
      def msim(q: Seq[Seq[Double]]): Column =
        graft.functions.VectorFunctions.maxSim(m, col(vc), q)
      strategy match {
        case "average_vector" =>
          (graft.functions.VectorFunctions.maxSim(m, col(vc),
            Search.recommendAvgMultiQuery(pos, neg)), true)
        case "best_score" =>
          (Search.bestScoreCombine(pos.map(msim), neg.map(msim)), true)
        case "sum_scores" =>
          (Search.sumScoresCombine(pos.map(msim), neg.map(msim)), true)
        case other =>
          throw new IllegalArgumentException(s"unknown recommend strategy '$other'")
      }
    case DiscoverMulti(vc, m, target, pairs) =>
      def msim(q: Seq[Seq[Double]]): Column =
        graft.functions.VectorFunctions.maxSim(m, col(vc), q)
      (Search.discoverCombine(msim(target),
        pairs.map { case (p, n) => (msim(p), msim(n)) }), true)
    case ContextMulti(vc, m, pairs) =>
      def msim(q: Seq[Seq[Double]]): Column =
        graft.functions.VectorFunctions.maxSim(m, col(vc), q)
      (Search.contextCombine(
        pairs.map { case (p, n) => (msim(p), msim(n)) }), true)
    case FeedbackMulti(vc, m, target, fb, a, b, c) =>
      def msim(q: Seq[Seq[Double]]): Column =
        graft.functions.VectorFunctions.maxSim(m, col(vc), q)
      (Search.feedbackNaiveCombine(msim(target),
        fb.map { case (q, w) => (msim(q), w) }, a, b, c), true)
    case DiscoverSparse(sc, target, pairs) =>
      def sim(q: (Seq[Long], Seq[Double])): Column =
        graft.functions.VectorFunctions.sparseDot(
          col(s"$sc.indices"), col(s"$sc.values"), q._1, q._2)
      (Search.discoverCombine(sim(target),
        pairs.map { case (p, n) => (sim(p), sim(n)) }), true)
    case ContextSparse(sc, pairs) =>
      def sim(q: (Seq[Long], Seq[Double])): Column =
        graft.functions.VectorFunctions.sparseDot(
          col(s"$sc.indices"), col(s"$sc.values"), q._1, q._2)
      (Search.contextCombine(
        pairs.map { case (p, n) => (sim(p), sim(n)) }), true)
    case other =>
      throw new IllegalArgumentException(s"$other is not a scoring leaf")
  }

  /** Execute a query DAG; returns (idCol, score) ranked. */
  def execute(
      spark: SparkSession,
      points: DataFrame,
      idCol: String,
      resolver: FieldResolver,
      q0: Query): DataFrame = {
    val q = resolveExclusion(q0)
    val rootFilter = q.filter.filterNot(_.isEmpty)
    val pred = rootFilter.map(f => new FilterCompiler(resolver).compile(f))

    // The parent/global filter is merged into every prefetch before
    // recursion (ref `planned_query.rs:306-340`, merge at :325 "Global
    // filter to apply to all prefetches"): filters live in the LEAVES, so a
    // filtered hybrid search filters each prefetch and the rescoring
    // parents (Fusion/Formula/MMR) only ever see pre-filtered candidates.
    // `execute` recurses, so grandchildren inherit transitively.
    def inherited(c: Query): Query =
      rootFilter.fold(c)(rf => c.copy(filter = Filter.mergeOpts(Some(rf), c.filter)))

    // `skip(offset)` after the final merge (`query.rs:448-451`); inputs are
    // ≤ offset+limit rows, so a single-partition window is the right shape.
    def dropOffset(df: DataFrame, ord: Seq[Column], offset: Int): DataFrame =
      if (offset == 0) df
      else df.withColumn("_rn", row_number().over(Window.orderBy(ord: _*)))
        .filter(col("_rn") > offset).drop("_rn").orderBy(ord: _*)

    // Rescore-parent candidate scoping: the union of prefetch results
    // (`filter_with_sources_ids` — the reference rescores behind a HasId
    // filter of the merged prefetch ids, `local_shard/query.rs:311,339`).
    def withPrefetchCandidates(df: DataFrame): DataFrame =
      if (q.prefetches.isEmpty) df
      else {
        val candidateIds = q.prefetches.map(inherited)
          .map(c => execute(spark, points, idCol, resolver, c).select(idCol))
          .reduce(_ union _).distinct()
        df.join(candidateIds, Seq(idCol), "left_semi")
      }

    def scoreExprOf(s: Scoring): (Column, Boolean) = scoringExpr(s)

    q.scoring match {
      // ---- rescore-over-prefetch nodes ----
      case FusionQ(kind, weights, rrfK) =>
        // `planned_query.rs:400-403` — a fusion root with nothing to fuse
        // is a validation error, not an empty result
        require(q.prefetches.nonEmpty, "cannot apply Fusion without prefetches")
        val children = q.prefetches.map(inherited).map { c =>
          val df = execute(spark, points, idCol, resolver, c)
          c.scoring match {
            case OrderByField(_, _, _) if kind == "dbsf" =>
              // Reference parity: scroll prefetch results carry a constant
              // score of 1.0 (`scroll.rs:131`) and `score_fusion` normalizes
              // only `.score` (the order_value travels separately), so
              // min==max and every scroll point contributes a flat 0.5 —
              // the order value does NOT enter DBSF.
              Fusion.Source(df.select(col(idCol), lit(1.0d).as("score")))
            case OrderByField(field, asc, _) =>
              // RRF is position-based: rank the scroll leaf by its LIST
              // POSITION (row_number over the leaf's own sort order) — the
              // reference scores by position in the returned page. A value
              // cast would break on non-numeric order fields; position is
              // type-agnostic. The window is single-partition over ≤ limit
              // rows — the leaf page, not the table.
              val ord = Seq(
                if (asc) col(field).asc_nulls_last else col(field).desc_nulls_last,
                col(idCol).asc)
              Fusion.Source(df.select(col(idCol),
                row_number().over(Window.orderBy(ord: _*)).cast("double").as("score")),
                largerBetter = false)
            case Nearest(_, m, _) => Fusion.Source(df, m.largerBetter)
            case ScrollById if kind == "dbsf" =>
              // scroll results carry constant score 1.0 (`scroll.rs:131`)
              Fusion.Source(df.select(col(idCol), lit(1.0d).as("score")))
            case ScrollById =>
              // RRF: list position over the scroll's id order — works for
              // Long AND UUID-string ids (a string id cast to double is
              // NULL for every row; position never is)
              Fusion.Source(df.select(col(idCol),
                row_number().over(Window.orderBy(col(idCol).asc))
                  .cast("double").as("score")),
                largerBetter = false)
            case _ => Fusion.Source(df)
          }
        }
        val fetch = q.offset + q.limit
        val fused = kind match {
          case "rrf" => Fusion.rrf(children, idCol, k = rrfK.getOrElse(2), weights, fetch)
          case "dbsf" => Fusion.dbsf(children, idCol, weights, fetch)
          case other => throw new IllegalArgumentException(s"unknown fusion '$other'")
        }
        // Root threshold over the fused list is NON-strict and order-aware
        // (`take_while(score >= t)` at collection level, `query.rs:389-396`
        // — unlike the strict leaf `check_threshold`, `types.rs:363-369`);
        // fused scores are always larger-better. Offset applies after
        // (`skip(offset).take(limit)`, `query.rs:448-451`).
        val thresholded =
          q.scoreThreshold.fold(fused)(t => fused.filter(col("score") >= t))
        dropOffset(thresholded, Seq(col("score").desc, col(idCol).asc), q.offset)

      case FormulaQ(ast, defaultScore) =>
        // `planned_query.rs:418-421`
        require(q.prefetches.nonEmpty, "cannot apply Formula without prefetches")
        val children = q.prefetches.map(inherited).zipWithIndex.map { case (c, i) =>
          execute(spark, points, idCol, resolver, c)
            .withColumnRenamed("score", s"_score$i")
        }
        val candidates = children
          .map(_.select(idCol)).reduce(_ union _).distinct()
        val withScores = children.foldLeft(candidates)((acc, ch) =>
          acc.join(ch, Seq(idCol), "left"))
        val joined = points.join(withScores, Seq(idCol))
        val expr = Formula.compile(ast,
          i => coalesce(col(s"_score$i"), lit(defaultScore)), resolver)
        Search.scoredTopK(joined, idCol, expr, largerBetter = true,
          k = q.limit, offset = q.offset, scoreThreshold = q.scoreThreshold)

      case MmrQ(vc, m, qv, lambda) =>
        require(q.prefetches.nonEmpty, "MMR rescore requires prefetches")
        val candidateIds = q.prefetches.map(inherited)
          .map(c => execute(spark, points, idCol, resolver, c).select(idCol))
          .reduce(_ union _).distinct()
        // Mmr.rerank breaks ties by first-seen input order, so the
        // candidates MUST arrive ranked best-first (the reference's MMR
        // receives the already-ranked search result, `mmr/mod.rs:42-170`).
        // An unordered semi-join here makes tie-breaks partition-order —
        // visible whenever MMR scores tie exactly (e.g. λ=0.5 with the
        // query equal to a stored vector: every post-first pick scores 0).
        // candidates lacking this named vector are silently dropped (the
        // reference's filter_map over `vector.get(&mmr.using)`,
        // `mmr/mod.rs:52-60`) — scoring a null vector would poison the
        // driver-side rerank
        val scoredCands = points.join(candidateIds, Seq(idCol), "left_semi")
          .filter(col(vc).isNotNull)
          .withColumn("score",
            round(Search.scoreExpr(m, col(vc), typedLit(qv)), 6))
        // MMR-with-prefetches applies the root score_threshold at the
        // candidate-gathering Nearest rescore (shard-level RescoreParams,
        // `planned_query.rs:244-262`) — strict, per `check_threshold`.
        val thresholded = q.scoreThreshold.fold(scoredCands) { t =>
          scoredCands.filter(
            if (m.largerBetter) col("score") > t else col("score") < t)
        }
        val cands = thresholded
          .select(col(idCol), col("score"), col(vc))
          .orderBy(
            if (m.largerBetter) col("score").desc else col("score").asc,
            col(idCol).asc)
        // `skip(offset).take(limit)` on the selection-ordered MMR output
        // (`query.rs:448-451`); `position` stays the global selection rank.
        Mmr.rerank(spark, cands, idCol, vc, m, qv, lambda, q.offset + q.limit)
          .filter(col("position") > q.offset)

      case MmrMultiQ(vc, m, qm, lambda) =>
        require(q.prefetches.nonEmpty, "MMR rescore requires prefetches")
        val candidateIds = q.prefetches.map(inherited)
          .map(c => execute(spark, points, idCol, resolver, c).select(idCol))
          .reduce(_ union _).distinct()
        // MaxSim relevance is larger-better for every metric; vectorless
        // candidates drop like the reference's filter_map (`mmr/mod.rs:52-60`)
        val scoredCands = points.join(candidateIds, Seq(idCol), "left_semi")
          .filter(col(vc).isNotNull)
          .withColumn("score", round(
            graft.functions.VectorFunctions.maxSim(m, col(vc), qm), 6))
        val thresholded = q.scoreThreshold.fold(scoredCands)(t =>
          scoredCands.filter(col("score") > t))
        val cands = thresholded
          .select(col(idCol), col("score"), col(vc))
          .orderBy(col("score").desc, col(idCol).asc)
        Mmr.rerankMulti(spark, cands, idCol, vc, m, qm, lambda,
          q.offset + q.limit)
          .filter(col("position") > q.offset)

      case MmrSparseQ(sc, qi, qv, lambda) =>
        require(q.prefetches.nonEmpty, "MMR rescore requires prefetches")
        val candidateIds = q.prefetches.map(inherited)
          .map(c => execute(spark, points, idCol, resolver, c).select(idCol))
          .reduce(_ union _).distinct()
        // vectorless candidates drop (`mmr/mod.rs:52-60` filter_map)
        val scoredCands = points.join(candidateIds, Seq(idCol), "left_semi")
          .filter(col(sc).isNotNull)
          .withColumn("score",
            round(graft.functions.VectorFunctions.sparseDot(
              col(s"$sc.indices"), col(s"$sc.values"), qi, qv), 6))
        // sparse scores are always larger-better (dot); threshold strict
        val thresholded = q.scoreThreshold.fold(scoredCands)(t =>
          scoredCands.filter(col("score") > t))
        val cands = thresholded
          .select(col(idCol), col("score"),
            col(s"$sc.indices").as("_qidx"), col(s"$sc.values").as("_qval"))
          .orderBy(col("score").desc, col(idCol).asc)
        Mmr.rerankSparse(spark, cands, idCol, qi, qv, lambda,
          q.offset + q.limit)
          .filter(col("position") > q.offset)

      // ---- scroll leaves (as RESCORE parents the reference turns these
      // into a scroll over HasId(union of prefetch results) —
      // `local_shard/query.rs:309-336,381-404`; leaves with no prefetch
      // scroll the whole collection) ----
      case OrderByField(field, asc, startFrom) =>
        // `skip(offset)` applies after the ordered page like any other
        // merge (`query.rs:448-451`) — fetch offset+limit, drop the head
        val page = Reads.scrollByField(withPrefetchCandidates(points), idCol,
          field, asc, q.filter, resolver, startFrom, q.offset + q.limit,
          projection = Seq(idCol, field))
        val ord = Seq(
          if (asc) col(field).asc_nulls_last else col(field).desc_nulls_last,
          col(idCol).asc)
        dropOffset(page, ord, q.offset)

      case ScrollById =>
        val page = Reads.scrollById(withPrefetchCandidates(points), idCol,
          q.filter, resolver, offsetId = None, limit = q.offset + q.limit,
          projection = Seq(idCol))
        dropOffset(page, Seq(col(idCol).asc), q.offset)

      case SampleRandom(seed) => {
        val scoped = withPrefetchCandidates(points)
        val base = pred.fold(scoped)(scoped.filter)
        // Deterministic pseudorandom key (seeded id hash — the engine's
        // seeded-sampling contract, like Reads.scrollRandom: deterministic
        // across runs AND partitionings, where `rand(seed)` is only
        // per-partitioning stable). `skip(offset)` applies after the
        // random order (`test_random_rescore_with_offset`) — EXCEPT on a
        // bare random root, where the reference zeroes the offset since
        // the output is not stable (`collection_query.rs:690-696`).
        val off = if (q.prefetches.isEmpty) 0 else q.offset
        val ord = Seq(xxhash64(col(idCol), lit(seed)).asc, col(idCol).asc)
        val page = base.orderBy(ord: _*).limit(off + q.limit)
        dropOffset(page, ord, off).select(idCol)
      }

      // ---- scoring leaves (optionally rescoring prefetch candidates) ----
      case leaf =>
        val (expr, largerBetter) = scoreExprOf(leaf)
        // qdrant's sparse search only yields points with ≥ 1 matching dim
        // (the posting-join candidate set); zero-overlap rows never appear.
        val leafPred = leaf match {
          case SparseDotQ(tc, terms) =>
            val overlap = arrays_overlap(col(tc), typedLit(terms.map(_._1)))
            Some(pred.fold(overlap)(_ && overlap))
          case SparseStructQ(sc, qi, _) =>
            val overlap = arrays_overlap(col(s"$sc.indices"), typedLit(qi))
            Some(pred.fold(overlap)(_ && overlap))
          case RecommendSparse(sc, _, pos, neg) =>
            val allIdx = (pos ++ neg).flatMap(_._1).distinct
            val overlap = arrays_overlap(col(s"$sc.indices"), typedLit(allIdx))
            Some(pred.fold(overlap)(_ && overlap))
          case DiscoverSparse(sc, target, pairs) =>
            val allIdx = (target +: pairs.flatMap(pr => Seq(pr._1, pr._2)))
              .flatMap(_._1).distinct
            val overlap = arrays_overlap(col(s"$sc.indices"), typedLit(allIdx))
            Some(pred.fold(overlap)(_ && overlap))
          case ContextSparse(sc, pairs) =>
            val allIdx = pairs.flatMap(pr => Seq(pr._1, pr._2))
              .flatMap(_._1).distinct
            val overlap = arrays_overlap(col(s"$sc.indices"), typedLit(allIdx))
            Some(pred.fold(overlap)(_ && overlap))
          case _ =>
            // optional-vector exclusion at the scan: points without the
            // scored vector never rank (`test_optional_vectors.py`)
            val guard = leaf match {
              case Nearest(vc, _, _) => Some(col(vc).isNotNull)
              case RecommendAvg(vc, _, _, _) => Some(col(vc).isNotNull)
              case RecommendBest(vc, _, _, _) => Some(col(vc).isNotNull)
              case RecommendSum(vc, _, _, _) => Some(col(vc).isNotNull)
              case DiscoverQ(vc, _, _, _) => Some(col(vc).isNotNull)
              case ContextQ(vc, _, _) => Some(col(vc).isNotNull)
              case MaxSimQ(vc, _, _) => Some(col(vc).isNotNull)
              case RecommendMulti(vc, _, _, _, _) => Some(col(vc).isNotNull)
              case DiscoverMulti(vc, _, _, _) => Some(col(vc).isNotNull)
              case ContextMulti(vc, _, _) => Some(col(vc).isNotNull)
              case FeedbackMulti(vc, _, _, _, _, _, _) => Some(col(vc).isNotNull)
              case FeedbackQ(vc, _, _, _, _, _, _) => Some(col(vc).isNotNull)
              case _ => None
            }
            guard match {
              case Some(g) => Some(pred.fold(g)(_ && g))
              case None => pred
            }
        }
        Search.scoredTopK(withPrefetchCandidates(points), idCol, expr,
          largerBetter, leafPred,
          k = q.limit, offset = q.offset, scoreThreshold = q.scoreThreshold)
    }
  }
}
