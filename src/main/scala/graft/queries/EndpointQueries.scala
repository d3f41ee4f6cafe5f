package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, TimestampType}

import graft.Tables
import graft.model.Dot
import graft.sources.{CollectionConfig, VectorConfig}
import graft.storage.Collection

/** One-call REST handlers on [[graft.storage.Collection]] — the rest of the
  * read surface beyond `Collection.query`: count, facet, scroll, retrieve,
  * query/batch, query/groups, search/matrix. Each entry drives the JSON
  * body through the collection's own handler (codec + config routing + ops
  * in ONE call, like the reference's actix handlers dispatching on a
  * collection: `src/actix/api/{count_api,facet_api,retrieve_api,
  * query_api,search_api}.rs`) and pins the result against a DuckDB oracle
  * over the same join fixture.
  */
object EndpointQueries {

  private val colls =
    new java.util.concurrent.ConcurrentHashMap[String, Collection]()

  private val cfg = CollectionConfig(
    idCol = "id", payloadCol = "payload",
    vectors = Seq(VectorConfig("", 64, Dot)),
    payloadTypes = Map("lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType, "label" -> LongType))

  /** documents ⋈ embeddings as one collection: dense vector + JSON payload
    * (lang/source/n_chars/label) — the fixture every endpoint body hits. */
  private def docColl(s: SparkSession, dir: String): Collection = {
    val path = "/tmp/graft_runtime/endp_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    colls.computeIfAbsent(path, { _ =>
      val d = Tables.load(s, dir, "documents")
      val e = Tables.load(s, dir, "embeddings")
      val pts = e.join(d, e("vec_id") === d("doc_id"))
        .select(e("vec_id").as("id"), e("embedding").as("vector"),
          to_json(struct(d("lang"), d("source"), d("n_chars"),
            e("label"))).as("payload"))
      Collection.create(s, path, cfg, pts)
    })
  }

  private def vjson(s: SparkSession, dir: String, id: Long): String =
    Tables.embeddingOf(s, dir, id).mkString("[", ",", "]")

  /** Two dense spaces ("" dim-64, "half" dim-32) plus a 2-token dim-32
    * multivector "tok" on one collection — the fixture for by-id
    * `VectorInput` resolution against a NAMED `using` space (the default
    * and named vectors hold different embeddings by construction, so a
    * resolver that ignores `using` scores visibly wrong). */
  private def namedVecColl(s: SparkSession, dir: String): Collection = {
    val path = "/tmp/graft_runtime/namedvec_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    colls.computeIfAbsent(path, { _ =>
      val e = Tables.load(s, dir, "embeddings")
      val nCfg = CollectionConfig(idCol = "vec_id",
        vectors = Seq(VectorConfig("", 64, Dot), VectorConfig("half", 32, Dot),
          VectorConfig("tok", 32, Dot, multivector = true)))
      Collection.create(s, path, nCfg,
        e.select(col("vec_id"), col("embedding").as("vector"),
          slice(col("embedding"), 1, 32).as("vector_half"),
          array(slice(col("embedding"), 1, 32),
            slice(col("embedding"), 33, 32)).as("vector_tok")))
    })
  }

  private val facetCfg = CollectionConfig(
    idCol = "id", payloadCol = "payload",
    vectors = Seq(VectorConfig("", 64, Dot)),
    payloadTypes = Map("label" -> LongType, "hot" -> BooleanType,
      "owner" -> StringType))

  /** Integer + bool + uuid-string payload fields in one collection — the
    * fixture for `exact:false` facet entries over every `FacetValue`
    * variant beyond plain keywords (`facets.rs:87`). */
  private def facetColl(s: SparkSession, dir: String): Collection = {
    val path = "/tmp/graft_runtime/facetv_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    colls.computeIfAbsent(path, { _ =>
      val d = Tables.load(s, dir, "documents")
      val e = Tables.load(s, dir, "embeddings")
      val pts = e.join(d, e("vec_id") === d("doc_id"))
        .select(e("vec_id").as("id"), e("embedding").as("vector"),
          to_json(struct(e("label"), (d("n_chars") > 250).as("hot"),
            UuidQueries.uuidOf(pmod(d("doc_id"), lit(7))).as("owner")))
            .as("payload"))
      Collection.create(s, path, facetCfg, pts)
    })
  }

  private val tsCfg = CollectionConfig(
    idCol = "id", payloadCol = "payload",
    payloadTypes = Map("ts" -> TimestampType))

  /** Events as a vector-less collection (the reference accepts an empty
    * `vectors` config) whose payload carries an RFC3339 `ts` string
    * declared TimestampType — the fixture for datetime-range cardinality
    * estimation over the μs-axis histogram. */
  private def tsColl(s: SparkSession, dir: String): Collection = {
    val path = "/tmp/graft_runtime/tscoll_" + dir.replaceAll("[^A-Za-z0-9]", "_")
    colls.computeIfAbsent(path, { _ =>
      val ev = Tables.load(s, dir, "events")
      val pts = ev.select(ev("event_id").as("id"),
        to_json(struct(date_format(ev("ts"),
          "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").as("ts"))).as("payload"))
      Collection.create(s, path, tsCfg, pts)
    })
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // POST /points/count through the collection handler (count_api.rs:17)
    "collection_count_endpoint" -> ((s, dir) => {
      docColl(s, dir).count(
        """{"filter": {"must": [
          |  {"key": "lang", "match": {"value": "en"}},
          |  {"key": "n_chars", "range": {"lt": 300}}
          |]}, "exact": true}""".stripMargin)
    }),
    // scroll with with_vector=true (default false, ScrollRequest
    // types.rs:490-537): vectors ride the SAME page scan — pinned via
    // dimension + first component so the oracle stays float-exact
    "collection_scroll_vectors" -> ((s, dir) => {
      val page = docColl(s, dir).scroll(
        """{"limit": 10, "with_payload": false, "with_vector": true,
          |  "filter": {"must": [{"key": "lang", "match": {"value": "fr"}}]}}""".stripMargin)
      page.select(col("id"), size(col("vector")).cast("long").as("dim"),
        round(element_at(col("vector"), 1).cast("double"), 6).as("v0"))
    }),
    // POST /points/count with exact=false — the cardinality-estimate route
    // (`estimate_point_count`, local_shard/mod.rs:1070-1085): the count is
    // the estimator's `exp`, computed DRIVER-side from the _fieldstats
    // sidecar with no distributed job. must-combination of two exact
    // per-value estimations: exp = round(N·(c1/N)·(c2/N))
    // (combine_must_estimations, query_estimator.rs:188-220).
    "count_estimate_must" -> ((s, dir) => {
      docColl(s, dir).count(
        """{"filter": {"must": [
          |  {"key": "lang", "match": {"value": "en"}},
          |  {"key": "source", "match": {"value": "src3"}}
          |]}, "exact": false}""".stripMargin)
    }),
    // should-group with one servable and one unknown condition
    // (values_count has no snapshot structure → {0, N/2, N}, the
    // reference's un-indexed fallback) + a must_not inversion; the clause
    // groups then must-combine (estimate_filter, query_estimator.rs:246-283).
    "count_estimate_mixed" -> ((s, dir) => {
      docColl(s, dir).count(
        """{"filter": {
          |  "should": [
          |    {"key": "lang", "match": {"value": "de"}},
          |    {"key": "n_chars", "values_count": {"gte": 1}}
          |  ],
          |  "must_not": [{"key": "source", "match": {"value": "src1"}}]
          |}, "exact": false}""".stripMargin)
    }),
    // numeric range through the 64-bucket equal-width value histogram:
    // min = fully-contained buckets, max = intersecting buckets, exp via
    // linear interpolation + the multi-value Stirling correction
    // (range_cardinality, numeric_index/query.rs:40-105; stat_tools.rs:20-73).
    "count_estimate_range" -> ((s, dir) => {
      docColl(s, dir).count(
        """{"filter": {"must": [
          |  {"key": "n_chars", "range": {"gte": 150, "lt": 400}}
          |]}, "exact": false}""".stripMargin)
    }),
    // order_by scroll over a DATETIME payload field with an RFC3339
    // `start_from` cursor (OrderBy `start_from` accepts the datetime wire
    // forms, `order_by.rs:16-170`): desc direction pages ts <= cursor,
    // cursor string coerces through Temporal.boundLit to a typed literal
    // so the parquet scan sees an ordinary timestamp comparison
    "scroll_orderby_datetime" -> ((s, dir) =>
      tsColl(s, dir).scroll(
        """{"limit": 15, "with_payload": false,
          |  "order_by": {"key": "ts", "direction": "desc",
          |               "start_from": "2024-01-20T12:00:00Z"}}""".stripMargin)),
    // The full {min, exp, max} band on a must-combination — pins the
    // whole `combine_must_estimations` rule set (query_estimator.rs:
    // 188-220): min is the inclusion-exclusion fold, max the smallest
    // member, exp the independence product.
    "count_estimate_bands_must" -> ((s, dir) =>
      docColl(s, dir).countEstimate(
        """{"filter": {"must": [
          |  {"key": "lang", "match": {"value": "en"}},
          |  {"key": "source", "match": {"value": "src3"}}
          |]}, "exact": false}""".stripMargin)),
    // Bands across GROUP combination: a should-pair (max-of-mins /
    // noisy-or exp / capped sum max) must-combined with an inverted
    // must_not (`invert_estimation` :328-338 swaps min and max arms).
    "count_estimate_bands_mixed" -> ((s, dir) =>
      docColl(s, dir).countEstimate(
        """{"filter": {
          |  "should": [
          |    {"key": "lang", "match": {"value": "de"}},
          |    {"key": "lang", "match": {"value": "fr"}}
          |  ],
          |  "must_not": [{"key": "source", "match": {"value": "src1"}}]
          |}, "exact": false}""".stripMargin)),
    // Datetime range through the SAME 64-bucket histogram, on the epoch-μs
    // axis (the reference's numeric index stores DateTimePayloadType as
    // i64 μs, `numeric_index/mod.rs`): RFC3339 string bounds — offset and
    // lenient space forms both — parse driver-side, estimate with zero
    // Spark jobs warm.
    "count_estimate_datetime" -> ((s, dir) =>
      tsColl(s, dir).count(
        """{"filter": {"must": [
          |  {"key": "ts", "range": {"gte": "2024-01-10T00:00:00Z",
          |                          "lt": "2024-01-20 12:00:00"}}
          |]}, "exact": false}""".stripMargin)),
    // Match::Except on a single-valued keyword field: the except formula's
    // min and max clamps collapse onto N − Σ excluded counts
    // (except_cardinality, map_index/read_ops.rs:176-228).
    "count_estimate_except" -> ((s, dir) => {
      docColl(s, dir).count(
        """{"filter": {"must": [
          |  {"key": "source", "match": {"except": ["src1", "src2"]}}
          |]}, "exact": false}""".stripMargin)
    }),
    // POST /facet with the DEFAULT exact=false (facets.rs:23-24) and no
    // filter: served from the _fieldstats sidecar driver-side (zero Spark
    // jobs warm) — the per-value stats head is the global top-K by count,
    // so the returned counts are exact, not approximate
    "collection_facet_estimate" -> ((s, dir) => {
      docColl(s, dir).facet("""{"key": "lang", "limit": 4}""")
    }),
    // exact=false over an INTEGER key: served from the same sidecar with
    // values rendered back to the declared long type and count-ties
    // re-sorted in NUMERIC order (the head ranks ties lexicographically)
    "facet_int_estimate" -> ((s, dir) =>
      facetColl(s, dir).facet("""{"key": "label", "limit": 5}""")),
    // exact=false over a BOOL key (false < true tie order)
    "facet_bool_estimate" -> ((s, dir) =>
      facetColl(s, dir).facet("""{"key": "hot", "limit": 3}""")),
    // exact=false over a UUID key — uuid payload values are canonical
    // lowercase-hex strings, so they serve through the string path
    "facet_uuid_estimate" -> ((s, dir) =>
      facetColl(s, dir).facet("""{"key": "owner", "limit": 5}""")),
    // POST /facet through the collection handler — `exact: true` pins the
    // exact filtered scan (the default `exact: false` now serves filtered
    // facets from the estimator, `facet_filtered_estimate` below)
    "collection_facet_endpoint" -> ((s, dir) => {
      docColl(s, dir).facet(
        """{"key": "lang", "limit": 5, "exact": true,
          |  "filter": {"must": [{"key": "source",
          |    "match": {"any": ["src1", "src3", "src7"]}}]}}""".stripMargin)
    }),
    // `exact: false` facet WITH a filter: per-value counts come from the
    // cardinality estimator over the sidecar — `estimate(filter ∧ key=v)
    // .exp` per complete-head value (the reference's approximate facet
    // serves per-segment index counts without a collection scan,
    // `local_shard/facet.rs:23-95`; its exact path merges the filter with
    // `Match(value)` per value, `:120-127`). Zero Spark jobs warm
    // (StoreSpec pins the job count); the oracle reproduces the
    // independence-product estimate exactly.
    "facet_filtered_estimate" -> ((s, dir) => {
      docColl(s, dir).facet(
        """{"key": "lang", "limit": 4,
          |  "filter": {"must": [{"key": "source",
          |    "match": {"value": "src3"}}]}}""".stripMargin)
    }),
    // WIDE selectivity band for the same estimator path: `match any` over
    // 14 of the 20 sources (~51% of the table) — the should-union
    // probability product (`expected_should_estimation`,
    // `query_estimator.rs:114-154`) feeds the per-value must-combine, so
    // the oracle reproduces BOTH combiners. Guards the estimate shape at
    // the opposite end of the selectivity spectrum from the tight fixture.
    "facet_filtered_estimate_wide" -> ((s, dir) => {
      docColl(s, dir).facet(
        """{"key": "lang", "limit": 6,
          |  "filter": {"must": [{"key": "source", "match": {"any":
          |    ["src0","src1","src2","src3","src4","src5","src6",
          |     "src7","src8","src9","src10","src11","src12","src13"]}}]}}""".stripMargin)
    }),
    // POST /points/scroll with order_by + start_from cursor: the handler
    // resolves the payload key through the DECLARED type (no physical
    // column needed), orders desc with nulls last and id tiebreak
    "collection_scroll_endpoint" -> ((s, dir) => {
      val page = docColl(s, dir).scroll(
        """{"limit": 15,
          |  "order_by": {"key": "n_chars", "direction": "desc", "start_from": 400},
          |  "with_payload": {"include": ["n_chars", "lang"]},
          |  "filter": {"must": [{"key": "lang", "match": {"value": "en"}}]}}""".stripMargin)
      page.select(col("id"),
        get_json_object(col("payload"), "$.n_chars").cast("long").as("n_chars"),
        get_json_object(col("payload"), "$.lang").as("lang"),
        get_json_object(col("payload"), "$.source").as("src_excluded"))
    }),
    // retrieve-by-ids with a with_payload include selector — excluded keys
    // must come back null
    "collection_retrieve_endpoint" -> ((s, dir) => {
      docColl(s, dir).retrievePoints(
        """{"ids": [3, 5, 8, 13], "with_vector": true,
          |  "with_payload": {"include": ["lang", "n_chars"]}}""".stripMargin)
        .select(col("id"),
          get_json_object(col("payload"), "$.lang").as("lang"),
          get_json_object(col("payload"), "$.n_chars").cast("long").as("n_chars"),
          get_json_object(col("payload"), "$.source").as("src_excluded"),
          size(col("vector")).cast("long").as("dim"))
        .orderBy(col("id"))
    }),
    // POST /points/query/batch: independent searches answered in one call,
    // tagged by position; the second carries its own filter
    "collection_query_batch" -> ((s, dir) => {
      docColl(s, dir).queryBatch(
        s"""{"searches": [
           |  {"query": {"nearest": ${vjson(s, dir, 7)}}, "limit": 5},
           |  {"query": {"nearest": ${vjson(s, dir, 42)}}, "limit": 5,
           |   "filter": {"must": [{"key": "lang", "match": {"value": "en"}}]}}
           |]}""".stripMargin)
    }),
    // POST /points/query/groups with with_lookup: per-label top-2, best 4
    // groups, lookup columns joined on the group value
    "collection_group_by" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val lookup = e.select(col("label").cast("string").as("lkid"),
        concat(lit("L"), col("label")).as("lookup_name")).distinct()
      docColl(s, dir).queryGroups(
        s"""{"query": {"nearest": ${vjson(s, dir, 7)}},
           |  "group_by": "label", "group_size": 2, "limit": 4,
           |  "with_lookup": {"collection": "labels"}}""".stripMargin,
        lookupTable = _ => lookup)
        .select(col("group_value"), col("id"), col("score"),
          col("rank").cast("long").as("rank"),
          col("grp_rank").cast("long").as("grp_rank"), col("lookup_name"))
        .orderBy(col("grp_rank"), col("rank"))
    }),
    // By-id recommend examples against a NAMED `using` space: the ids
    // must resolve from `vector_half` (dim 32), not the default dim-64
    // vector (`resolve_referenced_vectors` keys the lookup by `using`) —
    // a resolver that ignores `using` dim-mismatches here and fails
    "api_recommend_using_named" -> ((s, dir) => {
      namedVecColl(s, dir).query(
        """{"query": {"recommend": {"positive": [7, 11], "negative": [4]}},
          |  "using": "half", "limit": 10}""".stripMargin)
    }),
    // Bare point-id nearest against a MULTIVECTOR `using` space: the id
    // resolves to the stored token matrix and scores MaxSim (a matrix
    // `VectorInput` behaves identically whether inline or by-id)
    "api_nearest_id_multivec" -> ((s, dir) => {
      namedVecColl(s, dir).query(
        """{"query": {"nearest": 7}, "using": "tok", "limit": 10}""")
    }),
    // A RAW dense query against the same MULTIVECTOR `using` space — the
    // legacy-API emulation (`TryFrom<VectorInternal> for
    // MultiDenseVectorInternal`, `data_types/vectors.rs:176-190`;
    // `test_multi_vector.py:287-371`): the vector becomes a 1-token
    // matrix and scores MaxSim. No referenced id → no exclusion.
    "api_query_multivec_legacy" -> ((s, dir) => {
      val q = Tables.embeddingOf(s, dir, 7).take(32).mkString("[", ",", "]")
      namedVecColl(s, dir).query(
        s"""{"query": $q, "using": "tok", "limit": 10}""")
    }),
    // Wire RECOMMEND against the multivector `using` space
    // (`test_recommendation_multivector.py`; `RecoQuery` is
    // vector-kind-agnostic): per-example similarity is MaxSim. The
    // example set mixes all three `VectorInput` shapes — by-id 7 (the
    // stored matrix; EXCLUDED from results per `exclude_referenced_ids`),
    // an inline DENSE example (1-token legacy expansion), and an inline
    // MATRIX negative. One arm per strategy: `average_vector` merges into
    // one matrix (positives concatenated + negated negative rows,
    // `recommendations.rs:59-70,121-124`), best_score / sum_scores
    // combine the per-example MaxSim scores.
    "api_recommend_multivec" -> ((s, dir) => {
      val q11 = Tables.embeddingOf(s, dir, 11).take(32)
        .mkString("[", ",", "]")
      val e4 = Tables.embeddingOf(s, dir, 4)
      val negM = Seq(e4.take(32), e4.drop(32))
        .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      def run(strategy: String, tag: String) =
        namedVecColl(s, dir).query(
          s"""{"query": {"recommend": {"positive": [7, $q11],
             |  "negative": [$negM], "strategy": "$strategy"}},
             |  "using": "tok", "limit": 10}""".stripMargin)
          .select(lit(tag).as("strategy"), col("vec_id"), col("score"))
      run("average_vector", "avg")
        .unionByName(run("best_score", "best"))
        .unionByName(run("sum_scores", "sum"))
        .orderBy(col("strategy"), col("score").desc, col("vec_id"))
    }),
    // Wire DISCOVER / CONTEXT / RELEVANCE FEEDBACK against the multivector
    // `using` space — the reference's custom queries score any vector kind
    // (`MultiCustomQueryScorer`, `query_scorer/multi_custom_query_scorer
    // .rs`): per-example similarity is MaxSim, the rank / margin /
    // weighted-pair combines are unchanged. Each arm references id 7
    // (excluded); the inline dense example rides the 1-token expansion,
    // the inline matrix stays a matrix.
    "api_query_multivec_custom" -> ((s, dir) => {
      val p11 = Tables.embeddingOf(s, dir, 11).take(32)
        .mkString("[", ",", "]")
      val e4 = Tables.embeddingOf(s, dir, 4)
      val nm4 = Seq(e4.take(32), e4.drop(32))
        .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      def run(body: String, tag: String) =
        namedVecColl(s, dir).query(body)
          .select(lit(tag).as("arm"), col("vec_id"), col("score"))
      val disc = run(
        s"""{"query": {"discover": {"target": 7,
           |  "context": [{"positive": $p11, "negative": $nm4}]}},
           |  "using": "tok", "limit": 10}""".stripMargin, "discover")
      val ctx = run(
        s"""{"query": {"context": [{"positive": 7, "negative": $nm4}]},
           |  "using": "tok", "limit": 10}""".stripMargin, "context")
      val fb = run(
        s"""{"query": {"relevance_feedback": {"target": 7,
           |  "feedback": [{"example": $p11, "score": 0.9},
           |               {"example": $nm4, "score": 0.4}],
           |  "strategy": {"naive": {"a": 1.0, "b": 2.0, "c": 0.5}}}},
           |  "using": "tok", "limit": 10}""".stripMargin, "feedback")
      disc.unionByName(ctx).unionByName(fb)
        .orderBy(col("arm"), col("score").desc, col("vec_id"))
    }),
    // MMR over the MULTIVECTOR `using` space (`mmr/mod.rs:102-140` scores
    // the volatile multi-dense storage with the standard MaxSim scorer;
    // pairwise = candidate-as-query, `lazy_matrix.rs:56-68`): wire result
    // vs an independent greedy derivation from the raw embeddings parquet.
    // By-id example 7 is excluded from the candidate fetch.
    "api_query_mmr_multivec" -> ((s, dir) => {
      import s.implicits._
      val res = namedVecColl(s, dir).query(
        """{"query": {"nearest": 7,
          |  "mmr": {"diversity": 0.5, "candidates_limit": 25}},
          |  "using": "tok", "limit": 8}""".stripMargin)
        .orderBy(col("position")).collect()
      val mats: Map[Long, Array[Array[Double]]] =
        Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding")).collect()
          .map { r =>
            val e = r.getSeq[Float](1).iterator.map(_.toDouble).toArray
            r.getLong(0) -> Array(e.take(32), e.drop(32))
          }.toMap
      def dot(a: Array[Double], b: Array[Double]): Double =
        a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      def maxsim(q: Array[Array[Double]], t: Array[Array[Double]]): Double =
        q.foldLeft(0.0)((acc, r) => acc + t.iterator.map(dot(r, _)).max)
      val q = mats(7L)
      val cands = mats.toSeq
        .collect { case (id, m) if id != 7L =>
          (id, BigDecimal(maxsim(q, m)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, sc) => (-sc, id) }.take(25)
      val cmats = cands.map { case (id, _) => mats(id) }
      val rel = cmats.map(m => maxsim(q, m)) // raw inside the rerank
      val sel = scala.collection.mutable.ArrayBuffer.empty[Int]
      val rem = scala.collection.mutable.LinkedHashSet(cands.indices: _*)
      val first = rem.maxBy(i => rel(i))
      sel += first; rem -= first
      while (sel.length < 8 && rem.nonEmpty) {
        val best = rem.maxBy { c =>
          // pairwise MaxSim: CANDIDATE matrix as the query side
          0.5 * rel(c) - 0.5 * sel.map(sl => maxsim(cmats(c), cmats(sl))).max
        }
        sel += best; rem -= best
      }
      val expectIds = sel.map(i => cands(i)._1).toSeq
      val gotIds = res.map(_.getLong(0)).toSeq
      Seq((res.length, gotIds == expectIds,
        res.map(_.getInt(2)).toSeq == (1 to res.length)))
        .toDF("n", "ids_match_greedy", "positions_ok")
    }),
    // `lookup_from` against a MULTIVECTOR foreign space: the referenced
    // id resolves the sibling collection's stored MATRIX (the reference
    // resolves referenced vectors of ANY kind, `fetch_vectors.rs:173-183`)
    // and the root scores MaxSim like any matrix input. The sibling stores
    // qid = vec_id + 10000 with the same two-block split, so rows equal
    // the self-resolved `api_nearest_id_multivec` exactly (same oracle).
    "catalog_lookup_from_multivec" -> ((s, dir) => {
      val root = "/tmp/graft_runtime/cat_mlkp_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val cat = new graft.storage.Catalog(s, root)
      val e = Tables.load(s, dir, "embeddings")
      val mvCfg = CollectionConfig(idCol = "vec_id",
        vectors = Seq(VectorConfig("tok", 32, Dot, multivector = true)))
      def mv = array(slice(col("embedding"), 1, 32),
        slice(col("embedding"), 33, 32)).as("vector_tok")
      if (!cat.exists("mdocs"))
        cat.create("mdocs", mvCfg, e.select(col("vec_id"), mv))
      if (!cat.exists("mqueries"))
        cat.create("mqueries", CollectionConfig(idCol = "qid",
          vectors = Seq(VectorConfig("tok", 32, Dot, multivector = true))),
          e.select((col("vec_id") + 10000).as("qid"), mv))
      cat.query("mdocs",
        """{"query": {"nearest": 10007}, "using": "tok",
          |  "lookup_from": {"collection": "mqueries", "vector": "tok"},
          |  "limit": 10}""".stripMargin)
    }),
    // Request-level `shard_key` on the NON-query read bodies: the
    // reference's `ShardKeySelector` rides scroll, count, facet, and
    // retrieve too (`schema.rs:620`); each folds to a partition-pruning
    // condition on the shard-key column — exercised here over one sharded
    // collection, tagged by endpoint kind
    "shard_key_reads" -> ((s, dir) => {
      val coll = VectorQueries.shardedColl(s, dir)
      val cnt = coll.count(
        """{"shard_key": ["a", "c"], "exact": true,
          |  "filter": {"must": [{"key": "label", "range": {"gte": 2}}]}}""".stripMargin)
        .select(lit("count").as("kind"), lit("").as("val"), col("cnt"))
      val fac = coll.facet(
        """{"key": "label", "shard_key": "b", "limit": 5, "exact": true}""")
        .select(lit("facet").as("kind"), col("value").cast("string").as("val"),
          col("cnt"))
      val scr = coll.scroll(
        """{"shard_key": "a", "limit": 6, "with_payload": false}""")
        .select(lit("scroll").as("kind"), col("vec_id").cast("string").as("val"),
          lit(-1L).as("cnt"))
      val ret = coll.retrievePoints(
        """{"ids": [1, 2, 3, 4, 5, 6], "shard_key": "a",
          |  "with_payload": false}""".stripMargin)
        .select(lit("retrieve").as("kind"), col("vec_id").cast("string").as("val"),
          lit(-1L).as("cnt"))
      cnt.unionByName(fac).unionByName(scr).unionByName(ret)
        .orderBy(col("kind"), col("val"))
    }),
    // legacy POST /points/search/groups (`SearchGroupsRequest`): the
    // legacy base fields plus group_by/group_size/with_lookup — the
    // bare-STRING with_lookup form — must rewrite to exactly the grouped
    // query collection_group_by runs (same oracle)
    "collection_search_groups_legacy" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val lookup = e.select(col("label").cast("string").as("lkid"),
        concat(lit("L"), col("label")).as("lookup_name")).distinct()
      docColl(s, dir).searchGroups(
        s"""{"vector": ${vjson(s, dir, 7)},
           |  "group_by": "label", "group_size": 2, "limit": 4,
           |  "with_lookup": "labels"}""".stripMargin,
        lookupTable = _ => lookup)
        .select(col("group_value"), col("id"), col("score"),
          col("rank").cast("long").as("rank"),
          col("grp_rank").cast("long").as("grp_rank"), col("lookup_name"))
        .orderBy(col("grp_rank"), col("rank"))
    }),
    // legacy POST /points/recommend/groups (`RecommendGroupsRequest`):
    // by-id positives/negatives + best_score at the top level, grouped —
    // must match collection_group_recommend's universal-form rows
    "collection_recommend_groups_legacy" -> ((s, dir) => {
      docColl(s, dir).recommendGroups(
        """{"positive": [1, 2], "negative": [4], "strategy": "best_score",
          |  "group_by": "label", "group_size": 2, "limit": 3}""".stripMargin)
        .select(col("group_value"), col("id"), col("score"),
          col("rank").cast("long").as("rank"),
          col("grp_rank").cast("long").as("grp_rank"))
        .orderBy(col("grp_rank"), col("rank"))
    }),
    // with_lookup SELECTORS (`WithLookup`, `lookup/mod.rs:22-60`): the
    // looked-up row attaches payload filtered by `with_payload` (include
    // list keeps `name`, `extra` must vanish) and NO vectors (explicit
    // false = the default) — pinned via json reads + column-absence flag
    "collection_group_lookup_select" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val lookup = e.select(col("label")).distinct()
        .select(col("label").cast("string").as("lkid"),
          to_json(struct(concat(lit("L"), col("label")).as("name"),
            col("label").as("extra"))).as("payload"),
          array(col("label").cast("float")).as("vector"))
      val g = docColl(s, dir).queryGroups(
        s"""{"query": {"nearest": ${vjson(s, dir, 7)}},
           |  "group_by": "label", "group_size": 2, "limit": 4,
           |  "with_lookup": {"collection": "labels",
           |    "with_payload": ["name"], "with_vectors": false}}""".stripMargin,
        lookupTable = _ => lookup)
      g.select(col("group_value"), col("id"), col("score"),
        col("rank").cast("long").as("rank"),
        col("grp_rank").cast("long").as("grp_rank"),
        get_json_object(col("lookup_payload"), "$.name").as("lk_name"),
        get_json_object(col("lookup_payload"), "$.extra").as("lk_extra"),
        lit(g.columns.contains("lookup_vector")).as("has_vec"))
        .orderBy(col("grp_rank"), col("rank"))
    }),
    // with_lookup `with_vectors: true` + `with_payload: false`: the
    // lookup vector rides, the lookup payload does not
    "collection_group_lookup_vec" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val lookup = e.select(col("label")).distinct()
        .select(col("label").cast("string").as("lkid"),
          to_json(struct(concat(lit("L"), col("label")).as("name"))).as("payload"),
          array(col("label").cast("float")).as("vector"))
      val g = docColl(s, dir).queryGroups(
        s"""{"query": {"nearest": ${vjson(s, dir, 7)}},
           |  "group_by": "label", "group_size": 2, "limit": 4,
           |  "with_lookup": {"collection": "labels",
           |    "with_payload": false, "with_vectors": true}}""".stripMargin,
        lookupTable = _ => lookup)
      g.select(col("group_value"), col("id"), col("score"),
        col("rank").cast("long").as("rank"),
        col("grp_rank").cast("long").as("grp_rank"),
        size(col("lookup_vector")).cast("long").as("lkdim"),
        lit(g.columns.contains("lookup_payload")).as("has_pay"))
        .orderBy(col("grp_rank"), col("rank"))
    }),
    // legacy POST /points/search (deprecated-but-served): `vector` +
    // `top` alias + with_payload/with_vector rewrite to the universal
    // form — must reproduce collection_query_with_payload's rows exactly
    // (same oracle)
    "collection_search_legacy" -> ((s, dir) => {
      docColl(s, dir).search(
        s"""{"vector": ${vjson(s, dir, 7)}, "top": 5,
           |  "with_payload": {"include": ["lang", "n_chars"]},
           |  "with_vectors": true}""".stripMargin)
        .select(col("id"), col("score"),
          get_json_object(col("payload"), "$.lang").as("lang"),
          get_json_object(col("payload"), "$.n_chars").cast("long").as("n_chars"),
          get_json_object(col("payload"), "$.source").as("src_excluded"),
          round(element_at(col("vector"), 1).cast("double"), 6).as("v0"))
    }),
    // legacy POST /points/recommend with by-id examples + batch form:
    // the two bodies rewrite to recommend roots; results tagged by req
    "collection_recommend_legacy" -> ((s, dir) => {
      docColl(s, dir).searchBatch(
        """{"searches": [
          |  {"positive": [1, 2], "negative": [4],
          |   "strategy": "best_score", "limit": 5},
          |  {"positive": [1], "top": 5,
          |   "filter": {"must": [{"key": "lang", "match": {"value": "en"}}]}}
          |]}""".stripMargin, kind = "recommend")
    }),
    // legacy POST /points/discover/batch: by-id target + context pairs
    // rewrite to a discover root; a TARGET-LESS item is the pure context
    // search (`DiscoverRequestInternal.target` is optional on the legacy
    // route — `discovery.rs` routes target-less requests to context);
    // results tagged by request position
    "collection_discover_legacy" -> ((s, dir) => {
      docColl(s, dir).searchBatch(
        """{"searches": [
          |  {"target": 5, "context": [
          |     {"positive": 10, "negative": 20},
          |     {"positive": 30, "negative": 40}], "limit": 10},
          |  {"context": [{"positive": 10, "negative": 20},
          |               {"positive": 30, "negative": 40}], "limit": 10}
          |]}""".stripMargin, kind = "discover")
    }),
    // query/groups over a RECOMMEND root (`test_query_full.py`
    // test_recommend_group): by-id positives/negatives resolve against the
    // collection, best_score formula per point, grouped per label
    "collection_group_recommend" -> ((s, dir) => {
      docColl(s, dir).queryGroups(
        """{"query": {"recommend": {
          |    "positive": [1, 2], "negative": [4], "strategy": "best_score"}},
          |  "group_by": "label", "group_size": 2, "limit": 3}""".stripMargin)
        .select(col("group_value"), col("id"), col("score"),
          col("rank").cast("long").as("rank"),
          col("grp_rank").cast("long").as("grp_rank"))
        .orderBy(col("grp_rank"), col("rank"))
    }),
    // The reference's all-examples smoke test (`test_query_full.py:
    // 993-1010`): a recommend-groups request whose positives name EVERY
    // point of the collection must yield ZERO groups — the referenced-id
    // exclusion empties the candidate set entirely. A small dedicated
    // collection keeps the by-id resolve fan-out bounded.
    "collection_group_recommend_all_examples" -> ((s, dir) => {
      import s.implicits._
      val path = "/tmp/graft_runtime/allex_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val coll = colls.computeIfAbsent(path, { _ =>
        val e = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 12)
        Collection.create(s, path, CollectionConfig(idCol = "id",
          payloadCol = "payload", vectors = Seq(VectorConfig("", 64, Dot)),
          payloadTypes = Map("label" -> LongType)),
          e.select(col("vec_id").as("id"), col("embedding").as("vector"),
            to_json(struct(col("label"))).as("payload")))
      })
      val allIds = (0L until 12L).mkString(", ")
      val groups = coll.queryGroups(
        s"""{"query": {"recommend": {"positive": [$allIds]}},
           |  "group_by": "label", "group_size": 2, "limit": 10}""".stripMargin)
        .collect()
      // control arm: all-but-two examples leave exactly the two remaining
      // points eligible — groups come back non-empty and contain ONLY them
      val partial = coll.queryGroups(
        s"""{"query": {"recommend": {"positive": [${(2L until 12L).mkString(", ")}]}},
           |  "group_by": "label", "group_size": 2, "limit": 10}""".stripMargin)
        .collect().map(r => r.getLong(1)).toSet
      Seq((groups.length.toLong, partial == Set(0L, 1L)))
        .toDF("all_example_rows", "partial_only_remaining")
    }),
    // query/groups over an ORDER_BY root (test_order_by_group): rank by
    // the payload field itself (declared-type extraction), one window per
    // group, groups ordered by their best value
    "collection_group_order_by" -> ((s, dir) => {
      docColl(s, dir).queryGroups(
        """{"query": {"order_by": {"key": "n_chars", "direction": "desc"}},
          |  "group_by": "lang", "group_size": 2, "limit": 3}""".stripMargin)
        .select(col("group_value"), col("id"),
          col("score").cast("long").as("n_chars"),
          col("rank").cast("long").as("rank"),
          col("grp_rank").cast("long").as("grp_rank"))
        .orderBy(col("grp_rank"), col("rank"))
    }),
    // catalog-dispatched query with lookup_from: the recommend ids resolve
    // against a SIBLING catalog collection (named vector + shard_key
    // pruned), mirroring the hand-wired recommend_lookup_from_shard /
    // api_query_lookup_from fixtures — same oracle, so the catalog wiring
    // must reproduce their rows exactly
    "catalog_query_lookup_from" -> ((s, dir) => {
      val root = "/tmp/graft_runtime/cat_lkp_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val cat = new graft.storage.Catalog(s, root)
      val e = Tables.load(s, dir, "embeddings")
      if (!cat.exists("docs"))
        cat.create("docs", CollectionConfig(idCol = "vec_id",
          vectors = Seq(VectorConfig("", 64, Dot))),
          e.select(col("vec_id"), col("embedding").as("vector")))
      if (!cat.exists("queries")) {
        val lookup = e.filter(col("vec_id") < 100)
          .select(lit("a").as("shard_key"), (col("vec_id") + 10000).as("qid"),
            col("embedding").as("vector_vec"))
          .unionByName(e.filter(col("vec_id") >= 50 && col("vec_id") < 150)
            .select(lit("b").as("shard_key"), (col("vec_id") + 9950).as("qid"),
              col("embedding").as("vector_vec")))
        cat.create("queries", CollectionConfig(idCol = "qid",
          vectors = Seq(VectorConfig("vec", 64, Dot)),
          shardKeyCol = Some("shard_key")), lookup)
      }
      cat.query("docs",
        """{"query": {"recommend": {
          |    "positive": [10001, 10003], "negative": [10005],
          |    "strategy": "average_vector"}},
          |  "lookup_from": {
          |    "collection": "queries", "vector": "vec", "shard_key": ["b"]},
          |  "limit": 10}""".stripMargin)
    }),
    // `lookup_from` resolution-failure error parity
    // (`test_query_full.py:353-553` — test_recommend_lookup_validations):
    // a missing referenced id, a missing lookup COLLECTION, and a missing
    // lookup VECTOR each reject with the reference's exact message, on the
    // ROOT query and inside a NESTED prefetch alike.
    "catalog_lookup_from_errors" -> ((s, dir) => {
      import s.implicits._
      val root = "/tmp/graft_runtime/cat_lkerr2_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val cat = new graft.storage.Catalog(s, root)
      val e = Tables.load(s, dir, "embeddings")
      if (!cat.exists("base"))
        cat.create("base", CollectionConfig(idCol = "vec_id",
          vectors = Seq(VectorConfig("", 64, Dot)),
          payloadTypes = Map("label" -> LongType)),
          e.select(col("vec_id"), col("embedding").as("vector"),
            to_json(struct(col("label"))).as("payload")))
      if (!cat.exists("lkv"))
        cat.create("lkv", CollectionConfig(idCol = "qid",
          vectors = Seq(VectorConfig("other", 64, Dot))),
          e.filter(col("vec_id") < 3)
            .select((col("vec_id") + 1).as("qid"),
              col("embedding").as("vector_other")))
      def check(json: String, expect: String): (Boolean, Boolean) =
        try { cat.query("base", json); (false, false) }
        catch { case ex: Exception =>
          (true, Option(ex.getMessage).exists(_.contains(expect))) }
      def body(lookupColl: String, vec: String, negative: String): String =
        s"""{"query": {"recommend": {"positive": [1], "negative": [$negative]}},
           |  "limit": 10,
           |  "lookup_from": {"collection": "$lookupColl", "vector": "$vec"}}"""
          .stripMargin
      def nested(lookupColl: String, vec: String, negative: String): String =
        s"""{"prefetch": [
           |    {"query": {"recommend": {"positive": [1], "negative": [$negative]}},
           |     "lookup_from": {"collection": "$lookupColl", "vector": "$vec"}}],
           |  "query": {"fusion": "rrf"}, "limit": 10}""".stripMargin
      Seq(
        ("root_missing_id", check(body("lkv", "other", "2, 999"),
          "Not found: No point with id 999 found")),
        ("root_missing_collection", check(body("non-existing-collection", "other", "2"),
          "Not found: Collection non-existing-collection not found")),
        ("root_missing_vector", check(body("lkv", "non-existing-vector", "2"),
          "Wrong input: Not existing vector name error: non-existing-vector")),
        ("nested_missing_id", check(nested("lkv", "other", "2, 999"),
          "Not found: No point with id 999 found")),
        ("nested_missing_collection", check(nested("non-existing-collection", "other", "2"),
          "Not found: Collection non-existing-collection not found")),
        ("nested_missing_vector", check(nested("lkv", "non-existing-vector", "2"),
          "Wrong input: Not existing vector name error: non-existing-vector")),
        ("ok_control", check(body("lkv", "other", "2"), "")),
        // the GROUPS endpoint's `with_lookup` naming an absent collection
        // 404s with the same shape (`test_group.py:459-483`)
        ("with_lookup_missing_collection", {
          val qv = Tables.embeddingOf(s, dir, 7L).mkString(",")
          try {
            cat.queryGroups("base",
              s"""{"query": {"nearest": [$qv]}, "group_by": "label",
                 |  "group_size": 2, "limit": 3,
                 |  "with_lookup": "non_existing_collection"}""".stripMargin)
              .collect()
            (false, false)
          } catch { case ex: Exception =>
            (true, Option(ex.getMessage).exists(
              _.contains("Collection non_existing_collection not found")))
          }
        }))
        .map { case (n, (rej, ok)) => (n, rej, ok) }
        .toDF("check_name", "rejected", "msg_ok")
    }),
    // `lookup_from` naming the SEARCHED collection itself: the reference
    // only exempts ids from a DIFFERENT collection
    // (`lookup_collection != collection_name`, `collection_query.rs:
    // 552-556`) — a self-lookup_from still excludes the referenced id.
    // Pinned through the catalog path (the collection name is the catalog
    // directory), alongside a foreign-lookup control arm on the same data.
    "catalog_lookup_from_self_excludes" -> ((s, dir) => {
      import s.implicits._
      val root = "/tmp/graft_runtime/cat_selfx_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val cat = new graft.storage.Catalog(s, root)
      val e = Tables.load(s, dir, "embeddings")
      if (!cat.exists("pts"))
        cat.create("pts", CollectionConfig(idCol = "vec_id",
          vectors = Seq(VectorConfig("", 64, Dot))),
          e.select(col("vec_id"), col("embedding").as("vector")))
      if (!cat.exists("twin"))
        cat.create("twin", CollectionConfig(idCol = "vec_id",
          vectors = Seq(VectorConfig("", 64, Dot))),
          e.select(col("vec_id"), col("embedding").as("vector")))
      // same-collection lookup: id 7 resolves from "pts" itself → excluded
      val self = cat.query("pts",
        """{"query": {"nearest": 7},
          |  "lookup_from": {"collection": "pts"}, "limit": 10}""".stripMargin)
        .collect().map(_.getLong(0)).toSeq
      // foreign twin holds the SAME vectors under the SAME ids — id 7 is
      // a twin id, exempt, so it ranks itself first (score 1.0 on Dot)
      val foreign = cat.query("pts",
        """{"query": {"nearest": 7},
          |  "lookup_from": {"collection": "twin"}, "limit": 10}""".stripMargin)
        .collect().map(_.getLong(0)).toSeq
      Seq((!self.contains(7L), self.length.toLong,
          foreign.headOption.contains(7L), foreign.length.toLong))
        .toDF("self_excluded", "self_n", "foreign_includes", "foreign_n")
    }),
    // query/groups with `lookup_from` THROUGH the catalog
    // (`QueryGroupsRequestInternal` carries lookup_from like the flat
    // query): the recommend example ids resolve against the SIBLING
    // collection's vectors (qid = vec_id + 10000 with identical content),
    // so the grouped rows must equal the self-resolved
    // `collection_group_recommend` exactly — same oracle.
    "catalog_groups_lookup_from" -> ((s, dir) => {
      val root = "/tmp/graft_runtime/cat_glkp_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val cat = new graft.storage.Catalog(s, root)
      val d = Tables.load(s, dir, "documents")
      val e = Tables.load(s, dir, "embeddings")
      if (!cat.exists("pts"))
        cat.create("pts", cfg,
          e.join(d, e("vec_id") === d("doc_id"))
            .select(e("vec_id").as("id"), e("embedding").as("vector"),
              to_json(struct(d("lang"), d("source"), d("n_chars"),
                e("label"))).as("payload")))
      if (!cat.exists("exq"))
        cat.create("exq", CollectionConfig(idCol = "qid",
          vectors = Seq(VectorConfig("vec", 64, Dot))),
          e.select((col("vec_id") + 10000).as("qid"),
            col("embedding").as("vector_vec")))
      cat.queryGroups("pts",
        """{"query": {"recommend": {
          |    "positive": [10001, 10002], "negative": [10004],
          |    "strategy": "best_score"}},
          |  "lookup_from": {"collection": "exq", "vector": "vec"},
          |  "group_by": "label", "group_size": 2, "limit": 3}""".stripMargin)
        .select(col("group_value"), col("id"), col("score"),
          col("rank").cast("long").as("rank"),
          col("grp_rank").cast("long").as("grp_rank"))
        .orderBy(col("grp_rank"), col("rank"))
    }),
    // query/groups THROUGH the catalog with a REAL sibling collection as
    // the lookup (`Catalog.queryGroups` resolves `with_lookup.collection`
    // to `readDecoded()` of the sibling): the with_payload include list
    // filters the looked-up payload, with_vectors=false drops its vector,
    // and the sibling's internal columns never attach
    "catalog_group_lookup" -> ((s, dir) => {
      val root = "/tmp/graft_runtime/cat_grp_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val cat = new graft.storage.Catalog(s, root)
      val e = Tables.load(s, dir, "embeddings")
      if (!cat.exists("pts"))
        cat.create("pts", CollectionConfig(idCol = "vec_id",
          vectors = Seq(VectorConfig("", 64, Dot)),
          payloadTypes = Map("label" -> LongType)),
          e.select(col("vec_id"), col("embedding").as("vector"),
            to_json(struct(col("label"))).as("payload")))
      if (!cat.exists("labels"))
        cat.create("labels", CollectionConfig(idCol = "lid",
          vectors = Seq(VectorConfig("", 1, Dot)),
          payloadTypes = Map("name" -> StringType, "extra" -> LongType)),
          e.select(col("label")).distinct()
            .select(col("label").cast("string").as("lid"),
              array(col("label").cast("float")).as("vector"),
              to_json(struct(concat(lit("L"), col("label")).as("name"),
                col("label").as("extra"))).as("payload")))
      val g = cat.queryGroups("pts",
        s"""{"query": {"nearest": ${vjson(s, dir, 7)}},
           |  "group_by": "label", "group_size": 2, "limit": 4,
           |  "with_lookup": {"collection": "labels",
           |    "with_payload": ["name"], "with_vectors": false}}""".stripMargin)
      g.select(col("group_value"), col("vec_id"), col("score"),
        col("rank").cast("long").as("rank"),
        col("grp_rank").cast("long").as("grp_rank"),
        get_json_object(col("lookup_payload"), "$.name").as("lk_name"),
        get_json_object(col("lookup_payload"), "$.extra").as("lk_extra"),
        lit(g.columns.contains("lookup_vector")).as("has_vec"))
        .orderBy(col("grp_rank"), col("rank"))
    }),
    // query with with_payload include selector + with_vector: the response
    // enrichment join (broadcast hit set, table streams once) — payload
    // comes back selector-filtered, the vector decoded
    "collection_query_with_payload" -> ((s, dir) => {
      docColl(s, dir).query(
        s"""{"query": {"nearest": ${vjson(s, dir, 7)}}, "limit": 5,
           |  "with_payload": {"include": ["lang", "n_chars"]},
           |  "with_vector": true}""".stripMargin)
        .select(col("id"), col("score"),
          get_json_object(col("payload"), "$.lang").as("lang"),
          get_json_object(col("payload"), "$.n_chars").cast("long").as("n_chars"),
          get_json_object(col("payload"), "$.source").as("src_excluded"),
          round(element_at(col("vector"), 1).cast("double"), 6).as("v0"))
    }),
    // POST /points/search/matrix/pairs: has_id-scoped sample, top-3
    // neighbors per sampled point within the sample
    "collection_matrix_endpoint" -> ((s, dir) => {
      docColl(s, dir).searchMatrix(
        s"""{"filter": {"must": [{"has_id": [${(0 until 20).mkString(",")}]}]},
           |  "sample": 20, "limit": 3}""".stripMargin)
    }),
  )

  /** Shared by `collection_group_by` and its legacy-route twin
    * `collection_search_groups_legacy`: the legacy body must rewrite to
    * the identical grouped query, so both entries hash-match one oracle. */
  private val groupByLabelLookupSql =
    """WITH pts AS (SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
      |                    e.label::VARCHAR AS gv
      |             FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
      |q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7),
      |scored AS (SELECT p.gv, p.id, round(list_dot_product(p.v, q.v), 6) AS score
      |           FROM pts p, q),
      |ranked AS (SELECT *, row_number() OVER
      |             (PARTITION BY gv ORDER BY score DESC, id ASC) AS rank
      |           FROM scored),
      |hits AS (SELECT * FROM ranked WHERE rank <= 2),
      |tops AS (SELECT gv, score AS best FROM hits WHERE rank = 1
      |         ORDER BY best DESC, gv ASC LIMIT 4),
      |grps AS (SELECT gv, row_number() OVER (ORDER BY best DESC, gv ASC) AS grp_rank
      |         FROM tops)
      |SELECT h.gv AS group_value, h.id, h.score, h.rank::BIGINT AS rank,
      |       g.grp_rank::BIGINT AS grp_rank,
      |       concat('L', h.gv) AS lookup_name
      |FROM hits h JOIN grps g ON g.gv = h.gv
      |ORDER BY grp_rank, rank""".stripMargin

  /** Shared by `collection_group_recommend` and
    * `collection_recommend_groups_legacy` (same rewrite contract) — both
    * resolve by-id examples against the SEARCHED collection, so the
    * referenced ids {1, 2, 4} are excluded from the grouped hits
    * (`exclude_referenced_ids`, `collection_query.rs:523-531`; the legacy
    * recommend path injects the same must_not, `recommendations.rs:398`).
    * `catalog_groups_lookup_from` resolves the SAME vectors from a foreign
    * collection — its ids are exempt, so it keeps the inclusive scan. */
  private val groupRecommendExclSql =
    groupRecommendSqlOf(excluded = true)
  private val groupRecommendSql =
    groupRecommendSqlOf(excluded = false)
  private def groupRecommendSqlOf(excluded: Boolean): String =
    """WITH pts AS (SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
      |                    e.label::VARCHAR AS gv
      |             FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
      |q1 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id=1),
      |q2 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id=2),
      |q4 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id=4),
      |s AS (SELECT p.gv, p.id,
      |  greatest(list_dot_product(p.v, q1.v),
      |           list_dot_product(p.v, q2.v)) AS mp,
      |  list_dot_product(p.v, q4.v) AS mn
      |  FROM pts p, q1, q2, q4""".stripMargin +
      (if (excluded) " WHERE p.id NOT IN (1, 2, 4)" else "") +
    """),
      |scored AS (SELECT gv, id,
      |  round(CASE WHEN mp > mn THEN 0.5*(mp/(1+abs(mp))+1)
      |             ELSE -(0.5*(mn/(1+abs(mn))+1)) END, 6) AS score FROM s),
      |ranked AS (SELECT *, row_number() OVER
      |             (PARTITION BY gv ORDER BY score DESC, id ASC) AS rank
      |           FROM scored),
      |hits AS (SELECT * FROM ranked WHERE rank <= 2),
      |tops AS (SELECT gv, score AS best FROM hits WHERE rank = 1
      |         ORDER BY best DESC, gv ASC LIMIT 3),
      |grps AS (SELECT gv, row_number() OVER (ORDER BY best DESC, gv ASC)
      |           AS grp_rank FROM tops)
      |SELECT h.gv AS group_value, h.id, h.score, h.rank::BIGINT AS rank,
      |       g.grp_rank::BIGINT AS grp_rank
      |FROM hits h JOIN grps g ON g.gv = h.gv
      |ORDER BY grp_rank, rank""".stripMargin

  val oracles: Map[String, String] = Map(
    "catalog_query_lookup_from" -> RankQueries.oracles("recommend_lookup_from_shard"),
    "catalog_group_lookup" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7),
        |scored AS (SELECT e.label::VARCHAR AS gv, e.vec_id AS vec_id,
        |             round(list_dot_product(e.embedding::DOUBLE[], q.v), 6) AS score
        |           FROM embeddings e, q),
        |ranked AS (SELECT *, row_number() OVER
        |             (PARTITION BY gv ORDER BY score DESC, vec_id ASC) AS rank
        |           FROM scored),
        |hits AS (SELECT * FROM ranked WHERE rank <= 2),
        |tops AS (SELECT gv, score AS best FROM hits WHERE rank = 1
        |         ORDER BY best DESC, gv ASC LIMIT 4),
        |grps AS (SELECT gv, row_number() OVER (ORDER BY best DESC, gv ASC) AS grp_rank
        |         FROM tops)
        |SELECT h.gv AS group_value, h.vec_id, h.score, h.rank::BIGINT AS rank,
        |       g.grp_rank::BIGINT AS grp_rank,
        |       concat('L', h.gv) AS lk_name,
        |       CAST(NULL AS VARCHAR) AS lk_extra,
        |       FALSE AS has_vec
        |FROM hits h JOIN grps g ON g.gv = h.gv
        |ORDER BY grp_rank, rank""".stripMargin,
    "collection_search_legacy" ->
      """WITH pts AS (SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
        |                    d.lang, d.n_chars
        |             FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7)
        |SELECT p.id, round(list_dot_product(p.v, q.v), 6) AS score,
        |       p.lang, p.n_chars::BIGINT AS n_chars,
        |       NULL::VARCHAR AS src_excluded, round(p.v[1], 6) AS v0
        |FROM pts p, q ORDER BY score DESC, p.id ASC LIMIT 5""".stripMargin,
    "collection_recommend_legacy" ->
      """WITH pts AS (SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v, d.lang
        |             FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |q1 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id=1),
        |q2 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id=2),
        |q4 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id=4),
        |s0 AS (SELECT p.id,
        |  greatest(list_dot_product(p.v, q1.v),
        |           list_dot_product(p.v, q2.v)) AS mp,
        |  list_dot_product(p.v, q4.v) AS mn FROM pts p, q1, q2, q4
        |  WHERE p.id NOT IN (1, 2, 4)),
        |r0 AS (SELECT id, round(CASE WHEN mp > mn THEN 0.5*(mp/(1+abs(mp))+1)
        |         ELSE -(0.5*(mn/(1+abs(mn))+1)) END, 6) AS score, 0 AS req
        |       FROM s0 ORDER BY score DESC, id ASC LIMIT 5),
        |r1 AS (SELECT p.id, round(list_dot_product(p.v, q1.v), 6) AS score,
        |              1 AS req
        |       FROM pts p, q1 WHERE p.lang = 'en' AND p.id <> 1
        |       ORDER BY score DESC, p.id ASC LIMIT 5)
        |SELECT id, score, req::INT AS req FROM r0
        |UNION ALL SELECT id, score, req::INT AS req FROM r1""".stripMargin,
    "collection_discover_legacy" ->
      """WITH pts AS (SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v
        |             FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |t AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id=5),
        |p1 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id=10),
        |n1 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id=20),
        |p2 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id=30),
        |n2 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id=40),
        |s AS (SELECT p.id, list_dot_product(p.v, t.v) AS st,
        |  list_dot_product(p.v, p1.v) AS sp1, list_dot_product(p.v, n1.v) AS sn1,
        |  list_dot_product(p.v, p2.v) AS sp2, list_dot_product(p.v, n2.v) AS sn2
        |  FROM pts p, t, p1, n1, p2, n2),
        |r0 AS (SELECT id,
        |  round((CASE WHEN sp1 > sn1 THEN 1 WHEN sp1 < sn1 THEN -1 ELSE 0 END
        |       + CASE WHEN sp2 > sn2 THEN 1 WHEN sp2 < sn2 THEN -1 ELSE 0 END)::DOUBLE
        |      + 0.5*(st/(1+abs(st))+1), 6) AS score, 0 AS req
        |  FROM s WHERE id NOT IN (5, 10, 20, 30, 40)
        |  ORDER BY score DESC, id ASC LIMIT 10),
        |c AS (SELECT s.id,
        |  least(s.sp1 - s.sn1 - 1.1920928955078125e-07, 0) AS d1,
        |  least(s.sp2 - s.sn2 - 1.1920928955078125e-07, 0) AS d2 FROM s),
        |r1 AS (SELECT id, round(d1/(1+abs(d1)) + d2/(1+abs(d2)), 6) AS score,
        |              1 AS req
        |       FROM c WHERE id NOT IN (10, 20, 30, 40)
        |       ORDER BY score DESC, id ASC LIMIT 10)
        |SELECT id, score, req::INT AS req FROM r0
        |UNION ALL SELECT id, score, req::INT AS req FROM r1""".stripMargin,
    "collection_group_recommend" -> groupRecommendExclSql,
    "collection_group_recommend_all_examples" ->
      "SELECT 0::BIGINT AS all_example_rows, true AS partial_only_remaining",
    "catalog_groups_lookup_from" -> groupRecommendSql,
    "catalog_lookup_from_self_excludes" ->
      """SELECT true AS self_excluded, 10::BIGINT AS self_n,
        |  true AS foreign_includes, 10::BIGINT AS foreign_n""".stripMargin,
    "catalog_lookup_from_errors" ->
      """SELECT * FROM (VALUES
        |  ('root_missing_id', true, true),
        |  ('root_missing_collection', true, true),
        |  ('root_missing_vector', true, true),
        |  ('nested_missing_id', true, true),
        |  ('nested_missing_collection', true, true),
        |  ('nested_missing_vector', true, true),
        |  ('ok_control', false, false),
        |  ('with_lookup_missing_collection', true, true))
        |AS t(check_name, rejected, msg_ok)""".stripMargin,
    "collection_group_order_by" ->
      """WITH pts AS (SELECT e.vec_id AS id, d.n_chars, d.lang AS gv
        |             FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |ranked AS (SELECT gv, id, n_chars, row_number() OVER
        |             (PARTITION BY gv ORDER BY n_chars DESC, id ASC) AS rank
        |           FROM pts),
        |hits AS (SELECT * FROM ranked WHERE rank <= 2),
        |tops AS (SELECT gv, n_chars AS best FROM hits WHERE rank = 1
        |         ORDER BY best DESC, gv ASC LIMIT 3),
        |grps AS (SELECT gv, row_number() OVER (ORDER BY best DESC, gv ASC)
        |           AS grp_rank FROM tops)
        |SELECT h.gv AS group_value, h.id, h.n_chars::BIGINT AS n_chars,
        |       h.rank::BIGINT AS rank, g.grp_rank::BIGINT AS grp_rank
        |FROM hits h JOIN grps g ON g.gv = h.gv
        |ORDER BY grp_rank, rank""".stripMargin,
    "collection_count_endpoint" ->
      """SELECT count(*)::BIGINT AS cnt
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |WHERE d.lang = 'en' AND d.n_chars < 300""".stripMargin,
    "collection_scroll_vectors" ->
      """SELECT e.vec_id AS id, len(e.embedding)::BIGINT AS dim,
        |       round(e.embedding[1]::DOUBLE, 6) AS v0
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |WHERE d.lang = 'fr' ORDER BY id ASC LIMIT 10""".stripMargin,
    "count_estimate_must" ->
      """WITH t AS (SELECT d.lang, d.source
        |           FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |m AS (SELECT count(*)::DOUBLE AS n,
        |             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS c1,
        |             sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END)::DOUBLE AS c2
        |      FROM t)
        |SELECT CAST(round(n * (round(n * (c1/n) * (c2/n))/n)) AS BIGINT) AS cnt
        |FROM m""".stripMargin,
    "count_estimate_mixed" ->
      """WITH t AS (SELECT d.lang, d.source
        |           FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |m AS (SELECT count(*)::DOUBLE AS n,
        |             sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::DOUBLE AS cde,
        |             sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)::DOUBLE AS c1
        |      FROM t),
        |s AS (SELECT n, c1,
        |             round(n * (1.0 - (1.0 - cde/n)
        |               * (1.0 - CAST(CAST(n AS BIGINT) // 2 AS DOUBLE)/n))) AS sexp
        |      FROM m)
        |SELECT CAST(round(n * (sexp/n) * (round(n * ((n - c1)/n))/n)) AS BIGINT) AS cnt
        |FROM s""".stripMargin,
    "count_estimate_range" ->
      """WITH t AS (SELECT d.n_chars::DOUBLE AS v
        |           FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |mm AS (SELECT min(v) AS lo, max(v) AS hi, count(*)::DOUBLE AS n,
        |              (max(v) - min(v)) / 64.0 AS w FROM t),
        |bk AS (SELECT least(63, CAST(floor((t.v - mm.lo) / mm.w) AS INT)) AS b,
        |              count(*)::DOUBLE AS c
        |       FROM t, mm GROUP BY 1),
        |ed AS (SELECT bk.c, mm.n, mm.w,
        |              mm.lo + bk.b * mm.w AS blo,
        |              mm.lo + (bk.b + 1) * mm.w AS bhi
        |       FROM bk, mm),
        |hh AS (SELECT any_value(n) AS n,
        |  round(sum(CASE WHEN blo >= 150.0 AND bhi <= 400.0 THEN c ELSE 0 END)) AS minv,
        |  round(sum(CASE WHEN least(400.0, bhi) - greatest(150.0, blo) > 0
        |                 THEN c ELSE 0 END)) AS maxv,
        |  round(sum(CASE WHEN least(400.0, bhi) - greatest(150.0, blo) > 0
        |                 THEN c * least(1.0, (least(400.0, bhi) - greatest(150.0, blo)) / w)
        |                 ELSE 0 END)) AS midv
        |  FROM ed),
        |st AS (SELECT n, minv AS emin, least(n, maxv) AS emax,
        |  (1.0 - exp(
        |     (CASE WHEN n - 1.0 < 1.0 THEN 1.0 ELSE ln(sqrt(2.0*pi()*(n-1.0))) + (n-1.0)*ln((n-1.0)/exp(1.0)) END)
        |   + (CASE WHEN n - midv < 1.0 THEN 1.0 ELSE ln(sqrt(2.0*pi()*(n-midv))) + (n-midv)*ln((n-midv)/exp(1.0)) END)
        |   - (CASE WHEN n - 1.0 - midv < 1.0 THEN 1.0 ELSE ln(sqrt(2.0*pi()*(n-1.0-midv))) + (n-1.0-midv)*ln((n-1.0-midv)/exp(1.0)) END)
        |   - (CASE WHEN n < 1.0 THEN 1.0 ELSE ln(sqrt(2.0*pi()*n)) + n*ln(n/exp(1.0)) END)
        |  )) * n AS est
        |  FROM hh),
        |e AS (SELECT n, least(emax, greatest(round(est), emin)) AS ex FROM st)
        |SELECT CAST(round(n * (round(n * (ex/n))/n)) AS BIGINT) AS cnt FROM e""".stripMargin,
    "scroll_orderby_datetime" ->
      """SELECT event_id AS id FROM events
        |WHERE ts <= TIMESTAMP '2024-01-20 12:00:00'
        |ORDER BY ts DESC, event_id ASC LIMIT 15""".stripMargin,
    "count_estimate_bands_must" ->
      """WITH t AS (SELECT d.lang, d.source
        |           FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |m AS (SELECT count(*)::DOUBLE AS n,
        |             sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::DOUBLE AS c1,
        |             sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END)::DOUBLE AS c2
        |      FROM t),
        |g AS (SELECT n, greatest(0.0, c1 + c2 - n) AS gmin,
        |             round(n * (c1/n) * (c2/n)) AS gexp,
        |             least(c1, c2) AS gmax FROM m)
        |SELECT CAST(gmin AS BIGINT) AS est_min,
        |       CAST(round(n * (gexp/n)) AS BIGINT) AS est_exp,
        |       CAST(gmax AS BIGINT) AS est_max FROM g""".stripMargin,
    "count_estimate_bands_mixed" ->
      """WITH t AS (SELECT d.lang, d.source
        |           FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |m AS (SELECT count(*)::DOUBLE AS n,
        |             sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)::DOUBLE AS cde,
        |             sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)::DOUBLE AS cfr,
        |             sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)::DOUBLE AS c1
        |      FROM t),
        |s AS (SELECT n, c1, greatest(cde, cfr) AS smin,
        |             round((1.0 - (1.0 - cde/n) * (1.0 - cfr/n)) * n) AS sexp,
        |             least(cde + cfr, n) AS smax FROM m)
        |SELECT CAST(greatest(0.0, smin - c1) AS BIGINT) AS est_min,
        |       CAST(round(n * (sexp/n) * ((n - c1)/n)) AS BIGINT) AS est_exp,
        |       CAST(least(smax, n - c1) AS BIGINT) AS est_max FROM s""".stripMargin,
    "count_estimate_datetime" ->
      """WITH t AS (SELECT epoch_us(ts)::DOUBLE AS v FROM events),
        |bb AS (SELECT epoch_us(TIMESTAMP '2024-01-10 00:00:00')::DOUBLE AS a,
        |              epoch_us(TIMESTAMP '2024-01-20 12:00:00')::DOUBLE AS z),
        |mm AS (SELECT min(v) AS lo, max(v) AS hi, count(*)::DOUBLE AS n,
        |              (max(v) - min(v)) / 64.0 AS w FROM t),
        |bk AS (SELECT least(63, CAST(floor((t.v - mm.lo) / mm.w) AS INT)) AS b,
        |              count(*)::DOUBLE AS c
        |       FROM t, mm GROUP BY 1),
        |ed AS (SELECT bk.c, mm.n, mm.w,
        |              mm.lo + bk.b * mm.w AS blo,
        |              mm.lo + (bk.b + 1) * mm.w AS bhi,
        |              bb.a, bb.z
        |       FROM bk, mm, bb),
        |hh AS (SELECT any_value(n) AS n,
        |  round(sum(CASE WHEN blo >= a AND bhi <= z THEN c ELSE 0 END)) AS minv,
        |  round(sum(CASE WHEN least(z, bhi) - greatest(a, blo) > 0
        |                 THEN c ELSE 0 END)) AS maxv,
        |  round(sum(CASE WHEN least(z, bhi) - greatest(a, blo) > 0
        |                 THEN c * least(1.0, (least(z, bhi) - greatest(a, blo)) / w)
        |                 ELSE 0 END)) AS midv
        |  FROM ed),
        |st AS (SELECT n, minv AS emin, least(n, maxv) AS emax,
        |  (1.0 - exp(
        |     (CASE WHEN n - 1.0 < 1.0 THEN 1.0 ELSE ln(sqrt(2.0*pi()*(n-1.0))) + (n-1.0)*ln((n-1.0)/exp(1.0)) END)
        |   + (CASE WHEN n - midv < 1.0 THEN 1.0 ELSE ln(sqrt(2.0*pi()*(n-midv))) + (n-midv)*ln((n-midv)/exp(1.0)) END)
        |   - (CASE WHEN n - 1.0 - midv < 1.0 THEN 1.0 ELSE ln(sqrt(2.0*pi()*(n-1.0-midv))) + (n-1.0-midv)*ln((n-1.0-midv)/exp(1.0)) END)
        |   - (CASE WHEN n < 1.0 THEN 1.0 ELSE ln(sqrt(2.0*pi()*n)) + n*ln(n/exp(1.0)) END)
        |  )) * n AS est
        |  FROM hh),
        |e AS (SELECT n, least(emax, greatest(round(est), emin)) AS ex FROM st)
        |SELECT CAST(round(n * (round(n * (ex/n))/n)) AS BIGINT) AS cnt FROM e""".stripMargin,
    "count_estimate_except" ->
      """WITH t AS (SELECT d.source
        |           FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id)
        |SELECT (count(*) - sum(CASE WHEN source IN ('src1','src2') THEN 1 ELSE 0 END))::BIGINT AS cnt
        |FROM t""".stripMargin,
    "collection_facet_estimate" ->
      """SELECT d.lang AS value, count(DISTINCT e.vec_id)::BIGINT AS cnt
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |GROUP BY d.lang ORDER BY cnt DESC, value ASC LIMIT 4""".stripMargin,
    "facet_int_estimate" ->
      """SELECT e.label::BIGINT AS value, count(DISTINCT e.vec_id)::BIGINT AS cnt
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |GROUP BY 1 ORDER BY cnt DESC, value ASC LIMIT 5""".stripMargin,
    "facet_bool_estimate" ->
      """SELECT (d.n_chars > 250) AS value, count(DISTINCT e.vec_id)::BIGINT AS cnt
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |GROUP BY 1 ORDER BY cnt DESC, value ASC LIMIT 3""".stripMargin,
    "facet_uuid_estimate" ->
      """SELECT concat_ws('-',
        |    substr(md5((d.doc_id % 7)::VARCHAR),1,8),
        |    substr(md5((d.doc_id % 7)::VARCHAR),9,4),
        |    substr(md5((d.doc_id % 7)::VARCHAR),13,4),
        |    substr(md5((d.doc_id % 7)::VARCHAR),17,4),
        |    substr(md5((d.doc_id % 7)::VARCHAR),21,12)) AS value,
        |  count(DISTINCT e.vec_id)::BIGINT AS cnt
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |GROUP BY 1 ORDER BY cnt DESC, value ASC LIMIT 5""".stripMargin,
    "collection_facet_endpoint" ->
      """SELECT d.lang AS value, count(DISTINCT e.vec_id)::BIGINT AS cnt
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |WHERE d.source IN ('src1', 'src3', 'src7')
        |GROUP BY d.lang ORDER BY cnt DESC, value ASC LIMIT 5""".stripMargin,
    // independence-product estimate per head value: exp = round(n·(cv/n)·
    // (cf/n)) — the `combine_must_estimations` arithmetic the count
    // estimator uses, reproduced from the raw data
    "facet_filtered_estimate" ->
      """WITH t AS (SELECT d.lang, d.source
        |           FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |m AS (SELECT count(*)::DOUBLE AS n,
        |             sum(CASE WHEN source = 'src3' THEN 1 ELSE 0 END)::DOUBLE AS cf
        |      FROM t),
        |v AS (SELECT lang AS value, count(*)::DOUBLE AS cv FROM t GROUP BY lang),
        |est AS (SELECT v.value,
        |          CAST(round(m.n * (v.cv/m.n) * (m.cf/m.n)) AS BIGINT) AS cnt
        |        FROM v, m)
        |SELECT value, cnt FROM est WHERE cnt > 0
        |ORDER BY cnt DESC, value ASC LIMIT 4""".stripMargin,
    // wide arm: cf comes from the should-union probability product over
    // the 14 selected sources' exact counts (expected_should_estimation),
    // then the same per-value must-combine as the tight arm
    "facet_filtered_estimate_wide" ->
      """WITH t AS (SELECT d.lang, d.source
        |           FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |m AS (SELECT count(*)::DOUBLE AS n FROM t),
        |sc AS (SELECT source, count(*)::DOUBLE AS c FROM t
        |       WHERE source IN ('src0','src1','src2','src3','src4','src5',
        |                        'src6','src7','src8','src9','src10','src11',
        |                        'src12','src13')
        |       GROUP BY source),
        |anyest AS (SELECT round((1 - product(1 - sc.c/m.n)) * m.n) AS cf
        |           FROM sc, m GROUP BY m.n),
        |v AS (SELECT lang AS value, count(*)::DOUBLE AS cv FROM t GROUP BY lang),
        |est AS (SELECT v.value,
        |          CAST(round(m.n * (v.cv/m.n) * (a.cf/m.n)) AS BIGINT) AS cnt
        |        FROM v, m, anyest a)
        |SELECT value, cnt FROM est WHERE cnt > 0
        |ORDER BY cnt DESC, value ASC LIMIT 6""".stripMargin,
    "collection_scroll_endpoint" ->
      """SELECT e.vec_id AS id, d.n_chars::BIGINT AS n_chars, d.lang,
        |       NULL::VARCHAR AS src_excluded
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |WHERE d.lang = 'en' AND d.n_chars <= 400
        |ORDER BY d.n_chars DESC, id ASC LIMIT 15""".stripMargin,
    "collection_retrieve_endpoint" ->
      """SELECT e.vec_id AS id, d.lang, d.n_chars::BIGINT AS n_chars,
        |       NULL::VARCHAR AS src_excluded, len(e.embedding)::BIGINT AS dim
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |WHERE e.vec_id IN (3, 5, 8, 13) ORDER BY id""".stripMargin,
    "collection_query_batch" ->
      """WITH pts AS (SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v, d.lang
        |             FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |q7 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7),
        |q42 AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 42),
        |r0 AS (SELECT p.id, round(list_dot_product(p.v, q7.v), 6) AS score, 0 AS req
        |       FROM pts p, q7 ORDER BY score DESC, p.id ASC LIMIT 5),
        |r1 AS (SELECT p.id, round(list_dot_product(p.v, q42.v), 6) AS score, 1 AS req
        |       FROM pts p, q42 WHERE p.lang = 'en'
        |       ORDER BY score DESC, p.id ASC LIMIT 5)
        |SELECT id, score, req::INT AS req FROM r0
        |UNION ALL SELECT id, score, req::INT AS req FROM r1""".stripMargin,
    "api_recommend_using_named" ->
      """WITH dims AS (SELECT unnest(range(1, 33)) AS i),
        |w AS (SELECT d.i AS i,
        |  2 * (SELECT avg(embedding[d.i]::DOUBLE) FROM embeddings WHERE vec_id IN (7, 11))
        |    - (SELECT avg(embedding[d.i]::DOUBLE) FROM embeddings WHERE vec_id IN (4)) AS w
        |  FROM dims d),
        |s AS (SELECT e.vec_id AS vec_id, sum(e.embedding[w.i]::DOUBLE * w.w) AS sc
        |      FROM embeddings e CROSS JOIN w
        |      WHERE e.vec_id NOT IN (7, 11, 4) GROUP BY e.vec_id)
        |SELECT vec_id, round(sc, 6) AS score FROM s
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    // by-id example 7 excluded (`exclude_referenced_ids`); the
    // catalog_lookup_from_multivec twin keeps the shared scan — its id
    // lives in the FOREIGN collection and is exempt
    "api_nearest_id_multivec" ->
      """WITH q AS (SELECT embedding[1:32]::DOUBLE[] AS q1,
        |                  embedding[33:64]::DOUBLE[] AS q2
        |           FROM embeddings WHERE vec_id = 7),
        |t AS (SELECT vec_id, embedding[1:32]::DOUBLE[] AS d1,
        |             embedding[33:64]::DOUBLE[] AS d2 FROM embeddings
        |      WHERE vec_id <> 7),
        |s AS (SELECT t.vec_id AS vec_id,
        |  greatest(list_dot_product(t.d1, q.q1), list_dot_product(t.d2, q.q1)) +
        |  greatest(list_dot_product(t.d1, q.q2), list_dot_product(t.d2, q.q2)) AS sc
        |  FROM t, q)
        |SELECT vec_id, round(sc, 6) AS score FROM s
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    // legacy dense query = a 1-token matrix: per point the score is the
    // BEST token's dot with the single query vector; nothing excluded
    // (the input is a raw vector, not a referenced id)
    "api_query_multivec_legacy" ->
      """WITH q AS (SELECT embedding[1:32]::DOUBLE[] AS q1
        |           FROM embeddings WHERE vec_id = 7),
        |t AS (SELECT vec_id, embedding[1:32]::DOUBLE[] AS d1,
        |             embedding[33:64]::DOUBLE[] AS d2 FROM embeddings),
        |s AS (SELECT t.vec_id AS vec_id,
        |  greatest(list_dot_product(t.d1, q.q1),
        |           list_dot_product(t.d2, q.q1)) AS sc
        |  FROM t, q)
        |SELECT vec_id, round(sc, 6) AS score FROM s
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    // per-example MaxSim sims over the 2-token layout; by-id example 7
    // excluded everywhere; sig(x) = 0.5*(x/(1+|x|)+1)
    "api_recommend_multivec" ->
      """WITH q AS (SELECT
        |    a.embedding[1:32]::DOUBLE[] AS q71, a.embedding[33:64]::DOUBLE[] AS q72,
        |    b.embedding[1:32]::DOUBLE[] AS p11,
        |    c.embedding[1:32]::DOUBLE[] AS n1, c.embedding[33:64]::DOUBLE[] AS n2,
        |    list_transform(c.embedding[1:32]::DOUBLE[], x -> -x) AS m1,
        |    list_transform(c.embedding[33:64]::DOUBLE[], x -> -x) AS m2
        |  FROM embeddings a, embeddings b, embeddings c
        |  WHERE a.vec_id = 7 AND b.vec_id = 11 AND c.vec_id = 4),
        |t AS (SELECT vec_id, embedding[1:32]::DOUBLE[] AS d1,
        |             embedding[33:64]::DOUBLE[] AS d2 FROM embeddings
        |      WHERE vec_id <> 7),
        |s AS (SELECT t.vec_id AS vec_id,
        |    greatest(list_dot_product(d1,q.q71), list_dot_product(d2,q.q71))
        |  + greatest(list_dot_product(d1,q.q72), list_dot_product(d2,q.q72)) AS sim7,
        |    greatest(list_dot_product(d1,q.p11), list_dot_product(d2,q.p11)) AS sim11,
        |    greatest(list_dot_product(d1,q.n1), list_dot_product(d2,q.n1))
        |  + greatest(list_dot_product(d1,q.n2), list_dot_product(d2,q.n2)) AS simn,
        |    greatest(list_dot_product(d1,q.m1), list_dot_product(d2,q.m1))
        |  + greatest(list_dot_product(d1,q.m2), list_dot_product(d2,q.m2)) AS simm
        |  FROM t, q),
        |avg_arm AS (SELECT 'avg' AS strategy, vec_id,
        |    round(sim7 + sim11 + simm, 6) AS score FROM s
        |  ORDER BY score DESC, vec_id ASC LIMIT 10),
        |best_arm AS (SELECT 'best' AS strategy, vec_id,
        |    round(CASE WHEN greatest(sim7, sim11) > simn
        |      THEN 0.5*(greatest(sim7, sim11)/(1+abs(greatest(sim7, sim11)))+1)
        |      ELSE -(0.5*(simn/(1+abs(simn))+1)) END, 6) AS score FROM s
        |  ORDER BY score DESC, vec_id ASC LIMIT 10),
        |sum_arm AS (SELECT 'sum' AS strategy, vec_id,
        |    round(sim7 + sim11 - simn, 6) AS score FROM s
        |  ORDER BY score DESC, vec_id ASC LIMIT 10)
        |SELECT * FROM (
        |  SELECT * FROM avg_arm UNION ALL
        |  SELECT * FROM best_arm UNION ALL
        |  SELECT * FROM sum_arm)
        |ORDER BY strategy, score DESC, vec_id ASC""".stripMargin,
    // per-example MaxSim sims; fs(x) = x/(1+|x|), sig(x) = 0.5*(fs(x)+1);
    // context margin = f32 ulp(1.0); feedback pair weight (0.9-0.4)^2*0.5
    "api_query_multivec_custom" ->
      """WITH q AS (SELECT
        |    a.embedding[1:32]::DOUBLE[] AS q71, a.embedding[33:64]::DOUBLE[] AS q72,
        |    b.embedding[1:32]::DOUBLE[] AS p11,
        |    c.embedding[1:32]::DOUBLE[] AS n1, c.embedding[33:64]::DOUBLE[] AS n2
        |  FROM embeddings a, embeddings b, embeddings c
        |  WHERE a.vec_id = 7 AND b.vec_id = 11 AND c.vec_id = 4),
        |t AS (SELECT vec_id, embedding[1:32]::DOUBLE[] AS d1,
        |             embedding[33:64]::DOUBLE[] AS d2 FROM embeddings
        |      WHERE vec_id <> 7),
        |s AS (SELECT t.vec_id AS vec_id,
        |    greatest(list_dot_product(d1,q.q71), list_dot_product(d2,q.q71))
        |  + greatest(list_dot_product(d1,q.q72), list_dot_product(d2,q.q72)) AS sim7,
        |    greatest(list_dot_product(d1,q.p11), list_dot_product(d2,q.p11)) AS sim11,
        |    greatest(list_dot_product(d1,q.n1), list_dot_product(d2,q.n1))
        |  + greatest(list_dot_product(d1,q.n2), list_dot_product(d2,q.n2)) AS simn
        |  FROM t, q),
        |disc AS (SELECT 'discover' AS arm, vec_id,
        |    round((CASE WHEN sim11 > simn THEN 1 WHEN sim11 < simn THEN -1
        |           ELSE 0 END)::DOUBLE
        |      + 0.5*(sim7/(1+abs(sim7))+1), 6) AS score FROM s
        |  ORDER BY score DESC, vec_id ASC LIMIT 10),
        |ctx AS (SELECT 'context' AS arm, vec_id,
        |    round(least(sim7 - simn - 0.00000011920928955078125, 0)
        |      / (1 + abs(least(sim7 - simn - 0.00000011920928955078125, 0))),
        |      6) AS score FROM s
        |  ORDER BY score DESC, vec_id ASC LIMIT 10),
        |fb AS (SELECT 'feedback' AS arm, vec_id,
        |    round(sim7 + 0.125*(sim11 - simn), 6) AS score FROM s
        |  ORDER BY score DESC, vec_id ASC LIMIT 10)
        |SELECT * FROM (
        |  SELECT * FROM disc UNION ALL
        |  SELECT * FROM ctx UNION ALL
        |  SELECT * FROM fb)
        |ORDER BY arm, score DESC, vec_id ASC""".stripMargin,
    "api_query_mmr_multivec" ->
      "SELECT 8 AS n, true AS ids_match_greedy, true AS positions_ok",
    "catalog_lookup_from_multivec" ->
      """WITH q AS (SELECT embedding[1:32]::DOUBLE[] AS q1,
        |                  embedding[33:64]::DOUBLE[] AS q2
        |           FROM embeddings WHERE vec_id = 7),
        |t AS (SELECT vec_id, embedding[1:32]::DOUBLE[] AS d1,
        |             embedding[33:64]::DOUBLE[] AS d2 FROM embeddings),
        |s AS (SELECT t.vec_id AS vec_id,
        |  greatest(list_dot_product(t.d1, q.q1), list_dot_product(t.d2, q.q1)) +
        |  greatest(list_dot_product(t.d1, q.q2), list_dot_product(t.d2, q.q2)) AS sc
        |  FROM t, q)
        |SELECT vec_id, round(sc, 6) AS score FROM s
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    "shard_key_reads" ->
      """WITH base AS (SELECT vec_id, label, ['a','b','c'][(label % 3) + 1] AS sk
        |              FROM embeddings),
        |cnt AS (SELECT 'count' AS kind, '' AS val, count(*)::BIGINT AS cnt
        |        FROM base WHERE sk IN ('a','c') AND label >= 2),
        |fac AS (SELECT 'facet' AS kind, label::VARCHAR AS val, cnt FROM
        |         (SELECT label, count(*)::BIGINT AS cnt FROM base WHERE sk = 'b'
        |          GROUP BY label ORDER BY cnt DESC, label ASC LIMIT 5)),
        |scr AS (SELECT 'scroll' AS kind, vec_id::VARCHAR AS val, (-1)::BIGINT AS cnt
        |        FROM (SELECT vec_id FROM base WHERE sk = 'a'
        |              ORDER BY vec_id ASC LIMIT 6)),
        |ret AS (SELECT 'retrieve' AS kind, vec_id::VARCHAR AS val, (-1)::BIGINT AS cnt
        |        FROM base WHERE sk = 'a' AND vec_id IN (1, 2, 3, 4, 5, 6))
        |SELECT * FROM cnt UNION ALL SELECT * FROM fac
        |UNION ALL SELECT * FROM scr UNION ALL SELECT * FROM ret
        |ORDER BY kind, val""".stripMargin,
    "collection_group_by" -> groupByLabelLookupSql,
    "collection_search_groups_legacy" -> groupByLabelLookupSql,
    "collection_recommend_groups_legacy" -> groupRecommendExclSql,
    "collection_group_lookup_select" ->
      """WITH pts AS (SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
        |                    e.label::VARCHAR AS gv
        |             FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7),
        |scored AS (SELECT p.gv, p.id, round(list_dot_product(p.v, q.v), 6) AS score
        |           FROM pts p, q),
        |ranked AS (SELECT *, row_number() OVER
        |             (PARTITION BY gv ORDER BY score DESC, id ASC) AS rank
        |           FROM scored),
        |hits AS (SELECT * FROM ranked WHERE rank <= 2),
        |tops AS (SELECT gv, score AS best FROM hits WHERE rank = 1
        |         ORDER BY best DESC, gv ASC LIMIT 4),
        |grps AS (SELECT gv, row_number() OVER (ORDER BY best DESC, gv ASC) AS grp_rank
        |         FROM tops)
        |SELECT h.gv AS group_value, h.id, h.score, h.rank::BIGINT AS rank,
        |       g.grp_rank::BIGINT AS grp_rank,
        |       concat('L', h.gv) AS lk_name,
        |       CAST(NULL AS VARCHAR) AS lk_extra,
        |       FALSE AS has_vec
        |FROM hits h JOIN grps g ON g.gv = h.gv
        |ORDER BY grp_rank, rank""".stripMargin,
    "collection_group_lookup_vec" ->
      """WITH pts AS (SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
        |                    e.label::VARCHAR AS gv
        |             FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7),
        |scored AS (SELECT p.gv, p.id, round(list_dot_product(p.v, q.v), 6) AS score
        |           FROM pts p, q),
        |ranked AS (SELECT *, row_number() OVER
        |             (PARTITION BY gv ORDER BY score DESC, id ASC) AS rank
        |           FROM scored),
        |hits AS (SELECT * FROM ranked WHERE rank <= 2),
        |tops AS (SELECT gv, score AS best FROM hits WHERE rank = 1
        |         ORDER BY best DESC, gv ASC LIMIT 4),
        |grps AS (SELECT gv, row_number() OVER (ORDER BY best DESC, gv ASC) AS grp_rank
        |         FROM tops)
        |SELECT h.gv AS group_value, h.id, h.score, h.rank::BIGINT AS rank,
        |       g.grp_rank::BIGINT AS grp_rank,
        |       1::BIGINT AS lkdim, FALSE AS has_pay
        |FROM hits h JOIN grps g ON g.gv = h.gv
        |ORDER BY grp_rank, rank""".stripMargin,
    "collection_query_with_payload" ->
      """WITH pts AS (SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v,
        |                    d.lang, d.n_chars
        |             FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7)
        |SELECT p.id, round(list_dot_product(p.v, q.v), 6) AS score,
        |       p.lang, p.n_chars::BIGINT AS n_chars,
        |       NULL::VARCHAR AS src_excluded, round(p.v[1], 6) AS v0
        |FROM pts p, q ORDER BY score DESC, p.id ASC LIMIT 5""".stripMargin,
    "collection_matrix_endpoint" ->
      """WITH s AS (SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v
        |           FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |           WHERE e.vec_id < 20),
        |p AS (SELECT a.id AS id_a, b.id AS id_b,
        |             round(list_dot_product(a.v, b.v), 6) AS score
        |      FROM s a JOIN s b ON a.id != b.id),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY id_a ORDER BY score DESC, id_b ASC) AS rn
        |      FROM p)
        |SELECT id_a, id_b, score FROM r WHERE rn <= 3
        |ORDER BY id_a ASC, score DESC, id_b ASC""".stripMargin,
  )
}
