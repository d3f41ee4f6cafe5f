package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.Tables
import graft.model._
import graft.ops.Search
import graft.sources.{CollectionConfig, VectorConfig}
import graft.storage.Collection

/** End-to-end multi-operator scenarios — the reference's black-box API
  * flows (`tests/openapi/test_query.py`, `test_filter.py`,
  * `test_update_points.py` chain create → upsert → index → filtered query →
  * payload mutation → re-query against one live collection) re-expressed as
  * catalog entries whose DuckDB oracle reproduces the WHOLE chain
  * relationally over the source parquet. The per-operator catalogs prove
  * each op in isolation; these prove the ops compose on evolving state.
  */
object ScenarioQueries {

  private def sane(dir: String) = dir.replaceAll("[^A-Za-z0-9]", "_")

  /** embeddings ⋈ documents: points with a real vector AND a rich payload. */
  private def points(s: SparkSession, dir: String, pred: org.apache.spark.sql.Column,
      sourceOverride: Option[String] = None): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    val d = Tables.load(s, dir, "documents")
    val src = sourceOverride.map(lit).getOrElse(col("source"))
    e.join(d, e("vec_id") === d("doc_id"))
      .filter(pred)
      .select(col("vec_id").as("id"), col("embedding").as("vector"),
        to_json(struct(col("lang"), src.as("source"), col("n_chars"))).as("payload"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // create → upsert (replace+insert) → delete-by-filter → set_payload →
    // filtered KNN re-query over the final state (test_query.py flow).
    "scenario_search_lifecycle" -> ((s, dir) => {
      val cfg = CollectionConfig(
        idCol = "id", payloadCol = "payload",
        vectors = Seq(VectorConfig("", 64, Dot)),
        payloadTypes = Map("lang" -> StringType, "source" -> StringType,
          "n_chars" -> LongType, "flag" -> StringType))
      val path = s"/tmp/graft_runtime/scen_search_${sane(dir)}"
      val coll = Collection.create(s, path, cfg, points(s, dir, col("vec_id") < 200))
      // replace 100-119, insert 200-219, all tagged source='u2'
      coll.upsert(points(s, dir,
        (col("vec_id") >= 100 && col("vec_id") < 120) ||
          (col("vec_id") >= 200 && col("vec_id") < 220), Some("u2")))
      // drop German docs
      coll.deleteByFilter(Filter.mustAll(MatchValue("lang", "de")))
      // tag long docs
      coll.setPayload("""{"flag":"hot"}""",
        get_json_object(col("payload"), "$.n_chars").cast("long") >= 300)
      // filtered KNN over the final state: English docs, dot vs embedding 7
      val q = Tables.embeddingOf(s, dir, 7L)
      val df = coll.read()
        .withColumn("source", get_json_object(col("payload"), "$.source"))
        .withColumn("flag", get_json_object(col("payload"), "$.flag"))
      val pred = new graft.filters.FilterCompiler(coll.resolver(df))
        .compile(Filter.mustAll(MatchValue("lang", "en")))
      Search.scoredTopK(df, "id",
        Search.scoreExpr(Dot, col("vector"), typedLit(q)), largerBetter = true,
        filter = Some(pred), k = 10, extraCols = Seq("source", "flag"))
    }),
    // create → conditional upsert → delete payload keys → build payload
    // index → index-filtered aggregation re-query (test_filter.py flow:
    // mutations first, the index built over the mutated state, the final
    // read planning through the typed index column).
    "scenario_index_lifecycle" -> ((s, dir) => {
      val cfg = CollectionConfig(
        idCol = "id", payloadCol = "payload",
        vectors = Seq(VectorConfig("", 64, Dot)),
        payloadTypes = Map("lang" -> StringType, "source" -> StringType,
          "n_chars" -> LongType))
      val path = s"/tmp/graft_runtime/scen_index_${sane(dir)}"
      val coll = Collection.create(s, path, cfg, points(s, dir, col("vec_id") < 300))
      // replace 250-299 only where the existing point is English; insert 300-349
      coll.upsertConditional(
        points(s, dir, col("vec_id") >= 250 && col("vec_id") < 350, Some("cond")),
        Filter.mustAll(MatchValue("lang", "en")))
      // drop the lang key for ids < 50
      coll.deletePayloadKeys(Seq("lang"), col("id") < 50)
      // typed projection index over the mutated state, then an
      // index-filtered group-by (the filter compiles against idx_n_chars
      // and pushes to the parquet scan — PlanSpec asserts the pushdown)
      coll.buildPayloadIndex("n_chars")
      val df = coll.read()
      val pred = new graft.filters.FilterCompiler(
        new graft.filters.TypedResolver(df.schema, "id"))
        .compile(Filter.mustAll(RangeCond("idx_n_chars", gte = Some(200L))))
      df.filter(pred)
        .withColumn("lang", get_json_object(col("payload"), "$.lang"))
        .withColumn("source", get_json_object(col("payload"), "$.source"))
        .groupBy("lang", "source").agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang").asc_nulls_first, col("source"), col("cnt"))
    }),
    // create (two named vectors) → update vector by filter → delete named
    // vector by filter → KNN re-query whose filter (HasVector) and scores
    // both observe the vector mutations (test_update_points.py flow).
    "scenario_vector_lifecycle" -> ((s, dir) => {
      val cfg = CollectionConfig(
        idCol = "id", payloadCol = "payload",
        vectors = Seq(VectorConfig("", 64, Dot), VectorConfig("alt", 64, Dot)))
      val path = s"/tmp/graft_runtime/scen_vec_${sane(dir)}"
      val e = Tables.load(s, dir, "embeddings")
      val coll = Collection.create(s, path, cfg,
        e.filter(col("vec_id") < 150)
          .select(col("vec_id").as("id"), col("embedding").as("vector"),
            reverse(col("embedding")).as("vector_alt"),
            to_json(struct(col("label"))).as("payload")))
      // double the primary vector for ids < 30 (×2 is exact in fp, so the
      // oracle can scale the dot product instead of re-encoding vectors)
      coll.updateVector("", transform(col("vector"), x => x * lit(2.0f)),
        col("id") < 30)
      // drop the alt vector for ids 10-19
      coll.deleteVector("alt", col("id") >= 10 && col("id") < 20)
      // re-query: dot KNN on the primary vector, restricted to points that
      // still HAVE the alt vector — ids 10-19 must be excluded, ids < 30
      // must score doubled
      val q = Tables.embeddingOf(s, dir, 7L)
      coll.knn("", q, filter = Some(Filter.mustAll(HasVector("alt"))), k = 10)
    }),
  )

  val oracles: Map[String, String] = Map(
    "scenario_search_lifecycle" ->
      """WITH pts AS (SELECT e.vec_id AS id, e.embedding, d.lang, d.source, d.n_chars
        |             FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
        |seed AS (SELECT * FROM pts WHERE id < 200),
        |up AS (SELECT id, embedding, lang, 'u2' AS source, n_chars FROM pts
        |       WHERE (id >= 100 AND id < 120) OR (id >= 200 AND id < 220)),
        |m1 AS (SELECT * FROM up
        |       UNION ALL
        |       SELECT s.* FROM seed s WHERE s.id NOT IN (SELECT id FROM up)),
        |m2 AS (SELECT * FROM m1 WHERE NOT lang = 'de'),
        |m3 AS (SELECT id, embedding, lang, source, n_chars,
        |         CASE WHEN n_chars >= 300 THEN 'hot' END AS flag FROM m2),
        |q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7)
        |SELECT m3.id AS id,
        |       round(list_dot_product(m3.embedding::DOUBLE[], q.v), 6) AS score,
        |       m3.source AS source, m3.flag AS flag
        |FROM m3, q WHERE m3.lang = 'en'
        |ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,
    "scenario_index_lifecycle" ->
      """WITH pts AS (SELECT e.vec_id AS id, d.lang, d.source, d.n_chars
        |             FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
        |seed AS (SELECT * FROM pts WHERE id < 300),
        |cond AS (SELECT id, lang, 'cond' AS source, n_chars FROM pts
        |         WHERE id >= 250 AND id < 350),
        |m1 AS (SELECT c.* FROM cond c
        |       WHERE c.id IN (SELECT id FROM seed WHERE lang = 'en')
        |          OR c.id NOT IN (SELECT id FROM seed)
        |       UNION ALL
        |       SELECT s.* FROM seed s
        |       WHERE NOT (s.lang = 'en' AND s.id IN (SELECT id FROM cond))),
        |m2 AS (SELECT id, CASE WHEN id < 50 THEN NULL ELSE lang END AS lang,
        |              source, n_chars FROM m1)
        |SELECT lang, source, count(*) AS cnt FROM m2 WHERE n_chars >= 200
        |GROUP BY lang, source
        |ORDER BY lang ASC NULLS FIRST, source, cnt""".stripMargin,
    "scenario_vector_lifecycle" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7)
        |SELECT e.vec_id AS id,
        |  round(CASE WHEN e.vec_id < 30 THEN 2 * list_dot_product(e.embedding::DOUBLE[], q.v)
        |             ELSE list_dot_product(e.embedding::DOUBLE[], q.v) END, 6) AS score
        |FROM embeddings e, q
        |WHERE e.vec_id < 150 AND NOT (e.vec_id >= 10 AND e.vec_id < 20)
        |ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,
  )
}
