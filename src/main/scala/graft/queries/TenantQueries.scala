package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.Tables
import graft.sources.{CollectionConfig, VectorConfig}
import graft.storage.Collection
import graft.model.Dot

/** Tenant / principal storage-layout catalog (SURVEY.md §2.5 index params;
  * reference `KeywordIndexParams.is_tenant` / `IntegerIndexParams
  * .is_principal`, `lib/segment/src/data_types/index.rs:32,149`): declared
  * tenant fields bucket the PHYSICAL partitioning
  * (`tenantb_<field> = xxhash64(value) % 64`) so a must-match on the field
  * prunes 63/64 of the table at the directory level, and principal fields
  * order rows within write tasks so range scans prune row groups — the
  * Spark analog of the reference optimizer's defragmentation pass
  * (`lib/shard/src/optimize.rs:253-268`, `segment_builder.rs:279-340`).
  *
  * Every entry here is a plain data-correctness oracle over the laid-out
  * collection (the layout must never change results); the plan-level
  * pruning itself is pinned by PlanSpec ("tenant filter reaches
  * PartitionFilters") and the layout bounds by StoreSpec.
  */
object TenantQueries {

  private val colls = new ConcurrentHashMap[String, Collection]()

  private val cfg = CollectionConfig(
    idCol = "id", payloadCol = "payload",
    vectors = Seq(VectorConfig("", 64, Dot)),
    payloadTypes = Map(
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    tenantKeys = Seq("source"),
    principalKeys = Seq("n_chars"))

  /** documents ⋈ embeddings as a tenant-declared collection: `source` is
    * the tenant key (20 tenants in the fixture data), `n_chars` the
    * principal ordering field. */
  private[graft] def tenantColl(s: SparkSession, dir: String): Collection = {
    val path = "/tmp/graft_runtime/tenantcoll_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
    colls.computeIfAbsent(path, { _ =>
      val d = Tables.load(s, dir, "documents")
      val e = Tables.load(s, dir, "embeddings")
      val pts = e.join(d, e("vec_id") === d("doc_id"))
        .select(e("vec_id").as("id"), e("embedding").as("vector"),
          to_json(struct(d("lang"), d("source"), d("n_chars"))).as("payload"))
      Collection.create(s, path, cfg, pts)
    })
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact count under a tenant must-match: the filter prunes to the
    // value's hash bucket (+ the −1 irregular bucket) BEFORE any row is
    // read; the result must equal the full-scan oracle. dirs_ok pins the
    // physical layout — tenantb_source=NN partition directories on disk,
    // the thing the prune skips at 100 TB.
    "tenant_filtered_count" -> ((s, dir) => {
      val coll = tenantColl(s, dir)
      val dirOk = {
        val fs = new java.io.File(coll.path).listFiles()
        fs != null && fs.exists(_.getName.startsWith("tenantb_source="))
      }
      coll.count(
        """{"filter": {"must": [
          |  {"key": "source", "match": {"value": "src3"}}]},
          |  "exact": true}""".stripMargin)
        .withColumn("dirs_ok", lit(dirOk))
    }),
    // KNN under a tenant filter — the searched rows stream out of the
    // pruned buckets only; scores/order must match the brute-force oracle
    // exactly (pruning is a relaxation conjunct, never a semantics change)
    "tenant_filtered_knn" -> ((s, dir) => {
      val coll = tenantColl(s, dir)
      val q = Tables.embeddingOf(s, dir, 7L)
      coll.query(
        s"""{"query": {"nearest": ${q.mkString("[", ",", "]")}},
           |  "filter": {"must": [
           |    {"key": "source", "match": {"any": ["src2", "src7"]}}]},
           |  "limit": 10}""".stripMargin)
    }),
    // tenant match AND principal range combined: directory prune on the
    // bucket, row-group prune on the principal sort within it
    "tenant_principal_range" -> ((s, dir) => {
      tenantColl(s, dir).count(
        """{"filter": {"must": [
          |  {"key": "source", "match": {"value": "src5"}},
          |  {"key": "n_chars", "range": {"gte": 150, "lt": 400}}]},
          |  "exact": true}""".stripMargin)
    }),
    // scroll page under the tenant filter: payload rides intact through
    // the bucketed layout and internal layout columns (tenantb_*) never
    // reach the API surface
    "tenant_scroll_page" -> ((s, dir) => {
      val page = tenantColl(s, dir).scroll(
        """{"limit": 12, "with_payload": true,
          |  "filter": {"must": [
          |    {"key": "source", "match": {"value": "src4"}}]}}""".stripMargin)
      page.select(col("id"),
        get_json_object(col("payload"), "$.lang").as("lang"),
        get_json_object(col("payload"), "$.n_chars").cast("long").as("n_chars"),
        lit(!page.columns.exists(_.startsWith("tenantb_")))
          .as("no_internal_cols"))
    }),
    // Field-index creation through the WIRE with is_tenant/is_principal
    // (`PUT /collections/{c}/index`; `data_types/index.rs:32,149`): the
    // parsed flags re-lay an UNDECLARED collection out in one rewrite
    // (tenant directories appear), counts are unchanged, and the codec
    // rejects the flags on index kinds that don't carry them (keyword/uuid
    // for is_tenant, integer/float/datetime for is_principal — the
    // reference 400s these at the API boundary).
    "api_field_index_tenant" -> ((s, dir) => {
      import graft.api.RequestCodec
      val path = "/tmp/graft_runtime/tenantwire_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val coll = colls.computeIfAbsent(path, { _ =>
        val d = Tables.load(s, dir, "documents")
        val plain = Collection.create(s, path,
          cfg.copy(vectors = Nil, tenantKeys = Nil, principalKeys = Nil),
          d.select(d("doc_id").as("id"),
            to_json(struct(d("lang"), d("source"), d("n_chars")))
              .as("payload")))
        val (f1, _, _, fl1) = RequestCodec.parseFieldIndexRequest(
          """{"field_name": "source",
            |  "field_schema": {"type": "keyword", "is_tenant": true}}"""
            .stripMargin)
        val step1 = plain.buildPayloadIndex(f1, fl1)
        val (f2, _, _, fl2) = RequestCodec.parseFieldIndexRequest(
          """{"field_name": "n_chars",
            |  "field_schema": {"type": "integer", "is_principal": true}}"""
            .stripMargin)
        step1.buildPayloadIndex(f2, fl2)
      })
      def rejected(body: String): Boolean =
        try { RequestCodec.parseFieldIndexRequest(body); false }
        catch { case _: IllegalArgumentException => true }
      val dirOk = {
        val fs = new java.io.File(coll.path).listFiles()
        fs != null && fs.exists(_.getName.startsWith("tenantb_source="))
      }
      coll.count(
        """{"filter": {"must": [
          |  {"key": "source", "match": {"value": "src1"}}]},
          |  "exact": true}""".stripMargin)
        .withColumn("dirs_ok", lit(dirOk))
        .withColumn("idx_ok", lit(coll.read().columns.contains("idx_source") &&
          coll.read().columns.contains("idx_n_chars")))
        .withColumn("tenant_on_int_rejected", lit(rejected(
          """{"field_name": "x",
            |  "field_schema": {"type": "integer", "is_tenant": true}}"""
            .stripMargin)))
        .withColumn("principal_on_keyword_rejected", lit(rejected(
          """{"field_name": "x",
            |  "field_schema": {"type": "keyword", "is_principal": true}}"""
            .stripMargin)))
        // integer-index capability validation: lookup and range can't BOTH
        // be disabled (`test_payload_indexing.py:13-29`)
        .withColumn("lookup_range_both_off_rejected", lit(rejected(
          """{"field_name": "x",
            |  "field_schema": {"type": "integer",
            |    "lookup": false, "range": false}}""".stripMargin)))
        .withColumn("lookup_only_ok", lit(!rejected(
          """{"field_name": "x",
            |  "field_schema": {"type": "integer",
            |    "lookup": true, "range": false}}""".stripMargin)))
    }),
  )

  val oracles: Map[String, String] = Map(
    "tenant_filtered_count" ->
      """SELECT count(*)::BIGINT AS cnt, TRUE AS dirs_ok
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |WHERE d.source = 'src3'""".stripMargin,
    "tenant_filtered_knn" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7)
        |SELECT e.vec_id AS id,
        |       round(list_dot_product(e.embedding::DOUBLE[], q.v), 6) AS score
        |FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id, q
        |WHERE d.source IN ('src2', 'src7')
        |ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,
    "tenant_principal_range" ->
      """SELECT count(*)::BIGINT AS cnt
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |WHERE d.source = 'src5' AND d.n_chars >= 150 AND d.n_chars < 400"""
        .stripMargin,
    "tenant_scroll_page" ->
      """SELECT d.doc_id AS id, d.lang AS lang, d.n_chars::BIGINT AS n_chars,
        |       TRUE AS no_internal_cols
        |FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |WHERE d.source = 'src4' ORDER BY id ASC LIMIT 12""".stripMargin,
    "api_field_index_tenant" ->
      """SELECT count(*)::BIGINT AS cnt, TRUE AS dirs_ok, TRUE AS idx_ok,
        |       TRUE AS tenant_on_int_rejected,
        |       TRUE AS principal_on_keyword_rejected,
        |       TRUE AS lookup_range_both_off_rejected,
        |       TRUE AS lookup_only_ok
        |FROM documents WHERE source = 'src1'""".stripMargin,
  )
}
