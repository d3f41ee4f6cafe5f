package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.Tables
import graft.model._
import graft.sources.{CollectionConfig, VectorConfig}
import graft.storage.{Aliases, Collection}

/** Mutation (write-surface) round-trip catalog, SURVEY.md §2.1: upsert,
  * conditional upsert, delete-by-filter, payload set/delete-keys — applied
  * to a scratch collection under /tmp and read back, with a DuckDB oracle
  * reproducing the same sequence relationally over the source parquet.
  * This is the oracle-checked coverage for the Collection write API
  * (StoreSpec covers the same ops property-style).
  */
object StorageQueries {

  private val cfg = CollectionConfig(
    idCol = "id",
    payloadCol = "payload",
    payloadTypes = Map(
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType))

  /** documents rows as collection points: id + JSON payload. */
  private def points(s: SparkSession, dir: String, wherePred: org.apache.spark.sql.Column,
      sourceOverride: Option[String] = None): DataFrame = {
    val d = Tables.load(s, dir, "documents").filter(wherePred)
    val src = sourceOverride.map(lit).getOrElse(col("source"))
    d.select(col("doc_id").as("id"),
      to_json(struct(col("lang"), src.as("source"), col("n_chars"))).as("payload"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Streaming == batch parity for near-dup ingest (the §2.7 gap flagged in
    // r7: spec-only evidence). The documents corpus is replayed in three
    // id-ordered micro-batches through nearDupUpsertStream (fresh collection,
    // fresh band-key store), then the kept set is compared to the BATCH
    // operator over the same corpus: band-candidate pairs (threshold 0 —
    // exactly the streaming candidate edges, band index is mixed into bkey)
    // → connected components → keep-min-per-component. The one-row contract
    // the oracle asserts: stream kept something, counts match, kept sets are
    // identical. The driver-side collect is the replay harness, bounded by
    // the parity corpus (|documents| at the verify SF).
    "streaming_neardup_parity" -> ((s, dir) => {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft_sndp")
      val corpus = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("id"), col("text").as("payload"))
      val coll = Collection.create(s, base.resolve("coll").toString,
        CollectionConfig(idCol = "id", payloadCol = "payload"),
        corpus.limit(0))
      val stream = MemoryStream[(Long, String)]
      val q = graft.streaming.Streaming.nearDupUpsertStream(
        stream.toDF().toDF("id", "payload"), coll, "id", "payload",
        base.resolve("keys").toString, base.resolve("ckpt").toString,
        trigger = Trigger.ProcessingTime(0))
      val rows = corpus.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      rows.grouped(math.max(1, (rows.length + 2) / 3)).foreach { b =>
        stream.addData(b); q.processAllAvailable()
      }
      q.stop()
      val streamKept = coll.read().select("id")
      val pairs = graft.pipeline.Dedup.minhashLshPairs(corpus, "id", "payload",
        k = 3, bands = 16, rowsPerBand = 4, threshold = 0.0)
      val batchKept = graft.pipeline.Dedup
        .nearDupRepresentatives(corpus, "id", pairs)
        .filter(col("keep") === 1).select("id")
      val nS = streamKept.count(); val nB = batchKept.count()
      val setsEqual =
        streamKept.join(batchKept, Seq("id"), "left_anti").count() == 0 &&
          batchKept.join(streamKept, Seq("id"), "left_anti").count() == 0
      Seq((nS > 0, nS == nB, setsEqual))
        .toDF("nonempty_ok", "counts_ok", "sets_ok")
    }),
    "mutation_pipeline" -> ((s, dir) => {
      val path = "/tmp/graft_runtime/mut_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      // 1. seed: docs id < 150
      val coll = Collection.create(s, path, cfg,
        points(s, dir, col("doc_id") < 150))
      // 2. upsert ids 140..159 with source='upserted' (140-149 replace,
      //    150-159 insert)
      coll.upsert(points(s, dir,
        col("doc_id") >= 140 && col("doc_id") < 160, Some("upserted")))
      // 3. conditional upsert ids < 60 with source='cond', only where the
      //    existing point has lang='en'
      coll.upsertConditional(
        points(s, dir, col("doc_id") < 60, Some("cond")),
        Filter.mustAll(MatchValue("lang", "en")))
      // 4. delete all German docs
      coll.deleteByFilter(Filter.mustAll(MatchValue("lang", "de")))
      // 5. tag long docs via payload merge
      coll.setPayload("""{"flag":"hot"}""",
        get_json_object(col(cfg.payloadCol), "$.n_chars").cast("long") >= 300)
      // 6. drop the lang key for ids < 10
      coll.deletePayloadKeys(Seq("lang"), col(cfg.idCol) < 10)
      coll.read()
        .select(col("id"),
          get_json_object(col("payload"), "$.lang").as("lang"),
          get_json_object(col("payload"), "$.source").as("source"),
          get_json_object(col("payload"), "$.n_chars").cast("long").as("n_chars"),
          get_json_object(col("payload"), "$.flag").as("flag"))
        .orderBy(col("id"))
    }),
    // Collection lifecycle (`collection_meta_ops.rs:45-135`): catalog
    // create (duplicate rejected) → list → exists → open-by-alias with the
    // PERSISTED _config.json (declared payload types survive the reopen and
    // compile a typed filter) → delete with alias cascade → idempotent
    // delete-of-missing.
    "collection_lifecycle" -> ((s, dir) => {
      import s.implicits._
      val root = "/tmp/graft_runtime/catalog_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val cat = new graft.storage.Catalog(s, root)
      cat.create("docs_a", cfg, points(s, dir, col("doc_id") < 100))
      cat.create("docs_b", cfg, points(s, dir, col("doc_id") >= 100 && col("doc_id") < 150))
      cat.aliases.create("prod", "docs_a")
      val listOk = cat.list() == Seq("docs_a", "docs_b")
      val existsOk = cat.exists("docs_a") && !cat.exists("nope")
      // open through the ALIAS; config comes from the persisted sidecar
      val opened = cat.get("prod")
      val nA = opened.read().count()
      val pred = new graft.filters.FilterCompiler(opened.resolver(opened.read()))
        .compile(Filter.mustAll(MatchValue("lang", "en")))
      val nEn = opened.read().filter(pred).count()
      val dupRejected =
        try { cat.create("docs_a", cfg, points(s, dir, col("doc_id") < 1)); false }
        catch { case _: IllegalArgumentException => true }
      val delOk = cat.delete("docs_a")
      val cascadeOk = !cat.aliases.exists("prod")
      val goneOk = !cat.exists("docs_a") && cat.list() == Seq("docs_b")
      val delMissing = !cat.delete("docs_a")
      Seq((nA, nEn, listOk, existsOk, dupRejected, delOk, cascadeOk, goneOk, delMissing))
        .toDF("n_a", "n_en", "list_ok", "exists_ok", "dup_rejected",
          "delete_ok", "cascade_ok", "gone_ok", "delete_missing_false")
    }),
    // Nested-payload mutation round-trip (the r9 corruption class): payload
    // carries nested objects, arrays and numbers through set_payload
    // (top-level merge + `key`-path merge, `SetPayloadOp.key`,
    // `payload_ops.rs:64-75`) → delete_payload with nested JsonPaths →
    // a compiled NESTED filter (`json_path/mod.rs:344-439` semantics).
    // Value TYPES must survive every step: `$.meta.n_chars` stays a JSON
    // number, `$.tags` stays an array, `$.meta` stays an object.
    "set_payload_nested" -> ((s, dir) => {
      val path = "/tmp/graft_runtime/spn_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val d = Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
      val pts = d.select(col("doc_id").as("id"),
        to_json(struct(
          col("lang"),
          struct(col("n_chars"), col("source")).as("meta"),
          array(col("lang"), col("source")).as("tags"))).as("payload"))
      val coll = Collection.create(s, path,
        CollectionConfig(idCol = "id", payloadCol = "payload"), pts)
      // top-level merge adding a string AND a number
      coll.setPayload("""{"flag":"hot","rank":7}""",
        get_json_object(col("payload"), "$.meta.n_chars").cast("long") >= 300)
      // key-path merge INTO the nested object
      coll.setPayload("""{"grade":"a"}""", col("id") < 50, Some("meta"))
      // nested JsonPath deletes: a nested key and a whole array's elements
      coll.deletePayloadKeys(Seq("meta.source", "tags[]"), col("id") < 20)
      val df = coll.read()
      val pred = new graft.filters.FilterCompiler(coll.resolver(df)).compile(
        Filter.mustAll(
          MatchValue("meta.grade", "a"),
          RangeCond("meta.n_chars", gte = Some(300L))))
      df.select(col("id"),
          get_json_object(col("payload"), "$.lang").as("lang"),
          get_json_object(col("payload"), "$.meta.n_chars").cast("long").as("n_chars"),
          get_json_object(col("payload"), "$.meta.grade").as("grade"),
          get_json_object(col("payload"), "$.meta.source").as("src"),
          get_json_object(col("payload"), "$.flag").as("flag"),
          get_json_object(col("payload"), "$.rank").cast("long").as("rank"),
          get_json_object(col("payload"), "$.tags[1]").as("tag1"),
          coalesce(pred, lit(false)).as("hot_graded"))
        .orderBy(col("id"))
    }),
    // Facet over an ARRAY payload field after the same nested mutations,
    // filtered by the key-path-merged nested key — arrays must still fan
    // out per element and the nested filter must still type-match.
    "set_payload_nested_facet" -> ((s, dir) => {
      val path = "/tmp/graft_runtime/spnf_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val d = Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
      val pts = d.select(col("doc_id").as("id"),
        to_json(struct(
          col("lang"),
          struct(col("n_chars"), col("source")).as("meta"),
          array(col("lang"), col("source")).as("tags"))).as("payload"))
      val coll = Collection.create(s, path,
        CollectionConfig(idCol = "id", payloadCol = "payload"), pts)
      coll.setPayload("""{"grade":"a"}""", col("id") < 50, Some("meta"))
      coll.deletePayloadKeys(Seq("tags[]"), col("id") < 20)
      val df = coll.read()
      graft.ops.Reads.facet(df, "id", "tags",
        Some(Filter.mustAll(MatchValue("meta.grade", "a"))),
        coll.resolver(df), limit = 20)
    }),
    // Ordered heterogeneous batch (points/batch analog): five mixed ops
    // folded into ONE atomic table write; op order is observable (the final
    // upsert re-creates payloads whose source key an earlier op deleted).
    "batch_update_ops" -> ((s, dir) => {
      import graft.storage.UpdateOp._
      val path = "/tmp/graft_runtime/batch_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val coll = Collection.create(s, path, cfg,
        points(s, dir, col("doc_id") < 150))
      coll.applyBatch(Seq(
        Upsert(points(s, dir,
          col("doc_id") >= 90 && col("doc_id") < 110, Some("b1"))),
        SetPayload("""{"flag":"x"}""",
          get_json_object(col(cfg.payloadCol), "$.n_chars").cast("long") >= 300),
        DeleteByFilter(Filter.mustAll(MatchValue("lang", "de"))),
        DeletePayloadKeys(Seq("source"), col(cfg.idCol) < 20),
        Upsert(points(s, dir, col("doc_id") < 10, Some("b2")))))
      coll.read()
        .select(col("id"),
          get_json_object(col("payload"), "$.lang").as("lang"),
          get_json_object(col("payload"), "$.source").as("source"),
          get_json_object(col("payload"), "$.n_chars").cast("long").as("n_chars"),
          get_json_object(col("payload"), "$.flag").as("flag"))
        .orderBy(col("id"))
    }),
    // Upsert admission modes (`UpdateMode`, `point_ops.rs:34-42`;
    // `tests/openapi/test_update_mode.py`): insert_only skips existing ids,
    // update_only skips new ids, and update_only + update_filter keeps only
    // existing points matching the filter (`update/points/upsert.rs:60-95`).
    "upsert_update_modes" -> ((s, dir) => {
      import graft.storage.UpdateMode
      val path = "/tmp/graft_runtime/upmode_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      // 1. seed: docs id < 100
      val coll = Collection.create(s, path, cfg,
        points(s, dir, col("doc_id") < 100))
      // 2. insert_only ids 80..119 source='ins' → only 100..119 insert
      coll.upsert(points(s, dir,
        col("doc_id") >= 80 && col("doc_id") < 120, Some("ins")),
        UpdateMode.InsertOnly)
      // 3. update_only ids 90..129 source='upd' → only 90..119 update
      coll.upsert(points(s, dir,
        col("doc_id") >= 90 && col("doc_id") < 130, Some("upd")),
        UpdateMode.UpdateOnly)
      // 4. update_only + filter lang='en', ids < 40 source='cu'
      //    → only existing en-docs among 0..39 update
      coll.upsertConditional(
        points(s, dir, col("doc_id") < 40, Some("cu")),
        Filter.mustAll(MatchValue("lang", "en")),
        UpdateMode.UpdateOnly)
      coll.read()
        .select(col("id"),
          get_json_object(col("payload"), "$.lang").as("lang"),
          get_json_object(col("payload"), "$.source").as("source"),
          get_json_object(col("payload"), "$.n_chars").cast("long").as("n_chars"))
        .orderBy(col("id"))
    }),
    // Wire form of the same surface: `update_mode` riding the upsert op of a
    // points/batch body (`PointsList.update_mode`, rest schema.rs:1485-1487),
    // including update_only + update_filter. Constant fixture → VALUES oracle.
    "api_upsert_update_mode" -> ((s, dir) => {
      import s.implicits._
      val path = "/tmp/graft_runtime/upmode_api_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val coll = Collection.create(s, path,
        CollectionConfig(idCol = "id", payloadCol = "payload",
          payloadTypes = Map("s" -> StringType)),
        Seq.empty[Long].toDF("id")
          .withColumn("payload", lit(null).cast("string")))
      graft.api.UpdateBridge.applyJson(coll,
        """{"operations": [
          |  {"upsert": {"points": [
          |    {"id": 1, "payload": {"s": "seed"}},
          |    {"id": 2, "payload": {"s": "seed"}}]}},
          |  {"upsert": {"update_mode": "insert_only", "points": [
          |    {"id": 2, "payload": {"s": "skip"}},
          |    {"id": 3, "payload": {"s": "ins"}}]}},
          |  {"upsert": {"update_mode": "update_only", "points": [
          |    {"id": 3, "payload": {"s": "upd"}},
          |    {"id": 4, "payload": {"s": "skip"}}]}},
          |  {"upsert": {"update_mode": "update_only",
          |    "update_filter": {"must": [{"key": "s", "match": {"value": "seed"}}]},
          |    "points": [
          |      {"id": 1, "payload": {"s": "cu"}},
          |      {"id": 3, "payload": {"s": "nocu"}}]}}
          |]}""".stripMargin)
      coll.read()
        .select(col("id"), get_json_object(col("payload"), "$.s").as("s"))
        .orderBy(col("id"))
    }),
    // Collection alias lifecycle (`alias_mapping.rs:16-135`,
    // `collection_meta_ops.rs:45-92`): create → query-through-alias →
    // re-point (create overwrites) → rename (old name unbinds) → list per
    // collection → drop-collection cascade → rename-of-missing fails.
    // The relational part of the oracle is the two through-alias counts;
    // the registry invariants are derived one-row contracts.
    "collection_aliases" -> ((s, dir) => {
      import s.implicits._
      val base = "/tmp/graft_runtime/alias_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      Collection.create(s, base + "/colA", cfg, points(s, dir, col("lang") === "en"))
      Collection.create(s, base + "/colB", cfg, points(s, dir, col("lang") === "de"))
      val reg = new Aliases(base)
      reg.list().foreach { case (a, _) => reg.delete(a) } // fresh re-runs
      def countVia(name: String): Long =
        new Collection(s, base + "/" + reg.resolve(name), cfg).read().count()
      reg.create("prod-docs", "colA")
      val nEn = countVia("prod-docs")
      reg.create("prod-docs", "colB") // re-point: create overwrites
      val nDe = countVia("prod-docs")
      reg.create("extra", "colB")
      reg.rename("prod-docs", "main-docs")
      val renameOk = reg.get("prod-docs").isEmpty && reg.resolve("main-docs") == "colB"
      val aliasesOfB = reg.collectionAliases("colB").mkString(",")
      val nDirect = countVia("colA") // a non-alias name passes through
      val nRemoved = reg.removeCollection("colB").toLong
      val renameMissingFails = scala.util.Try(reg.rename("gone", "x")).isFailure
      Seq((nEn, nDe, nDirect, renameOk, aliasesOfB, nRemoved,
          renameMissingFails, reg.list().isEmpty))
        .toDF("n_en", "n_de", "n_direct", "rename_ok", "aliases_of_b",
          "n_removed", "rename_missing_fails", "empty_after")
    }),
    // Collection-level metadata lifecycle (PATCH /collections/{c},
    // `tests/openapi/test_collection_metadata.py`): set → add second key →
    // overwrite first → delete second via explicit null; final state is
    // exactly {new_meta: value3}. State persists beside the table and
    // survives data rewrites.
    "collection_metadata" -> ((s, dir) => {
      import s.implicits._
      val path = "/tmp/graft_runtime/meta_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val coll = Collection.create(s, path, cfg, points(s, dir, col("doc_id") < 20))
      coll.updateMetadata(coll.metadata().map { case (k, _) => k -> None }) // fresh re-runs
      coll.updateMetadata(Map("new_meta" -> Some("value")))
      coll.updateMetadata(Map("new_meta_2" -> Some("value2")))
      coll.updateMetadata(Map("new_meta" -> Some("value3")))
      coll.updateMetadata(Map("new_meta_2" -> None))
      coll.deleteByFilter(Filter.mustAll(MatchValue("lang", "de"))) // rewrite keeps meta
      val m = coll.metadata()
      Seq((m.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","),
          m.size.toLong, coll.read().count()))
        .toDF("metadata", "n_keys", "points_count")
    }),
    // GET /collections/{c} statistics (`CollectionInfo`,
    // `lib/collection/src/operations/types.rs:215`): points_count,
    // indexed_vectors_count (non-null vector cells — the exact index is
    // the default), declared vector + payload-index schema, green status.
    "collection_info" -> ((s, dir) => {
      val path = "/tmp/graft_runtime/info_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      val e = Tables.load(s, dir, "embeddings")
      val d = Tables.load(s, dir, "documents")
      val pts = e.join(d, e("vec_id") === d("doc_id"))
        .select(col("vec_id").as("id"),
          when(col("vec_id") % 5 =!= 0, col("embedding")).as("vector"),
          to_json(struct(col("lang"), col("n_chars"))).as("payload"))
      val icfg = CollectionConfig(
        idCol = "id", payloadCol = "payload",
        vectors = Seq(VectorConfig("", 64, Dot)),
        payloadTypes = Map("lang" -> StringType, "n_chars" -> LongType))
      Collection.create(s, path, icfg, pts).info()
    }),
  )

  val oracles: Map[String, String] = Map(
    // streaming replay + hash family are not DuckDB-expressible — derived
    // one-row contract (see entry scaladoc), parity computed Spark-side
    "streaming_neardup_parity" ->
      "SELECT true AS nonempty_ok, true AS counts_ok, true AS sets_ok",
    "mutation_pipeline" ->
      """WITH seed AS (SELECT doc_id AS id, lang, source, n_chars
        |             FROM documents WHERE doc_id < 150),
        |up AS (SELECT doc_id AS id, lang, 'upserted' AS source, n_chars
        |       FROM documents WHERE doc_id >= 140 AND doc_id < 160),
        |m1 AS (SELECT * FROM up
        |       UNION ALL
        |       SELECT s.* FROM seed s WHERE s.id NOT IN (SELECT id FROM up)),
        |cond AS (SELECT doc_id AS id, lang, 'cond' AS source, n_chars
        |         FROM documents WHERE doc_id < 60),
        |m2 AS (SELECT c.* FROM cond c JOIN m1 ON m1.id = c.id AND m1.lang = 'en'
        |       UNION ALL
        |       SELECT m1.* FROM m1
        |       WHERE NOT (m1.lang = 'en' AND m1.id IN (SELECT id FROM cond))),
        |m3 AS (SELECT * FROM m2 WHERE NOT lang = 'de')
        |SELECT id,
        |  CASE WHEN id < 10 THEN NULL ELSE lang END AS lang,
        |  source,
        |  n_chars::BIGINT AS n_chars,
        |  CASE WHEN n_chars >= 300 THEN 'hot' END AS flag
        |FROM m3 ORDER BY id""".stripMargin,
    "collection_lifecycle" ->
      """SELECT
        |  (SELECT count(*) FROM documents WHERE doc_id < 100)::BIGINT AS n_a,
        |  (SELECT count(*) FROM documents
        |   WHERE doc_id < 100 AND lang = 'en')::BIGINT AS n_en,
        |  true AS list_ok, true AS exists_ok, true AS dup_rejected,
        |  true AS delete_ok, true AS cascade_ok, true AS gone_ok,
        |  true AS delete_missing_false""".stripMargin,
    "set_payload_nested" ->
      """WITH seed AS (SELECT doc_id AS id, lang, source, n_chars
        |              FROM documents WHERE doc_id < 100)
        |SELECT id, lang, n_chars::BIGINT AS n_chars,
        |  CASE WHEN id < 50 THEN 'a' END AS grade,
        |  CASE WHEN id < 20 THEN NULL ELSE source END AS src,
        |  CASE WHEN n_chars >= 300 THEN 'hot' END AS flag,
        |  (CASE WHEN n_chars >= 300 THEN 7 END)::BIGINT AS rank,
        |  CASE WHEN id < 20 THEN NULL ELSE source END AS tag1,
        |  (id < 50 AND n_chars >= 300) AS hot_graded
        |FROM seed ORDER BY id""".stripMargin,
    "set_payload_nested_facet" ->
      """WITH seed AS (SELECT doc_id AS id, lang, source
        |              FROM documents WHERE doc_id >= 20 AND doc_id < 50),
        |vals AS (SELECT id, lang AS value FROM seed
        |         UNION ALL SELECT id, source FROM seed)
        |SELECT value, count(DISTINCT id)::BIGINT AS cnt
        |FROM vals GROUP BY value
        |ORDER BY cnt DESC, value ASC LIMIT 20""".stripMargin,
    "upsert_update_modes" ->
      """WITH seed AS (SELECT doc_id AS id, lang, source, n_chars
        |              FROM documents WHERE doc_id < 100),
        |ins AS (SELECT doc_id AS id, lang, 'ins' AS source, n_chars
        |        FROM documents WHERE doc_id >= 80 AND doc_id < 120),
        |m1 AS (SELECT * FROM seed
        |       UNION ALL
        |       SELECT i.* FROM ins i WHERE i.id NOT IN (SELECT id FROM seed)),
        |upd AS (SELECT doc_id AS id, lang, 'upd' AS source, n_chars
        |        FROM documents WHERE doc_id >= 90 AND doc_id < 130),
        |m2 AS (SELECT u.* FROM upd u WHERE u.id IN (SELECT id FROM m1)
        |       UNION ALL
        |       SELECT m1.* FROM m1 WHERE m1.id NOT IN (SELECT id FROM upd)),
        |cu AS (SELECT doc_id AS id, lang, 'cu' AS source, n_chars
        |       FROM documents WHERE doc_id < 40),
        |m3 AS (SELECT c.* FROM cu c JOIN m2 ON m2.id = c.id AND m2.lang = 'en'
        |       UNION ALL
        |       SELECT m2.* FROM m2
        |       WHERE NOT (m2.lang = 'en' AND m2.id IN (SELECT id FROM cu)))
        |SELECT id, lang, source, n_chars::BIGINT AS n_chars
        |FROM m3 ORDER BY id""".stripMargin,
    "api_upsert_update_mode" ->
      """SELECT * FROM (VALUES (1, 'cu'), (2, 'seed'), (3, 'upd'))
        |AS t(id, s) ORDER BY id""".stripMargin,
    "batch_update_ops" ->
      """WITH seed AS (SELECT doc_id AS id, lang, source, n_chars
        |              FROM documents WHERE doc_id < 150),
        |b1 AS (SELECT doc_id AS id, lang, 'b1' AS source, n_chars
        |       FROM documents WHERE doc_id >= 90 AND doc_id < 110),
        |m1 AS (SELECT * FROM b1
        |       UNION ALL
        |       SELECT s.* FROM seed s WHERE s.id NOT IN (SELECT id FROM b1)),
        |m2 AS (SELECT id, lang, source, n_chars,
        |         CASE WHEN n_chars >= 300 THEN 'x' END AS flag FROM m1),
        |m3 AS (SELECT * FROM m2 WHERE NOT lang = 'de'),
        |m4 AS (SELECT id, lang,
        |         CASE WHEN id < 20 THEN NULL ELSE source END AS source,
        |         n_chars, flag FROM m3),
        |b2 AS (SELECT doc_id AS id, lang, 'b2' AS source, n_chars,
        |         CAST(NULL AS VARCHAR) AS flag
        |       FROM documents WHERE doc_id < 10),
        |m5 AS (SELECT * FROM b2
        |       UNION ALL
        |       SELECT m4.* FROM m4 WHERE m4.id NOT IN (SELECT id FROM b2))
        |SELECT id, lang, source, n_chars::BIGINT AS n_chars, flag
        |FROM m5 ORDER BY id""".stripMargin,
    "collection_aliases" ->
      """SELECT
        |  (SELECT count(*) FROM documents WHERE lang = 'en')::BIGINT AS n_en,
        |  (SELECT count(*) FROM documents WHERE lang = 'de')::BIGINT AS n_de,
        |  (SELECT count(*) FROM documents WHERE lang = 'en')::BIGINT AS n_direct,
        |  true AS rename_ok, 'extra,main-docs' AS aliases_of_b,
        |  2::BIGINT AS n_removed, true AS rename_missing_fails,
        |  true AS empty_after""".stripMargin,
    "collection_metadata" ->
      """SELECT 'new_meta=value3' AS metadata, 1::BIGINT AS n_keys,
        |  (SELECT count(*) FROM documents
        |   WHERE doc_id < 20 AND NOT lang = 'de')::BIGINT AS points_count""".stripMargin,
    "collection_info" ->
      """SELECT 'green' AS status,
        |  (SELECT count(*) FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id)::BIGINT AS points_count,
        |  (SELECT count(*) FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        |   WHERE e.vec_id % 5 <> 0)::BIGINT AS indexed_vectors_count,
        |  '<default>:64:Dot' AS vectors_schema,
        |  'lang:string,n_chars:bigint' AS payload_schema,
        |  true AS segments_ok""".stripMargin,
  )
}
