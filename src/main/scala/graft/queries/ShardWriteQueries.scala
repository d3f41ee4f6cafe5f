package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.sources.{CollectionConfig, VectorConfig}
import graft.storage.Collection

/** Shard-key WRITE surface catalog (VERDICT r11 #1 — the confirmed
  * silent-corruption class): the wire carries a shard key point-level on
  * `PointStruct` and body-level on every update op
  * (`lib/api/src/rest/schema.rs:1290-1479`); a custom-sharded collection
  * REJECTS writes that resolve no key (`shard_holder/mod.rs:436` "Shard
  * key not specified") and scopes selector ops to the selected shards.
  * Every entry reads its effects back through SHARD-SCOPED reads — the
  * exact path the r11 bug made silently wrong. */
object ShardWriteQueries {

  private def seedRows(s: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("vector", ArrayType(FloatType)),
      StructField("payload", StringType), StructField("shard_key", StringType)))
    val rows = java.util.Arrays.asList(
      Row(1L, Array(1.0f, 0.0f, 0.0f, 0.0f), """{"tag":"x"}""", "a"),
      Row(2L, Array(0.0f, 1.0f, 0.0f, 0.0f), """{"tag":"x"}""", "a"),
      Row(11L, Array(0.0f, 0.0f, 1.0f, 0.0f), """{"tag":"x"}""", "b"),
      Row(12L, Array(0.0f, 0.0f, 0.0f, 1.0f), """{"tag":"x"}""", "b"))
    s.createDataFrame(rows, schema)
  }

  private def shardCfg = CollectionConfig(idCol = "id",
    vectors = Seq(VectorConfig("", 4, graft.model.Dot)),
    payloadTypes = Map("tag" -> StringType),
    shardKeyCol = Some("shard_key"))

  private def freshColl(s: SparkSession, name: String): Collection =
    Collection.create(s, s"/tmp/graft_runtime/$name", shardCfg, seedRows(s))

  /** Read-only combined-prune fixtures, built once per JVM (the deployment
    * shape: layout + index at ingest, queries against the stored table) —
    * the mutation entries above keep their per-call rebuilds because the
    * write IS the operator under test there. */
  private val prunedColls =
    new java.util.concurrent.ConcurrentHashMap[String, Collection]()

  /** Same seed points, NO shard-key column — for fixtures whose semantics
    * are orthogonal to sharding (a custom-sharded collection rejects every
    * keyless update op, `shard_holder/mod.rs:429-438`). */
  private def freshPlain(s: SparkSession, name: String): Collection =
    Collection.create(s, s"/tmp/graft_runtime/$name",
      shardCfg.copy(shardKeyCol = None),
      seedRows(s).select(col("id"), col("vector"), col("payload")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Wire upsert into a shard-keyed collection: point 3 takes the BODY
    // shard key ("b", `PointsList.shard_key` applies to points lacking
    // their own), point 4's POINT-level key ("a") wins over the body's.
    // Each shard-scoped scroll must see exactly its points — the r11 bug
    // NULL-filled the partition column and made them vanish.
    "api_upsert_shard_key" -> ((s, dir) => {
      val coll = freshColl(s, "shardw_upsert")
      graft.api.UpdateBridge.applyJson(coll,
        """{"operations": [
          |  {"upsert": {"shard_key": "b", "points": [
          |    {"id": 3, "vector": [0.5, 0.5, 0.0, 0.0], "payload": {"tag": "w"}},
          |    {"id": 4, "vector": [0.0, 0.5, 0.5, 0.0], "shard_key": "a"}
          |  ]}}
          |]}""".stripMargin)
      def page(key: String): DataFrame = coll.scroll(
        s"""{"limit": 100, "with_payload": false, "shard_key": "$key"}""")
        .select(lit(key).as("shard"), col("id"))
      page("a").unionByName(page("b")).orderBy(col("shard"), col("id"))
    }),
    // Rejections: a keyless wire upsert into a custom-sharded collection,
    // a shard-keyed wire upsert into a PLAIN collection, a multi-key body
    // selector on upsert (each point lands on exactly one key), and a
    // TYPED batch missing the shard-key column (the unionByName-NULL-fill
    // hole, now a schema-level reject in mergeUpsert).
    "api_upsert_shard_key_reject" -> ((s, dir) => {
      import s.implicits._
      val coll = freshColl(s, "shardw_reject")
      val plainCfg = CollectionConfig(idCol = "id",
        vectors = Seq(VectorConfig("", 4, graft.model.Dot)))
      val plain = Collection.create(s, "/tmp/graft_runtime/shardw_plain", plainCfg,
        seedRows(s).select(col("id"), col("vector"), col("payload")))
      def rejects(body: => Unit, expect: String): (Boolean, Boolean) =
        try { body; (false, false) }
        catch { case ex: Exception =>
          (true, Option(ex.getMessage).exists(_.contains(expect))) }
      val rows = Seq(
        ("missing_key", rejects(graft.api.UpdateBridge.applyJson(coll,
          """{"operations": [{"upsert": {"points": [
            |  {"id": 9, "vector": [1.0, 0.0, 0.0, 0.0]}]}}]}""".stripMargin),
          "Shard key not specified")),
        ("non_sharded", rejects(graft.api.UpdateBridge.applyJson(plain,
          """{"operations": [{"upsert": {"points": [
            |  {"id": 9, "vector": [1.0, 0.0, 0.0, 0.0], "shard_key": "a"}]}}]}"""
            .stripMargin),
          "no shard-key column")),
        ("multi_key_body", rejects(graft.api.UpdateBridge.applyJson(coll,
          """{"operations": [{"upsert": {"shard_key": ["a", "b"], "points": [
            |  {"id": 9, "vector": [1.0, 0.0, 0.0, 0.0]}]}}]}""".stripMargin),
          "single key")),
        ("typed_missing_column", rejects(coll.applyBatch(Seq(
          graft.storage.UpdateOp.Upsert(
            seedRows(s).filter(col("id") === 1L)
              .select(col("id"), col("vector"), col("payload"))))),
          "Shard key not specified")),
        // a NON-NUMERIC wire shard key on an INT-sharded collection
        // surfaces as the wire-shaped bad request, not a raw
        // NumberFormatException (the reference validates shard-key types
        // at the API layer)
        ("int_shard_non_numeric", {
          val intSchema = StructType(Seq(
            StructField("id", LongType), StructField("vector", ArrayType(FloatType)),
            StructField("payload", StringType), StructField("shard_key", LongType)))
          val intRows = java.util.Arrays.asList(
            Row(1L, Array(1.0f, 0.0f, 0.0f, 0.0f), """{"tag":"x"}""", 10L),
            Row(2L, Array(0.0f, 1.0f, 0.0f, 0.0f), """{"tag":"x"}""", 20L))
          val intColl = Collection.create(s, "/tmp/graft_runtime/shardw_int",
            shardCfg, s.createDataFrame(intRows, intSchema))
          val bad = rejects(graft.api.UpdateBridge.applyJson(intColl,
            """{"operations": [{"upsert": {"points": [
              |  {"id": 3, "vector": [1.0, 0.0, 0.0, 0.0], "shard_key": "a"}]}}]}"""
              .stripMargin),
            "Bad request: Shard key a is not a number")
          // a NUMERIC wire key on the int-sharded table must land in its
          // partition (the coercion handles the inferred IntegerType
          // partition column — a String leak would silently corrupt it)
          graft.api.UpdateBridge.applyJson(intColl,
            """{"operations": [{"upsert": {"points": [
              |  {"id": 3, "vector": [0.5, 0.5, 0.0, 0.0], "shard_key": 10}]}}]}"""
              .stripMargin)
          val scoped = intColl.scroll(
            """{"limit": 100, "with_payload": false, "shard_key": 10}""")
            .collect().map(_.getLong(0)).sorted.toSeq
          (bad._1 && scoped == Seq(1L, 3L), bad._2)
        }))
      // the failed ops must not have mutated the table
      val intact = coll.read().count() == 4L && plain.read().count() == 4L
      rows.map { case (n, (rej, msg)) => (n, rej, msg, intact) }
        .toDF("check_name", "rejected", "msg_ok", "table_intact")
    }),
    // Delete-selector precedence: `PointsSelector` is serde-UNTAGGED with
    // the id-list variant FIRST (`point_ops.rs:19-26`), so a body carrying
    // BOTH `points` and `filter` deletes BY IDS (the extra field is
    // ignored) — the trap arm is a filter matching OTHER points that must
    // all survive.
    "api_delete_points_precedence" -> ((s, dir) => {
      // a PLAIN collection: selector precedence is orthogonal to sharding
      // (and a keyless update on a custom-sharded collection now rejects —
      // `shard_holder/mod.rs:429-438`)
      val coll = freshPlain(s, "shardw_delprec")
      graft.api.UpdateBridge.applyJson(coll,
        """{"operations": [{"delete": {
          |  "points": [1],
          |  "filter": {"must": [{"key": "tag", "match": {"value": "x"}}]}
          |}}]}""".stripMargin)
      coll.read().select(col("id"),
          get_json_object(col("payload"), "$.tag").as("tag"))
        .orderBy(col("id"))
    }),
    // Vector DIMENSION validation (`OperationError::WrongVectorDimension`,
    // `operation_error.rs:24`; `test_vector_dimension_validation.py`, the
    // #9039 regression): a mis-sized dense vector rejects on the wire —
    // upsert, update_vectors, AND the query side (a zipped kernel would
    // silently truncate the dot product: the worst class).
    "api_vector_dim_validation" -> ((s, dir) => {
      import s.implicits._
      val coll = freshColl(s, "shardw_dims") // dim-4 space
      def rejectsWith(expect: String)(body: => Unit): (Boolean, Boolean) =
        try { body; (false, false) }
        catch { case ex: Exception =>
          (true, Option(ex.getMessage).exists(_.contains(expect))) }
      def rejects(body: => Unit): (Boolean, Boolean) =
        rejectsWith("Vector dimension error: expected dim: 4, got 3")(body)
      val rows = Seq(
        // an EMPTY vector is the #9045 regression shape — rejected at the
        // VALIDATION boundary with the reference's message (`schema.rs:
        // 31-33`; `test_multi_vector.py:158-160`: `[]` deserializes as an
        // empty DENSE vector, untagged order), before any dim check
        ("upsert_empty_vector", rejectsWith(
          "dense vector must not be empty")(
          graft.api.UpdateBridge.applyJson(coll,
            """{"operations": [{"upsert": {"points": [
              |  {"id": 9, "vector": [], "shard_key": "a"}]}}]}""".stripMargin))),
        // matrix-shape validation happens at PARSE, before any config
        // check, with the reference's position-named messages
        // (`validate_multi_vector`, `test_multi_vector.py:180-228`)
        ("upsert_empty_inner_vector", rejectsWith(
          "Validation error in JSON body: [points[0].vector.?.data: " +
            "all vectors must be non-empty]")(
          graft.api.UpdateBridge.applyJson(coll,
            """{"operations": [{"upsert": {"points": [
              |  {"id": 9, "vector": [[]], "shard_key": "a"}]}}]}"""
              .stripMargin))),
        ("upsert_mixed_dim_matrix", rejectsWith(
          "Validation error in JSON body: [points[0].vector.?.data: " +
            "all vectors must have the same dimension, found vector with " +
            "dimension 3")(
          graft.api.UpdateBridge.applyJson(coll,
            """{"operations": [{"upsert": {"points": [
              |  {"id": 9, "vector": [[0.1, 0.2, 0.3, 0.4], [0.1, 0.2, 0.3]],
              |   "shard_key": "a"}]}}]}""".stripMargin))),
        ("upsert_wrong_dim", rejects(graft.api.UpdateBridge.applyJson(coll,
          """{"operations": [{"upsert": {"points": [
            |  {"id": 9, "vector": [0.1, 0.2, 0.3], "shard_key": "a"}]}}]}"""
            .stripMargin))),
        ("update_vectors_wrong_dim", rejects(graft.api.UpdateBridge.applyJson(coll,
          """{"operations": [{"update_vectors": {"points": [
            |  {"id": 1, "vector": [0.1, 0.2, 0.3]}], "shard_key": "a"}}]}"""
            .stripMargin))),
        ("query_wrong_dim", rejects(
          coll.query("""{"query": [0.1, 0.2, 0.3], "limit": 3}"""))),
        ("recommend_wrong_dim", rejects(coll.query(
          """{"query": {"recommend": {"positive": [[0.1, 0.2, 0.3]]}},
            |  "limit": 3}""".stripMargin))),
        ("query_ok", rejects(
          coll.query("""{"query": [0.1, 0.2, 0.3, 0.4], "limit": 3}"""))))
      val intact = coll.read().count() == 4L
      rows.map { case (n, (rej, msg)) => (n, rej, msg, intact) }
        .toDF("check_name", "rejected", "msg_ok", "table_intact")
    }),
    // Body-level `shard_key` SCOPES selector ops exactly like the read
    // paths (`FilterSelector.shard_key`, `point_ops.rs:42`): the delete
    // names ids {1, 11} but is scoped to shard "a", so 11 (in "b")
    // survives; the set_payload names {2, 12} scoped to "b", so only 12
    // changes; the delete_vectors scoped to "b" nulls only 12's vector.
    "api_update_shard_scoped" -> ((s, dir) => {
      val coll = freshColl(s, "shardw_scoped")
      // the DELETE names an out-of-scope id (11, home "b") — deletes are
      // exempt from the unknown-point check, so it silently survives; the
      // payload/vector ops name only in-scope ids (a checked op naming an
      // id outside its shard scope 404s — `check_unprocessed_points`,
      // pinned by api_update_unknown_point_404)
      graft.api.UpdateBridge.applyJson(coll,
        """{"operations": [
          |  {"delete": {"points": [1, 11], "shard_key": "a"}},
          |  {"set_payload": {"payload": {"tag": "y"},
          |    "points": [12], "shard_key": ["b"]}},
          |  {"delete_vectors": {"points": [12], "vector": [""],
          |    "shard_key": "b"}}
          |]}""".stripMargin)
      coll.read()
        .select(col("id"), col("shard_key"),
          get_json_object(col("payload"), "$.tag").as("tag"),
          col("vector").isNotNull.as("has_vector"))
        .orderBy(col("id"))
    }),
    // Unknown-point 404 (`check_unprocessed_points`, `lib/shard/src/
    // update/helpers.rs:118-128`; wire shape `test_optional_vectors.py:
    // 385-413` — "Not found: No point with id .. found"): every id-list
    // payload/vector op 404s on a missing id, plain DELETES and by-filter
    // selectors don't, a batch applies its PREFIX before the failing op
    // surfaces (`do_batch_update_points` per-op loop, `update.rs:800-915`),
    // an id upserted EARLIER in the batch is live, `update_filter` only
    // silences points that exist, a key-scoped op 404s on an id outside
    // its shards, and a KEYLESS update on a custom-sharded collection is
    // "Shard key not specified" (`shard_holder/mod.rs:429-438`).
    "api_update_unknown_point_404" -> ((s, dir) => {
      import s.implicits._
      val coll = freshPlain(s, "shardw_404")
      val sharded = freshColl(s, "shardw_404_scoped")
      def outcome(expect: String)(body: => Unit): (Boolean, Boolean) =
        try { body; (false, false) }
        catch { case ex: Exception =>
          (true, Option(ex.getMessage).exists(_.contains(expect))) }
      def ops(js: String): Unit = graft.api.UpdateBridge.applyJson(coll,
        s"""{"operations": [$js]}""")
      val rows = Seq.newBuilder[(String, Boolean, Boolean)]
      def arm(name: String, expect: String)(body: => Unit): Unit = {
        val (rej, msg) = outcome(expect)(body); rows += ((name, rej, msg))
      }
      arm("set_payload_unknown", "Not found: No point with id 999 found")(
        ops("""{"set_payload": {"payload": {"tag": "q"}, "points": [1, 999]}}"""))
      arm("update_vectors_unknown",
        "Not found: No point with id 424242424242424242 found")(
        ops("""{"update_vectors": {"points": [
          |  {"id": 1, "vector": [0.9, 0.9, 0.9, 0.9]},
          |  {"id": 424242424242424242, "vector": [0.1, 0.1, 0.1, 0.1]}]}}"""
          .stripMargin))
      arm("delete_vectors_unknown", "No point with id 999 found")(
        ops("""{"delete_vectors": {"points": [999], "vector": [""]}}"""))
      arm("delete_points_unknown_ok", "-")(
        ops("""{"delete": {"points": [999]}}"""))
      arm("filter_selector_ok", "-")(
        ops("""{"set_payload": {"payload": {"tag": "nf"},
          |  "filter": {"must": [{"key": "tag", "match": {"value": "zz"}}]}}}"""
          .stripMargin))
      // the batch PREFIX lands before the failure surfaces: id 2 takes
      // tag "p1" even though the request errors
      arm("prefix_fails", "No point with id 999 found")(
        ops("""{"set_payload": {"payload": {"tag": "p1"}, "points": [2]}},
          |{"set_payload": {"payload": {"tag": "p2"}, "points": [999]}}"""
          .stripMargin))
      val prefixApplied = coll.read().filter(col("id") === 2)
        .select(get_json_object(col("payload"), "$.tag")).collect()
        .headOption.exists(_.getString(0) == "p1")
      rows += (("prefix_applied", prefixApplied, prefixApplied))
      arm("in_batch_upsert_then_set_ok", "-")(
        ops("""{"upsert": {"points": [{"id": 9, "vector": [0.5, 0, 0, 0]}]}},
          |{"set_payload": {"payload": {"tag": "new"}, "points": [9]}}"""
          .stripMargin))
      // update_filter excludes id 11 (tag x -> the filter wants "nomatch"),
      // which EXISTS: silently skipped, vector unchanged, no 404
      arm("update_filter_excluded_ok", "-")(
        ops("""{"update_vectors": {"points": [
          |  {"id": 11, "vector": [0.7, 0.7, 0.7, 0.7]}],
          |  "update_filter": {"must": [
          |    {"key": "tag", "match": {"value": "nomatch"}}]}}}""".stripMargin))
      val vecUnchanged = coll.read().filter(col("id") === 11)
        .select(element_at(col("vector"), 3).cast("double")).collect()
        .headOption.exists(_.getDouble(0) == 1.0)
      rows += (("excluded_vector_unchanged", vecUnchanged, vecUnchanged))
      arm("cross_shard_404", "Not found: No point with id 2 found")(
        graft.api.UpdateBridge.applyJson(sharded,
          """{"operations": [{"set_payload": {"payload": {"tag": "y"},
            |  "points": [2], "shard_key": "b"}}]}""".stripMargin))
      arm("keyless_update_reject", "Wrong input: Shard key not specified")(
        graft.api.UpdateBridge.applyJson(sharded,
          """{"operations": [{"set_payload": {"payload": {"tag": "y"},
            |  "points": [2]}}]}""".stripMargin))
      // a delete-by-FILTER earlier in the batch removes the point, so the
      // later id-list op 404s (the ledger replays the filter delete over
      // its probe set — `check_unprocessed_points` would fire in the
      // reference after the sequential delete)
      arm("filter_delete_then_set_404", "No point with id 11 found")(
        ops("""{"delete": {"filter": {"must": [
          |  {"key": "tag", "match": {"value": "x"}}]}}},
          |{"set_payload": {"payload": {"tag": "back"}, "points": [11]}}"""
          .stripMargin))
      rows.result().toDF("check_name", "rejected", "msg_ok")
        .orderBy(col("check_name"))
    }),
    // Same-point-in-batch update_vectors MERGE (the reference's #3376
    // regression, `test_optional_vectors.py:416-487`: separate batch items
    // naming the same point each contribute their named vectors —
    // `update_vectors` merges per point id, `update/vectors.rs:48-56`).
    "api_update_vectors_merge" -> ((s, dir) => {
      import graft.sources.{CollectionConfig, VectorConfig}
      val cfg = CollectionConfig(idCol = "id",
        vectors = Seq(VectorConfig("text", 2, graft.model.Dot),
          VectorConfig("image", 2, graft.model.Dot)))
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("vector_text", ArrayType(FloatType)),
        StructField("vector_image", ArrayType(FloatType))))
      val seed = java.util.Arrays.asList(
        Row(1000L, Array(0.1f, 0.3f), Array(0.8f, 0.6f)))
      val coll = Collection.create(s, "/tmp/graft_runtime/shardw_uvmerge",
        cfg, s.createDataFrame(seed, schema))
      graft.api.UpdateBridge.applyJson(coll,
        """{"operations": [{"update_vectors": {"points": [
          |  {"id": 1000, "vector": {"text": [0.8, 0.8]}},
          |  {"id": 1000, "vector": {"image": [0.3, 0.6]}}]}},
          |{"update_vectors": {"points": [
          |  {"id": 1000, "vector": {"text": [0.2, 0.0]}},
          |  {"id": 1000, "vector": {"image": [0.7, 0.5],
          |                          "text": [0.9, 0.2]}}]}}]}""".stripMargin)
      coll.read().select(col("id"),
        round(element_at(col("vector_text"), 1).cast("double"), 6).as("t0"),
        round(element_at(col("vector_text"), 2).cast("double"), 6).as("t1"),
        round(element_at(col("vector_image"), 1).cast("double"), 6).as("i0"),
        round(element_at(col("vector_image"), 2).cast("double"), 6).as("i1"))
    }),
    // Column-form `Batch` upsert (`PointsBatch`/`Batch`, the second
    // untagged arm of `PointInsertOperations` — parallel ids/vectors/
    // payloads columns): one op with the UNNAMED-array vector form +
    // payloads, one with the NAMED-map form (per-name parallel lists,
    // sparse included), transposed into the same micro-batch path as the
    // points-list form.
    "api_upsert_batch_column" -> ((s, dir) => {
      import graft.sources.{CollectionConfig, SparseVectorConfig, VectorConfig}
      val cfg = CollectionConfig(idCol = "id",
        vectors = Seq(VectorConfig("", 2, graft.model.Dot)),
        sparse = Seq(SparseVectorConfig("tok")),
        payloadTypes = Map("tag" -> StringType))
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("vector", ArrayType(FloatType)),
        StructField("sparse_tok", StructType(Seq(
          StructField("indices", ArrayType(IntegerType)),
          StructField("values", ArrayType(FloatType))))),
        StructField("payload", StringType)))
      val seed = java.util.Arrays.asList(
        Row(1L, Array(1.0f, 0.0f), Row(Array(0), Array(1.0f)), """{"tag":"seed"}"""))
      val coll = Collection.create(s, "/tmp/graft_runtime/batch_col_upsert", cfg,
        s.createDataFrame(seed, schema))
      graft.api.UpdateBridge.applyJson(coll,
        """{"operations": [
          |  {"upsert": {"batch": {
          |    "ids": [2, 3],
          |    "vectors": [[0.5, 0.5], [0.0, 1.0]],
          |    "payloads": [{"tag": "b2"}, null]}}},
          |  {"upsert": {"batch": {
          |    "ids": [4, 1],
          |    "vectors": {
          |      "": [[0.25, 0.75], [0.9, 0.1]],
          |      "tok": [{"indices": [1, 3], "values": [2.0, 4.0]},
          |              {"indices": [0], "values": [7.0]}]}}}}
          |]}""".stripMargin)
      coll.read().select(col("id"),
        round(element_at(col("vector"), 1).cast("double"), 6).as("v0"),
        round(element_at(col("vector"), 2).cast("double"), 6).as("v1"),
        coalesce(size(col("sparse_tok.indices")), lit(-1)).cast("long").as("nnz"),
        get_json_object(col("payload"), "$.tag").as("tag"))
        .orderBy(col("id"))
    }),
    // `update_filter` on the update_vectors body (`UpdateVectors.
    // update_filter`, `schema.rs:1470-1473`): only points MATCHING the
    // filter take the new vector — id 1 (tag "x") updates, id 11 (tag
    // changed to "z" first, within the same ordered batch) does not.
    "api_update_vectors_filtered" -> ((s, dir) => {
      // plain collection: `update_filter` semantics are shard-independent,
      // and points 1 (home "a") and 11 (home "b") could not share one
      // key-scoped update on a custom-sharded collection
      val coll = freshPlain(s, "shardw_uvfilter")
      graft.api.UpdateBridge.applyJson(coll,
        """{"operations": [
          |  {"set_payload": {"payload": {"tag": "z"}, "points": [11]}},
          |  {"update_vectors": {
          |    "points": [
          |      {"id": 1, "vector": [9.0, 9.0, 9.0, 9.0]},
          |      {"id": 11, "vector": [9.0, 9.0, 9.0, 9.0]}],
          |    "update_filter": {"must": [{"key": "tag", "match": {"value": "x"}}]}}}
          |]}""".stripMargin)
      coll.read().select(col("id"),
        round(element_at(col("vector"), 1).cast("double"), 6).as("v0"),
        get_json_object(col("payload"), "$.tag").as("tag"))
        .orderBy(col("id"))
    }),
    // Shard-key LIFECYCLE — the `PUT/GET /collections/{c}/shards` +
    // `POST /shards/delete` surface (`sharding_keys.rs`, routes
    // `shards_api.rs`): creating key "c" upgrades the collection to a
    // declared registry (initialized from the data's implicit keys), a
    // write into an UNDECLARED key rejects ("Shard key .. not found",
    // `shard_holder/mod.rs:432`), a duplicate create rejects, and
    // deleting key "a" drops its points as a partition-DIRECTORY delete —
    // zero table rewrite (pinned via rewriteCount).
    "shard_key_lifecycle" -> ((s, dir) => {
      import s.implicits._
      val coll = freshColl(s, "shardw_lifecycle")
      coll.shardsPut("""{"shard_key": "c"}""")
      def rejects(body: => Unit, expect: String): (Boolean, Boolean) =
        try { body; (false, false) }
        catch { case ex: Exception =>
          (true, Option(ex.getMessage).exists(_.contains(expect))) }
      // declared key "c" accepts the write; undeclared "d" rejects
      graft.api.UpdateBridge.applyJson(coll,
        """{"operations": [{"upsert": {"points": [
          |  {"id": 21, "vector": [1.0, 1.0, 0.0, 0.0], "shard_key": "c"}]}}]}"""
          .stripMargin)
      val (rejD, msgD) = rejects(graft.api.UpdateBridge.applyJson(coll,
        """{"operations": [{"upsert": {"points": [
          |  {"id": 31, "vector": [1.0, 0.0, 1.0, 0.0], "shard_key": "d"}]}}]}"""
          .stripMargin), "Shard key d not found")
      val (rejDup, msgDup) = rejects(coll.shardsPut("""{"shard_key": "c"}"""),
        "already exists")
      val before = coll.rewriteCount
      val dropped = coll.shardsDelete("""{"shard_key": "a"}""")
      val zeroRewrites = coll.rewriteCount == before
      // a DECLARED key with no data yet still drops successfully (the
      // registry entry is the key's existence; data directories are
      // incidental) and the registry retires it
      coll.shardsPut("""{"shard_key": "d"}""")
      val droppedEmpty = coll.shardsDelete("""{"shard_key": "d"}""")
      val keysNow = coll.listShardKeys().get.map(_.toString).sorted.mkString(",")
      val survivors = coll.read().select("id").collect()
        .map(_.getLong(0)).sorted.mkString(",")
      Seq((rejD, msgD, rejDup, msgDup, dropped, droppedEmpty, zeroRewrites,
          keysNow, survivors))
        .toDF("rej_undeclared", "msg_undeclared", "rej_dup", "msg_dup",
          "dropped", "dropped_empty", "zero_rewrites", "keys_now", "survivor_ids")
    }),
    // Shard-scoped `exact: false` count (VERDICT r11 #3): the shard-key
    // partition column rides the `_fieldstats` sidecar (one per-key count
    // job at build — low cardinality by construction), so the estimate
    // serves the TENANT's size driver-side instead of unknown(N/2).
    "count_estimate_shard" -> ((s, dir) => {
      VectorQueries.shardedColl(s, dir).count(
        """{"shard_key": "a", "exact": false}""")
    }),
    // Combined SHARD-KEY × IVF-CELL physical layout: the table partitions
    // by shard_key/ivfcell — a shard-scoped ANN query prunes on BOTH
    // levels (tenant directories first, then unprobed cells within them;
    // PlanSpec pins both reaching PartitionFilters). nprobe = cells here
    // so the ranking is exact and the DuckDB oracle can mirror it.
    "ivf_shard_combined" -> ((s, dir) => {
      import graft.sources.IvfSpec
      val path = "/tmp/graft_runtime/ivf_shard_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val e = Tables.load(s, dir, "embeddings")
      val cfg = CollectionConfig(idCol = "vec_id",
        vectors = Seq(VectorConfig("", 64, graft.model.Dot,
          ann = Some(IvfSpec(cells = 8, nprobe = 8)))),
        shardKeyCol = Some("shard_key"))
      val coll = prunedColls.computeIfAbsent(path, _ =>
        Collection.create(s, path, cfg,
          e.select(col("vec_id"), col("embedding").as("vector"),
            element_at(typedLit(Seq("a", "b", "c")),
              (pmod(col("label"), lit(3)) + 1).cast("int")).as("shard_key"))))
      val qvec = Tables.embeddingOf(s, dir, 7L)
      coll.query(
        s"""{"query": {"nearest": [${qvec.mkString(",")}]},
           |  "shard_key": ["a", "b"], "limit": 10}""".stripMargin)
    }),
    // THREE-LEVEL prune composition — shard_key × IVF cell × declared geo
    // index: a multi-tenant geo corpus's query prunes tenant directories
    // and unprobed cells at the PARTITION level and geo cells at the
    // row-group level, all on ONE query (PlanSpec pins PartitionFilters
    // carrying shard_key + ivfcell AND PushedFilters carrying the
    // geocell conjunct). nprobe = cells so the ranking is exact and
    // DuckDB mirrors it with an unpruned recompute (shard ∈ {a,b} ∧
    // strict haversine ∧ dot top-10).
    "ivf_geo_combined" -> ((s, dir) => {
      import graft.sources.IvfSpec
      val path = "/tmp/graft_runtime/ivf_geo_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val e = Tables.load(s, dir, "embeddings")
      val cfg = CollectionConfig(idCol = "vec_id",
        vectors = Seq(VectorConfig("", 64, graft.model.Dot,
          ann = Some(IvfSpec(cells = 8, nprobe = 8)))),
        shardKeyCol = Some("shard_key"))
      val coll = prunedColls.computeIfAbsent(path, { _ =>
        val base = Collection.create(s, path, cfg,
          e.select(col("vec_id"), col("embedding").as("vector"),
            element_at(typedLit(Seq("a", "b", "c")),
              (pmod(col("label"), lit(3)) + 1).cast("int")).as("shard_key"),
            concat(lit("""{"location": {"lon": """),
              col("vec_id") * 7 % 360 - 180 + lit(0.25),
              lit(""", "lat": """),
              col("vec_id") * 11 % 180 - 90 + lit(0.25),
              lit("}}")).as("payload")))
        val (f, dt, _, fl) = graft.api.RequestCodec.parseFieldIndexRequest(
          """{"field_name": "location", "field_schema": "geo"}""")
        base.buildPayloadIndex(f, dt, fl)
      })
      val qvec = Tables.embeddingOf(s, dir, 7L)
      coll.query(
        s"""{"query": {"nearest": [${qvec.mkString(",")}]},
           |  "shard_key": ["a", "b"],
           |  "filter": {"must": [{"key": "location", "geo_radius":
           |    {"center": {"lon": 10.0, "lat": 45.0},
           |     "radius": 3000000.0}}]},
           |  "limit": 10}""".stripMargin)
    }),
    // Facet over the shard-key PARTITION column: shard keys are a point
    // attribute, not a payload field, but they facet like any keyword —
    // served zero-job from the same sidecar per-key counts the estimate
    // path uses (`FacetValue` keyword variant).
    "facet_shard_key" -> ((s, dir) => {
      VectorQueries.shardedColl(s, dir)
        .facet("""{"key": "shard_key", "limit": 3}""")
    }),
    // The full {min, exp, max} band over a TWO-shard selector: MatchAny
    // over exact per-key counts → min = max(ca, cb), exp = noisy-or, max =
    // capped sum (`combine_should_estimations`, query_estimator.rs).
    "count_estimate_shard_band" -> ((s, dir) => {
      VectorQueries.shardedColl(s, dir).countEstimate(
        """{"shard_key": ["a", "b"], "exact": false}""")
    }),
  )

  val oracles: Map[String, String] = Map(
    "api_upsert_shard_key" ->
      """SELECT * FROM (VALUES
        |  ('a', 1::BIGINT), ('a', 2::BIGINT), ('a', 4::BIGINT),
        |  ('b', 3::BIGINT), ('b', 11::BIGINT), ('b', 12::BIGINT))
        |AS t(shard, id)""".stripMargin,
    "api_upsert_shard_key_reject" ->
      """SELECT * FROM (VALUES
        |  ('missing_key', true, true, true),
        |  ('non_sharded', true, true, true),
        |  ('multi_key_body', true, true, true),
        |  ('typed_missing_column', true, true, true),
        |  ('int_shard_non_numeric', true, true, true))
        |AS t(check_name, rejected, msg_ok, table_intact)""".stripMargin,
    // ids win over the stray filter: only point 1 deleted; 2/11/12 (all
    // tag=x, matching the filter) survive
    "api_delete_points_precedence" ->
      """SELECT * FROM (VALUES
        |  (2::BIGINT, 'x'), (11::BIGINT, 'x'), (12::BIGINT, 'x'))
        |AS t(id, tag)""".stripMargin,
    "api_vector_dim_validation" ->
      """SELECT * FROM (VALUES
        |  ('upsert_empty_vector', true, true, true),
        |  ('upsert_empty_inner_vector', true, true, true),
        |  ('upsert_mixed_dim_matrix', true, true, true),
        |  ('upsert_wrong_dim', true, true, true),
        |  ('update_vectors_wrong_dim', true, true, true),
        |  ('query_wrong_dim', true, true, true),
        |  ('recommend_wrong_dim', true, true, true),
        |  ('query_ok', false, false, true))
        |AS t(check_name, rejected, msg_ok, table_intact)""".stripMargin,
    "api_update_shard_scoped" ->
      """SELECT * FROM (VALUES
        |  (2::BIGINT, 'a', 'x', true),
        |  (11::BIGINT, 'b', 'x', true),
        |  (12::BIGINT, 'b', 'y', false))
        |AS t(id, shard_key, tag, has_vector)""".stripMargin,
    // 404 contract: checked ops reject on missing/out-of-scope ids with
    // the reference message, deletes/filters don't, the batch prefix
    // lands, in-batch upserts count as live, update_filter exclusion is
    // silent, keyless updates on a sharded collection reject
    "api_update_unknown_point_404" ->
      """SELECT * FROM (VALUES
        |  ('cross_shard_404', true, true),
        |  ('delete_points_unknown_ok', false, false),
        |  ('delete_vectors_unknown', true, true),
        |  ('filter_delete_then_set_404', true, true),
        |  ('excluded_vector_unchanged', true, true),
        |  ('filter_selector_ok', false, false),
        |  ('in_batch_upsert_then_set_ok', false, false),
        |  ('keyless_update_reject', true, true),
        |  ('prefix_applied', true, true),
        |  ('prefix_fails', true, true),
        |  ('set_payload_unknown', true, true),
        |  ('update_filter_excluded_ok', false, false),
        |  ('update_vectors_unknown', true, true))
        |AS t(check_name, rejected, msg_ok) ORDER BY check_name""".stripMargin,
    // per-point merge across batch items: the LAST value per (point,
    // vector name) wins, names merge rather than replace (#3376)
    "api_update_vectors_merge" ->
      """SELECT 1000::BIGINT AS id, 0.9 AS t0, 0.2 AS t1,
        |  0.7 AS i0, 0.5 AS i1""".stripMargin,
    "api_upsert_batch_column" ->
      """SELECT * FROM (VALUES
        |  (1::BIGINT, 0.9, 0.1, 1::BIGINT, NULL),
        |  (2::BIGINT, 0.5, 0.5, -1::BIGINT, 'b2'),
        |  (3::BIGINT, 0.0, 1.0, -1::BIGINT, NULL),
        |  (4::BIGINT, 0.25, 0.75, 2::BIGINT, NULL))
        |AS t(id, v0, v1, nnz, tag)""".stripMargin,
    "api_update_vectors_filtered" ->
      """SELECT * FROM (VALUES
        |  (1::BIGINT, 9.0, 'x'),
        |  (2::BIGINT, 0.0, 'x'),
        |  (11::BIGINT, 0.0, 'z'),
        |  (12::BIGINT, 0.0, 'x'))
        |AS t(id, v0, tag)""".stripMargin,
    // seed shards a={1,2}, b={11,12}; +21 into created "c"; delete "a"
    // drops 1,2; registry after = {b, c}
    "shard_key_lifecycle" ->
      """SELECT true AS rej_undeclared, true AS msg_undeclared,
        |  true AS rej_dup, true AS msg_dup, true AS dropped,
        |  true AS dropped_empty, true AS zero_rewrites, 'b,c' AS keys_now,
        |  '11,12,21' AS survivor_ids""".stripMargin,
    // per-tenant exact count: shard "a" holds label % 3 == 0 (the fixture
    // maps label % 3 → a/b/c)
    "count_estimate_shard" ->
      """SELECT count(*)::BIGINT AS cnt FROM embeddings WHERE label % 3 = 0""",
    "ivf_shard_combined" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7)
        |SELECT e.vec_id AS vec_id,
        |  round(list_dot_product(e.embedding::DOUBLE[], q.v), 6) AS score
        |FROM embeddings e, q
        |WHERE (e.label % 3) IN (0, 1)
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    // unpruned recompute: tenant selector ∧ strict haversine (same
    // R = 6371008.8 as VectorFunctions) ∧ exact dot ranking
    "ivf_geo_combined" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7),
        |g AS (SELECT vec_id, embedding,
        |    ((vec_id*7) % 360) - 180 + 0.25 AS lon,
        |    ((vec_id*11) % 180) - 90 + 0.25 AS lat,
        |    label % 3 AS sk FROM embeddings)
        |SELECT g.vec_id AS vec_id,
        |  round(list_dot_product(g.embedding::DOUBLE[], q.v), 6) AS score
        |FROM g, q
        |WHERE g.sk IN (0, 1)
        |  AND 2*6371008.8*asin(sqrt(
        |    power(sin((45.0 - lat)*pi()/180.0/2), 2) +
        |    cos(lat*pi()/180.0)*cos(45.0*pi()/180.0)*
        |    power(sin((10.0 - lon)*pi()/180.0/2), 2))) < 3000000.0
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    "facet_shard_key" ->
      """SELECT list_extract(['a','b','c'], (label % 3)::INT + 1) AS value,
        |       count(*)::BIGINT AS cnt
        |FROM embeddings GROUP BY 1
        |ORDER BY cnt DESC, value ASC LIMIT 3""".stripMargin,
    "count_estimate_shard_band" ->
      """WITH m AS (SELECT
        |    sum(CASE WHEN label % 3 = 0 THEN 1 ELSE 0 END)::DOUBLE AS ca,
        |    sum(CASE WHEN label % 3 = 1 THEN 1 ELSE 0 END)::DOUBLE AS cb,
        |    count(*)::DOUBLE AS n
        |  FROM embeddings)
        |SELECT CAST(greatest(ca, cb) AS BIGINT) AS est_min,
        |  CAST(round(n * (round((1.0 - (1.0 - ca/n) * (1.0 - cb/n)) * n) / n))
        |    AS BIGINT) AS est_exp,
        |  CAST(least(ca + cb, n) AS BIGINT) AS est_max FROM m""".stripMargin,
  )
}
