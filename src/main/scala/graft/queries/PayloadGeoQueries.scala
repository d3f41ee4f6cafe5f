package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.filters.{FilterCompiler, JsonResolver, TypedResolver}
import graft.model._
import graft.ops.{Formula, Search}

/** JSON-payload filters (VARIANT path), geo conditions, formula rescore.
  * Geo coordinates derive deterministically from `events.user_id` so the
  * DuckDB oracle can reproduce them. */
object PayloadGeoQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private val geoColls =
    new java.util.concurrent.ConcurrentHashMap[String, graft.storage.Collection]()

  /** A collection with a WIRE-declared geo payload index over mixed value
    * shapes — the `test_geo_payload_index.py` fixture generalized: per
    * doc_id%8, a single point (shapes 0-4), a non-geo string (5 — the
    * reference skips non-geo-shaped values), an ARRAY of two points (6 —
    * `{"location": [pt, pt]}` is first-class in the reference fixture),
    * or no field at all (7). Coordinates derive from doc_id so DuckDB
    * reproduces them numerically. */
  private def geoIndexedColl(s: SparkSession, dir: String): graft.storage.Collection = {
    val path = "/tmp/graft_runtime/geofieldidx_" +
      dir.replaceAll("[^A-Za-z0-9]", "_")
    geoColls.computeIfAbsent(path, { _ =>
      val d = Tables.load(s, dir, "documents")
      val lonC = col("doc_id") * 7 % 360 - 180 + lit(0.25)
      val latC = col("doc_id") * 11 % 180 - 90 + lit(0.25)
      val shape = col("doc_id") % 8
      val payload =
        when(shape === 5, lit("""{"location": "unparseable", "kind": "bad"}"""))
          .when(shape === 6, concat(lit("""{"location": [{"lon": """), lonC,
            lit(""", "lat": """), latC, lit("""}, {"lon": """), -lonC,
            lit(""", "lat": """), -latC, lit("""}], "kind": "multi"}""")))
          .when(shape === 7, lit("""{"kind": "none"}"""))
          .otherwise(concat(lit("""{"location": {"lon": """), lonC,
            lit(""", "lat": """), latC, lit("""}, "kind": "pt"}""")))
      val base = graft.storage.Collection.create(s, path,
        graft.sources.CollectionConfig(),
        d.select(col("doc_id").as("id"), payload.as("payload")))
      // declare the geo index through the wire schema — this CRASHED
      // pre-r15 (STRING→STRUCT cast); now it materializes the from_json
      // struct + geocell prune column and routes into FilterCompiler
      val (f, dt, _, fl) = graft.api.RequestCodec.parseFieldIndexRequest(
        """{"field_name": "location", "field_schema": "geo"}""")
      base.buildPayloadIndex(f, dt, fl)
    })
  }

  /** events + derived lon/lat + location struct. */
  private def geoEvents(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
        col("event_id"),
        (col("user_id") % 360 - 180 + lit(0.25)).as("lon"),
        (col("user_id") % 180 - 90 + lit(0.25)).as("lat"))
      .withColumn("location", struct(col("lon").as("lon"), col("lat").as("lat")))

  private def geoCount(s: SparkSession, dir: String, cond: Condition): DataFrame = {
    val g = geoEvents(s, dir)
    val pred = new FilterCompiler(new TypedResolver(g.schema, "event_id"))
      .compile(Filter.mustAll(cond))
    g.filter(pred).agg(count(lit(1)).as("cnt"))
  }

  /** Six JSON payload shapes exercising absent / explicit-null / empty /
    * [null] / scalar / non-empty-array — cycled by doc_id so the DuckDB
    * oracle can rebuild the identical column. */
  private val payloadForms = Seq(
    """{"tags":["a","b"]}""", """{"tags":[]}""", """{"tags":null}""",
    "{}", """{"tags":"x"}""", """{"tags":[null]}""")

  private def trichotomy(s: SparkSession, dir: String, f: Filter): DataFrame = {
    val d = Tables.load(s, dir, "documents").select(
      col("doc_id"), (col("doc_id") % 6).as("bucket"),
      element_at(array(payloadForms.map(lit): _*),
        (col("doc_id") % 6).cast("int") + 1).as("payload"))
    val jr = new JsonResolver(col("payload"), Map("tags" -> StringType), col("doc_id"))
    val pred = new FilterCompiler(jr).compile(f)
    d.groupBy(col("bucket"))
      .agg(sum(when(pred, 1L).otherwise(0L)).as("cnt"))
      .orderBy(col("bucket").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The two VARIANT-path queries are aggregate-shaped on purpose: the
    // predicate is a projected 0/1 column summed by the aggregate, not a
    // Filter node. A Filter would have the payload parse inlined into every
    // key reference by alias substitution (no cross-reference CSE there),
    // while ProjectExec subexpression-eliminates them down to one parse/row.
    // Both VARIANT-path queries parse the payload ONCE in a dedicated
    // projection (`preParsed = true` resolver) — each predicate reference
    // then costs a variant_get, not a full JSON string parse. CollapseProject
    // keeps the parse in its own ProjectExec because the parsed column is
    // referenced multiple times and try_parse_json is not "cheap".
    "payload_json_facet" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_type"), col("event_id"),
        try_parse_json(col("props")).as("_props_v"))
      val jr = new JsonResolver(col("_props_v"), Map("k" -> LongType),
        col("event_id"), preParsed = true)
      val pred = new FilterCompiler(jr).compile(Filter(
        must = Seq(RangeCond("k", gte = Some(10L), lt = Some(500L)))))
      ev.select(col("event_type").as("value"),
          when(pred, 1L).otherwise(0L).as("_m"))
        .groupBy(col("value"))
        .agg(sum(col("_m")).as("cnt"))
        .filter(col("cnt") > 0)
        .orderBy(col("cnt").desc, col("value").asc)
        .limit(10)
    }),
    "payload_json_count" -> ((s, dir) => {
      val ev = events(s, dir).select(col("event_id"),
        try_parse_json(col("props")).as("_props_v"))
      val jr = new JsonResolver(col("_props_v"), Map("k" -> LongType),
        col("event_id"), preParsed = true)
      val pred = new FilterCompiler(jr).compile(Filter(
        must = Seq(RangeCond("k", gte = Some(50L))),
        should = Seq(IsEmpty("missing_key"), IsNullCond("k"))))
      ev.select(when(pred, 1L).otherwise(0L).as("_m"))
        .agg(sum(col("_m")).as("cnt"))
    }),
    // IsEmpty / IsNull trichotomy (ref types.rs:3780-3806, fixture F1):
    // a synthesized payload cycles through all six value shapes —
    //   b0 ["a","b"]  b1 []  b2 null  b3 absent  b4 "x"  b5 [null]
    // IsEmpty matches absent and [] (b1,b3) but NOT explicit null;
    // IsNull matches explicit null and [null] (b2,b5). Per-bucket counts
    // make each shape's verdict visible to the oracle.
    "filter_is_empty" -> ((s, dir) =>
      trichotomy(s, dir, Filter.mustAll(IsEmpty("tags")))),
    "filter_is_null" -> ((s, dir) =>
      trichotomy(s, dir, Filter.mustAll(IsNullCond("tags")))),
    // JsonPath wildcard traversal + doubly-nested filters
    // (`JsonPath::rest` `json_path/mod.rs:19-33`,
    // `tests/openapi/test_nesting_nested_payload_query.py`): payloads carry
    // arr1 = [{arr2:[{a:1,b:2}]}, {arr2:[{a:doc%7,b:n%5},{a:5,b:doc%3}]}].
    //  q1: nested(arr1, arr2[].a == 6)            → doc%7 == 6
    //  q2: nested(arr1[].arr2, a == 5 AND b == 1) → same-element conjunction:
    //      (doc%7 == 5 AND n%5 == 1) OR doc%3 == 1
    //  q3: nested(arr1, nested(arr2, a == 6))     → must equal q1
    //  q4: flat wildcard range arr1[].arr2[].a >= 6 → doc%7 == 6
    "filter_nested_wildcard" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(lit("""{"arr1":[{"arr2":[{"a":1,"b":2}]},{"arr2":[{"a":"""),
          col("doc_id") % 7, lit(""","b":"""), col("n_chars") % 5,
          lit("""},{"a":5,"b":"""), col("doc_id") % 3,
          lit("""}]}]}""")).as("payload"))
      val fc = new FilterCompiler(new JsonResolver(col("payload"),
        Map("arr1.arr2[].a" -> LongType, "arr1.arr2.a" -> LongType,
          "arr1[].arr2.a" -> LongType, "arr1[].arr2.b" -> LongType,
          "arr1[].arr2[].a" -> LongType), col("doc_id")))
      val q1 = fc.compile(Filter.mustAll(NestedCond("arr1",
        Filter.mustAll(MatchValue("arr2[].a", 6L)))))
      val q2 = fc.compile(Filter.mustAll(NestedCond("arr1[].arr2",
        Filter(must = Seq(MatchValue("a", 5L), MatchValue("b", 1L))))))
      val q3 = fc.compile(Filter.mustAll(NestedCond("arr1",
        Filter.mustAll(NestedCond("arr2", Filter.mustAll(MatchValue("a", 6L)))))))
      val q4 = fc.compile(Filter.mustAll(
        RangeCond("arr1[].arr2[].a", gte = Some(6L))))
      d.agg(
        sum(when(q1, 1L).otherwise(0L)).as("cnt_q1"),
        sum(when(q2, 1L).otherwise(0L)).as("cnt_q2"),
        sum(when(q3, 1L).otherwise(0L)).as("cnt_q3"),
        sum(when(q4, 1L).otherwise(0L)).as("cnt_q4"))
    }),
    // Empty-list match semantics (`tests/openapi/test_match_any_empty.py`,
    // `test_match_except_empty.py`): `any: []` matches NOTHING;
    // `except: []` matches every point with at least one actual value
    // under the key (∃ v ∉ ∅ = ∃ v — so [] / null / absent do NOT match).
    // Payload shapes cycle per bucket: ["a","b"] / [] / null / absent / "x".
    "match_empty_lists" -> ((s, dir) => {
      val forms = Seq("""{"tags":["a","b"]}""", """{"tags":[]}""",
        """{"tags":null}""", "{}", """{"tags":"x"}""")
      val d = Tables.load(s, dir, "documents").select(
        col("doc_id"), (col("doc_id") % 5).as("bucket"),
        element_at(array(forms.map(lit): _*),
          (col("doc_id") % 5).cast("int") + 1).as("payload"))
      val fc = new FilterCompiler(new JsonResolver(col("payload"),
        Map("tags" -> StringType), col("doc_id")))
      val anyEmpty = fc.compile(Filter.mustAll(MatchAny("tags", Seq())))
      val exceptEmpty = fc.compile(Filter.mustAll(MatchExcept("tags", Seq())))
      d.groupBy(col("bucket")).agg(
          sum(when(anyEmpty, 1L).otherwise(0L)).as("cnt_any_empty"),
          sum(when(exceptEmpty, 1L).otherwise(0L)).as("cnt_except_empty"))
        .orderBy(col("bucket"))
    }),
    // ValuesCount against a missing / null / empty field
    // (`test_filter_values_count_missing_field.py`: absent counts as 0, so
    // `lt: 1`, `lte: 0` and `gte: 0` all include the field-less point).
    "values_count_missing" -> ((s, dir) => {
      val forms = Seq("""{"tags":["a","b"]}""", """{"tags":[]}""",
        """{"tags":null}""", "{}", """{"tags":"x"}""")
      val d = Tables.load(s, dir, "documents").select(
        col("doc_id"), (col("doc_id") % 5).as("bucket"),
        element_at(array(forms.map(lit): _*),
          (col("doc_id") % 5).cast("int") + 1).as("payload"))
      val fc = new FilterCompiler(new JsonResolver(col("payload"),
        Map("tags" -> StringType), col("doc_id")))
      val lt1 = fc.compile(Filter.mustAll(ValuesCount("tags", lt = Some(1L))))
      val gte0 = fc.compile(Filter.mustAll(ValuesCount("tags", gte = Some(0L))))
      val lte0 = fc.compile(Filter.mustAll(ValuesCount("tags", lte = Some(0L))))
      d.groupBy(col("bucket")).agg(
          sum(when(lt1, 1L).otherwise(0L)).as("cnt_lt1"),
          sum(when(gte0, 1L).otherwise(0L)).as("cnt_gte0"),
          sum(when(lte0, 1L).otherwise(0L)).as("cnt_lte0"))
        .orderBy(col("bucket"))
    }),
    // Bool payload index analog (`field_index/bool_index/`, Match bool
    // `types.rs:3007`): per-bucket counts over payloads cycling
    // true / false / absent / explicit null — only the true bucket matches,
    // and null/absent rows are FALSE (not null-propagated into the count).
    "match_bool_count" -> ((s, dir) => {
      val forms = Seq("""{"hot":true}""", """{"hot":false}""", "{}",
        """{"hot":null}""")
      val d = Tables.load(s, dir, "documents").select(
        col("doc_id"), (col("doc_id") % 4).as("bucket"),
        element_at(array(forms.map(lit): _*),
          (col("doc_id") % 4).cast("int") + 1).as("payload"))
      val jr = new JsonResolver(col("payload"),
        Map("hot" -> BooleanType), col("doc_id"))
      val pred = new FilterCompiler(jr).compile(
        Filter.mustAll(MatchValue("hot", true)))
      d.groupBy(col("bucket"))
        .agg(sum(when(pred, 1L).otherwise(0L)).as("cnt"))
        .orderBy(col("bucket").asc)
    }),
    "geo_radius" -> ((s, dir) =>
      geoCount(s, dir, GeoRadius("location", GeoPoint(0.0, 0.0), 3000000.0))),
    // geohash-indexed radius search: cell-prefix prune then exact haversine —
    // identical answer to geo_radius (same oracle), pruned scan
    "geo_radius_indexed" -> ((s, dir) => {
      val g = graft.index.GeoIndex.withCells(
        geoEvents(s, dir), "lon", "lat", precision = 2)
      graft.index.GeoIndex.radiusSearch(g, "lon", "lat",
          centerLon = 0.0, centerLat = 0.0, radiusM = 3000000.0, precision = 2)
        .agg(count(lit(1)).as("cnt"))
    }),
    "geo_bbox" -> ((s, dir) =>
      geoCount(s, dir, GeoBoundingBox("location",
        topLeft = GeoPoint(-50.0, 60.0), bottomRight = GeoPoint(50.0, -30.0)))),
    // geohash-indexed bbox search: cell-prefix prune then the exact STRICT
    // box check — identical answer to geo_bbox (same oracle), pruned scan
    "geo_bbox_indexed" -> ((s, dir) => {
      val g = graft.index.GeoIndex.withCells(
        geoEvents(s, dir), "lon", "lat", precision = 2)
      graft.index.GeoIndex.bboxSearch(g, "lon", "lat",
          tlLon = -50.0, tlLat = 60.0, brLon = 50.0, brLat = -30.0,
          precision = 2)
        .agg(count(lit(1)).as("cnt"))
    }),
    "geo_polygon" -> ((s, dir) =>
      geoCount(s, dir, GeoPolygonCond("location", exterior = Seq(
        GeoPoint(-100.0, -50.0), GeoPoint(100.0, -40.0), GeoPoint(0.0, 70.0),
        GeoPoint(-100.0, -50.0))))),
    // polygon with an interior ring — inside the exterior AND NOT inside
    // any hole (`test_geo_filter.py::test_geo_polygon_with_interiors`;
    // `GeoPolygon::check_point` via geo's Contains). The hole is placed on
    // the fixture's negative-lon diagonal band so it genuinely removes
    // rows.
    "geo_polygon_interiors" -> ((s, dir) =>
      geoCount(s, dir, GeoPolygonCond("location",
        exterior = Seq(GeoPoint(-70.0, -70.0), GeoPoint(60.0, -70.0),
          GeoPoint(60.0, 60.0), GeoPoint(-70.0, 60.0), GeoPoint(-70.0, -70.0)),
        interiors = Seq(Seq(GeoPoint(-60.0, 20.0), GeoPoint(-40.0, 20.0),
          GeoPoint(-40.0, 40.0), GeoPoint(-60.0, 40.0),
          GeoPoint(-60.0, 20.0)))))),
    // multiple polygons under `should` — OR semantics across two disjoint
    // rings (`test_geo_filter.py::test_geo_polygon_multiple`); each rect
    // sits on one of the fixture's two lon↔lat diagonal bands so both
    // branches contribute rows.
    "geo_polygon_multi_should" -> ((s, dir) => {
      val g = geoEvents(s, dir)
      def rect(lonLo: Double, latLo: Double,
          lonHi: Double, latHi: Double): Condition =
        GeoPolygonCond("location", exterior = Seq(
          GeoPoint(lonLo, latLo), GeoPoint(lonHi, latLo),
          GeoPoint(lonHi, latHi), GeoPoint(lonLo, latHi),
          GeoPoint(lonLo, latLo)))
      val pred = new FilterCompiler(new TypedResolver(g.schema, "event_id"))
        .compile(Filter(should = Seq(
          rect(55.0, -35.0, 65.0, -25.0), rect(-65.0, 25.0, -55.0, 35.0))))
      g.filter(pred).agg(count(lit(1)).as("cnt"))
    }),
    // Geo cardinality estimation from the declared index's cell sidecar
    // (`geo_index/read_ops.rs` `estimate_cardinality`: query regions →
    // per-region postings counts; here coarse per-cell counts in the
    // _fieldstats sidecar): `exact:false` count answers DRIVER-side with
    // zero scan. The oracle recomputes the same candidate sum from the
    // cover cells' lon/lat boxes (disjoint, embedded as literals).
    "count_estimate_geo" -> ((s, dir) =>
      geoIndexedColl(s, dir).count(
        """{"filter": {"must": [{"key": "location", "geo_bounding_box":
          |  {"top_left": {"lon": -40.0, "lat": 20.0},
          |   "bottom_right": {"lon": -10.0, "lat": -10.0}}}]},
          |  "exact": false}""".stripMargin)),
    "count_estimate_geo_radius" -> ((s, dir) =>
      geoIndexedColl(s, dir).count(
        """{"filter": {"must": [{"key": "location", "geo_radius":
          |  {"center": {"lon": 10.25, "lat": 45.25},
          |   "radius": 1000000.0}}]},
          |  "exact": false}""".stripMargin)),
    // Declared geo payload index END-TO-END (`PUT /collections/{c}/index`
    // with `"field_schema": "geo"` → geohash-pruned filtering;
    // `tests/openapi/test_geo_payload_index.py`,
    // `lib/segment/src/index/field_index/geo_index/`): every arm runs
    // through `Collection.count` with the cell prune ANDed in front of the
    // exact check, against an unpruned DuckDB recomputation. Value-shape
    // arms: `multi_radius`/`multi_bbox` = array-of-points rows match when
    // ANY point is inside (spanning arrays carry the sentinel scalar cell
    // plus a per-point `geocells_` array the exists-overlap conjunct
    // prunes — the reference posts every point of an array value into its
    // geohash postings); `bad_world` = a string-valued geo field matches
    // nothing (the reference skips non-geo-shaped values);
    // `mustnot_radius` = the prune stays total under negation.
    "api_geo_field_index" -> ((s, dir) => {
      import s.implicits._
      val coll = geoIndexedColl(s, dir)
      def cnt(filter: String): Long =
        coll.count(s"""{"filter": $filter, "exact": true}""")
          .head().getLong(0)
      val radius =
        """{"key": "location", "geo_radius":
          |  {"center": {"lon": 10.0, "lat": 45.0}, "radius": 3000000.0}}"""
          .stripMargin
      val bbox =
        """{"key": "location", "geo_bounding_box":
          |  {"top_left": {"lon": -50.0, "lat": 60.0},
          |   "bottom_right": {"lon": 50.0, "lat": -30.0}}}""".stripMargin
      val world =
        """{"key": "location", "geo_bounding_box":
          |  {"top_left": {"lon": -180.0, "lat": 90.0},
          |   "bottom_right": {"lon": 180.0, "lat": -90.0}}}""".stripMargin
      val poly =
        """{"key": "location", "geo_polygon": {"exterior": {"points": [
          |  {"lon": -100.0, "lat": -50.0}, {"lon": 100.0, "lat": -40.0},
          |  {"lon": 0.0, "lat": 70.0}, {"lon": -100.0, "lat": -50.0}]}}}"""
          .stripMargin
      val stored = coll.read()
      val colsOk = stored.columns.contains("idx_location") &&
        stored.columns.contains("geocell_location") &&
        stored.columns.contains("geocells_location")
      Seq(
        ("bad_world", cnt(
          s"""{"must": [{"key": "kind", "match": {"value": "bad"}}, $world]}""")),
        ("bbox", cnt(s"""{"must": [$bbox]}""")),
        ("cols", if (colsOk) 1L else 0L),
        // array-of-points rows under bbox/radius: their spanning cells
        // carry the sentinel in the scalar column, and the per-point
        // `geocells_` exists-overlap conjunct prunes them — counts must
        // equal the unpruned recomputation (∃ over both points)
        ("multi_bbox", cnt(
          s"""{"must": [{"key": "kind", "match": {"value": "multi"}}, $bbox]}""")),
        ("multi_radius", cnt(
          s"""{"must": [{"key": "kind", "match": {"value": "multi"}}, $radius]}""")),
        ("mustnot_radius", cnt(s"""{"must_not": [$radius]}""")),
        ("polygon", cnt(s"""{"must": [$poly]}""")),
        ("radius", cnt(s"""{"must": [$radius]}""")))
        .toDF("arm", "cnt").orderBy("arm")
    }),
    // Slice: deterministic SipHash-2-4 partition of the id space. SipHash
    // is not expressible in DuckDB, so the entry emits a one-row derived
    // contract the oracle asserts: the `total` slices are a PARTITION of the
    // table (every row in exactly one slice, counts sum to the total row
    // count) and every slice is non-empty. Known SipHash test vectors are
    // additionally asserted in FilterSpec.
    "slice_filter" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val compiler = new FilterCompiler(new TypedResolver(e.schema, "vec_id"))
      val preds = (0 until 4).map(i =>
        compiler.compile(Filter.mustAll(SliceCond(total = 4, index = i))))
      // single scan: per-row slice-membership count + per-slice counts
      val row = e.select(
          (preds.zipWithIndex.map { case (p, i) =>
            sum(when(p, 1L).otherwise(0L)).as(s"c$i")
          } :+ count(lit(1)).as("n") :+
            max(preds.map(p => when(p, 1).otherwise(0)).reduce(_ + _)).as("maxm") :+
            min(preds.map(p => when(p, 1).otherwise(0)).reduce(_ + _)).as("minm")): _*)
        .head()
      val counts = (0 until 4).map(i => row.getLong(i))
      import s.implicits._
      Seq((counts.sum == row.getLong(4),
          row.getInt(5) == 1 && row.getInt(6) == 1,
          counts.forall(_ > 0)))
        .toDF("covering_ok", "exactly_one_ok", "nonempty_ok")
    }),
    // recency scoring: gaussian decay of event time toward a target instant
    // (the datetime-decay use of the formula language) + a value term
    "formula_recency" -> ((s, dir) => {
      import Formula._
      val ev = events(s, dir).filter(col("event_type") === "click")
      // PayloadVar over a temporal column reads as epoch seconds
      // (Temporal.asSeconds); express in hours for a well-conditioned
      // gaussian
      val hours = Mult(Seq(PayloadVar("ts"), Constant(1.0 / 3600.0)))
      val targetHours = Constant(
        java.time.Instant.parse("2024-01-15T00:00:00Z").getEpochSecond / 3600.0)
      val ast = Sum(Seq(
        Mult(Seq(Constant(0.8),
          Decay(GaussDecay, hours, targetHours, midpoint = 0.5, scale = 72.0))),
        Mult(Seq(Constant(0.01), PayloadVar("value")))))
      val expr = Formula.compile(ast, _ => lit(0.0),
        new TypedResolver(ev.schema, "event_id"))
      Search.scoredTopK(ev, "event_id", expr, largerBetter = true, k = 10)
    }),
    "formula_rescore" -> ((s, dir) => {
      import Formula._
      val e = Tables.load(s, dir, "embeddings")
      val pre = Search.knn(e, "vec_id", "embedding",
        Tables.embeddingOf(s, dir, 7L), Dot, k = 50)
      val joined = e.select("vec_id", "label").join(pre, "vec_id")
      val ast = Sum(Seq(
        Mult(Seq(Constant(0.6), ScoreVar(0))),
        Mult(Seq(Constant(0.3),
          Decay(GaussDecay, PayloadVar("label"), Constant(5.0),
            midpoint = 0.5, scale = 3.0))),
        Div(Constant(10.0), Sum(Seq(PayloadVar("vec_id"), Constant(1.0))))))
      val expr = Formula.compile(ast, _ => col("score"),
        new TypedResolver(joined.schema, "vec_id"))
      Search.scoredTopK(joined, "vec_id", expr, largerBetter = true, k = 10)
    }),
  )

  // mirror of VectorFunctions.haversineMeters with the same precomputed
  // deg→rad literal so both engines execute identical double arithmetic
  private val rad = "0.017453292519943295"
  private def haversineSql(lon2: String, lat2: String): String =
    s"2*6371008.8*asin(sqrt(power(sin((($lat2 - lat)*$rad)/2), 2) + " +
      s"cos(lat*$rad)*cos($lat2*$rad)*power(sin((($lon2 - lon)*$rad)/2), 2)))"

  private val geoCte =
    """WITH g AS (SELECT event_id,
      |  ((user_id % 360) - 180 + 0.25) AS lon,
      |  ((user_id % 180) - 90 + 0.25) AS lat FROM events)""".stripMargin

  /** Mirror of the driver-side geo estimate over the deterministic
    * fixture: candidates = single-point rows falling in any cover cell's
    * half-open box (disjoint — exactly the sidecar's per-cell counts
    * under the cover) + the sentinel rows (array-valued shape 6 +
    * non-geo-shaped shape 5), then the single-must `combine_must` round
    * trip `round(n·(c/n))`. */
  private def geoEstimateSql(cover: Seq[String]): String = {
    val boxes = cover.map { c =>
      val (lonLo, latLo, lonHi, latHi) = graft.index.GeoIndex.cellBox(c)
      s"(lon >= $lonLo AND lon < $lonHi AND lat >= $latLo AND lat < $latHi)"
    }.mkString("(", "\n     OR ", ")")
    s"""WITH g AS (SELECT doc_id,
       |    ((doc_id*7) % 360) - 180 + 0.25 AS lon,
       |    ((doc_id*11) % 180) - 90 + 0.25 AS lat,
       |    doc_id % 8 AS shape FROM documents),
       |  m AS (SELECT count(*)::DOUBLE AS n,
       |    (sum(CASE WHEN shape NOT IN (5, 6, 7) AND $boxes
       |          THEN 1 ELSE 0 END)
       |     + sum(CASE WHEN shape IN (5, 6) THEN 1 ELSE 0 END))::DOUBLE AS c
       |    FROM g)
       |SELECT CAST(round(n * (c / n)) AS BIGINT) AS cnt FROM m""".stripMargin
  }

  /** Ray-cast membership for an axis-aligned rectangle ring
    * [(lonLo,latLo),(lonHi,latLo),(lonHi,latHi),(lonLo,latHi),close] —
    * term-by-term the Spark `pointInRing` result: the two horizontal
    * edges' crossings are identically false (omitted), the two vertical
    * edges' x-intersections fold to their constant lon (IEEE-exact:
    * `0.0*(lat-a)/Δ + lon` = lon). */
  private def rectRaycastSql(lonLo: Double, latLo: Double,
      lonHi: Double, latHi: Double): String =
    s"""((CASE WHEN (($latLo > lat) != ($latHi > lat)) AND lon < $lonHi
       |      THEN 1 ELSE 0 END)
       | + (CASE WHEN (($latHi > lat) != ($latLo > lat)) AND lon < $lonLo
       |      THEN 1 ELSE 0 END)) % 2 = 1""".stripMargin

  private val trichotomyCte =
    """WITH p AS (SELECT doc_id, doc_id % 6 AS bucket,
      |  CASE CAST(doc_id % 6 AS INT)
      |    WHEN 0 THEN '{"tags":["a","b"]}' WHEN 1 THEN '{"tags":[]}'
      |    WHEN 2 THEN '{"tags":null}' WHEN 3 THEN '{}'
      |    WHEN 4 THEN '{"tags":"x"}' ELSE '{"tags":[null]}' END AS payload
      |  FROM documents),
      |t AS (SELECT bucket,
      |  list_contains(json_keys(payload), 'tags') AS present,
      |  coalesce(json_type(payload, '$.tags') = 'NULL', false) AS explicit_null,
      |  CASE WHEN json_type(payload, '$.tags') = 'ARRAY'
      |    THEN len(list_filter(CAST(json_extract(payload, '$.tags') AS JSON[]),
      |             x -> x IS NOT NULL))
      |    WHEN coalesce(json_type(payload, '$.tags') = 'NULL', true) THEN 0
      |    ELSE 1 END AS vals_len,
      |  coalesce(CASE WHEN json_type(payload, '$.tags') = 'ARRAY'
      |    THEN len(list_filter(CAST(json_extract(payload, '$.tags') AS JSON[]),
      |             x -> x IS NULL)) > 0 END, false) AS has_null_elem
      |  FROM p)""".stripMargin

  val oracles: Map[String, String] = Map(
    "payload_json_facet" ->
      """SELECT event_type AS value, count(*)::BIGINT AS cnt FROM events
        |WHERE json_extract(props, '$.k')::BIGINT >= 10
        |  AND json_extract(props, '$.k')::BIGINT < 500
        |GROUP BY 1 ORDER BY cnt DESC, value ASC LIMIT 10""".stripMargin,
    "payload_json_count" ->
      """SELECT count(*)::BIGINT AS cnt FROM events
        |WHERE json_extract(props, '$.k')::BIGINT >= 50""".stripMargin,
    // trichotomy CTE: rebuild the payload column, derive presence /
    // explicit-null / array-element facts with DuckDB JSON functions
    // (json_extract alone conflates explicit null with absence — json_keys
    // and json_type(payload, path) disambiguate), then apply the same
    // IsEmpty / IsNull algebra as FilterCompiler
    "filter_is_empty" ->
      s"""$trichotomyCte
         |SELECT bucket, sum(CASE WHEN (NOT present)
         |    OR (vals_len = 0 AND NOT (explicit_null OR has_null_elem))
         |  THEN 1 ELSE 0 END)::BIGINT AS cnt
         |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,
    "filter_is_null" ->
      s"""$trichotomyCte
         |SELECT bucket, sum(CASE WHEN explicit_null OR has_null_elem
         |  THEN 1 ELSE 0 END)::BIGINT AS cnt
         |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,
    // the synthesized nested payload is a pure function of (doc_id, n_chars),
    // so each wildcard/nested query reduces to modular arithmetic
    "filter_nested_wildcard" ->
      """SELECT
        |  (SELECT count(*) FROM documents WHERE doc_id % 7 = 6)::BIGINT AS cnt_q1,
        |  (SELECT count(*) FROM documents
        |   WHERE (doc_id % 7 = 5 AND n_chars % 5 = 1)
        |      OR doc_id % 3 = 1)::BIGINT AS cnt_q2,
        |  (SELECT count(*) FROM documents WHERE doc_id % 7 = 6)::BIGINT AS cnt_q3,
        |  (SELECT count(*) FROM documents WHERE doc_id % 7 = 6)::BIGINT AS cnt_q4""".stripMargin,
    // bucket value populations: b0 two values, b1 [], b2 null, b3 absent,
    // b4 one scalar — any:[] matches none; except:[] matches b0,b4
    "match_empty_lists" ->
      """WITH b AS (SELECT doc_id % 5 AS bucket, count(*) AS n
        |           FROM documents GROUP BY 1)
        |SELECT bucket, 0::BIGINT AS cnt_any_empty,
        |  (CASE WHEN bucket IN (0, 4) THEN n ELSE 0 END)::BIGINT AS cnt_except_empty
        |FROM b ORDER BY bucket""".stripMargin,
    // values_count per bucket: 2 / 0 / 0 / 0 / 1 — lt1 and lte0 match the
    // three zero-value shapes, gte0 matches everything
    "values_count_missing" ->
      """WITH b AS (SELECT doc_id % 5 AS bucket, count(*) AS n
        |           FROM documents GROUP BY 1)
        |SELECT bucket,
        |  (CASE WHEN bucket IN (1, 2, 3) THEN n ELSE 0 END)::BIGINT AS cnt_lt1,
        |  n::BIGINT AS cnt_gte0,
        |  (CASE WHEN bucket IN (1, 2, 3) THEN n ELSE 0 END)::BIGINT AS cnt_lte0
        |FROM b ORDER BY bucket""".stripMargin,
    "match_bool_count" ->
      """WITH p AS (SELECT doc_id, doc_id % 4 AS bucket,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN '{"hot":true}' WHEN 1 THEN '{"hot":false}'
        |    WHEN 2 THEN '{}' ELSE '{"hot":null}' END AS payload
        |  FROM documents)
        |SELECT bucket, sum(CASE WHEN
        |    coalesce(json_type(payload, '$.hot') = 'BOOLEAN'
        |      AND json_extract(payload, '$.hot')::VARCHAR = 'true', false)
        |  THEN 1 ELSE 0 END)::BIGINT AS cnt
        |FROM p GROUP BY bucket ORDER BY bucket""".stripMargin,
    "geo_radius" ->
      s"""$geoCte
         |SELECT count(*)::BIGINT AS cnt FROM g
         |WHERE ${haversineSql("0", "0")} < 3000000.0""".stripMargin,
    "geo_radius_indexed" ->
      s"""$geoCte
         |SELECT count(*)::BIGINT AS cnt FROM g
         |WHERE ${haversineSql("0", "0")} < 3000000.0""".stripMargin,
    "geo_bbox" ->
      s"""$geoCte
         |SELECT count(*)::BIGINT AS cnt FROM g
         |WHERE lon > -50.0 AND lon < 50.0 AND lat < 60.0 AND lat > -30.0""".stripMargin,
    "geo_bbox_indexed" ->
      s"""$geoCte
         |SELECT count(*)::BIGINT AS cnt FROM g
         |WHERE lon > -50.0 AND lon < 50.0 AND lat < 60.0 AND lat > -30.0""".stripMargin,
    "geo_polygon" ->
      // ray casting, edges of ((-100,-50),(100,-40),(0,70)); mirrors
      // FilterCompiler.pointInRing literal-by-literal
      s"""$geoCte
         |SELECT count(*)::BIGINT AS cnt FROM g WHERE
         |((CASE WHEN ((-50.0 > lat) != (-40.0 > lat))
         |        AND lon < 200.0 * (lat - -50.0) / 10.0 + -100.0 THEN 1 ELSE 0 END)
         | + (CASE WHEN ((-40.0 > lat) != (70.0 > lat))
         |        AND lon < -100.0 * (lat - -40.0) / 110.0 + 100.0 THEN 1 ELSE 0 END)
         | + (CASE WHEN ((70.0 > lat) != (-50.0 > lat))
         |        AND lon < -100.0 * (lat - 70.0) / -120.0 + 0.0 THEN 1 ELSE 0 END)
         |) % 2 = 1""".stripMargin,
    "geo_polygon_interiors" ->
      s"""$geoCte
         |SELECT count(*)::BIGINT AS cnt FROM g
         |WHERE ${rectRaycastSql(-70.0, -70.0, 60.0, 60.0)}
         |  AND NOT ${rectRaycastSql(-60.0, 20.0, -40.0, 40.0)}""".stripMargin,
    "geo_polygon_multi_should" ->
      s"""$geoCte
         |SELECT count(*)::BIGINT AS cnt FROM g
         |WHERE ${rectRaycastSql(55.0, -35.0, 65.0, -25.0)}
         |   OR ${rectRaycastSql(-65.0, 25.0, -55.0, 35.0)}""".stripMargin,
    "count_estimate_geo" -> geoEstimateSql(
      graft.index.GeoIndex.boundedCoverBbox(-40.0, 20.0, -10.0, -10.0,
        graft.index.GeoIndex.StatsPrecision)),
    "count_estimate_geo_radius" -> geoEstimateSql(
      graft.index.GeoIndex.boundedCoverRadius(10.25, 45.25, 1000000.0,
        graft.index.GeoIndex.StatsPrecision)),
    "api_geo_field_index" -> {
      // unpruned recomputation of every arm over the deterministic fixture;
      // shape 6 rows OR both points (∃-over-values), shapes 5/7 never match
      def hv(lonE: String, latE: String): String =
        s"2*6371008.8*asin(sqrt(power(sin(((45.0 - ($latE))*$rad)/2), 2) + " +
          s"cos(($latE)*$rad)*cos(45.0*$rad)*" +
          s"power(sin(((10.0 - ($lonE))*$rad)/2), 2)))"
      def inR(lonE: String, latE: String): String =
        s"${hv(lonE, latE)} < 3000000.0"
      def inB(lonE: String, latE: String): String =
        s"(($lonE) > -50.0 AND ($lonE) < 50.0 AND " +
          s"($latE) < 60.0 AND ($latE) > -30.0)"
      def inP(lonE: String, latE: String): String =
        s"""((CASE WHEN ((-50.0 > ($latE)) != (-40.0 > ($latE)))
           |    AND ($lonE) < 200.0 * (($latE) - -50.0) / 10.0 + -100.0
           |    THEN 1 ELSE 0 END)
           | + (CASE WHEN ((-40.0 > ($latE)) != (70.0 > ($latE)))
           |    AND ($lonE) < -100.0 * (($latE) - -40.0) / 110.0 + 100.0
           |    THEN 1 ELSE 0 END)
           | + (CASE WHEN ((70.0 > ($latE)) != (-50.0 > ($latE)))
           |    AND ($lonE) < -100.0 * (($latE) - 70.0) / -120.0 + 0.0
           |    THEN 1 ELSE 0 END)) % 2 = 1""".stripMargin
      def inW(lonE: String, latE: String): String =
        s"(($lonE) > -180.0 AND ($lonE) < 180.0 AND " +
          s"($latE) < 90.0 AND ($latE) > -90.0)"
      def anyPt(cond: (String, String) => String): String =
        s"""CASE WHEN shape IN (5, 7) THEN FALSE
           |  WHEN shape = 6 THEN (${cond("lon", "lat")})
           |    OR (${cond("-lon", "-lat")})
           |  ELSE ${cond("lon", "lat")} END""".stripMargin
      s"""WITH g AS (SELECT doc_id,
         |    ((doc_id*7) % 360) - 180 + 0.25 AS lon,
         |    ((doc_id*11) % 180) - 90 + 0.25 AS lat,
         |    doc_id % 8 AS shape FROM documents),
         |  m AS (SELECT shape,
         |    ${anyPt(inR)} AS in_radius,
         |    ${anyPt(inB)} AS in_bbox,
         |    ${anyPt(inP)} AS in_poly,
         |    ${anyPt(inW)} AS in_world FROM g)
         |SELECT arm, cnt FROM (
         |  SELECT 'bad_world' AS arm,
         |    sum(CASE WHEN shape = 5 AND in_world THEN 1 ELSE 0 END)::BIGINT
         |    AS cnt FROM m
         |  UNION ALL SELECT 'bbox',
         |    sum(CASE WHEN in_bbox THEN 1 ELSE 0 END)::BIGINT FROM m
         |  UNION ALL SELECT 'cols', 1::BIGINT
         |  UNION ALL SELECT 'multi_bbox',
         |    sum(CASE WHEN shape = 6 AND in_bbox THEN 1 ELSE 0 END)::BIGINT
         |    FROM m
         |  UNION ALL SELECT 'multi_radius',
         |    sum(CASE WHEN shape = 6 AND in_radius THEN 1 ELSE 0 END)::BIGINT
         |    FROM m
         |  UNION ALL SELECT 'mustnot_radius',
         |    sum(CASE WHEN NOT in_radius THEN 1 ELSE 0 END)::BIGINT FROM m
         |  UNION ALL SELECT 'polygon',
         |    sum(CASE WHEN in_poly THEN 1 ELSE 0 END)::BIGINT FROM m
         |  UNION ALL SELECT 'radius',
         |    sum(CASE WHEN in_radius THEN 1 ELSE 0 END)::BIGINT FROM m
         |) ORDER BY arm""".stripMargin
    },
    "formula_recency" ->
      """WITH h AS (SELECT event_id, value,
        |    (epoch_us(ts) / 1e6) * (1.0/3600.0) AS hrs,
        |    epoch('2024-01-15 00:00:00'::TIMESTAMP) / 3600.0 AS h0
        |  FROM events WHERE event_type = 'click')
        |SELECT event_id,
        |  round(0.8 * exp(ln(0.5)/5184.0 * (hrs - h0) * (hrs - h0))
        |      + 0.01 * value, 6) AS score
        |FROM h ORDER BY score DESC, event_id ASC LIMIT 10""".stripMargin,
    // SipHash slice partition — one-row derived contract (see entry scaladoc)
    "slice_filter" ->
      "SELECT true AS covering_ok, true AS exactly_one_ok, true AS nonempty_ok",
    "formula_rescore" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7),
        |pre AS (SELECT e.vec_id AS vec_id,
        |          round(list_dot_product(e.embedding::DOUBLE[], q.v), 6) AS s
        |        FROM embeddings e, q ORDER BY s DESC, vec_id ASC LIMIT 50)
        |SELECT e.vec_id AS vec_id,
        |  round(0.6 * p.s
        |      + 0.3 * exp(ln(0.5)/9 * (e.label - 5.0) * (e.label - 5.0))
        |      + 10.0 / (e.vec_id + 1.0), 6) AS score
        |FROM embeddings e JOIN pre p ON e.vec_id = p.vec_id
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
  )
}
