package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.index.GeoIndex

/** Geohash cell index: encoding vectors, cover soundness, and
  * prune-vs-exact equivalence. */
class GeoIndexSpec extends SparkTestBase {

  test("geohash encoding matches well-known vectors") {
    // the canonical example from the geohash spec
    assert(GeoIndex.encode(-5.6, 42.6, 5) == "ezs42")
    assert(GeoIndex.encode(10.40744, 57.64911, 11) == "u4pruydqqvj")
    assert(GeoIndex.encode(-0.1278, 51.5074, 6) == "gcpvj0") // London
  }

  test("radius cover contains every cell holding an in-radius point") {
    val rng = new scala.util.Random(7)
    val centerLon = 12.5; val centerLat = 41.9; val r = 250000.0
    val cover = GeoIndex.coverRadius(centerLon, centerLat, r, precision = 3).toSet
    def hav(lon: Double, lat: Double): Double = {
      val dLat = math.toRadians(lat - centerLat)
      val dLon = math.toRadians(lon - centerLon)
      val a = math.pow(math.sin(dLat / 2), 2) +
        math.cos(math.toRadians(centerLat)) * math.cos(math.toRadians(lat)) *
          math.pow(math.sin(dLon / 2), 2)
      2 * 6371008.8 * math.asin(math.sqrt(a))
    }
    for (_ <- 1 to 2000) {
      val lon = centerLon + (rng.nextDouble() - 0.5) * 8
      val lat = centerLat + (rng.nextDouble() - 0.5) * 8
      if (hav(lon, lat) <= r)
        assert(cover.contains(GeoIndex.encode(lon, lat, 3)),
          s"point ($lon,$lat) in radius but its cell not covered")
    }
  }

  test("wide high-latitude and pole-enclosing circles stay recall-safe") {
    // the planar lon span r/(m_per_deg·cos lat) UNDERESTIMATES the true
    // spherical-cap MBR at high latitude (lonDelta must be
    // asin(sin(r/R)/cos(lat)), `geo_hash.rs:542-568`, the reference's
    // wide_circle_south_pole tests) — and a circle enclosing a pole spans
    // ALL longitudes. Pin both: every point the exact haversine accepts
    // has its cell in the bounded cover, at every precision the adaptive
    // backoff can pick.
    def hav(lon: Double, lat: Double, cLon: Double, cLat: Double): Double = {
      val dLat = math.toRadians(lat - cLat)
      val dLon = math.toRadians(lon - cLon)
      val a = math.pow(math.sin(dLat / 2), 2) +
        math.cos(math.toRadians(cLat)) * math.cos(math.toRadians(lat)) *
          math.pow(math.sin(dLon / 2), 2)
      2 * 6371008.8 * math.asin(math.sqrt(a))
    }
    val rng = new scala.util.Random(11)
    val cases = Seq(
      (30.0, 60.0, 3.2e6),    // advisor's wide high-lat circle
      (10.0, 75.0, 2.0e6),    // arctic, wide
      (0.0, -80.0, 1.5e6),    // encloses the south pole
      (170.0, 65.0, 1.0e6))   // antimeridian + high lat
    for ((cLon, cLat, r) <- cases) {
      val cover = GeoIndex.boundedCoverRadius(cLon, cLat, r)
      assert(cover.nonEmpty && cover.size <= GeoIndex.MaxCoverCells)
      val prec = cover.head.length
      assert(cover.forall(_.length == prec))
      val cells = cover.toSet
      var checked = 0
      for (_ <- 1 to 20000) {
        val lon = rng.nextDouble() * 360 - 180
        val lat = rng.nextDouble() * 180 - 90
        if (hav(lon, lat, cLon, cLat) < r) {
          checked += 1
          assert(cells.contains(GeoIndex.encode(lon, lat, prec)),
            s"($lon,$lat) inside circle ($cLon,$cLat,$r) but cell uncovered")
        }
      }
      assert(checked > 0, s"no in-circle samples for ($cLon,$cLat,$r)")
    }
  }

  test("indexed radius search equals unindexed exact scan") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val pts = (1 to 3000).map(i =>
      (i.toLong, rng.nextDouble() * 360 - 180, rng.nextDouble() * 170 - 85))
    val df = pts.toDF("id", "lon", "lat")
    val exact = df.filter(VectorFunctions.haversineMeters(
        col("lon"), col("lat"), lit(30.0), lit(45.0)) < lit(2000000.0))
      .select("id").collect().map(_.getLong(0)).toSet
    val indexed = GeoIndex.withCells(df, "lon", "lat", precision = 2)
    val got = GeoIndex.radiusSearch(indexed, "lon", "lat", 30.0, 45.0,
        2000000.0, precision = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == exact)
    // and the prune is real: fewer rows pass the cell filter than the table
    val pruned = indexed.filter(col("geo_cell").isin(
      GeoIndex.coverRadius(30.0, 45.0, 2000000.0, 2): _*)).count()
    assert(pruned < 3000 && pruned >= got.size)
  }

  test("indexed bbox search equals unindexed strict scan, antimeridian included") {
    import spark.implicits._
    val rng = new scala.util.Random(43)
    val pts = (1 to 3000).map(i =>
      (i.toLong, rng.nextDouble() * 360 - 180, rng.nextDouble() * 170 - 85))
    val df = pts.toDF("id", "lon", "lat")
    val indexed = GeoIndex.withCells(df, "lon", "lat", precision = 2)
    def strictScan(tlLon: Double, tlLat: Double,
        brLon: Double, brLat: Double): Set[Long] = {
      val lonOk =
        if (tlLon > brLon) col("lon") > lit(tlLon) || col("lon") < lit(brLon)
        else col("lon") > lit(tlLon) && col("lon") < lit(brLon)
      df.filter(lonOk && col("lat") < lit(tlLat) && col("lat") > lit(brLat))
        .select("id").collect().map(_.getLong(0)).toSet
    }
    // plain box
    val exact = strictScan(-50.0, 60.0, 50.0, -30.0)
    val got = GeoIndex.bboxSearch(indexed, "lon", "lat",
        -50.0, 60.0, 50.0, -30.0, precision = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == exact)
    val pruned = indexed.filter(col("geo_cell").isin(
      GeoIndex.coverBbox(-50.0, 60.0, 50.0, -30.0, 2): _*)).count()
    assert(pruned < 3000 && pruned >= got.size)
    // ANTIMERIDIAN-crossing box: top_left.lon > bottom_right.lon
    val exactAm = strictScan(150.0, 40.0, -150.0, -40.0)
    val gotAm = GeoIndex.bboxSearch(indexed, "lon", "lat",
        150.0, 40.0, -150.0, -40.0, precision = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotAm == exactAm, "antimeridian bbox diverged from the exact scan")
    assert(gotAm.nonEmpty, "fixture: the wrap box should catch points")
  }

  test("haversine reproduces the reference's pinned distance exactly") {
    // `types.rs:5248`: "haversine distance between (0, 0) and (0.5, 0.5)
    // is 78626.29627999048" — the geo crate's Haversine.distance with
    // MEAN_EARTH_RADIUS = 6 371 008.8 (geo 0.33). Bit-exact pin: a wrong
    // radius constant shifts the 9th significant digit here.
    import spark.implicits._
    val d = Seq((0.5, 0.5)).toDF("lon", "lat")
      .select(VectorFunctions.haversineMeters(
        col("lon"), col("lat"), lit(0.0), lit(0.0)).as("d"))
      .head().getDouble(0)
    assert(d == 78626.29627999048, s"got $d")
    assert(VectorFunctions.EarthRadiusMeters == 6371008.8)
  }

  test("bounded covers stay under the cap for any shape size and stay recall-safe") {
    // the reference caps geohash regions and falls back to coarser levels
    // (`geo_hash.rs` region machinery); unbounded enumeration of a
    // continent-sized box at precision 5 would be a driver-side OOM
    val rng = new scala.util.Random(11)
    for (i <- 1 to 60) {
      // sweep box sizes from street-level to hemispheric, random centers
      val cLon = rng.nextDouble() * 360 - 180
      val cLat = rng.nextDouble() * 140 - 70
      val halfLat = math.pow(10.0, -3.0 + i % 6) // 0.001° .. 100°
      val halfLon = halfLat * (1 + rng.nextDouble())
      val tlLat = math.min(cLat + halfLat, 90.0)
      val brLat = math.max(cLat - halfLat, -90.0)
      val tlLon = math.max(cLon - halfLon, -180.0)
      val brLon = math.min(cLon + halfLon, 180.0)
      val cells = GeoIndex.boundedCoverBbox(tlLon, tlLat, brLon, brLat)
      assert(cells.nonEmpty && cells.size <= GeoIndex.MaxCoverCells,
        s"box ±$halfLat°/±$halfLon° → ${cells.size} cells")
      // recall safety at the chosen (coarser) precision: sample points
      // strictly inside the box; their STORAGE cells must have a prefix
      // in the cover
      val cover = cells.toSet
      for (_ <- 1 to 50) {
        val lat = brLat + (tlLat - brLat) * (0.001 + 0.998 * rng.nextDouble())
        val lon = tlLon + (brLon - tlLon) * (0.001 + 0.998 * rng.nextDouble())
        val storageCell = GeoIndex.encode(lon, lat, GeoIndex.ColumnPrecision)
        assert(cover.exists(storageCell.startsWith),
          s"in-box point ($lon,$lat) cell $storageCell not covered " +
            s"(cover precision ${cells.head.length})")
      }
    }
    // radius: country- and continent-sized circles
    for (r <- Seq(100.0, 5000.0, 250000.0, 2.0e6, 8.0e6, 2.0e7)) {
      val cells = GeoIndex.boundedCoverRadius(12.5, 41.9, r)
      assert(cells.nonEmpty && cells.size <= GeoIndex.MaxCoverCells,
        s"radius $r → ${cells.size} cells")
    }
    // the whole-world radius still answers (coarse cells, ≤ cap)
    val world = GeoIndex.boundedCoverRadius(0.0, 0.0, 2.1e7)
    assert(world.nonEmpty && world.size <= GeoIndex.MaxCoverCells)
  }

  test("continent-sized pruned bbox equals the full scan at the cap") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val pts = (1 to 4000).map(i =>
      (i.toLong, rng.nextDouble() * 360 - 180, rng.nextDouble() * 170 - 85))
    val df = pts.toDF("id", "lon", "lat")
    val indexed = GeoIndex.withCells(df, "lon", "lat",
      GeoIndex.ColumnPrecision)
    // a ~9000 km × ~11000 km box: full precision-5 enumeration would be
    // millions of cells; the bounded cover backs off to a coarse level
    val (tlLon, tlLat, brLon, brLat) = (-60.0, 55.0, 40.0, -25.0)
    val cover = GeoIndex.boundedCoverBbox(tlLon, tlLat, brLon, brLat)
    assert(cover.size <= GeoIndex.MaxCoverCells && cover.nonEmpty)
    assert(cover.head.length < GeoIndex.ColumnPrecision,
      "continent box should have backed off to a coarser precision")
    val pruned = indexed
      .filter(GeoIndex.prunePredicate(col("geo_cell"),
        GeoIndex.ColumnPrecision, cover))
      .filter(VectorFunctions.inBboxStrict(col("lon"), col("lat"),
        tlLon, tlLat, brLon, brLat))
      .select("id").collect().map(_.getLong(0)).toSet
    val exact = df.filter(VectorFunctions.inBboxStrict(
        col("lon"), col("lat"), tlLon, tlLat, brLon, brLat))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pruned == exact)
  }

  test("declared geo payload index: build, prune, and exact parity over mixed value shapes") {
    // the r14 crash (`get_json_object(...).cast(STRUCT)` is an illegal
    // cast) + end-to-end wiring: declaring a `"geo"` field index must
    // succeed over the reference's own mixed fixture shapes
    // (`test_geo_payload_index.py`: single point AND array of points) and
    // geo filters must return IDENTICAL results to the unindexed path.
    import graft.api.RequestCodec
    import graft.sources.CollectionConfig
    import graft.storage.Collection
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val rows = (1L to 400L).map { i =>
      val lon = rng.nextDouble() * 360 - 180
      val lat = rng.nextDouble() * 170 - 85
      val payload = (i % 8) match {
        case 6 => s"""{"location": [{"lon": $lon, "lat": $lat}, """ +
          s"""{"lon": ${-lon}, "lat": ${-lat}}], "tag": "multi"}"""
        case 7 => s"""{"tag": "noloc"}"""
        case 5 => s"""{"location": "berlin", "tag": "malformed"}"""
        case _ => s"""{"location": {"lon": $lon, "lat": $lat}, "tag": "pt"}"""
      }
      (i, payload)
    }
    val path = "/tmp/graft_runtime/geoidx_spec"
    val base = Collection.create(spark, path, CollectionConfig(),
      rows.toDF("id", "payload"))
    val filters = Seq(
      """{"must": [{"key": "location", "geo_radius":
        |  {"center": {"lon": 10.0, "lat": 45.0}, "radius": 3000000.0}}]}"""
        .stripMargin,
      """{"must": [{"key": "location", "geo_bounding_box":
        |  {"top_left": {"lon": -50.0, "lat": 60.0},
        |   "bottom_right": {"lon": 50.0, "lat": -30.0}}}]}""".stripMargin,
      // must_not exercises the prune's totality (a NULL-able prune would
      // wrongly drop no-location rows from the negation)
      """{"must_not": [{"key": "location", "geo_radius":
        |  {"center": {"lon": 10.0, "lat": 45.0}, "radius": 3000000.0}}]}"""
        .stripMargin,
      """{"must": [{"key": "location", "geo_polygon": {"exterior": {"points": [
        |  {"lon": -40.0, "lat": -20.0}, {"lon": 40.0, "lat": -20.0},
        |  {"lon": 0.0, "lat": 55.0}, {"lon": -40.0, "lat": -20.0}]}}}]}"""
        .stripMargin)
    def ids(c: Collection, f: String): Set[Long] =
      c.scroll(s"""{"limit": 1000, "with_payload": false, "filter": $f}""")
        .select("id").collect().map(_.getLong(0)).toSet
    val before = filters.map(ids(base, _))
    // declare the geo index through the wire schema (this CRASHED pre-r15)
    val (field, dt, _, flags) = RequestCodec.parseFieldIndexRequest(
      """{"field_name": "location", "field_schema": "geo"}""")
    val coll = base.buildPayloadIndex(field, dt, flags)
    val stored = coll.read()
    assert(stored.columns.contains("idx_location") &&
      stored.columns.contains("geocell_location"))
    // sentinel semantics: single-point rows carry a real cell, multi-point
    // and malformed-but-present rows carry the sentinel, absent rows null
    val cells = stored
      .select(get_json_object(col("payload"), "$.tag").as("tag"),
        col("geocell_location").as("cell"))
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(cells.collect { case ("pt", c) => c }.forall(c =>
      c.exists(s => s.length == GeoIndex.ColumnPrecision && s != "*")))
    assert(cells.collect { case ("multi", c) => c }.forall(_.contains("*")))
    assert(cells.collect { case ("malformed", c) => c }.forall(_.contains("*")))
    assert(cells.collect { case ("noloc", c) => c }.forall(_.isEmpty))
    // multi-point rows keep a NULL idx struct (not a single point) —
    // from_json null-on-malformed, like the reference's index-time skip
    assert(stored.filter(get_json_object(col("payload"), "$.tag") === "multi")
      .filter(col("idx_location").isNotNull).count() == 0)
    // filter parity, all three condition kinds + must_not
    val after = filters.map(ids(coll, _))
    assert(before == after, "indexed results diverged from unindexed")
    assert(before.head.nonEmpty && before(2).nonEmpty, "degenerate fixture")
    // array-of-points rows still match when either point is inside
    // (the exact ∃-over-values path owns sentinel rows)
    val multiInside = ids(coll,
      """{"must": [{"key": "tag", "match": {"value": "multi"}},
        |  {"key": "location", "geo_bounding_box":
        |  {"top_left": {"lon": -180.0, "lat": 90.0},
        |   "bottom_right": {"lon": 180.0, "lat": -90.0}}}]}""".stripMargin)
    assert(multiInside == rows.collect { case (i, p) if p.contains("multi") => i }.toSet)
    // upsert AFTER indexing: the write path rematerializes idx_/geocell_
    // for the new rows (a union-NULL-filled cell would break the prune)
    coll.upsert(Seq((9001L,
      """{"location": {"lon": 10.1, "lat": 45.1}, "tag": "pt"}"""))
      .toDF("id", "payload"))
    val afterUpsert = ids(coll, filters.head)
    assert(afterUpsert.contains(9001L),
      "upserted point invisible to the pruned geo filter — stale geocell")
    // payload mutation moves the point's cell: relocate 9001 out of range
    coll.setPayload("""{"location": {"lon": -170.0, "lat": -60.0}}""",
      col("id") === 9001L)
    assert(!ids(coll, filters.head).contains(9001L),
      "mutated point still matches through a stale geocell")
  }
}
