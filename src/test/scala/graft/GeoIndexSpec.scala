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
      2 * 6371000 * math.asin(math.sqrt(a))
    }
    for (_ <- 1 to 2000) {
      val lon = centerLon + (rng.nextDouble() - 0.5) * 8
      val lat = centerLat + (rng.nextDouble() - 0.5) * 8
      if (hav(lon, lat) <= r)
        assert(cover.contains(GeoIndex.encode(lon, lat, 3)),
          s"point ($lon,$lat) in radius but its cell not covered")
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
}
