package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.filters.Cardinality
import graft.filters.Cardinality._
import graft.model._

/** Driver-side cardinality estimation ([[graft.filters.Cardinality]]) —
  * pins the combination formulas (`query_estimator.rs`), the per-condition
  * dispatch, and the min ≤ exp ≤ max / containment invariants the
  * reference debug-asserts. End-to-end parity (including the DuckDB-
  * reproduced arithmetic) lives in the `count_estimate_*` CORRECTNESS
  * entries. */
class CardinalitySpec extends AnyFunSuite {

  private val snap = FieldStatsSnapshot(
    total = 1000L,
    vectorCounts = Map("" -> 900L, "img" -> 400L),
    values = Map(
      "lang" -> ValueStats(
        indexedPoints = 1000L, valuesCount = 1000L, uniqueValues = 4L,
        counts = Map("en" -> 600L, "de" -> 250L, "fr" -> 100L, "es" -> 50L),
        tailUnique = 0L, tailValues = 0L),
      // multi-valued with a capped head: 200 tail values over 50 uniques
      "tags" -> ValueStats(
        indexedPoints = 700L, valuesCount = 1500L, uniqueValues = 53L,
        counts = Map("a" -> 650L, "b" -> 400L, "c" -> 250L),
        tailUnique = 50L, tailValues = 200L)),
    hist = Map(
      "len" -> HistStats(
        indexedPoints = 1000L, totalValues = 1000L, maxValuesPerPoint = 1L,
        lo = 0.0, hi = 100.0,
        buckets = Seq.tabulate(64)(i => if (i < 10) 100L else 0L))),
    nulls = Map("lang" -> NullStats(7L, 3L)),
    stringTyped = Set("lang", "tags"),
    boolTyped = Set.empty)

  private def wellFormed(e: CardEst): Unit = {
    assert(e.min <= e.exp, s"min>exp in $e")
    assert(e.exp <= e.max || e.exp == 0L, s"exp>max in $e")
    assert(e.min >= 0L)
  }

  test("combine_must: stepwise min, min-of-max, independence exp") {
    val e = combineMust(Seq(CardEst.exact(600), CardEst.exact(500)), 1000L)
    assert(e.min == 100L) // 600+500-1000
    assert(e.max == 500L)
    assert(e.exp == 300L) // 1000·0.6·0.5
    wellFormed(e)
    // three clauses, empty intersection possible
    val e3 = combineMust(
      Seq(CardEst.exact(300), CardEst.exact(300), CardEst.exact(300)), 1000L)
    assert(e3.min == 0L && e3.max == 300L && e3.exp == 27L)
  }

  test("combine_should: complement rule") {
    val e = combineShould(Seq(CardEst.exact(600), CardEst.exact(500)), 1000L)
    assert(e.min == 600L)
    assert(e.max == 1000L)
    assert(e.exp == 800L) // 1000·(1 − 0.4·0.5)
    val capped = combineShould(Seq(CardEst.exact(300), CardEst.exact(200)), 1000L)
    assert(capped.max == 500L)
  }

  test("min_should: OR over size-k AND combinations; k>n is exact(0)") {
    val es = Seq(CardEst.exact(600), CardEst.exact(500), CardEst.exact(400))
    val e = combineMinShould(es, 2, 1000L)
    // pairwise musts: (600,500)->300, (600,400)->240, (500,400)->200
    // should: 1000·(1−0.7·0.76·0.8) = 574.4 → 574
    assert(e.exp == 574L)
    assert(combineMinShould(es, 4, 1000L) == CardEst.exact(0L))
  }

  test("invert flips the triple") {
    val e = invert(CardEst(100L, 300L, 700L), 1000L)
    assert(e == CardEst(300L, 700L, 900L))
  }

  test("unknown is {0, total/2 (integer), total}") {
    assert(CardEst.unknown(1001L) == CardEst(0L, 500L, 1001L))
  }

  test("match value: exact for known, zero for absent on uncapped, tail avg on capped") {
    assert(estimateCondition(MatchValue("lang", "en"), snap) == CardEst.exact(600L))
    assert(estimateCondition(MatchValue("lang", "xx"), snap) == CardEst.exact(0L))
    val tail = estimateCondition(MatchValue("tags", "zz"), snap)
    assert(tail == CardEst(0L, 4L, 200L)) // round(200/50)=4, capped by tail mass
    // type mismatch → unknown, like a per-type index declining the query
    assert(estimateCondition(MatchValue("lang", 42L), snap) == CardEst.unknown(1000L))
  }

  test("match any combines over the field's indexed points; empty set is exact(0)") {
    val e = estimateCondition(MatchAny("lang", Seq("en", "de")), snap)
    // 1000·(1 − 0.4·0.75) = 700
    assert(e.exp == 700L && e.min == 600L && e.max == 850L)
    assert(estimateCondition(MatchAny("lang", Nil), snap) == CardEst.exact(0L))
  }

  test("except formula clamps onto N − Σ excluded for single-valued fields") {
    val e = estimateCondition(MatchExcept("lang", Seq("en", "de")), snap)
    assert(e == CardEst.exact(150L)) // min=max=exp collapse
    wellFormed(e)
  }

  test("prefix served only from an uncapped map") {
    val e = estimateCondition(MatchPrefix("lang", "e"), snap) // en + es = 650
    assert(e.max == 650L && e.min == 325L) // ceil(650/2)
    assert(e.exp >= e.min && e.exp <= e.max)
    assert(estimateCondition(MatchPrefix("tags", "a"), snap) ==
      CardEst.unknown(1000L))
  }

  test("range over the histogram: contained vs intersecting buckets") {
    // buckets 0..9 hold 100 values each over [0, 100), width 100/64
    val w = 100.0 / 64.0
    // exactly the first 4 buckets
    val e = estimateCondition(
      RangeCond("len", gte = Some(0.0), lt = Some(4.0 * w)), snap)
    assert(e.min == 400L && e.max == 400L && e.exp == 400L)
    // half of bucket 0
    val half = estimateCondition(
      RangeCond("len", gte = Some(0.0), lt = Some(w / 2.0)), snap)
    assert(half.min == 0L && half.max == 100L)
    assert(half.exp >= 45L && half.exp <= 55L) // ~50 after Stirling
    // datetime-string bound on a NUMERIC field estimates on the epoch-nanos
    // axis (Temporal.boundLit's exact-path coercion): 2024 nanos sit far
    // beyond the [0, 100) histogram → estimated empty, not unknown
    assert(estimateCondition(
      RangeCond("len", gte = Some("2024-01-01")), snap) == CardEst.exact(0L))
    // a string with no temporal reading stays unknown
    assert(estimateCondition(
      RangeCond("len", gte = Some("abc")), snap) == CardEst.unknown(1000L))
  }

  test("datetime range on a dateTyped field estimates on the epoch-microsecond axis") {
    import graft.filters.Temporal
    val us = (s: String) => Temporal.epochMicros(Temporal.parseInstant(s).get).toDouble
    val lo = us("2024-01-01T00:00:00Z")
    val hi = us("2024-01-31T00:00:00Z")
    // 640 single-valued points uniform over January on the μs axis
    val h = HistStats(640L, 640L, 1L, lo, hi, Seq.fill(64)(10L))
    val s2 = snap.copy(hist = snap.hist + ("ts" -> h), dateTyped = Set("ts"))
    // exactly the first half of the month (the bucket grid divides 30 days
    // into 64 cells; 2024-01-16T00:00 lands mid-bucket-32)
    val e = estimateCondition(RangeCond("ts",
      gte = Some("2024-01-01T00:00:00Z"), lt = Some("2024-01-16T00:00:00Z")), s2)
    assert(e.min >= 310L && e.max <= 330L && e.exp >= e.min && e.exp <= e.max)
    // RFC3339 offset form parses too (= 15th 22:00Z)
    val eo = estimateCondition(RangeCond("ts",
      lt = Some("2024-01-15T18:00:00-04:00")), s2)
    assert(eo.max < 640L && eo.exp > 0L)
    // a numeric bound on a dateTyped field is epoch NANOS (the wire unit)
    val en = estimateCondition(RangeCond("ts",
      lt = Some((us("2024-01-16T00:00:00Z") * 1000.0).toLong)), s2)
    assert(math.abs(en.exp - e.exp) <= 10L)
  }

  test("null/empty/id/vector/slice conditions") {
    assert(estimateCondition(IsNullCond("lang"), snap) == CardEst.exact(7L))
    assert(estimateCondition(IsEmpty("lang"), snap) == CardEst.exact(3L))
    assert(estimateCondition(IsEmpty("other"), snap) == CardEst.unknown(1000L))
    assert(estimateCondition(HasId(Seq(1L, 2L, 2L)), snap) == CardEst.exact(2L))
    assert(estimateCondition(HasVector("img"), snap) == CardEst.exact(400L))
    assert(estimateCondition(HasVector("nope"), snap) == CardEst.exact(0L))
    assert(estimateCondition(SliceCond(8, 3), snap) == CardEst(0L, 125L, 1000L))
  }

  test("filter groups must-combine; empty filter is exact total") {
    val f = Filter(
      must = Seq(MatchValue("lang", "en")),
      mustNot = Seq(MatchValue("lang", "de")))
    val e = estimateFilter(f, snap)
    // must group: 600; mustNot group: invert(250)=750; combine: 1000·0.6·0.75
    assert(e.exp == 450L && e.min == 350L && e.max == 600L)
    assert(Cardinality.estimate(None, snap) == CardEst.exact(1000L))
    assert(Cardinality.estimate(Some(Filter.empty), snap) == CardEst.exact(1000L))
  }

  test("stirling multi-value estimate ≈ selected when one value per point") {
    val est = multiValueSelection(10000L, 10000L, 2500L)
    assert(math.abs(est - 2500.0) < 5.0)
  }

  test("geo estimation: cover sums, sentinel, polygon interiors arithmetic") {
    import graft.index.GeoIndex
    // per-cell counts around two precision-2 cells + 40 sentinel rows
    val homeCell = GeoIndex.encode(10.25, 45.25, GeoIndex.StatsPrecision)
    val farCell = GeoIndex.encode(-150.0, -60.0, GeoIndex.StatsPrecision)
    val g = GeoStats(multiPoints = 40L,
      cellCounts = Map(homeCell -> 100L, farCell -> 7L))
    val s = snap.copy(geo = Map("loc" -> g))
    // a radius around the home cell: candidates = home count + sentinels;
    // the far cell must not leak in
    val er = estimateCondition(
      GeoRadius("loc", GeoPoint(10.25, 45.25), 1000.0), s)
    assert(er.min == 0L && er.exp == 140L && er.max == 140L)
    wellFormed(er)
    // an unindexed geo key falls back to the unknown band
    assert(estimateCondition(
      GeoRadius("other", GeoPoint(0, 0), 1000.0), s) ==
      CardEst(0L, 500L, 1000L))
    // world-sized bbox: every cell + sentinels (cover at precision 1
    // still prefixes the precision-2 sidecar cells)
    val ew = estimateCondition(GeoBoundingBox("loc",
      GeoPoint(-179.9, 89.9), GeoPoint(179.9, -89.9)), s)
    assert(ew.exp == 147L && ew.max == 147L)
    // polygon with an interior ring over the home cell: the reference's
    // saturating subtraction (read_ops.rs:297-325) — exterior(world-ish)
    // minus interior(home) keeps min at 0 and drops exp by the hole's
    val ring = Seq(GeoPoint(-179.9, -89.9), GeoPoint(179.9, -89.9),
      GeoPoint(179.9, 89.9), GeoPoint(-179.9, 89.9),
      GeoPoint(-179.9, -89.9))
    val hole = Seq(GeoPoint(10.0, 45.0), GeoPoint(10.5, 45.0),
      GeoPoint(10.5, 45.5), GeoPoint(10.0, 45.5), GeoPoint(10.0, 45.0))
    val ep = estimateCondition(GeoPolygonCond("loc", ring, Seq(hole)), s)
    // exterior candidates 147; hole candidates 140 (home cell + sentinel)
    assert(ep.min == 0L && ep.exp == 7L && ep.max == 147L)
    wellFormed(ep)
  }
}
