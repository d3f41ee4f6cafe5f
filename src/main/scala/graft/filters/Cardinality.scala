package graft.filters

import graft.model._

/** Cardinality estimation for `count` with `exact: false` — the driver-side
  * analog of the reference's filter estimator
  * (`lib/segment/src/index/query_estimator.rs`,
  * `lib/collection/src/shards/local_shard/mod.rs:1070-1085`: approximate
  * count = `estimate_point_count(filter).exp`).
  *
  * The estimate runs entirely on the driver against a persisted per-field
  * statistics snapshot ([[FieldStatsSnapshot]], the analog of the payload
  * field indexes' in-memory count structures) — ZERO distributed jobs on
  * the warm path. At 100 TB this is the whole point of `exact: false`:
  * a filtered count answered from KB-scale metadata instead of a scan.
  *
  * Estimation triple: `CardinalityEstimation {min, exp, max}`
  * (`field_index/mod.rs:63-92`); the count endpoint serves `exp`.
  * Combination rules are ports of the published formulas:
  *  - must: `combine_must_estimations` (`query_estimator.rs:188-220`) —
  *    min via stepwise `max(0, acc + min_i - total)`, max = min over max_i,
  *    exp = independence product `total·∏(exp_i/total)`.
  *  - should: `combine_should_estimations` (`query_estimator.rs:133-154`) —
  *    min = max over min_i, max = capped sum, exp via the complement rule
  *    `total·(1-∏(1-exp_i/total))` (`expected_should_estimation`).
  *  - min_should: OR over all size-`minCount` AND-combinations
  *    (`combine_min_should_estimations`, `query_estimator.rs:161-186`).
  *  - must_not: per-condition inversion `(total-max, total-exp, total-min)`
  *    (`invert_estimation`, `query_estimator.rs:328-338`) then must-combine.
  *  - The four clause groups combine with must (`estimate_filter`,
  *    `query_estimator.rs:246-283`).
  *
  * Conditions the snapshot cannot serve estimate as `unknown(total)` =
  * `{0, total/2, total}` (`CardinalityEstimation::unknown`,
  * `field_index/mod.rs:85-92`) — exactly the reference's behavior for
  * un-indexed fields.
  */
object Cardinality {

  /** `CardinalityEstimation` minus primary clauses (those drive the
    * reference's index-vs-scan planning, which Catalyst owns here). */
  final case class CardEst(min: Long, exp: Long, max: Long)

  object CardEst {
    def exact(n: Long): CardEst = CardEst(n, n, n)
    /** `CardinalityEstimation::unknown` — integer halving like the Rust
      * `total / 2`. */
    def unknown(total: Long): CardEst = CardEst(0L, total / 2, total)
  }

  /** Keyword/integer-lookup per-value point counts (the map index's
    * postings lengths, `map_index/read_ops.rs:158-165`). The value map is
    * capped at build time ([[graft.storage.Collection]] keeps the TOP_K
    * heaviest values); the tail folds into `(tailUnique, tailValues)` so
    * an uncapped-value lookup still estimates from the tail average —
    * a driver sidecar must stay KB-scale however many distinct values a
    * 100 TB field carries (the reference keeps the full map because its
    * index is per-segment and mmap'd; a capped head + tail aggregate is
    * the bounded-memory analog).
    *
    * @param indexedPoints points with ≥1 value (`get_indexed_points`)
    * @param valuesCount   Σ per-value point counts (`get_values_count`)
    * @param uniqueValues  distinct values incl. tail (`get_unique_values_count`)
    */
  final case class ValueStats(
      indexedPoints: Long,
      valuesCount: Long,
      uniqueValues: Long,
      counts: Map[String, Long],
      tailUnique: Long,
      tailValues: Long) {

    /** Estimate for one value: exact posting length when the head map (or
      * an uncapped map) knows it, tail-average otherwise. */
    def countFor(v: String): CardEst = counts.get(v) match {
      case Some(c) => CardEst.exact(c)
      case None if tailUnique == 0L => CardEst.exact(0L)
      case None => CardEst(0L,
        math.round(tailValues.toDouble / tailUnique.toDouble),
        math.min(tailValues, indexedPoints))
    }
  }

  /** Equal-width value histogram for numeric range estimation — the
    * bounded-size analog of the reference's mergeable histogram
    * (`numeric_index/query.rs:40-105` drives the same min/mid/max shape
    * from it). Counts are VALUES, not points; the multi-value correction
    * below maps them back to points. */
  final case class HistStats(
      indexedPoints: Long,
      totalValues: Long,
      maxValuesPerPoint: Long,
      lo: Double,
      hi: Double,
      buckets: Seq[Long])

  /** Exact counts for the IsNull / IsEmpty conditions (the null-index
    * analog, `null_index/mod.rs`): both are plain predicates at build
    * time, so the estimate is exact by construction. */
  final case class NullStats(isNullCount: Long, isEmptyCount: Long)

  /** Per-cell point counts for a DECLARED geo payload index — the
    * driver-side analog of the reference's geohash postings counts
    * (`geo_index/read_ops.rs` `match_cardinality`: per-region
    * `points_of_hash` sums drive the estimate). Cells are coarse
    * ([[graft.index.GeoIndex.StatsPrecision]]) so the map stays bounded;
    * `multiPoints` counts sentinel rows (array-valued / non-geo-shaped —
    * candidates under EVERY cover since any of their points could fall
    * anywhere). */
  final case class GeoStats(
      multiPoints: Long,
      cellCounts: Map[String, Long]) {

    /** Candidate count for a bounded cover (prefixes at ≤ the sidecar
      * precision): Σ matching-cell counts + the sentinel rows. The cover
      * is a SUPERSET of the shape and the exact check may reject any
      * candidate, so min = 0; exp follows the reference in reading the
      * region sum as the expectation (`match_cardinality` exp reduces to
      * the region sum for single-valued fields). */
    def coverEstimate(cover: Seq[String], total: Long): CardEst = {
      if (cover.isEmpty) return CardEst(0L, total / 2, total)
      val sum = cellCounts.iterator.collect {
        case (cell, c) if cover.exists(cell.startsWith) => c
      }.sum + multiPoints
      val capped = math.min(sum, total)
      CardEst(0L, capped, capped)
    }
  }

  /** Driver-side statistics snapshot persisted beside the table
    * (`<path>_fieldstats.json`). `total` = point count;
    * `vectorCounts` = non-null count per named (dense or sparse) vector
    * (`available_vector_count`, used by HasVector —
    * `read_view/filtering.rs:140-151`). */
  final case class FieldStatsSnapshot(
      total: Long,
      vectorCounts: Map[String, Long],
      values: Map[String, ValueStats],
      hist: Map[String, HistStats],
      nulls: Map[String, NullStats],
      stringTyped: Set[String] = Set.empty,
      boolTyped: Set[String] = Set.empty,
      intTyped: Set[String] = Set.empty,
      dateTyped: Set[String] = Set.empty,
      geo: Map[String, GeoStats] = Map.empty)

  // ------------------------------------------------------------ combiners

  /** `combine_must_estimations` (`query_estimator.rs:188-220`). */
  def combineMust(es: Seq[CardEst], total: Long): CardEst = {
    val minE = es.map(_.min).foldLeft(total) { (acc, x) =>
      math.max(0L, acc + x - total)
    }
    val maxE = if (es.isEmpty) total else es.map(_.max).min
    val expProb = es.map(e => e.exp.toDouble / total.toDouble).product
    val expE = math.round(expProb * total.toDouble)
    CardEst(minE, expE, maxE)
  }

  /** `expected_should_estimation` + `combine_should_estimations`
    * (`query_estimator.rs:114-154`). */
  def combineShould(es: Seq[CardEst], total: Long): CardEst = {
    if (total == 0L) return CardEst.exact(0L)
    val notHit = es.map(e => 1.0 - e.exp.toDouble / total.toDouble).product
    CardEst(
      min = es.map(_.min).foldLeft(0L)(math.max),
      exp = math.round((1.0 - notHit) * total.toDouble),
      max = math.min(es.map(_.max).sum, total))
  }

  /** `combine_min_should_estimations` (`query_estimator.rs:161-186`):
    * OR over the AND of every size-`minCount` combination. */
  def combineMinShould(es: Seq[CardEst], minCount: Int, total: Long): CardEst =
    if (minCount > es.length) CardEst.exact(0L)
    else combineShould(
      es.combinations(minCount).map(c => combineMust(c, total)).toSeq, total)

  /** `invert_estimation` (`query_estimator.rs:328-338`). */
  def invert(e: CardEst, total: Long): CardEst =
    CardEst(
      math.max(0L, total - e.max),
      math.max(0L, total - e.exp),
      math.max(0L, total - e.min))

  // ------------------------------------------------------ value→point math

  /** `number_of_selected_points` (`stat_tools.rs:76-80`): Bloom-style
    * expected unique points among `values` random value selections. */
  def numberOfSelectedPoints(points: Long, values: Long): Long = {
    if (points == 0L) return 0L
    val p = 1.0 - math.exp(-(values.toDouble / points.toDouble))
    math.round(p * points.toDouble)
  }

  /** `estimate_multi_value_selection_cardinality` + `prob_not_select` +
    * Stirling `approx_fact_log` (`stat_tools.rs:20-73`): expected unique
    * points behind `selected` matched values when points carry
    * `totalValues/totalPoints` values on average. */
  def multiValueSelection(
      totalPoints: Long, totalValues: Long, selected: Long): Double = {
    if (totalPoints == 0L) return 0.0
    def lfact(n: Double): Double =
      if (n < 1.0) 1.0
      else math.log(math.sqrt(2.0 * math.Pi * n)) + n * math.log(n / math.E)
    val total = totalValues.toDouble
    val avg = total / totalPoints.toDouble
    val probNot = math.exp(
      lfact(total - avg) + lfact(total - selected.toDouble) -
        lfact(total - avg - selected.toDouble) - lfact(total))
    (1.0 - probNot) * totalPoints.toDouble
  }

  // -------------------------------------------------------- per condition

  /** Wire value → stats map key. Only same-typed lookups are served, like
    * the per-type map indexes (`map_index/payload_index_impl/{str,int}.rs`
    * return None on a type mismatch → unknown). */
  private def valueKey(v: Any, stringField: Boolean, boolField: Boolean): Option[String] =
    v match {
      case s: String if stringField => Some(s)
      case b: Boolean if boolField => Some(b.toString)
      case n: Long if !stringField && !boolField => Some(n.toString)
      case n: Int if !stringField && !boolField => Some(n.toString)
      case n: BigInt if !stringField && !boolField => Some(n.toString)
      case _ => None
    }

  /** `except_cardinality` (`map_index/read_ops.rs:176-228`). */
  private def exceptEstimate(st: ValueStats, keys: Seq[String]): CardEst = {
    val excludedCounts = keys.map(k => st.countFor(k).exp)
    val totalExcluded = excludedCounts.sum
    val nonExcluded = math.max(0L, st.valuesCount - totalExcluded)
    val maxValuesPerPoint = math.max(0L, st.uniqueValues - keys.length)
    if (maxValuesPerPoint == 0L) return CardEst.exact(0L)
    val minNotExcludedByValues =
      (nonExcluded + maxValuesPerPoint - 1L) / maxValuesPerPoint // div_ceil
    val minE = math.max(minNotExcludedByValues,
      math.max(0L, st.indexedPoints - totalExcluded))
    val maxExcluded = if (excludedCounts.isEmpty) 0L else excludedCounts.max
    val maxE = math.min(
      math.max(0L, st.indexedPoints - maxExcluded), nonExcluded)
    val exp = math.min(maxE, math.max(minE,
      numberOfSelectedPoints(st.indexedPoints, nonExcluded)))
    CardEst(minE, exp, maxE)
  }

  /** `prefix_cardinality` (`map_index/payload_index_impl/str.rs:243-272`):
    * served only when the value map is uncapped (tail values could hide
    * prefix matches otherwise). */
  private def prefixEstimate(st: ValueStats, prefix: String): Option[CardEst] = {
    if (st.tailUnique > 0L) return None
    val hit = st.counts.view.filterKeys(_.startsWith(prefix)).toSeq
    val keys = hit.length.toLong
    val sum = math.min(hit.map(_._2).sum, st.valuesCount)
    val maxE = math.min(sum, st.indexedPoints)
    val minE = if (keys == 0L) 0L else math.min((sum + keys - 1L) / keys, maxE)
    val exp = math.min(maxE, math.max(minE,
      numberOfSelectedPoints(st.indexedPoints, sum)))
    Some(CardEst(minE, exp, maxE))
  }

  /** Histogram range → `(min, exp, max)` over VALUES, then the
    * `range_cardinality` point-space correction
    * (`numeric_index/query.rs:40-105`). Bounds are treated as a real
    * interval; open/closed-ness is below histogram resolution (the
    * reference's histogram borders make the same concession). */
  private def rangeEstimate(
      h: HistStats,
      gt: Option[Double], gte: Option[Double],
      lt: Option[Double], lte: Option[Double]): CardEst = {
    if (h.maxValuesPerPoint == 0L) return CardEst.exact(0L)
    val b = h.buckets.length
    val a = gte.orElse(gt).getOrElse(Double.NegativeInfinity)
    val z = lte.orElse(lt).getOrElse(Double.PositiveInfinity)
    if (z < a) return CardEst.exact(0L)
    val w = if (b == 0) 0.0 else (h.hi - h.lo) / b.toDouble
    var minH = 0.0; var midH = 0.0; var maxH = 0.0
    if (w <= 0.0) {
      // degenerate single-point histogram: all values at lo
      val inside = h.lo >= a && h.lo <= z
      if (inside) { minH = h.totalValues.toDouble; midH = minH; maxH = minH }
    } else {
      var i = 0
      while (i < b) {
        val loI = h.lo + i * w
        val hiI = h.lo + (i + 1) * w
        val c = h.buckets(i).toDouble
        val overlap = math.min(z, hiI) - math.max(a, loI)
        if (overlap > 0.0) {
          maxH += c
          val frac = math.min(1.0, overlap / w)
          midH += c * frac
          if (loI >= a && hiI <= z) minH += c
        }
        i += 1
      }
    }
    val minV = math.round(minH)
    val midV = math.round(midH)
    val maxV = math.round(maxH)
    val expectedMin = math.max(
      minV / h.maxValuesPerPoint,
      math.max(math.min(1L, minV),
        minV - (h.totalValues - h.indexedPoints)))
    val expectedMax = math.min(h.indexedPoints, maxV)
    val est = math.round(
      multiValueSelection(h.indexedPoints, h.totalValues, midV))
    CardEst(expectedMin,
      math.min(expectedMax, math.max(est, expectedMin)), expectedMax)
  }

  private def numericBound(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case l: Long => Some(l.toDouble)
    case i: Int => Some(i.toDouble)
    case b: BigInt => Some(b.toDouble)
    case b: BigDecimal => Some(b.toDouble)
    case _ => None
  }

  /** Per-condition estimation — the `condition_cardinality` dispatch
    * (`struct_payload_index/read_view/filtering.rs:93-170`). */
  def estimateCondition(c: Condition, s: FieldStatsSnapshot): CardEst = {
    val total = s.total
    def unknown = CardEst.unknown(total)
    c match {
      case MatchValue(k, v) => s.values.get(k) match {
        case Some(st) =>
          valueKey(v, s.stringTyped(k), s.boolTyped(k))
            .map(st.countFor).getOrElse(unknown)
        case None => unknown
      }
      case MatchAny(k, vs) => s.values.get(k) match {
        case Some(st) =>
          val keys = vs.flatMap(valueKey(_, s.stringTyped(k), s.boolTyped(k)))
          if (vs.isEmpty) CardEst.exact(0L)
          else if (keys.length != vs.length) unknown // mixed/mistyped set
          else combineShould(keys.map(st.countFor), st.indexedPoints)
        case None => unknown
      }
      case MatchExcept(k, vs) => s.values.get(k) match {
        case Some(st) =>
          val keys = vs.flatMap(valueKey(_, s.stringTyped(k), s.boolTyped(k)))
          if (keys.length != vs.length) unknown
          else exceptEstimate(st, keys)
        case None => unknown
      }
      case MatchPrefix(k, p) => s.values.get(k)
        .filter(_ => s.stringTyped(k))
        .flatMap(prefixEstimate(_, p)).getOrElse(unknown)
      case RangeCond(k, gt, gte, lt, lte) => s.hist.get(k) match {
        case Some(h) =>
          // bound coercion mirrors [[Temporal.boundLit]]: a datetime-typed
          // field's histogram sits on the epoch-μs axis (the reference
          // stores DateTimePayloadType as i64 μs in the same numeric
          // index, `numeric_index/mod.rs`), so RFC3339 strings parse to
          // μs and wire numerics (epoch nanos) truncate to μs; a plain
          // numeric field accepts numerics as-is and datetime strings as
          // nanos (the engine's numeric wire unit)
          def conv(v: Any): Option[Double] =
            if (s.dateTyped(k)) v match {
              case str: String => Temporal.parseInstant(str)
                .map(i => Temporal.epochMicros(i).toDouble)
              case other => numericBound(other).map(_ / 1000.0)
            } else numericBound(v).orElse(v match {
              case str: String => Temporal.parseInstant(str)
                .map(i => Temporal.epochMicros(i).toDouble * 1000.0)
              case _ => None
            })
          val bs = Seq(gt, gte, lt, lte).map(_.map(conv))
          // a bound with no reading on the field's axis → unknown
          if (bs.exists(b => b.isDefined && b.get.isEmpty)) unknown
          else rangeEstimate(h, bs(0).flatten, bs(1).flatten,
            bs(2).flatten, bs(3).flatten)
        case None => unknown
      }
      case IsEmpty(k) => s.nulls.get(k)
        .map(n => CardEst.exact(n.isEmptyCount)).getOrElse(unknown)
      case IsNullCond(k) => s.nulls.get(k)
        .map(n => CardEst.exact(n.isNullCount)).getOrElse(unknown)
      case HasId(ids) =>
        // no driver-side id tracker to resolve against; assume the
        // requested ids exist (the reference resolves and uses the exact
        // surviving count, `filtering.rs:121-139`)
        CardEst.exact(math.min(ids.distinct.length.toLong, total))
      case HasVector(name) =>
        CardEst.exact(s.vectorCounts.getOrElse(name, 0L))
      case SliceCond(t, _) =>
        // `filtering.rs:156-164`
        CardEst(0L, total / t.toLong, total)
      case SubFilter(f) => estimateFilter(f, s)
      // Geo conditions on a key with a DECLARED geo index estimate from
      // the per-cell sidecar counts (`geo_index/read_ops.rs`
      // `estimate_cardinality`: regions → `match_cardinality` sums); an
      // un-indexed geo key stays unknown like the reference. The cover is
      // computed at the sidecar precision; an over-wide shape (empty
      // bounded cover) also degrades to unknown — the reference's
      // region-overflow `Ok(None)` arm.
      case GeoBoundingBox(k, tl, br) => s.geo.get(k) match {
        case Some(g) => g.coverEstimate(
          graft.index.GeoIndex.boundedCoverBbox(tl.lon, tl.lat, br.lon,
            br.lat, graft.index.GeoIndex.StatsPrecision), total)
        case None => unknown
      }
      case GeoRadius(k, c0, radius) => s.geo.get(k) match {
        case Some(g) => g.coverEstimate(
          graft.index.GeoIndex.boundedCoverRadius(c0.lon, c0.lat, radius,
            graft.index.GeoIndex.StatsPrecision), total)
        case None => unknown
      }
      // polygon: exterior-cover estimate minus each interior ring's,
      // with the reference's saturating arithmetic
      // (`polygon_hashes_estimation` consumption, `read_ops.rs:297-325`)
      case GeoPolygonCond(k, exterior, interiors) => s.geo.get(k) match {
        case Some(g) =>
          def ringEst(ring: Seq[graft.model.GeoPoint]): CardEst =
            g.coverEstimate(graft.index.GeoIndex.boundedCoverPolygon(
              ring.map(p => (p.lon, p.lat)),
              graft.index.GeoIndex.StatsPrecision), total)
          interiors.foldLeft(ringEst(exterior)) { (acc, ring) =>
            val ie = ringEst(ring)
            val minE = math.max(0L, acc.min - ie.max)
            val maxE = math.max(minE, acc.max - ie.min)
            CardEst(minE, math.max(acc.exp - ie.exp, minE), maxE)
          }
        case None => unknown
      }
      // text / values_count / nested: no snapshot structure serves them
      // here → unknown, like an un-indexed field in the reference
      case _ => unknown
    }
  }

  /** `estimate_filter` (`query_estimator.rs:246-283`). */
  def estimateFilter(f: Filter, s: FieldStatsSnapshot): CardEst = {
    val total = s.total
    val groups = Seq.newBuilder[CardEst]
    if (f.must.nonEmpty)
      groups += combineMust(f.must.map(estimateCondition(_, s)), total)
    if (f.should.nonEmpty)
      groups += combineShould(f.should.map(estimateCondition(_, s)), total)
    f.minShould.foreach { ms =>
      groups += combineMinShould(
        ms.conditions.map(estimateCondition(_, s)), ms.minCount, total)
    }
    if (f.mustNot.nonEmpty)
      groups += combineMust(
        f.mustNot.map(c => invert(estimateCondition(c, s), total)), total)
    combineMust(groups.result(), total)
  }

  /** Entry point for the count endpoint: no filter → exact total
    * (`estimate_point_count(None)`). */
  def estimate(f: Option[Filter], s: FieldStatsSnapshot): CardEst =
    f.filterNot(_.isEmpty).map(estimateFilter(_, s))
      .getOrElse(CardEst.exact(s.total))
}
