package graft.model

/** Geo point, lon/lat degrees.
  * Ref: qdrant `lib/segment/src/types.rs:2356-2361` (`GeoPoint {lon, lat}`).
  */
final case class GeoPoint(lon: Double, lat: Double)

/** Boolean filter structure.
  *
  * Semantics (ref `lib/segment/src/types.rs:4409-4441`,
  * `lib/segment/src/index/query_optimization/optimized_filter.rs:44-100`):
  * `must` = AND of conditions, `should` = OR (at least one, when non-empty),
  * `minShould` = at-least-N-of, `mustNot` = NONE may hold; the four clause
  * groups combine with AND.
  */
final case class Filter(
    must: Seq[Condition] = Nil,
    should: Seq[Condition] = Nil,
    minShould: Option[MinShould] = None,
    mustNot: Seq[Condition] = Nil) {
  def isEmpty: Boolean =
    must.isEmpty && should.isEmpty && minShould.isEmpty && mustNot.isEmpty
}

object Filter {
  val empty: Filter = Filter()
  def mustAll(cs: Condition*): Filter = Filter(must = cs)

  /** Clause-wise concatenation of two filters, mirroring
    * `Filter::merge_owned` (`types.rs:4520-4551`): must/should/mustNot lists
    * append; minShould unions the condition lists and keeps the larger
    * minCount. Used to propagate a parent/global filter into every prefetch
    * (`lib/shard/src/query/planned_query.rs:325`). */
  def merge(a: Filter, b: Filter): Filter = Filter(
    must = a.must ++ b.must,
    should = a.should ++ b.should,
    minShould = (a.minShould, b.minShould) match {
      case (Some(x), Some(y)) =>
        Some(MinShould(x.conditions ++ y.conditions, x.minCount.max(y.minCount)))
      case (x, y) => x.orElse(y)
    },
    mustNot = a.mustNot ++ b.mustNot)

  /** `Filter::merge_opts` (`types.rs:4554-4561`). */
  def mergeOpts(a: Option[Filter], b: Option[Filter]): Option[Filter] =
    (a, b) match {
      case (Some(x), Some(y)) => Some(merge(x, y))
      case (x, y) => x.orElse(y)
    }
}

/** Ref: `MinShould {conditions, min_count}` — `types.rs:4395`. */
final case class MinShould(conditions: Seq[Condition], minCount: Int)

/** Condition algebra. Ref: `Condition` enum `lib/segment/src/types.rs:3964-3985`
  * and `FieldCondition` `types.rs:3568-3596`.
  *
  * Field-key semantics: a key may resolve to zero, one, or many values (payload
  * values can be arrays); every predicate below is ∃-quantified over the
  * resolved values. A condition on an absent field is `false` (and its
  * `mustNot` is therefore `true`) — never SQL-NULL.
  */
sealed trait Condition

/** Per-field full-text index params — the analyzer configuration a declared
  * text index carries (`TextIndexParams`,
  * `lib/segment/src/data_types/index.rs:243-312`). When a field has a text
  * index, Match::Text/TextAny/Phrase queries are tokenized with the SAME
  * analyzer as the indexed values (`index.rs:243-414`), not split on
  * whitespace. */
final case class TextIndexConfig(
    tokenizer: String = "word", // word | whitespace | prefix | multilingual
    lowercase: Boolean = true,
    asciiFolding: Boolean = false,
    stopwords: Seq[String] = Nil,
    stemmerLang: Option[String] = None,
    /** `min_token_len` / `max_token_len` (`TextIndexParams`): processed
      * tokens outside the range are dropped (document AND query sides);
      * the PREFIX tokenizer instead uses them as its edge-n-gram bounds
      * (`tokenizers/mod.rs:59-140`). */
    minTokenLen: Option[Int] = None,
    maxTokenLen: Option[Int] = None,
    /** `phrase_matching` (`TextIndexParams`, `data_types/index.rs:285`):
      * positions are stored only when enabled — a Match::Phrase against a
      * text index declared WITHOUT it matches NOTHING ("Phrase matching
      * needs positional information; without it nothing matches",
      * `full_text_index/inverted_index/on_disk_inverted_index/mod.rs:601`,
      * `mutable_inverted_index.rs:167`). */
    phraseMatching: Boolean = false)

/** Exact match against any of the field's values. Ref `types.rs:3007,3095`. */
final case class MatchValue(key: String, value: Any) extends Condition
/** IN-set. Ref `Match::Any` `types.rs:3068`. */
final case class MatchAny(key: String, values: Seq[Any]) extends Condition
/** At least one value NOT in the set (not the negation of MatchAny).
  * Ref `types.rs:3075-3080`. */
final case class MatchExcept(key: String, values: Seq[Any]) extends Condition
/** Full-text: ALL query tokens present. Ref `types.rs:3014-3017`. */
final case class MatchText(key: String, text: String) extends Condition
/** Full-text: at least one query token present. Ref `types.rs:3021-3024`. */
final case class MatchTextAny(key: String, text: String) extends Condition
/** Consecutive token sequence. Ref `types.rs:3034`. */
final case class MatchPhrase(key: String, text: String) extends Condition
/** Keyword starts-with (byte-wise, case-sensitive). Ref `types.rs:3053-3065`. */
final case class MatchPrefix(key: String, prefix: String) extends Condition

/** Numeric / datetime range; any bound optional. Ref `types.rs:3229-3345`. */
final case class RangeCond(
    key: String,
    gt: Option[Any] = None,
    gte: Option[Any] = None,
    lt: Option[Any] = None,
    lte: Option[Any] = None) extends Condition

/** Count of values under key within range (absent→0, array→len, scalar→1).
  * Ref `types.rs:3348-3390`. */
final case class ValuesCount(
    key: String,
    gt: Option[Long] = None,
    gte: Option[Long] = None,
    lt: Option[Long] = None,
    lte: Option[Long] = None) extends Condition

/** Point within lon/lat box; handles antimeridian when
  * topLeft.lon > bottomRight.lon. Ref `types.rs:3400-3425`. */
final case class GeoBoundingBox(key: String, topLeft: GeoPoint, bottomRight: GeoPoint)
    extends Condition
/** Haversine distance ≤ radius meters. Ref `types.rs:3427-3449`. */
final case class GeoRadius(key: String, center: GeoPoint, radiusMeters: Double)
    extends Condition
/** Point-in-polygon, exterior ring + optional interior holes (rings closed).
  * Ref `types.rs:3451-3566`. */
final case class GeoPolygonCond(
    key: String,
    exterior: Seq[GeoPoint],
    interiors: Seq[Seq[GeoPoint]] = Nil) extends Condition

/** Field missing OR empty array. Ref `types.rs:3780-3785`. */
final case class IsEmpty(key: String) extends Condition
/** Field value is JSON null (or [null]) — distinct from absent.
  * Ref `types.rs:3786-3806`. */
final case class IsNullCond(key: String) extends Condition
/** Point id ∈ set. Ids are numeric (Long) or UUID strings — the two arms of
  * `ExtendedPointId` (`types.rs:174-179`). Ref `types.rs:3808-3820`. */
final case class HasId(ids: Seq[Any]) extends Condition
/** Deterministic hash-slice of the id space: point matches iff
  * SipHash-2-4(zero key, LE id bytes) mod total == index. Slices are
  * disjoint, cover all points, and smaller samples nest in larger ones.
  * Ref `SliceCondition` / `slice_point_id_hash` `types.rs:3860-3923`. */
final case class SliceCond(total: Int, index: Int) extends Condition {
  require(total > 0 && index >= 0 && index < total, "slice index must be in 0..total")
}
/** Named vector present. Ref `types.rs:3821-3830`. */
final case class HasVector(name: String) extends Condition
/** Per-element filter over an array-of-objects field: inner conditions must
  * hold on the SAME element. Ref `types.rs:3925-3962`. */
final case class NestedCond(key: String, filter: Filter) extends Condition
/** Nested boolean structure. Ref `types.rs:3983`. */
final case class SubFilter(filter: Filter) extends Condition
