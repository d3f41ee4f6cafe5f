package graft.api

import org.json4s._

import graft.model._
import graft.ops.PointQuery

/** Collection strict mode (`StrictModeConfig`, `lib/segment/src/types.rs:
  * 1323-1430`; request verification `lib/collection/src/operations/
  * verification/`; `tests/openapi/test_strictmode.py`). The gate runs
  * BEFORE execution and rejects requests that exceed the collection's
  * declared limits — the reference returns HTTP 403 with a
  * "Strict mode violation" message.
  *
  * Enforced here (the request-shape limits with a batch analog):
  * `max_query_limit`, `unindexed_filtering_retrieve`,
  * `unindexed_filtering_update`, `search_allow_exact`,
  * `search_max_oversampling`, `upsert_max_batchsize`,
  * `filter_max_conditions`, `condition_max_size`.
  *
  * Parsed and recorded but NOT enforced (serving-machinery knobs with no
  * batch analog — documented, not silently dropped): `max_timeout`,
  * `search_max_hnsw_ef` (HNSW out of scope per BASELINE), rate limits,
  * storage byte caps, `max_points_count`, memory quotas.
  */
final case class StrictModeConfig(
    enabled: Boolean = false,
    maxQueryLimit: Option[Int] = None,
    unindexedFilteringRetrieve: Option[Boolean] = None,
    unindexedFilteringUpdate: Option[Boolean] = None,
    searchAllowExact: Option[Boolean] = None,
    searchMaxOversampling: Option[Double] = None,
    upsertMaxBatchsize: Option[Int] = None,
    filterMaxConditions: Option[Int] = None,
    conditionMaxSize: Option[Int] = None)

/** A strict-mode rejection (the 403 payload's description). */
final class StrictModeViolation(msg: String)
  extends IllegalArgumentException(s"Strict mode violation: $msg")

object StrictMode {

  /** `strict_mode_config` wire body (create/update collection). */
  def parse(json: String): StrictModeConfig = {
    val o = org.json4s.jackson.JsonMethods.parse(json)
    // accept every JSON number spelling (JInt/JLong/JDouble/JDecimal) — a
    // limit arriving as `100.0` must still be ENFORCED, not silently None
    def numOf(k: String): Option[Double] = (o \ k) match {
      case JInt(v) => Some(v.toDouble)
      case JLong(v) => Some(v.toDouble)
      case JDouble(v) => Some(v)
      case JDecimal(v) => Some(v.toDouble)
      case JNothing | JNull => None
      case other =>
        throw new IllegalArgumentException(s"expected number for '$k', got $other")
    }
    def intOf(k: String): Option[Int] = numOf(k).map(_.toInt)
    def boolOf(k: String): Option[Boolean] = (o \ k) match {
      case JBool(b) => Some(b)
      case _ => None
    }
    StrictModeConfig(
      enabled = boolOf("enabled").getOrElse(false),
      maxQueryLimit = intOf("max_query_limit"),
      unindexedFilteringRetrieve = boolOf("unindexed_filtering_retrieve"),
      unindexedFilteringUpdate = boolOf("unindexed_filtering_update"),
      searchAllowExact = boolOf("search_allow_exact"),
      searchMaxOversampling = numOf("search_max_oversampling"),
      upsertMaxBatchsize = intOf("upsert_max_batchsize"),
      filterMaxConditions = intOf("filter_max_conditions"),
      conditionMaxSize = intOf("condition_max_size"))
  }

  /** Gate a parsed universal-query request (recurses into prefetches —
    * the reference verifies the whole tree,
    * `verification/new_query.rs`). `indexedKeys` = payload fields with a
    * declared index (`CollectionConfig.payloadTypes` keys). */
  def verifyQuery(q: PointQuery.Query, cfg: StrictModeConfig,
      indexedKeys: Set[String]): Unit = {
    if (!cfg.enabled) return
    cfg.maxQueryLimit.foreach { max =>
      if (q.limit > max)
        throw new StrictModeViolation(
          s"limit ${q.limit} exceeds max_query_limit $max")
    }
    q.params.foreach { p =>
      if (p.exact && !cfg.searchAllowExact.getOrElse(true))
        throw new StrictModeViolation("exact search is not allowed")
      (p.oversampling, cfg.searchMaxOversampling) match {
        case (Some(o), Some(max)) if o > max =>
          throw new StrictModeViolation(
            s"oversampling $o exceeds search_max_oversampling $max")
        case _ => ()
      }
    }
    q.filter.foreach(f =>
      verifyFilter(f, cfg, indexedKeys,
        allowUnindexed = cfg.unindexedFilteringRetrieve.getOrElse(true)))
    q.prefetches.foreach(verifyQuery(_, cfg, indexedKeys))
  }

  /** Gate a parsed update-op batch (`verification/` update checks). */
  def verifyUpdate(ops: Seq[RequestCodec.WireOp], cfg: StrictModeConfig,
      indexedKeys: Set[String]): Unit = {
    if (!cfg.enabled) return
    import RequestCodec._
    val allowUnindexed = cfg.unindexedFilteringUpdate.getOrElse(true)
    def selector(sel: Selector): Unit =
      sel.filter.foreach(verifyFilter(_, cfg, indexedKeys, allowUnindexed))
    ops.foreach {
      case WUpsert(points, updateFilter, _, _) =>
        cfg.upsertMaxBatchsize.foreach { max =>
          if (points.size > max)
            throw new StrictModeViolation(
              s"upsert batch of ${points.size} exceeds upsert_max_batchsize $max")
        }
        updateFilter.foreach(verifyFilter(_, cfg, indexedKeys, allowUnindexed))
      case WDelete(sel) => selector(sel)
      case WSetPayload(_, sel, _, _) => selector(sel)
      case WDeletePayload(_, sel) => selector(sel)
      case WClearPayload(sel) => selector(sel)
      case WUpdateVectors(_, _, uf) =>
        uf.foreach(verifyFilter(_, cfg, indexedKeys, allowUnindexed))
      case WDeleteVectors(sel, _) => selector(sel)
    }
  }

  /** Filter-only gate for the non-query read endpoints (count / facet /
    * scroll / matrix — the reference verifies their filters through the
    * same `operations/verification` checks). */
  def verifyFilter(f: Filter, cfg: StrictModeConfig,
      indexedKeys: Set[String]): Unit =
    if (cfg.enabled)
      verifyFilter(f, cfg, indexedKeys,
        cfg.unindexedFilteringRetrieve.getOrElse(true))

  private def verifyFilter(f: Filter, cfg: StrictModeConfig,
      indexedKeys: Set[String], allowUnindexed: Boolean): Unit = {
    val conds = allConditions(f)
    cfg.filterMaxConditions.foreach { max =>
      if (conds.size > max)
        throw new StrictModeViolation(
          s"filter with ${conds.size} conditions exceeds filter_max_conditions $max")
    }
    cfg.conditionMaxSize.foreach { max =>
      conds.foreach { c =>
        val size = c match {
          case MatchAny(_, vs) => vs.size
          case MatchExcept(_, vs) => vs.size
          case HasId(ids) => ids.size
          case _ => 0
        }
        if (size > max)
          throw new StrictModeViolation(
            s"condition of size $size exceeds condition_max_size $max")
      }
    }
    if (!allowUnindexed) {
      addressedKeys(f).find(k => !indexedKeys.contains(stripPath(k)))
        .foreach(k => throw new StrictModeViolation(
          s"filtering on unindexed field '$k' is not allowed"))
    }
  }

  /** Payload keys addressed by the filter, with nested conditions
    * contributing their FULL paths — inner keys are RELATIVE to the
    * nested root (`a[].b` indexes under `a`), so they must not be tested
    * as top-level fields. */
  private def addressedKeys(f: Filter, prefix: Option[String] = None): Seq[String] = {
    def withPrefix(k: String) = prefix.fold(k)(p => s"$p.$k")
    val top = f.must ++ f.should ++ f.mustNot ++
      f.minShould.map(_.conditions).getOrElse(Nil)
    top.flatMap {
      case SubFilter(inner) => addressedKeys(inner, prefix)
      case NestedCond(k, inner) =>
        withPrefix(k) +: addressedKeys(inner, Some(withPrefix(stripPath(k))))
      case c => keyOf(c).map(withPrefix).toSeq
    }
  }

  /** Flatten the condition tree (SubFilter / Nested recurse). */
  private def allConditions(f: Filter): Seq[Condition] = {
    val top = f.must ++ f.should ++ f.mustNot ++
      f.minShould.map(_.conditions).getOrElse(Nil)
    top.flatMap {
      case SubFilter(inner) => allConditions(inner)
      case n @ NestedCond(_, inner) => n +: allConditions(inner)
      case c => Seq(c)
    }
  }

  private def keyOf(c: Condition): Option[String] = c match {
    case MatchValue(k, _) => Some(k)
    case MatchAny(k, _) => Some(k)
    case MatchExcept(k, _) => Some(k)
    case MatchText(k, _) => Some(k)
    case MatchTextAny(k, _) => Some(k)
    case MatchPhrase(k, _) => Some(k)
    case MatchPrefix(k, _) => Some(k)
    case RangeCond(k, _, _, _, _) => Some(k)
    case ValuesCount(k, _, _, _, _) => Some(k)
    case GeoBoundingBox(k, _, _) => Some(k)
    case GeoRadius(k, _, _) => Some(k)
    case GeoPolygonCond(k, _, _) => Some(k)
    case IsEmpty(k) => Some(k)
    case IsNullCond(k) => Some(k)
    // HasId / HasVector / Slice / SubFilter address no payload field —
    // always allowed regardless of indexing (matches the reference's
    // payload-index check surface)
    case _ => None
  }

  /** `a.b[0].c` → `a` (indexes are declared on the first key, like the
    * reference's JsonPath `first_key`). */
  private def stripPath(k: String): String =
    k.takeWhile(ch => ch != '.' && ch != '[')
}
