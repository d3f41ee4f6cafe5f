package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.filters.{FieldResolver, FilterCompiler}
import graft.model.Filter

/** Non-scoring reads: count, facet, scroll (id / payload-field order).
  * SURVEY.md §2.4. */
object Reads {

  private def pred(filter: Option[Filter], r: FieldResolver): Option[Column] =
    filter.filterNot(_.isEmpty).map(f => new FilterCompiler(r).compile(f))

  /** Exact count of points matching filter.
    * Ref `lib/shard/src/count.rs:15-23` (Spark counts are always exact). */
  def count(points: DataFrame, filter: Option[Filter], r: FieldResolver): DataFrame = {
    val base = pred(filter, r).fold(points)(points.filter)
    base.agg(org.apache.spark.sql.functions.count(lit(1)).as("cnt"))
  }

  /** Facet: per-value point counts for a keyword/int/bool field, top-`limit`
    * by count (unique per point). Multi-valued fields contribute each value
    * once per point. Ref `lib/segment/src/data_types/facets.rs:16-120`,
    * merge `lib/collection/src/collection/facet.rs:83-130`.
    * Deterministic tiebreak: value ascending.
    */
  def facet(
      points: DataFrame,
      idCol: String,
      field: String,
      filter: Option[Filter],
      r: FieldResolver,
      limit: Int = 10): DataFrame = {
    val base = pred(filter, r).fold(points)(points.filter)
    base
      .select(col(idCol), explode(r.values(field)).as("value"))
      .groupBy(col("value"))
      .agg(count_distinct(col(idCol)).as("cnt"))
      .orderBy(col("cnt").desc, col("value").asc)
      .limit(limit)
  }

  /** `ExtendedPointId` total order over a STRING id column that may mix
    * decimal-rendered numeric ids with canonical UUIDs: the reference's
    * derived Ord puts every NumId before every Uuid, NumId numerically,
    * Uuid in byte order (`types.rs:174-179`). Canonical lowercase uuid
    * strings compare bytewise AS strings, so `"0" + zero-padded-decimal`
    * vs `"1" + uuid` realizes the order in one sortable key. Pure-UUID
    * collections get the same relative order as the raw column. */
  private[graft] def idSortKey(c: Column): Column =
    when(c.rlike("^[0-9]+$"), concat(lit("0"), lpad(c, 20, "0")))
      .otherwise(concat(lit("1"), c))

  private[graft] def idSortKeyLit(id: Any): String = id match {
    case l: Long => "0" + "%020d".format(l)
    case s: String if s.nonEmpty && s.forall(_.isDigit) =>
      "0" + ("0" * (20 - s.length)) + s
    case other => "1" + other.toString
  }

  private def idIsString(points: DataFrame, idCol: String): Boolean =
    points.schema.fields.find(_.name == idCol)
      .exists(_.dataType == org.apache.spark.sql.types.StringType)

  /** Scroll by id: keyset pagination — filter, id ≥ offset, order by id.
    * Ref `lib/collection/src/shards/local_shard/scroll.rs:64-130`. The
    * (limit+1)-th row is the caller's `next_page_offset`. Ids are Long or
    * UUID strings; string columns order via [[idSortKey]] so mixed
    * NumId+Uuid collections page in `ExtendedPointId` order. A UUID offset
    * additionally conjoins the raw pushable bound `id >= uuid` (implied:
    * every uuid ≥ the offset satisfies it; numerics are already excluded
    * by the key bound) so the scan still prunes on the id-sorted layout. */
  def scrollById(
      points: DataFrame,
      idCol: String,
      filter: Option[Filter],
      r: FieldResolver,
      offsetId: Option[Any],
      limit: Int,
      projection: Seq[String]): DataFrame = {
    val base = pred(filter, r).fold(points)(points.filter)
    if (!idIsString(points, idCol)) {
      val paged = offsetId.fold(base) {
        // UUID offset, numeric collection: every NumId < every Uuid, so
        // the page past the offset is empty (`ExtendedPointId` Ord)
        case _: String => base.filter(lit(false))
        case o => base.filter(col(idCol) >= lit(o))
      }
      paged.orderBy(col(idCol).asc).limit(limit).select(projection.map(col): _*)
    } else {
      val key = idSortKey(col(idCol))
      val paged = offsetId.fold(base) { o =>
        val exact = key >= lit(idSortKeyLit(o))
        o match {
          case s: String if !s.forall(_.isDigit) =>
            base.filter(exact && col(idCol) >= lit(s))
          case l: Long => base.filter(exact)
          case _ => base.filter(exact)
        }
      }
      paged.orderBy(key.asc).limit(limit).select(projection.map(col): _*)
    }
  }

  /** Scroll ordered by a payload field (asc/desc) with `start_from` cursor;
    * rows missing the field sort last; id tiebreak for determinism.
    * Ref `lib/segment/src/data_types/order_by.rs:16-170`,
    * `local_shard/scroll.rs:337-450`. */
  def scrollByField(
      points: DataFrame,
      idCol: String,
      field: String,
      asc: Boolean,
      filter: Option[Filter],
      r: FieldResolver,
      startFrom: Option[Any],
      limit: Int,
      projection: Seq[String]): DataFrame = {
    val base = pred(filter, r).fold(points)(points.filter)
    val cursored = startFrom.fold(base) { s =>
      // cursor coerces to the field's type: datetime fields accept epoch
      // nanos and RFC3339-family strings (Temporal.boundLit)
      val dt = points.schema.fields.find(_.name == field).map(_.dataType)
      val b = graft.filters.Temporal.boundLit(dt, s)
      base.filter(if (asc) col(field) >= b else col(field) <= b)
    }
    val idOrd =
      if (idIsString(points, idCol)) idSortKey(col(idCol)).asc
      else col(idCol).asc
    val ord = Seq(
      if (asc) col(field).asc_nulls_last else col(field).desc_nulls_last,
      idOrd)
    cursored.orderBy(ord: _*).limit(limit).select(projection.map(col): _*)
  }

  /** Random-order scroll (`ScrollOrder::Random`,
    * `lib/shard/src/query/scroll.rs:35-40`): a filtered page in
    * pseudorandom order. The reference samples via RNG per request;
    * here the order is a seeded xxhash64 of the id — pseudorandom with
    * respect to id/payload order, deterministic across runs and
    * partitionings (the engine's seeded-sampling contract, like
    * `sample_random`). orderBy+limit plans as TakeOrderedAndProject:
    * per-partition top-k then a driver merge of k-row heads, no global
    * sort at scale. */
  def scrollRandom(
      points: DataFrame,
      idCol: String,
      filter: Option[Filter],
      r: FieldResolver,
      seed: Long,
      limit: Int,
      projection: Seq[String]): DataFrame = {
    val base = pred(filter, r).fold(points)(points.filter)
    base.orderBy(xxhash64(col(idCol), lit(seed)).asc, col(idCol).asc)
      .limit(limit).select(projection.map(col): _*)
  }

  /** One scroll page + cursor: fetch limit+1 rows, return the first `limit`
    * and the (limit+1)-th id as `next_page_offset` (None once exhausted) —
    * the API-level pagination contract
    * (`lib/collection/src/collection/point_ops.rs:390-425`). The page is
    * collected (a page is small by construction). */
  def scrollPage(
      points: DataFrame,
      idCol: String,
      filter: Option[Filter],
      r: FieldResolver,
      offsetId: Option[Any],
      limit: Int,
      projection: Seq[String]): (Seq[org.apache.spark.sql.Row], Option[Any]) = {
    val proj = if (projection.contains(idCol)) projection else idCol +: projection
    val rows = scrollById(points, idCol, filter, r, offsetId, limit + 1, proj)
      .collect().toSeq
    if (rows.length <= limit) (rows, None)
    else {
      val idIdx = proj.indexOf(idCol)
      (rows.take(limit), Some(rows(limit).get(idIdx)))
    }
  }

  /** Retrieve by ids with projection (the `with_payload`/`with_vector`
    * selector surface, ref `src/actix/api/retrieve_api.rs:75,132`).
    * Ids are Long or UUID strings (`ExtendedPointId`, `types.rs:174-179`). */
  def retrieve(
      points: DataFrame,
      idCol: String,
      ids: Seq[Any],
      projection: Seq[String]): DataFrame =
    points.filter(col(idCol).isin(ids: _*))
      .orderBy(col(idCol).asc).select(projection.map(col): _*)
}
