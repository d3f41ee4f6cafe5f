package graft.storage

import org.apache.spark.sql.{Column, DataFrame}

import graft.model.Filter

/** One operation of an ordered heterogeneous batch update — the
  * `POST /collections/{name}/points/batch` surface (`UpdateOperation`,
  * `src/common/update.rs:101-110`, route `src/actix/api/update_api.rs:324`).
  *
  * A batch applies its operations in order against a single evolving table
  * plan and commits with ONE table write: all-or-nothing like the reference's
  * batch (each op sees the effects of the previous ones), and cheaper than N
  * sequential single-op jobs — the 100 TB consideration: one pass, one
  * overwrite, however long the op list.
  */
sealed trait UpdateOp

/** Upsert admission mode (`UpdateMode`, `point_ops.rs:34-42`):
  * `Upsert` inserts new points and updates existing ones (default);
  * `InsertOnly` only inserts new ids, silently skipping points that already
  * exist; `UpdateOnly` only updates existing ids, never inserting.
  * Combined with an `update_filter` the reference keeps a point when
  * InsertOnly→not-exists, Upsert→not-exists OR matches, UpdateOnly→exists
  * AND matches (`update/points/upsert.rs:60-95`). */
sealed trait UpdateMode
object UpdateMode {
  case object Upsert extends UpdateMode
  case object InsertOnly extends UpdateMode
  case object UpdateOnly extends UpdateMode
  def parse(s: String): UpdateMode = s match {
    case "upsert" => Upsert
    case "insert_only" => InsertOnly
    case "update_only" => UpdateOnly
    case other => throw new IllegalArgumentException(
      s"unknown update_mode '$other' (expected upsert | insert_only | update_only)")
  }
}

object UpdateOp {
  final case class Upsert(points: DataFrame,
      mode: UpdateMode = UpdateMode.Upsert) extends UpdateOp
  final case class UpsertConditional(points: DataFrame, filter: Filter,
      mode: UpdateMode = UpdateMode.Upsert) extends UpdateOp
  final case class DeleteIds(ids: Seq[Any]) extends UpdateOp
  final case class DeleteByFilter(filter: Filter) extends UpdateOp
  /** Merge JSON patch into the payload of rows matching `target` —
    * type-preserving, at the optional `key` JsonPath (`SetPayloadOp.key`,
    * `payload_ops.rs:64-75`); `None` = top-level merge. */
  final case class SetPayload(patch: String, target: Column,
      key: Option[String] = None) extends UpdateOp
  final case class OverwritePayload(payload: String, target: Column) extends UpdateOp
  /** Drop keys (full JsonPaths — nested `a.b`, `a[]`) from the payload. */
  final case class DeletePayloadKeys(keys: Seq[String], target: Column) extends UpdateOp
  final case class ClearPayload(target: Column) extends UpdateOp
  final case class UpdateVector(name: String, newVec: Column, target: Column) extends UpdateOp
  final case class DeleteVector(name: String, target: Column) extends UpdateOp
}
