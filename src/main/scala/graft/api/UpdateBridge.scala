package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.filters.FilterCompiler
import graft.storage.{Collection, UpdateOp}

/** Bridges parsed wire update operations ([[RequestCodec.WireOp]]) onto a
  * [[Collection]]: selector filters compile against the collection's
  * payload resolver, upsert batches materialize as micro-batch DataFrames
  * in the collection's schema, and the WHOLE op list applies as one
  * `applyBatch` — a single table rewrite, preserving the reference's
  * ordered-application semantics (`src/actix/api/update_api.rs:324`).
  */
object UpdateBridge {

  def applyJson(coll: Collection, json: String): Unit =
    apply(coll, RequestCodec.parseUpdateOperations(json))

  def apply(coll: Collection, ops: Seq[RequestCodec.WireOp]): Unit =
    coll.applyBatch(ops.flatMap(toUpdateOps(coll, _)))

  def toUpdateOps(coll: Collection, op: RequestCodec.WireOp): Seq[UpdateOp] = {
    import RequestCodec._
    op match {
      case WUpsert(points, None) =>
        Seq(UpdateOp.Upsert(wirePoints(coll, points)))
      case WUpsert(points, Some(f)) =>
        Seq(UpdateOp.UpsertConditional(wirePoints(coll, points), f))
      case WDelete(Selector(Some(ids), None)) => Seq(UpdateOp.DeleteIds(ids))
      case WDelete(sel) => Seq(UpdateOp.DeleteByFilter(sel.filter.get))
      case WSetPayload(payload, sel, false) =>
        Seq(UpdateOp.SetPayload(payload, selectorPred(coll, sel)))
      case WSetPayload(payload, sel, true) =>
        Seq(UpdateOp.OverwritePayload(payload, selectorPred(coll, sel)))
      case WDeletePayload(keys, sel) =>
        Seq(UpdateOp.DeletePayloadKeys(keys, selectorPred(coll, sel)))
      case WClearPayload(sel) =>
        Seq(UpdateOp.ClearPayload(selectorPred(coll, sel)))
      case WUpdateVectors(points) =>
        // one column edit per (point, vector name); applyBatch still folds
        // the whole list into a single rewrite
        points.flatMap { p =>
          p.vectors.toSeq.sortBy(_._1).map { case (name, vec) =>
            UpdateOp.UpdateVector(name,
              typedLit(vec.map(_.toFloat)),
              idPred(coll, Seq(p.id)))
          }
        }
      case WDeleteVectors(sel, names) =>
        names.map(n => UpdateOp.DeleteVector(n, selectorPred(coll, sel)))
    }
  }

  /** Selector → boolean Column against the collection's schema (id list or
    * compiled filter; both present = AND, matching the reference's
    * `PointsSelector` which is one-of). */
  def selectorPred(coll: Collection, sel: RequestCodec.Selector): Column = {
    val parts =
      sel.ids.map(ids => idPred(coll, ids)).toSeq ++
        sel.filter.map(f =>
          new FilterCompiler(coll.resolver(coll.read())).compile(f)).toSeq
    parts.reduce(_ && _)
  }

  private def idPred(coll: Collection, ids: Seq[Any]): Column =
    col(coll.config.idCol).isin(ids: _*)

  /** Wire points → micro-batch DataFrame in the collection's column layout:
    * id + declared vector columns (`array<float>`, encoded to the declared
    * element type inside the upsert op) + JSON payload string. Id type
    * follows the batch (u64 → LongType, UUID string → StringType —
    * `ExtendedPointId`, `types.rs:174-179`). */
  def wirePoints(coll: Collection, points: Seq[RequestCodec.WirePoint]): DataFrame = {
    require(points.nonEmpty, "upsert batch must not be empty")
    val cfg = coll.config
    val idType = points.head.id match {
      case _: String => StringType
      case _ => LongType
    }
    val vecNames = cfg.vectorNames
    val schema = StructType(
      StructField(cfg.idCol, idType) +:
        vecNames.map(n => StructField(cfg.vectorCol(n), ArrayType(FloatType))) :+
        StructField(cfg.payloadCol, StringType))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    points.foreach { p =>
      p.vectors.keys.foreach { n =>
        require(vecNames.contains(n), s"undeclared vector name '$n'")
      }
      rows.add(Row.fromSeq(
        p.id +:
          vecNames.map(n => p.vectors.get(n).map(_.map(_.toFloat)).orNull) :+
          p.payload.orNull))
    }
    coll.spark.createDataFrame(rows, schema)
  }
}
