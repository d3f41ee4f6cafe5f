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

  def apply(coll: Collection, ops: Seq[RequestCodec.WireOp]): Unit = {
    // strict-mode gate before any table plan is built (`operations/
    // verification/` update checks — batch size, unindexed update filters)
    coll.config.strictMode.foreach(sm =>
      StrictMode.verifyUpdate(ops, sm, coll.config.payloadTypes.keySet))
    coll.applyBatch(ops.flatMap(toUpdateOps(coll, _)))
  }

  def toUpdateOps(coll: Collection, op: RequestCodec.WireOp): Seq[UpdateOp] = {
    import RequestCodec._
    op match {
      case WUpsert(points, None, mode) =>
        Seq(UpdateOp.Upsert(wirePoints(coll, points), mode))
      case WUpsert(points, Some(f), mode) =>
        Seq(UpdateOp.UpsertConditional(wirePoints(coll, points), f, mode))
      case WDelete(Selector(Some(ids), None)) => Seq(UpdateOp.DeleteIds(ids))
      case WDelete(sel) => Seq(UpdateOp.DeleteByFilter(sel.filter.get))
      case WSetPayload(payload, sel, false, key) =>
        Seq(UpdateOp.SetPayload(payload, selectorPred(coll, sel), key))
      case WSetPayload(payload, sel, true, _) =>
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
            UpdateOp.UpdateVector(name, vecLit(coll, name, vec),
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

  /** Wire vector value → typed Column literal in the collection's storage
    * shape (dense `array<float>`, multi-dense `array<array<float>>`, sparse
    * `struct<indices, values>`), validated against the declared config. */
  private def vecLit(coll: Collection, name: String,
      vec: RequestCodec.WireVec): Column = {
    import RequestCodec._
    val cfg = coll.config
    vec match {
      case WDenseVec(v) =>
        require(cfg.vectors.exists(vc => vc.name == name && !vc.multivector),
          s"dense value for non-dense vector '$name'")
        typedLit(v.map(_.toFloat))
      case WMultiVec(m) =>
        require(cfg.vectors.exists(vc => vc.name == name && vc.multivector),
          s"multi-dense value for non-multivector '$name'")
        typedLit(m.map(_.map(_.toFloat)))
      case WSparseVec(is, vs) =>
        require(cfg.sparse.exists(_.name == name),
          s"sparse value for non-sparse vector '$name'")
        struct(typedLit(is).as("indices"), typedLit(vs.map(_.toFloat)).as("values"))
    }
  }

  /** Wire points → micro-batch DataFrame in the collection's column layout:
    * id + declared vector columns (dense `array<float>` — encoded to the
    * declared element type inside the upsert op — multi-dense matrices,
    * sparse structs) + JSON payload string. Id type follows the batch
    * (u64 → LongType, UUID string → StringType — `ExtendedPointId`,
    * `types.rs:174-179`). */
  def wirePoints(coll: Collection, points: Seq[RequestCodec.WirePoint]): DataFrame = {
    import RequestCodec._
    require(points.nonEmpty, "upsert batch must not be empty")
    val cfg = coll.config
    val idType = points.head.id match {
      case _: String => StringType
      case _ => LongType
    }
    val sparseType = StructType(Seq(
      StructField("indices", ArrayType(IntegerType)),
      StructField("values", ArrayType(FloatType))))
    val schema = StructType(
      StructField(cfg.idCol, idType) +:
        (cfg.vectors.map(vc => StructField(cfg.vectorCol(vc.name),
          if (vc.multivector) ArrayType(ArrayType(FloatType))
          else ArrayType(FloatType))) ++
          cfg.sparse.map(sc => StructField(cfg.sparseCol(sc.name), sparseType))) :+
        StructField(cfg.payloadCol, StringType))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    points.foreach { p =>
      p.vectors.keys.foreach { n =>
        require(cfg.vectors.exists(_.name == n) || cfg.sparse.exists(_.name == n),
          s"undeclared vector name '$n'")
      }
      def denseVal(vc: graft.sources.VectorConfig): Any = p.vectors.get(vc.name) match {
        case None => null
        case Some(WDenseVec(v)) if !vc.multivector => v.map(_.toFloat)
        case Some(WMultiVec(m)) if vc.multivector => m.map(_.map(_.toFloat))
        case Some(other) =>
          throw new IllegalArgumentException(
            s"vector value shape $other does not match config of '${vc.name}'")
      }
      def sparseVal(name: String): Any = p.vectors.get(name) match {
        case None => null
        case Some(WSparseVec(is, vs)) => Row(is, vs.map(_.toFloat))
        case Some(other) =>
          throw new IllegalArgumentException(
            s"sparse vector '$name' given non-sparse value $other")
      }
      rows.add(Row.fromSeq(
        p.id +:
          (cfg.vectors.map(denseVal) ++ cfg.sparse.map(sc => sparseVal(sc.name))) :+
          p.payload.orNull))
    }
    coll.spark.createDataFrame(rows, schema)
  }
}
