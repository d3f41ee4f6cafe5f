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
      case WUpsert(points, None, mode, bodyKey) =>
        Seq(UpdateOp.Upsert(wirePoints(coll, points, bodyKey), mode))
      case WUpsert(points, Some(f), mode, bodyKey) =>
        Seq(UpdateOp.UpsertConditional(wirePoints(coll, points, bodyKey), f, mode))
      // `PointsSelector` is serde-UNTAGGED with the id-list variant first
      // (`point_ops.rs:19-26`): a body carrying BOTH `points` and `filter`
      // deserializes as the id list (the extra field is ignored), so ids
      // take precedence here too — falling through to the filter arm would
      // silently delete every filter match instead of the named points.
      case WDelete(Selector(Some(ids), _, Nil)) => Seq(UpdateOp.DeleteIds(ids))
      case WDelete(Selector(Some(ids), _, shardKeys)) =>
        // shard-scoped id delete: the selector compiles to a filter so the
        // shard condition prunes partitions like the read paths
        Seq(UpdateOp.DeleteByFilter(graft.model.Filter(must = Seq(
          graft.model.HasId(ids), shardKeyCond(coll, shardKeys)))))
      case WDelete(sel) =>
        val base = sel.filter.get
        Seq(UpdateOp.DeleteByFilter(
          if (sel.shardKeys.isEmpty) base
          else base.copy(must = shardKeyCond(coll, sel.shardKeys) +: base.must)))
      case WSetPayload(payload, sel, false, key) =>
        Seq(UpdateOp.SetPayload(payload, selectorPred(coll, sel), key))
      case WSetPayload(payload, sel, true, _) =>
        Seq(UpdateOp.OverwritePayload(payload, selectorPred(coll, sel)))
      case WDeletePayload(keys, sel) =>
        Seq(UpdateOp.DeletePayloadKeys(keys, selectorPred(coll, sel)))
      case WClearPayload(sel) =>
        Seq(UpdateOp.ClearPayload(selectorPred(coll, sel)))
      case WUpdateVectors(points, shardKeys, updateFilter) =>
        // one column edit per (point, vector name); applyBatch still folds
        // the whole list into a single rewrite. A body `shard_key`
        // restricts which shards the edits touch (`UpdateVectors.
        // shard_key`); an `update_filter` restricts to matching points
        // (`schema.rs:1470-1473`).
        val scope = (shardKeyPred(coll, shardKeys).toSeq ++
          updateFilter.map(f =>
            new FilterCompiler(coll.resolver(coll.read())).compile(f)).toSeq)
          .reduceOption(_ && _)
        points.flatMap { p =>
          p.vectors.toSeq.sortBy(_._1).map { case (name, vec) =>
            val target = scope.fold(idPred(coll, Seq(p.id)))(
              _ && idPred(coll, Seq(p.id)))
            UpdateOp.UpdateVector(name, vecLit(coll, name, vec), target)
          }
        }
      case WDeleteVectors(sel, names) =>
        names.map(n => UpdateOp.DeleteVector(n, selectorPred(coll, sel)))
    }
  }

  /** Selector → boolean Column against the collection's schema (id list or
    * compiled filter; both present = AND, matching the reference's
    * `PointsSelector` which is one-of). A body `shard_key` selector ANDs a
    * partition-pruning condition on the shard-key column, exactly like the
    * read paths' `shardKeyFilter`. */
  def selectorPred(coll: Collection, sel: RequestCodec.Selector): Column = {
    val parts =
      sel.ids.map(ids => idPred(coll, ids)).toSeq ++
        sel.filter.map(f =>
          new FilterCompiler(coll.resolver(coll.read())).compile(f)).toSeq ++
        shardKeyPred(coll, sel.shardKeys).toSeq
    parts.reduce(_ && _)
  }

  private def shardKeyCond(coll: Collection, keys: Seq[Any]): graft.model.Condition =
    graft.model.MatchAny(shardField(coll), keys)

  private def shardKeyPred(coll: Collection, keys: Seq[Any]): Option[Column] =
    if (keys.isEmpty) None
    else Some(col(shardField(coll)).isin(keys: _*))

  private def shardField(coll: Collection): String =
    coll.config.shardKeyCol.getOrElse(throw new IllegalArgumentException(
      "shard_key given but the collection has no shard-key column"))

  private def idPred(coll: Collection, ids: Seq[Any]): Column =
    col(coll.config.idCol).isin(ids: _*)

  /** Wire vector value → typed Column literal in the collection's storage
    * shape (dense `array<float>`, multi-dense `array<array<float>>`, sparse
    * `struct<indices, values>`), validated against the declared config. */
  private def vecLit(coll: Collection, name: String,
      vec: RequestCodec.WireVec): Column = {
    import RequestCodec._
    val cfg = coll.config
    def dimCheck(v: Seq[Double]): Unit =
      cfg.vectors.find(_.name == name).foreach(vc =>
        if (v.length != vc.dim) throw new IllegalArgumentException(
          s"Vector dimension error: expected dim: ${vc.dim}, got ${v.length}"))
    vec match {
      case WDenseVec(v) =>
        require(cfg.vectors.exists(vc => vc.name == name && !vc.multivector),
          s"dense value for non-dense vector '$name'")
        dimCheck(v)
        typedLit(v.map(_.toFloat))
      case WMultiVec(m) =>
        require(cfg.vectors.exists(vc => vc.name == name && vc.multivector),
          s"multi-dense value for non-multivector '$name'")
        m.foreach(dimCheck)
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
    * sparse structs) + JSON payload string (+ the shard-key column on a
    * custom-sharded collection). Id type follows the batch (u64 →
    * LongType, UUID string → StringType — `ExtendedPointId`,
    * `types.rs:174-179`).
    *
    * Shard-key contract (`shard_holder/mod.rs:426-437`): each point's key
    * is its own `shard_key` or the body-level one; a shard-keyed
    * collection REJECTS points that resolve no key ("Shard key not
    * specified") — silently NULL-filling the partition column would make
    * the point invisible to every shard-scoped read. A collection
    * WITHOUT custom sharding rejects any shard key on the write. */
  def wirePoints(coll: Collection, points: Seq[RequestCodec.WirePoint],
      bodyShardKey: Option[Any] = None): DataFrame = {
    import RequestCodec._
    require(points.nonEmpty, "upsert batch must not be empty")
    val cfg = coll.config
    val idType = points.head.id match {
      case _: String => StringType
      case _ => LongType
    }
    val shardKeyOf: RequestCodec.WirePoint => Option[Any] =
      p => p.shardKey.orElse(bodyShardKey)
    // declared-key registry (the shards API surface): once shard keys are
    // explicitly created, a write naming an undeclared key rejects with
    // the reference's message (`shard_holder/mod.rs:432`)
    val declaredKeys: Option[Set[String]] =
      if (cfg.shardKeyCol.isEmpty) None
      else coll.listShardKeys().map(_.map(_.toString).toSet)
    val skField: Option[StructField] = cfg.shardKeyCol match {
      case Some(sk) =>
        // column type follows the existing table (string keys by default,
        // integer keys on an int-sharded table)
        Some(StructField(sk, coll.read().schema(sk).dataType))
      case None =>
        if (bodyShardKey.isDefined || points.exists(_.shardKey.isDefined))
          throw new IllegalArgumentException(
            "shard_key given but the collection has no shard-key column")
        None
    }
    val sparseType = StructType(Seq(
      StructField("indices", ArrayType(IntegerType)),
      StructField("values", ArrayType(FloatType))))
    val schema = StructType(
      (StructField(cfg.idCol, idType) +:
        (cfg.vectors.map(vc => StructField(cfg.vectorCol(vc.name),
          if (vc.multivector) ArrayType(ArrayType(FloatType))
          else ArrayType(FloatType))) ++
          cfg.sparse.map(sc => StructField(cfg.sparseCol(sc.name), sparseType))) :+
        StructField(cfg.payloadCol, StringType)) ++ skField.toSeq)
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]()
    points.foreach { p =>
      p.vectors.keys.foreach { n =>
        require(cfg.vectors.exists(_.name == n) || cfg.sparse.exists(_.name == n),
          s"undeclared vector name '$n'")
      }
      def dimCheck(vc: graft.sources.VectorConfig, v: Seq[Double]): Unit =
        if (v.length != vc.dim) throw new IllegalArgumentException(
          s"Vector dimension error: expected dim: ${vc.dim}, got ${v.length}")
      def denseVal(vc: graft.sources.VectorConfig): Any = p.vectors.get(vc.name) match {
        case None => null
        case Some(WDenseVec(v)) if !vc.multivector =>
          dimCheck(vc, v); v.map(_.toFloat)
        case Some(WMultiVec(m)) if vc.multivector =>
          m.foreach(dimCheck(vc, _)); m.map(_.map(_.toFloat))
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
      val skVal: Seq[Any] = skField match {
        case None => Nil
        case Some(f) =>
          val key = shardKeyOf(p).getOrElse(throw new IllegalArgumentException(
            s"Shard key not specified for point ${p.id}: collection uses " +
              "custom sharding, every upserted point needs a shard_key " +
              "(point-level or body-level)"))
          declaredKeys.foreach(ks =>
            if (!ks.contains(key.toString)) throw new IllegalArgumentException(
              s"Bad request: Shard key $key not found"))
          // an int-sharded table reads its partition column back as
          // IntegerType (directory-name inference) or LongType — both take
          // the numeric coercion; a non-numeric key surfaces as a
          // wire-shaped bad request (the reference validates shard-key
          // types at the API layer), never a raw NumberFormatException or
          // a String smuggled into the numeric partition column
          Seq(f.dataType match {
            case LongType | IntegerType =>
              val asLong = key match {
                case l: Long => l
                case i: Int => i.toLong
                case other =>
                  try other.toString.toLong
                  catch {
                    case _: NumberFormatException =>
                      throw new IllegalArgumentException(
                        s"Bad request: Shard key $other is not a number")
                  }
              }
              if (f.dataType == IntegerType) asLong.toInt else asLong
            case _ => key.toString
          })
      }
      rows.add(Row.fromSeq(
        (p.id +:
          (cfg.vectors.map(denseVal) ++ cfg.sparse.map(sc => sparseVal(sc.name))) :+
          p.payload.orNull) ++ skVal))
    }
    coll.spark.createDataFrame(rows, schema)
  }
}
