package graft.filters

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{coalesce, lit}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Type-preserving payload mutation kernels: the set_payload merge and
  * delete_payload key removal of `lib/shard/src/operations/payload_ops.rs`
  * with the `JsonPath::value_set` / `value_remove` semantics of
  * `lib/segment/src/json_path/mod.rs:59-82,344-439`:
  *
  *  - merge without a `key`: top-level keys of the patch overwrite; an
  *    explicit JSON null in the patch DELETES the key (`merge_map`,
  *    `lib/segment/src/common/utils.rs:40-56`);
  *  - merge with a `key` path (`a.b`, `a[0]`, `a[]`): the patch object
  *    merges into the value AT that path, creating intermediate
  *    objects/arrays exactly like `value_set` (a non-object at the target
  *    is replaced by an object; `[n]` into a non-array resets to `[]`);
  *  - delete keys are full JsonPaths: `a.b` removes a nested key, a
  *    terminal `[]` empties the array, a terminal `[n]` is a no-op
  *    (deleting array indices is not idempotent — `value_remove`).
  *
  * Values keep their JSON types end-to-end (objects, arrays, numbers,
  * bools) — one jackson parse + serialize per touched row, inside
  * whole-stage codegen, same shape as [[PayloadSelectExpr]]. The patch
  * re-parses per row: mutation rewrites are I/O-bound table jobs and the
  * patch is a short request literal, so the parse is noise next to the
  * row's own payload parse (and a String reference keeps the generated
  * class free of non-serializable jackson state).
  */
object PayloadMutate {

  import PayloadSelect.{Index, Item, Key, Path, Wildcard}

  private val mapper = new ObjectMapper()

  /** merge_map: null patch values delete, everything else overwrites. */
  private def mergeMap(dest: ObjectNode, src: ObjectNode): Unit = {
    val it = src.fields()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.isNull) { dest.remove(e.getKey); () }
      else { dest.set[JsonNode](e.getKey, e.getValue.deepCopy()); () }
    }
  }

  /** `value_set` (`json_path/mod.rs:344-380`) — returns the node to store
    * at the current position (a non-matching node type is REPLACED, like
    * the reference's `*dest = ...`). */
  private def valueSet(path: List[Item], dest: JsonNode, src: ObjectNode): JsonNode =
    path match {
      case Nil =>
        val obj =
          if (dest != null && dest.isObject) dest.asInstanceOf[ObjectNode]
          else mapper.createObjectNode()
        mergeMap(obj, src)
        obj
      case Key(k) :: rest =>
        val obj =
          if (dest != null && dest.isObject) dest.asInstanceOf[ObjectNode]
          else mapper.createObjectNode()
        valueSetMap(k, rest, obj, src)
        obj
      case Index(i) :: rest =>
        val arr =
          if (dest != null && dest.isArray) dest.asInstanceOf[ArrayNode]
          else mapper.createArrayNode()
        if (i >= 0 && i < arr.size()) { arr.set(i, valueSet(rest, arr.get(i), src)); () }
        arr
      case Wildcard :: rest =>
        if (dest != null && dest.isArray) {
          val arr = dest.asInstanceOf[ArrayNode]
          var j = 0
          while (j < arr.size()) { arr.set(j, valueSet(rest, arr.get(j), src)); j += 1 }
          arr
        } else mapper.createArrayNode() // `*dest = Array(Vec::new())`
    }

  /** `value_set_map` (`json_path/mod.rs:382-395`). */
  private def valueSetMap(
      key: String, rest: List[Item], destMap: ObjectNode, src: ObjectNode): Unit = {
    val cur = if (destMap.has(key)) destMap.get(key) else null
    destMap.set[JsonNode](key, valueSet(rest, cur, src))
    ()
  }

  /** `value_remove` (`json_path/mod.rs:72-82,397-439`). */
  private def valueRemove(path: Path, root: ObjectNode): Unit = path.rest match {
    case Nil => root.remove(path.firstKey); ()
    case head :: tail =>
      if (root.has(path.firstKey)) removeAt(head, tail, root.get(path.firstKey))
  }

  private def removeAt(head: Item, rest: List[Item], value: JsonNode): Unit =
    rest match {
      case r1 :: rn => (head, value) match {
        case (Key(k), o: ObjectNode) if o.has(k) => removeAt(r1, rn, o.get(k))
        case (Index(i), a: ArrayNode) if i >= 0 && i < a.size() =>
          removeAt(r1, rn, a.get(i))
        case (Wildcard, a: ArrayNode) =>
          val it = a.elements()
          while (it.hasNext) removeAt(r1, rn, it.next())
        case _ => ()
      }
      case Nil => (head, value) match {
        case (Key(k), o: ObjectNode) => o.remove(k); ()
        case (Wildcard, a: ArrayNode) => a.removeAll(); ()
        case _ => () // Index terminal: not idempotent, unsupported (ref)
      }
    }

  /** Codegen entry: set_payload merge. `path` null = top-level merge. */
  def setUtf8(json: UTF8String, patchJson: String, path: Path): UTF8String = {
    val parsed = mapper.readTree(json.toString)
    val root =
      if (parsed != null && parsed.isObject) parsed.asInstanceOf[ObjectNode]
      else mapper.createObjectNode()
    val patch = mapper.readTree(patchJson) match {
      case o: ObjectNode => o
      case other =>
        throw new IllegalArgumentException(s"set_payload patch must be a JSON object, got $other")
    }
    if (path == null) mergeMap(root, patch)
    else valueSetMap(path.firstKey, path.rest, root, patch)
    UTF8String.fromString(mapper.writeValueAsString(root))
  }

  /** Codegen entry: delete_payload keys (JsonPaths). */
  def deleteUtf8(json: UTF8String, paths: Array[Path]): UTF8String = {
    val parsed = mapper.readTree(json.toString)
    parsed match {
      case root: ObjectNode =>
        var i = 0
        while (i < paths.length) { valueRemove(paths(i), root); i += 1 }
        UTF8String.fromString(mapper.writeValueAsString(root))
      case _ => json // non-object payloads pass through (objects by construction)
    }
  }

  /** set_payload as a Column: a SQL-null payload merges into `{}` (the
    * reference sets payload on a payload-less point). */
  def setCol(payload: Column, patch: String, key: Option[String]): Column =
    GraftShim.column(PayloadSetExpr(
      GraftShim.expression(coalesce(payload, lit("{}"))), patch, key))

  /** delete_payload as a Column: a SQL-null payload stays null. */
  def deleteCol(payload: Column, keys: Seq[String]): Column =
    GraftShim.column(PayloadDeleteKeysExpr(GraftShim.expression(payload), keys))
}

/** set_payload merge expression (patch + optional key path are request
  * literals; the payload column is the only child). */
case class PayloadSetExpr(child: Expression, patch: String, key: Option[String])
    extends UnaryExpression {
  override def dataType: DataType = StringType

  @transient private lazy val path: PayloadSelect.Path =
    key.map(PayloadSelect.parse).orNull

  override def nullSafeEval(input: Any): Any =
    PayloadMutate.setUtf8(input.asInstanceOf[UTF8String], patch, path)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patchRef = ctx.addReferenceObj("setPayloadPatch", patch, "java.lang.String")
    val pathRef = ctx.addReferenceObj("setPayloadPath", path,
      "graft.filters.PayloadSelect.Path")
    defineCodeGen(ctx, ev,
      c => s"graft.filters.PayloadMutate.setUtf8($c, $patchRef, $pathRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** delete_payload keys expression (keys are request literals). */
case class PayloadDeleteKeysExpr(child: Expression, keys: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = StringType

  @transient private lazy val paths: Array[PayloadSelect.Path] =
    keys.map(PayloadSelect.parse).toArray

  override def nullSafeEval(input: Any): Any =
    PayloadMutate.deleteUtf8(input.asInstanceOf[UTF8String], paths)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deletePayloadPaths", paths,
      "graft.filters.PayloadSelect.Path[]")
    defineCodeGen(ctx, ev,
      c => s"graft.filters.PayloadMutate.deleteUtf8($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
