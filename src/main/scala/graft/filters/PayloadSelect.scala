package graft.filters

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Payload include/exclude selectors over a JSON payload column — the
  * `with_payload` selector surface (`PayloadSelector`,
  * `lib/segment/src/types.rs:4300-4380`; path matching
  * `lib/segment/src/json_path/mod.rs:85-215`).
  *
  * Path grammar: dot-separated keys, a segment may end in `[]` (explicit
  * array traversal) or `[n]` (a concrete index — which, as in the reference,
  * never matches the wildcard produced by traversal, so such patterns are
  * inert). Matching rules, verbatim from the reference:
  *  - include keeps a path iff SOME pattern shares a first key and the two
  *    item lists agree on their common prefix (either may be longer);
  *  - exclude drops a path iff SOME pattern is a prefix of the path.
  * Arrays traverse with a wildcard item; objects with a key item; scalar
  * leaves copy through.
  */
object PayloadSelect {

  sealed trait Item
  final case class Key(k: String) extends Item
  final case class Index(i: Int) extends Item
  case object Wildcard extends Item

  final case class Path(firstKey: String, rest: List[Item])

  /** Parse `a.b[].c[2]` → Path(a, [Key(b), Wildcard, Key(c), Index(2)]). */
  def parse(s: String): Path = {
    val segs = s.split("\\.", -1).toList
    def items(seg: String): List[Item] = {
      val open = seg.indexOf('[')
      val (key, suffix) = if (open < 0) (seg, "") else seg.splitAt(open)
      val arr = "\\[(\\d*)\\]".r.findAllMatchIn(suffix).map { m =>
        if (m.group(1).isEmpty) Wildcard else Index(m.group(1).toInt)
      }.toList
      Key(key) :: arr
    }
    segs match {
      case Nil => Path("", Nil)
      case head :: tail =>
        val h = items(head)
        val first = h.head.asInstanceOf[Key].k
        Path(first, h.tail ++ tail.flatMap(items))
    }
  }

  /** include: common-prefix equality (`check_include_pattern`). */
  private def includeMatch(pattern: Path, path: Path): Boolean =
    pattern.firstKey == path.firstKey &&
      pattern.rest.zip(path.rest).forall { case (a, b) => a == b }

  /** exclude: pattern ⊑ path (`check_exclude_pattern`). */
  private def excludeMatch(pattern: Path, path: Path): Boolean =
    pattern.firstKey == path.firstKey && path.rest.startsWith(pattern.rest)

  private val mapper = new ObjectMapper()

  /** Apply the selector to a JSON object string; non-object JSON and nulls
    * pass through unchanged (payloads are objects by construction). */
  def select(json: String, patterns: Array[Path], include: Boolean): String = {
    val root = mapper.readTree(json)
    root match {
      case obj: ObjectNode =>
        mapper.writeValueAsString(filterObject(obj, None, patterns, include))
      case _ => json
    }
  }

  private def keep(path: Path, patterns: Array[Path], include: Boolean): Boolean =
    if (include) patterns.exists(p => includeMatch(p, path))
    else !patterns.exists(p => excludeMatch(p, path))

  private def extend(base: Option[Path], item: Either[String, Item]): Path =
    base match {
      case None => Path(item.left.getOrElse(""), Nil) // top level: first key
      case Some(p) =>
        Path(p.firstKey, p.rest :+ item.fold(k => Key(k), identity))
    }

  /** `value_filter` + `run_filter` (`json_path/mod.rs:85-102,440-475`). */
  private def filterObject(
      obj: ObjectNode, base: Option[Path],
      patterns: Array[Path], include: Boolean): ObjectNode = {
    val out = mapper.createObjectNode()
    val it = obj.fields()
    while (it.hasNext) {
      val e = it.next()
      val path = extend(base, Left(e.getKey))
      if (keep(path, patterns, include))
        out.set[JsonNode](e.getKey, runFilter(e.getValue, path, patterns, include))
    }
    out
  }

  private def runFilter(
      v: JsonNode, path: Path,
      patterns: Array[Path], include: Boolean): JsonNode = v match {
    case arr: ArrayNode =>
      val out = mapper.createArrayNode()
      val elemPath = extend(Some(path), Right(Wildcard))
      val it = arr.elements()
      while (it.hasNext) {
        val e = it.next()
        if (keep(elemPath, patterns, include))
          out.add(runFilter(e, elemPath, patterns, include))
      }
      out
    case obj: ObjectNode => filterObject(obj, Some(path), patterns, include)
    case leaf => leaf
  }

  /** Codegen entry point (UTF8String in/out). */
  def selectUtf8(json: UTF8String, patterns: Array[Path], include: Boolean): UTF8String =
    UTF8String.fromString(select(json.toString, patterns, include))

  def includeCol(payload: Column, keys: Seq[String]): Column =
    GraftShim.column(
      PayloadSelectExpr(GraftShim.expression(payload), keys, include = true))

  def excludeCol(payload: Column, keys: Seq[String]): Column =
    GraftShim.column(
      PayloadSelectExpr(GraftShim.expression(payload), keys, include = false))
}

/** Expression form: the selector runs inside whole-stage codegen (one parse +
  * one serialize per row, no UDF serialization boundary). */
case class PayloadSelectExpr(child: Expression, keys: Seq[String], include: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  @transient private lazy val parsed: Array[PayloadSelect.Path] =
    keys.map(PayloadSelect.parse).toArray

  override def nullSafeEval(input: Any): Any =
    PayloadSelect.selectUtf8(input.asInstanceOf[UTF8String], parsed, include)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("selectorPaths", parsed,
      "graft.filters.PayloadSelect.Path[]")
    defineCodeGen(ctx, ev,
      c => s"graft.filters.PayloadSelect.selectUtf8($c, $ref, $include)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
