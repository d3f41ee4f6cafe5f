package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Resolves payload keys against a schema-free JSON payload column (the
  * qdrant payload model: `Payload(Map<String, Value>)`,
  * `lib/segment/src/types.rs:2483`), preserving the absent / JSON-null /
  * empty-array / scalar-or-array trichotomies that typed columns cannot.
  *
  * Declared `types` play the role of qdrant's payload index schema
  * (`lib/shard/src/payload_index_schema.rs`): a key is read as the declared
  * type; a value that is an array of T yields all elements (∃ semantics), a
  * scalar yields one. Dotted keys (`a.b.c`) traverse nested objects like
  * qdrant's JsonPath (`lib/segment/src/json_path/mod.rs:19-33`).
  *
  * Implementation: Spark 4 VARIANT — `parse_json` once, `try_variant_get`
  * per key; `is_variant_null` distinguishes explicit JSON null from absence.
  */
final class JsonResolver(
    payloadCol: Column,
    types: Map[String, DataType],
    idColumn: Column,
    vectorCols: Map[String, Column] = Map.empty,
    preParsed: Boolean = false)
  extends FieldResolver {

  private def typeName(key: String): String =
    types.getOrElse(key, StringType).sql

  // When a filter references several keys (or one key in several branches),
  // parsing the JSON string per reference multiplies the dominant per-row
  // cost. Callers on a hot path should project `try_parse_json(payload)`
  // once and construct the resolver with `preParsed = true`.
  private def raw(key: String): Column =
    try_variant_get(
      if (preParsed) payloadCol else try_parse_json(payloadCol),
      "$." + key, "variant")

  def values(key: String): Column = {
    val r = raw(key)
    val t = typeName(key)
    // NOTE: keep the number of `r` references minimal — the optimizer
    // inlines the payload parse into every reference when this lands in a
    // Filter, and only ProjectExec reliably subexpression-eliminates them
    // (see scaladoc on preParsed and the aggregate-shaped catalog queries).
    coalesce(
      // array-valued: all elements, nulls dropped
      filter(try_variant_get(r, "$", s"array<$t>"), e => e.isNotNull),
      // scalar: single element unless explicit JSON null
      when(r.isNotNull && !is_variant_null(r), array(try_variant_get(r, "$", t))),
      array().cast(s"array<$t>"))
  }

  /** Present in the document (JSON null counts as present). */
  def fieldExists(key: String): Column = raw(key).isNotNull

  def isJsonNull(key: String): Column = {
    val r = raw(key)
    coalesce(is_variant_null(r), lit(false)) ||
      // [null] also matches IsNull (ref types.rs:3786-3806)
      coalesce(exists(try_variant_get(r, "$", s"array<variant>"),
        e => is_variant_null(e)), lit(false))
  }

  def id: Column = idColumn
  def vector(name: String): Column = vectorCols.getOrElse(name, lit(null))

  override def dataTypeOf(key: String): Option[DataType] = types.get(key).map {
    case ArrayType(e, _) => e
    case t => t
  }

  /** Nested array-of-objects: the inner filter re-resolves via JSON on the
    * element. Elements are variants; expose them as JSON strings and let the
    * element resolver re-parse. */
  override def elementType(key: String): Option[StructType] = None

  /** ∃-element nested compilation entry: used by FilterCompiler via
    * [[nestedValues]]. */
  def nestedValues(key: String): Column =
    coalesce(
      transform(try_variant_get(raw(key), "$", "array<variant>"), e => to_json(e)),
      array().cast(ArrayType(StringType)))

  def elementResolver(elem: Column, innerTypes: Map[String, DataType]): JsonResolver =
    new JsonResolver(elem, innerTypes, lit(null), Map.empty)

  /** Declared types for keys nested under `key.` (relative to the element). */
  def innerTypes(key: String): Map[String, DataType] =
    types.collect {
      case (k, v) if k.startsWith(key + ".") => k.stripPrefix(key + ".") -> v
    }
}
