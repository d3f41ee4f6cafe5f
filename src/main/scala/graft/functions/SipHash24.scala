package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** SipHash-2-4 (Aumasson & Bernstein) — the reference's `Slice` condition
  * hash: zero key over the canonical id bytes (8 little-endian bytes for a
  * numeric id). Ref `lib/segment/src/types.rs:3860-3899`
  * (`slice_point_id_hash`): this exact value is a public API contract of the
  * slice condition, so we replicate it bit-for-bit.
  */
object SipHash24 {

  @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  /** General SipHash-2-4 over a byte array (for test vectors). */
  def hash(k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1

    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val n = data.length
    val full = n - (n % 8)
    var off = 0
    while (off < full) {
      var m = 0L
      var i = 7
      while (i >= 0) { m = (m << 8) | (data(off + i) & 0xffL); i -= 1 }
      v3 ^= m; round(); round(); v0 ^= m
      off += 8
    }
    var b = (n.toLong & 0xff) << 56
    var i = n - 1
    while (i >= full) { b |= (data(i) & 0xffL) << (8 * (i - full)); i -= 1 }
    v3 ^= b; round(); round(); v0 ^= b
    v2 ^= 0xff
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  /** Specialized: zero-key SipHash-2-4 of the 8 little-endian bytes of `x` —
    * i.e. `slice_point_id_hash(NumId(x))`. Inlined single-block path (the
    * LE-bytes block reinterpreted as an LE u64 is just `x`). */
  def hashLe8(x: Long): Long = {
    var v0 = 0x736f6d6570736575L
    var v1 = 0x646f72616e646f6dL
    var v2 = 0x6c7967656e657261L
    var v3 = 0x7465646279746573L

    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    v3 ^= x; round(); round(); v0 ^= x
    val b = 8L << 56
    v3 ^= b; round(); round(); v0 ^= b
    v2 ^= 0xff
    round(); round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  /** `hashLe8(id) mod total` with unsigned u64 semantics (as in Rust `%`). */
  def sliceIndex(id: Long, total: Int): Long =
    java.lang.Long.remainderUnsigned(hashLe8(id), total.toLong)

  /** True iff `id` falls in slice `index` of `total`. */
  def inSlice(id: Long, total: Int, index: Int): Boolean =
    sliceIndex(id, total) == index.toLong

  /** The 16 RFC 4122 bytes of a canonical hyphenated UUID string. */
  def uuidBytes(s: String): Array[Byte] = {
    val hex = s.replace("-", "")
    require(hex.length == 32, s"not a canonical UUID: $s")
    Array.tabulate(16)(i =>
      java.lang.Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  /** `slice_point_id_hash(Uuid(id))`: zero-key SipHash-2-4 over the 16 UUID
    * bytes (`types.rs:3893-3899` — the UUID arm of the public contract).
    * A string id column can also hold decimal-rendered NUMERIC ids (mixed
    * NumId+Uuid collections) — digits-only dispatches to the NumId arm so
    * slice membership matches the id's `ExtendedPointId` kind, not its
    * storage rendering. */
  def sliceIndexUuid(id: String, total: Int): Long = {
    // ≤20 digits: the full u64 NumId domain (incl. the [2^63, 2^64) tail,
    // stored as its decimal rendering) parses unsigned and hashes its 8 LE
    // bytes like the reference's NumId arm; a 20-digit string past u64 max
    // is no NumId and falls to the UUID arm's loud reject.
    var digits = id.length > 0 && id.length <= 20
    var i = 0
    while (digits && i < id.length) {
      if (id.charAt(i) < '0' || id.charAt(i) > '9') digits = false
      i += 1
    }
    if (digits)
      try return sliceIndex(java.lang.Long.parseUnsignedLong(id), total)
      catch { case _: NumberFormatException => () }
    java.lang.Long.remainderUnsigned(hash(0L, 0L, uuidBytes(id)), total.toLong)
  }

  def sliceIndexCol(id: Column, total: Int): Column =
    GraftShim.column(SliceIndexExpr(GraftShim.expression(id), total))
}

/** Codegen'd `slice_point_id_hash(id) mod total`: stays inside whole-stage
  * codegen as a static call, so a Slice filter is evaluated in the scan stage
  * like any other deterministic predicate. Dispatches on the id column type —
  * LongType ids hash their 8 LE bytes, StringType (UUID) ids their 16 RFC
  * 4122 bytes, mirroring the two `ExtendedPointId` arms. */
case class SliceIndexExpr(child: Expression, total: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  // long ids pass through; SQL int literals get an analyzer cast to long
  // (the hash is over 8 LE bytes, so the widened value hashes identically);
  // string (UUID) ids stay strings.
  override def inputTypes: Seq[GraftShim.AbsType] =
    Seq(GraftShim.typeCollection(LongType, StringType))
  private def isUuid: Boolean = child.dataType == StringType
  override def nullSafeEval(input: Any): Any =
    if (isUuid) SipHash24.sliceIndexUuid(input.toString, total)
    else SipHash24.sliceIndex(input.asInstanceOf[Long], total)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (isUuid)
      defineCodeGen(ctx, ev,
        c => s"graft.functions.SipHash24.sliceIndexUuid($c.toString(), $total)")
    else
      defineCodeGen(ctx, ev, c => s"graft.functions.SipHash24.sliceIndex($c, $total)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
