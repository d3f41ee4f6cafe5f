package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BM25 sparse EMBEDDING — the reference's one local inference path
  * (`lib/bm25/src/lib.rs`): a document embeds to a sparse vector whose
  * indices are murmur3 token ids and whose values are BM25 term-frequency
  * weights; a query embeds with weight 1.0 per unique token. The IDF
  * factor is NOT part of the embedding — it applies at query time through
  * the sparse `modifier: idf` (`query_context.rs:278-300`), so
  * `dot(doc_embed, query_embed × idf)` reproduces the BM25 score.
  *
  * Tokenization here is the corpus convention (single-space split, the
  * same as `TextFunctions.tokensWs`) — the reference's `BasicTokenizer`
  * is explicitly a quick-start ("production users bring a richer
  * pipeline", `basic_tokenizer.rs:4-5`), so the tokenizer is a
  * call-site choice, not embedding semantics.
  */
object Bm25 {

  /** Standard MurmurHash3 x86 32-bit (Austin Appleby, public domain) —
    * byte-compatible with the reference's `token_id` hash
    * (`lib.rs:166-168`, the `murmur3` crate with seed 0). Spark's
    * built-in `hash()` is NOT compatible (different tail handling). */
  def murmur3(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val n = data.length
    val nblocks = n >>> 2
    var i = 0
    while (i < nblocks) {
      val base = i << 2
      var k = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks << 2
    var k1 = 0
    if ((n & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((n & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((n & 3) >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h ^= k1
    }
    h ^= n
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** `token_id`: |murmur3(token, 0) as i32| — `unsigned_abs`
    * (`lib.rs:166-168`). The reference stores u32; sparse indices are
    * Long here (the full u32 domain), so |i32::MIN| = 2³¹ is representable
    * and the former divergence (2³¹ → 0) is gone. */
  def tokenId(token: String): Long = {
    val h = murmur3(token.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0)
    math.abs(h.toLong)
  }

  /** `embed_document` (`lib.rs:132-163`): per unique token,
    * tf = n·(k1+1) / (k1·(1 − b + b·dl/avgdl) + n), computed in double and
    * stored f32 (`tf as f32`). Id collisions overwrite in sorted-token
    * order (the reference overwrites in hash-map iteration order — i.e.
    * nondeterministically; sorted order is the deterministic refinement). */
  def embedDoc(text: String, k1: Double, b: Double,
      avgDocLen: Double): (Array[Long], Array[Float]) = {
    val toks = text.split(" ", -1)
    val docLen = toks.length.toDouble
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    toks.foreach(t => counts.update(t, counts.getOrElse(t, 0) + 1))
    val byId = scala.collection.mutable.TreeMap.empty[Long, Float]
    counts.toSeq.sortBy(_._1).foreach { case (tok, cnt) =>
      val n = cnt.toDouble
      val tf = n * (k1 + 1.0) / (k1 * (1.0 - b + b * docLen / avgDocLen) + n)
      byId.update(tokenId(tok), tf.toFloat)
    }
    (byId.keys.toArray, byId.values.toArray)
  }

  /** `embed_query` (`lib.rs:118-130`): sorted unique token ids, every
    * weight 1.0. */
  def embedQuery(tokens: Seq[String]): (Seq[Long], Seq[Double]) = {
    val ids = tokens.map(tokenId).distinct.sorted
    (ids, Seq.fill(ids.length)(1.0))
  }

  /** Codegen entry: returns the sparse struct row for one document. */
  def embedDocRow(text: UTF8String, k1: Double, b: Double,
      avgDocLen: Double): InternalRow = {
    val (is, vs) = embedDoc(text.toString, k1, b, avgDocLen)
    InternalRow(new GenericArrayData(is), new GenericArrayData(vs))
  }
}

/** text → sparse struct<indices, values> BM25 document embedding. The
  * generated code calls the static [[Bm25.embedDocRow]] helper — no
  * interpreted fallback (same pattern as the F16/binary codec kernels). */
case class Bm25DocEmbedExpr(child: Expression, k1: Double, b: Double,
    avgDocLen: Double) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("indices", ArrayType(LongType, containsNull = false)),
    StructField("values", ArrayType(FloatType, containsNull = false))))
  override protected def nullSafeEval(v: Any): Any =
    Bm25.embedDocRow(v.asInstanceOf[UTF8String], k1, b, avgDocLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.Bm25.embedDocRow($c, ${k1}D, ${b}D, ${avgDocLen}D);"
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
