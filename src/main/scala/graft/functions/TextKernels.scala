package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass codegen'd kernels for the text-dedup pipeline.
  *
  * The higher-order-function formulations (transform/aggregate lambdas) are
  * interpreted per element; at ~50 shingles/doc × 64 hash slots that's
  * thousands of interpreted calls per row and dominated the dedup bench.
  * Each kernel below is one static call per row over primitive arrays.
  *
  * Hash family: Spark's XXH64 with the builtin seed 42, so
  * `shingleHashes(tokens, k)` elements equal
  * `xxhash64(concat_ws(' ', tok_i..tok_{i+k-1}))` — cross-checkable against
  * the builtin in tests.
  */
object TextKernels {

  private val SPACE = UTF8String.fromString(" ")
  private val SEED = 42L

  /** Distinct, sorted xxhash64 values of the k-token shingles. */
  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val out = if (n < k) new Array[Long](0) else {
      val m = n - k + 1
      val buf = new Array[Long](m)
      val parts = new Array[UTF8String](k)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < k) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        buf(i) = XXH64.hashUTF8String(UTF8String.concatWs(SPACE, parts: _*), SEED)
        i += 1
      }
      java.util.Arrays.sort(buf)
      // unique in place
      var w = 0
      i = 0
      while (i < m) {
        if (w == 0 || buf(i) != buf(w - 1)) { buf(w) = buf(i); w += 1 }
        i += 1
      }
      if (w == m) buf else java.util.Arrays.copyOf(buf, w)
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Positional xxhash64 values of the k-token shingles: element i is the
    * hash of tokens[i..i+k), in document order, repeats preserved — the
    * input to span-level operators where POSITION carries the signal
    * (duplicate-passage detection), unlike the set form above. */
  def shingleHashSeq(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val out = if (n < k) new Array[Long](0) else {
      val m = n - k + 1
      val buf = new Array[Long](m)
      val parts = new Array[UTF8String](k)
      var i = 0
      while (i < m) {
        var j = 0
        while (j < k) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
        buf(i) = XXH64.hashUTF8String(UTF8String.concatWs(SPACE, parts: _*), SEED)
        i += 1
      }
      buf
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** LSH band keys over an implicit bands×r MinHash signature: slot s's
    * min-hash is min over shingle hashes h of XXH64(h, seed=s); band key b
    * chains its r slot minima through XXH64. Empty input → per-slot
    * Long.MaxValue sentinel (same for every empty doc, so empties collide
    * only with empties). */
  def minhashBandKeys(hashes: ArrayData, bands: Int, r: Int): ArrayData = {
    val n = hashes.numElements()
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = XXH64.hashLong(b.toLong, SEED)
      var j = 0
      while (j < r) {
        val seed = (b * r + j).toLong
        var min = Long.MaxValue
        var i = 0
        while (i < n) {
          val h = XXH64.hashLong(hashes.getLong(i), seed)
          if (h < min) min = h
          i += 1
        }
        acc = XXH64.hashLong(min, acc)
        j += 1
      }
      keys(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }

  /** 64-bit SimHash with unit weights: bit i set iff
    * Σ_tokens (bit i of xxhash64(token) ? +1 : −1) > 0. Same hash family as
    * the HOF formulation (`xxhash64(t)`), so fingerprints are unchanged. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      val s = tokens.getUTF8String(t)
      if (s != null) {
        val h = XXH64.hashUTF8String(s, SEED)
        var i = 0
        while (i < 64) {
          counts(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  /** Consecutive-subsequence test over token arrays — positions-based
    * phrase matching (`Match::Phrase`, full-text index positions path,
    * `lib/segment/src/index/field_index/full_text_index/`). Works on any
    * tokenizer's output, unlike substring matching on raw text. */
  def containsTokenSeq(tokens: ArrayData, phrase: Array[UTF8String]): Boolean = {
    val n = tokens.numElements()
    val m = phrase.length
    if (m == 0) return true
    var i = 0
    while (i <= n - m) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val t = tokens.getUTF8String(i + j)
        if (t == null || !t.equals(phrase(j))) ok = false
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  def containsTokenSeqCol(tokens: Column, phrase: Seq[String]): Column =
    GraftShim.column(ContainsTokenSeqExpr(GraftShim.expression(tokens),
      phrase.map(UTF8String.fromString).toArray))

  /** Intersection size of two sorted distinct long arrays (linear merge). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Word-level repetition signals for training-data quality filtering
    * (the word-granularity analog of the Gopher repetition rules — Rae et
    * al. 2021, §A1.1: duplicate-n-gram and most-frequent-n-gram fractions).
    * One pass per n over the token array with an exact string-count map:
    * out[2(n-1)]   = fraction of n-gram occurrences whose gram occurs > 1×,
    * out[2(n-1)+1] = occurrences of the most frequent n-gram / total.
    * Zero n-grams (doc shorter than n) → both 0.0. O(len·maxN) per row,
    * no shuffle — the shape that survives 100 TB (signal extraction is
    * embarrassingly parallel; any thresholding happens downstream). */
  def repetitionStats(tokens: ArrayData, maxN: Int): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Double](2 * maxN)
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = tokens.getUTF8String(i); i += 1 }
    var g = 1
    while (g <= maxN) {
      val m = n - g + 1
      if (m > 0) {
        val counts = new java.util.HashMap[UTF8String, Array[Int]](m * 2)
        var j = 0
        while (j < m) {
          val gram =
            if (g == 1) toks(j)
            else {
              val parts = new Array[UTF8String](g)
              var p = 0
              while (p < g) { parts(p) = toks(j + p); p += 1 }
              UTF8String.concatWs(SPACE, parts: _*)
            }
          val c = counts.get(gram)
          if (c == null) counts.put(gram, Array(1)) else c(0) += 1
          j += 1
        }
        var dup = 0L
        var top = 0L
        val it = counts.values().iterator()
        while (it.hasNext) {
          val c = it.next()(0)
          if (c > 1) dup += c
          if (c > top) top = c
        }
        out(2 * (g - 1)) = dup.toDouble / m
        out(2 * (g - 1) + 1) = top.toDouble / m
      }
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def repetitionStatsCol(tokens: Column, maxN: Int): Column =
    GraftShim.column(RepetitionStatsExpr(GraftShim.expression(tokens), maxN))

  def shingleHashSetCol(tokens: Column, k: Int): Column =
    GraftShim.column(ShingleHashSetExpr(GraftShim.expression(tokens), k))
  def shingleHashSeqCol(tokens: Column, k: Int): Column =
    GraftShim.column(ShingleHashSeqExpr(GraftShim.expression(tokens), k))
  def minhashBandKeysCol(hashes: Column, bands: Int, r: Int): Column =
    GraftShim.column(MinHashBandKeysExpr(GraftShim.expression(hashes), bands, r))
  def simhash64Col(tokens: Column): Column =
    GraftShim.column(SimHash64Expr(GraftShim.expression(tokens)))
  def sortedIntersectCountCol(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectCountExpr(
      GraftShim.expression(a), GraftShim.expression(b)))
}

case class RepetitionStatsExpr(child: Expression, maxN: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.repetitionStats(input.asInstanceOf[ArrayData], maxN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.repetitionStats($c, $maxN)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShingleHashSetExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashes(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ShingleHashSeqExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashSeq(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingleHashSeq($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashBandKeysExpr(child: Expression, bands: Int, r: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashBandKeys(input.asInstanceOf[ArrayData], bands, r)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.minhashBandKeys($c, $bands, $r)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ContainsTokenSeqExpr(child: Expression, phrase: Array[UTF8String])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    TextKernels.containsTokenSeq(input.asInstanceOf[ArrayData], phrase)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phrase", phrase,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.containsTokenSeq($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
