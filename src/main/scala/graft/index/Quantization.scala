package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model._
import graft.ops.Search

/** Vector compression transforms + two-phase (approx → exact rescore)
  * search, mirroring qdrant's quantization configs (SURVEY.md §2.6;
  * scalar int8 `types.rs:930-985`, binary `types.rs:1036-1120`, rescore +
  * oversampling `types.rs:573-618`).
  *
  * Scale shape: the quantized column is 4× (int8) / 32× (binary) smaller
  * than f32 — phase 1 scans only it; phase 2 re-reads full vectors for just
  * k·oversampling candidates via semi-join.
  */
object Quantization {

  /** Global scalar int8 params from data (min/max with optional quantile
    * clipping, ref `ScalarQuantizationConfig.quantile`). */
  final case class ScalarParams(min: Double, max: Double) {
    def delta: Double = (max - min) / 255.0
  }

  def fitScalar(df: DataFrame, vecCol: String, quantile: Double = 1.0): ScalarParams = {
    val flat = df.select(explode(col(vecCol)).as("v0"))
      .select(col("v0").cast("double").as("v"))
    if (quantile >= 1.0) {
      val row = flat.agg(min(col("v")), max(col("v"))).head()
      ScalarParams(row.getDouble(0), row.getDouble(1))
    } else {
      val qs = flat.stat.approxQuantile("v", Array(1.0 - quantile, quantile), 0.001)
      ScalarParams(qs(0), qs(1))
    }
  }

  /** Encode to array<int> in [0,255] (clipped). */
  def encodeScalar(vecCol: Column, p: ScalarParams): Column =
    transform(vecCol, v =>
      least(greatest(
        round((v.cast("double") - p.min) / lit(p.delta), 0), lit(0.0)), lit(255.0))
        .cast("int"))

  /** Dequantized similarity on the int8 column. */
  def scalarScore(metric: Metric, qcol: Column, query: Seq[Double], p: ScalarParams): Column = {
    val deq = transform(qcol, q => q.cast("double") * lit(p.delta) + lit(p.min))
    Search.scoreExpr(metric, deq, typedLit(query))
  }

  /** Two-phase search: approx top k·oversampling on the quantized column,
    * exact rescore of those candidates on the original vectors. */
  def searchScalarRescore(
      encoded: DataFrame, // original cols + "qvec" int8 column
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      metric: Metric,
      p: ScalarParams,
      k: Int = 10,
      oversampling: Double = 3.0): DataFrame = {
    val approxK = math.max(k, (k * oversampling).toInt)
    val approx = Search.scoredTopK(encoded, idCol,
      scalarScore(metric, col("qvec"), query, p), metric.largerBetter, k = approxK)
    val cands = encoded.join(approx.select(idCol), Seq(idCol), "left_semi")
    Search.scoredTopK(cands, idCol,
      Search.scoreExpr(metric, col(vecCol), typedLit(query)), metric.largerBetter, k = k)
  }

  /** Binary quantization: sign bits packed into array<long> (dim/64 words).
    * Query encoded the same; approx distance = hamming. */
  def encodeBinary(vecCol: Column, dim: Int): Column = {
    val words = (dim + 63) / 64
    array((0 until words).map { w =>
      val bits = (0 until math.min(64, dim - w * 64)).map { b =>
        when(element_at(vecCol, w * 64 + b + 1).cast("double") > 0.0,
          lit(1L << b)).otherwise(lit(0L))
      }
      bits.reduce((a, b) => a.bitwiseOR(b))
    }: _*)
  }

  def binaryQueryLiteral(query: Seq[Double]): Seq[Long] = {
    val words = (query.length + 63) / 64
    (0 until words).map { w =>
      (0 until math.min(64, query.length - w * 64)).foldLeft(0L) { (acc, b) =>
        if (query(w * 64 + b) > 0.0) acc | (1L << b) else acc
      }
    }
  }

  /** Hamming distance between packed sign vectors (smaller = more similar
    * for angular metrics). */
  def hammingScore(bcol: Column, queryWords: Seq[Long]): Column =
    aggregate(zip_with(bcol, typedLit(queryWords), (a, b) =>
      bit_count(a.bitwiseXOR(b))), lit(0), (acc, x) => acc + x)

  def searchBinaryRescore(
      encoded: DataFrame, // original cols + "bvec" packed column
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      metric: Metric,
      k: Int = 10,
      oversampling: Double = 4.0): DataFrame = {
    val approxK = math.max(k, (k * oversampling).toInt)
    val approx = Search.scoredTopK(encoded, idCol,
      hammingScore(col("bvec"), binaryQueryLiteral(query)).cast("double"),
      largerBetter = false, k = approxK)
    val cands = encoded.join(approx.select(idCol), Seq(idCol), "left_semi")
    Search.scoredTopK(cands, idCol,
      Search.scoreExpr(metric, col(vecCol), typedLit(query)), metric.largerBetter, k = k)
  }
}
