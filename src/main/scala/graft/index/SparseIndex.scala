package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sparse-vector scoring as an inverted-postings join — the bulk analog of
  * qdrant's posting-list search (`lib/sparse/src/index/search_context.rs`,
  * inverted index `lib/sparse/src/index/inverted_index/`).
  *
  * Layout: one postings row per (doc, dim) with a weight — in Parquet this
  * IS the inverted index once sorted/partitioned by dim: scans prune to the
  * query's dims, the join shuffles only matching postings. BM25 weighting
  * per `lib/bm25/src/lib.rs` (tf saturation k1, length norm b) and the
  * "fancy IDF" modifier `ln((N − df + 0.5)/(df + 0.5) + 1)` per
  * `lib/segment/src/data_types/query_context.rs:278-300`.
  */
object SparseIndex {

  /** Explode a struct<indices,values> sparse-vector column to postings
    * (id, dim, weight). */
  def postingsFromSparse(df: DataFrame, idCol: String, sparseCol: String): DataFrame =
    df.select(col(idCol),
        explode(arrays_zip(col(s"$sparseCol.indices"), col(s"$sparseCol.values"))).as("p"))
      .select(col(idCol), col("p.indices").as("dim"),
        col("p.values").cast("double").as("weight"))

  /** Term-frequency postings from a text column (dim = token string). */
  def postingsFromTokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(TextFunctions.tokensWs(col(textCol))).as("dim"))
      .groupBy(col(idCol), col("dim"))
      .agg(count(lit(1)).cast("double").as("weight"))

  /** BM25 document term weights:
    * tf = n·(k1+1) / (k1·(1 − b + b·doc_len/avg_doc_len) + n).
    * `docLen` joins per-doc token counts. Ref `lib/bm25/src/lib.rs:142-163`. */
  def bm25Postings(
      tfPostings: DataFrame,
      docLens: DataFrame, // (idCol, doc_len)
      idCol: String,
      k1: Double = 1.2,
      b: Double = 0.75,
      avgDocLen: Double = 256.0): DataFrame =
    tfPostings.join(docLens, idCol)
      .withColumn("weight",
        col("weight") * (lit(k1) + 1.0) /
          (lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("doc_len") / lit(avgDocLen)) +
            col("weight")))
      .select(col(idCol), col("dim"), col("weight"))

  /** IDF per dim over a corpus of `n` docs:
    * ln((n − df + 0.5)/(df + 0.5) + 1). The corpus may itself be filtered
    * (`params.idf.corpus`) — pass the filtered postings. */
  def idfTable(postings: DataFrame, idCol: String, n: Long): DataFrame =
    postings.groupBy(col("dim"))
      .agg(count_distinct(col(idCol)).cast("double").as("df"))
      .withColumn("idf",
        log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .select(col("dim"), col("idf"))

  /** Full-text BM25 top-k for a fixed (small) set of query terms — the
    * zero-shuffle shape. Per-doc term frequencies are column expressions
    * over the token array, so the whole query is two corpus scans and NO
    * shuffle: (1) one aggregate for N, avgdl and per-term document
    * frequencies (partial aggregation, a handful of counters per
    * partition); (2) a scoring scan that plans as TakeOrderedAndProject.
    * This is the 100 TB plan: no explode, no postings join, nothing wide
    * ever moves. The generic postings machinery (`search`) remains for
    * true sparse vectors and large query vocabularies. */
  def bm25SearchText(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[(String, Double)],
      k1: Double = 1.2,
      b: Double = 0.75,
      k: Int = 10): DataFrame = {
    val toks = TextFunctions.tokensWs(col(textCol))
    val tfCols = queryTerms.zipWithIndex.map { case ((t, _), i) =>
      size(filter(toks, x => x === lit(t))).cast("double").as(s"_tf_$i")
    }
    val withTf = docs.select(
      (col(idCol) +: size(toks).cast("double").as("_dl") +: tfCols): _*)
    val aggCols = count(lit(1)).as("n") +: avg(col("_dl")).as("avgdl") +:
      queryTerms.indices.map(i =>
        sum(when(col(s"_tf_$i") > 0, 1L).otherwise(0L)).cast("double").as(s"df_$i"))
    val stats = withTf.agg(aggCols.head, aggCols.tail: _*).head()
    val n = stats.getLong(0).toDouble
    val avgdl = stats.getDouble(1)
    val contribs = queryTerms.zipWithIndex.map { case ((_, qw), i) =>
      val df = stats.getDouble(2 + i)
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val tf = col(s"_tf_$i")
      tf * (lit(k1) + 1.0) /
        (lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("_dl") / lit(avgdl)) + tf) *
        lit(qw) * lit(idf)
    }
    withTf
      .filter(queryTerms.indices.map(i => col(s"_tf_$i") > 0).reduce(_ || _))
      .select(col(idCol), round(contribs.reduce(_ + _), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Score docs against a sparse query via postings join:
    * Σ_dims weight·qweight(·idf). Top-k largest. */
  def search(
      postings: DataFrame,
      idCol: String,
      query: DataFrame, // (dim, qw)
      idf: Option[DataFrame] = None,
      k: Int = 10): DataFrame = {
    val joined = postings.join(broadcast(query), "dim")
    val weighted = idf.fold(joined.withColumn("contrib", col("weight") * col("qw"))) {
      table =>
        joined.join(broadcast(table), Seq("dim"), "left")
          .withColumn("contrib",
            col("weight") * col("qw") * coalesce(col("idf"), lit(0.0)))
    }
    weighted.groupBy(col(idCol))
      .agg(round(sum(col("contrib")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
