package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-quality operators for training-data pipelines: token counting,
  * quality scoring, marker-based language ID, content fingerprinting.
  * All pure column expressions — codegen-friendly, no UDFs. */
object TextAnalysis {

  val DefaultStopwords: Seq[String] = Seq("the", "a")

  def tokenCount(text: Column): Column = size(tokensWs(text)).cast("long")

  /** Quality features: token count, stopword ratio, mean token length. */
  def withQualityFeatures(
      df: DataFrame,
      textCol: String,
      stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val toks = tokensWs(col(textCol))
    val n = size(toks)
    val stop = size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))
    df.withColumn("n_tokens", n.cast("long"))
      .withColumn("stop_ratio", round(stop.cast("double") / n.cast("double"), 6))
      .withColumn("avg_token_len",
        round((length(col(textCol)) - (n - 1)).cast("double") / n.cast("double"), 6))
  }

  /** Marker-word language ID: the language whose marker appears most often
    * wins; ties resolve in `markers` order. A stand-in for real n-gram
    * profiles (vocabulary here is synthetic); the plumbing — per-language
    * scores + argmax — matches a production char-n-gram scorer. */
  def langIdPredict(
      text: Column,
      markers: Seq[(String, String)]): Column = {
    val toks = tokensWs(text)
    val counts = markers.map { case (lang, marker) =>
      (lang, size(filter(toks, t => t === marker)))
    }
    // first-wins argmax as a nested CASE: if c_head ≥ all later, pick head;
    // else the global max lives in the tail — recurse.
    def build(rest: List[(String, Column)]): Column = rest match {
      case (lang, _) :: Nil => lit(lang)
      case (lang, c) :: tail =>
        when(tail.map { case (_, oc) => c >= oc }.reduce(_ && _), lit(lang))
          .otherwise(build(tail))
      case Nil => lit(null)
    }
    build(counts.toList)
  }

  /** Content fingerprint (md5 hex of raw text). */
  def fingerprint(text: Column): Column = md5(text)
}
