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

  /** Word-level repetition signals (Gopher-style, Rae et al. 2021 §A1.1):
    * for n = 1..maxN, `dup_<n>_frac` = fraction of n-gram occurrences whose
    * gram repeats, `top_<n>_frac` = share of the most frequent n-gram.
    * n = 1 columns are named `dup_word_frac` / `top_word_frac`. One
    * codegen'd pass per row ([[graft.functions.TextKernels.repetitionStats]]),
    * rounded to 6 for oracle parity. */
  def withRepetitionSignals(
      df: DataFrame,
      textCol: String,
      maxN: Int = 3): DataFrame = {
    import graft.functions.TextKernels
    val stats = TextKernels.repetitionStatsCol(tokensWs(col(textCol)), maxN)
    val withArr = df.withColumn("_rep", stats)
    val named = (1 to maxN).foldLeft(withArr) { (d, g) =>
      val (dn, tn) =
        if (g == 1) ("dup_word_frac", "top_word_frac")
        else (s"dup_${g}gram_frac", s"top_${g}gram_frac")
      d.withColumn(dn, round(element_at(col("_rep"), 2 * (g - 1) + 1), 6))
        .withColumn(tn, round(element_at(col("_rep"), 2 * (g - 1) + 2), 6))
    }
    named.drop("_rep")
  }

  /** Composite Gopher-style quality gate: token-count and mean-token-length
    * bounds plus repetition-fraction ceilings. Emits `keep` = 1/0 so a
    * pipeline can `filter($"keep" === 1)` or audit the reject set. All
    * signals are per-row column expressions — the gate is shuffle-free at
    * any scale. */
  def withGopherKeep(
      df: DataFrame,
      textCol: String,
      minTokens: Int = 30,
      maxTokens: Int = 100000,
      minAvgTokenLen: Double = 3.0,
      maxAvgTokenLen: Double = 10.0,
      maxTopWordFrac: Double = 0.12,
      maxDup2GramFrac: Double = 0.09,
      maxDup3GramFrac: Double = 0.05): DataFrame = {
    val sig = withRepetitionSignals(withQualityFeatures(df, textCol), textCol)
    sig.withColumn("keep",
      (col("n_tokens").between(minTokens, maxTokens) &&
        col("avg_token_len").between(minAvgTokenLen, maxAvgTokenLen) &&
        col("top_word_frac") <= maxTopWordFrac &&
        col("dup_2gram_frac") <= maxDup2GramFrac &&
        col("dup_3gram_frac") <= maxDup3GramFrac).cast("int"))
  }

  /** Email pattern for [[redactPii]]: local-part @ domain . TLD. Plain
    * character classes + bounded quantifiers only — identical semantics in
    * Java regex (Spark) and RE2 (DuckDB oracle), no lookaround/backrefs. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-prefix phone pattern: +CC-NNN-NNNN. */
  val PhonePattern: String = "\\+\\d{1,2}-\\d{3}-\\d{4}"

  /** PII scrubbing (the C4-style pre-training redaction step): replaces
    * every email / phone match with a placeholder token and counts the
    * matches per row (counted on the ORIGINAL text, so the two patterns
    * can't shadow each other). Narrow codegen'd per-row expressions
    * (regexp_count / regexp_replace) — shuffle-free at any scale. */
  def redactPii(
      df: DataFrame,
      textCol: String,
      emailToken: String = "<EMAIL>",
      phoneToken: String = "<PHONE>"): DataFrame =
    df.withColumn("n_emails",
        regexp_count(col(textCol), lit(EmailPattern)).cast("long"))
      .withColumn("n_phones",
        regexp_count(col(textCol), lit(PhonePattern)).cast("long"))
      .withColumn("text_redacted",
        regexp_replace(
          regexp_replace(col(textCol), EmailPattern, emailToken),
          PhonePattern, phoneToken))
}
