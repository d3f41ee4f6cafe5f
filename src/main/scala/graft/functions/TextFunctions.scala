package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for full-text match, dedup and quality pipelines.
  *
  * Tokenizer parity note: qdrant's full-text index supports word /
  * whitespace / prefix / multilingual tokenizers with lowercase, ascii
  * folding, stemming and stopwords (`lib/segment/src/data_types/index.rs:
  * 243-560`). The `documents` test corpus is already space-delimited
  * lowercase, so the whitespace tokenizer is the oracle-checked path; the
  * word tokenizer (split on non-alphanumerics + lowercase) is provided for
  * real corpora.
  */
object TextFunctions {

  /** Whitespace tokenizer (`Tokenizer::Whitespace`). */
  def tokensWs(text: Column): Column = split(text, " ")

  /** Word tokenizer: split on non-alphanumeric, lowercase, drop empties
    * (`Tokenizer::Word` + lowercase option). */
  def tokensWord(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** Case-PRESERVING word tokenizer — `Tokenizer::Word` with
    * `lowercase: false`: the lowercase step is a separate analyzer option
    * in the reference (issue #8724's regression pins that a mixed-case
    * custom stopword set survives verbatim when lowercase is off). */
  def tokensWordCased(text: Column): Column =
    filter(split(text, "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** Prefix tokenizer (`Tokenizer::Prefix`): per word, all edge n-grams of
    * length `minGram..maxGram` — enables prefix-match via exact token
    * lookup (ref `data_types/index.rs:243-312`). */
  def tokensPrefix(tokens: Column, minGram: Int, maxGram: Int): Column =
    array_distinct(flatten(transform(tokens, t =>
      filter(
        transform(sequence(lit(minGram), lit(maxGram)), n => substring(t, lit(1), n)),
        p => length(p) >= minGram && length(p) <= length(t)))))

  /** DOCUMENT-side prefix tokenization with the reference's exact edge
    * semantics (`PrefixTokenizer::tokenize`, `tokenizers/mod.rs:59-84`):
    * per processed word, prefixes of length `min..min(max, len)`; a word
    * SHORTER than `min` still emits itself (the loop's None arm emits the
    * whole word and breaks), so short words stay findable by exact match.
    * `max = None` means unbounded (prefixes up to the full word). */
  def tokensPrefixEdge(tokens: Column, minGram: Int,
      maxGram: Option[Int]): Column =
    array_distinct(flatten(transform(tokens, t => {
      val hi = maxGram.map(m => least(lit(m), length(t))).getOrElse(length(t))
      when(length(t) < minGram, array(t))
        .otherwise(transform(sequence(lit(minGram), hi),
          n => t.substr(lit(1), n)))
    })))

  /** Token length-range filter (`process_token`'s min/max_token_len —
    * `tokens_processor.rs:97-103`): processed tokens outside the range
    * are dropped. */
  def lengthRange(tokens: Column, min: Option[Int], max: Option[Int]): Column = {
    var t = tokens
    min.foreach(m => t = filter(t, x => length(x) >= m))
    max.foreach(m => t = filter(t, x => length(x) <= m))
    t
  }

  /** Lowercase option of the tokenizer pipeline. */
  def lowercaseTokens(tokens: Column): Column = transform(tokens, t => lower(t))

  /** ASCII folding (`ascii_folding` option): strip diacritics via NFD
    * decomposition + combining-mark removal — matches the common
    * Lucene/qdrant folding for Latin scripts. */
  def asciiFold(tokens: Column): Column =
    transform(tokens, t => org.apache.spark.sql.GraftShim.column(
      graft.functions.AsciiFoldExpr(org.apache.spark.sql.GraftShim.expression(t))))

  /** Stopword removal (`stopwords` option): drop tokens in the set. */
  def dropStopwords(tokens: Column, stopwords: Seq[String]): Column =
    filter(tokens, t => !t.isin(stopwords.map(_.asInstanceOf[Any]): _*))

  /** English Porter stemming (the `stemmer` option). Codegen'd static call
    * per token. For other languages see [[stemTokensLang]]. */
  def stemTokens(tokens: Column): Column =
    transform(tokens, t => org.apache.spark.sql.GraftShim.column(
      graft.functions.PorterStemExpr(org.apache.spark.sql.GraftShim.expression(t))))

  /** Snowball stemming for a given language (`SnowballLanguage`,
    * `data_types/index.rs:354-433`): per-token codegen'd dispatch into
    * [[Snowball]]. Unknown language → identity. */
  def stemTokensLang(tokens: Column, lang: String): Column =
    transform(tokens, t => org.apache.spark.sql.GraftShim.column(
      graft.functions.SnowballStemExpr(
        org.apache.spark.sql.GraftShim.expression(t), lang)))

  /** Multilingual tokenizer (`TokenizerType::Multilingual`): Unicode
    * letter/digit runs, CJK unigrams, lowercase, drops non-alphabetic
    * tokens. See [[MultilingualTokenizer]]. */
  def tokensMultilingual(text: Column): Column = MultilingualTokenizer.col(text)

  /** The full multilingual analyzer: multilingual tokenizer → per-language
    * stopword set → Snowball stemmer for that language (the reference's
    * language-default analyzer configuration). */
  def analyzeMultilingual(
      text: Column,
      lang: String,
      stem: Boolean = true,
      extraStopwords: Seq[String] = Nil): Column = {
    var t = tokensMultilingual(text)
    val sw = graft.functions.Stopwords.forLanguage(lang) ++ extraStopwords
    if (sw.nonEmpty) t = dropStopwords(t, sw.toSeq.sorted)
    if (stem) t = stemTokensLang(t, lang)
    t
  }

  /** Full tokenizer pipeline mirroring qdrant's TextIndexParams options:
    * tokenize → lowercase → ascii-fold → stopwords → stem. */
  def analyze(
      text: Column,
      word: Boolean = true,
      lowercase: Boolean = true,
      asciiFolding: Boolean = false,
      stopwords: Seq[String] = Nil,
      stem: Boolean = false): Column = {
    var t = if (word) tokensWord(text) else tokensWs(text)
    if (lowercase && !word) t = lowercaseTokens(t) // tokensWord lowercases
    if (asciiFolding) t = asciiFold(t)
    if (stopwords.nonEmpty) t = dropStopwords(t, stopwords)
    if (stem) t = stemTokens(t)
    t
  }

  /** Analyzer pipeline for a declared text-index config ([[graft.model
    * .TextIndexConfig]]): tokenize → lowercase → fold → stopwords → stem,
    * Column side. The word tokenizer lowercases inherently. */
  def analyzeWith(text: Column, c: graft.model.TextIndexConfig): Column = {
    var t = c.tokenizer match {
      case "multilingual" => tokensMultilingual(text)
      case "whitespace" =>
        if (c.lowercase) lowercaseTokens(tokensWs(text)) else tokensWs(text)
      case _ => if (c.lowercase) tokensWord(text) else tokensWordCased(text)
    }
    if (c.asciiFolding) t = asciiFold(t)
    if (c.stopwords.nonEmpty) t = dropStopwords(t, c.stopwords)
    c.stemmerLang.foreach(l => t = stemTokensLang(t, l))
    c.tokenizer match {
      case "prefix" =>
        // document side indexes edge n-grams of each processed word; the
        // min/max lengths bound the GRAMS, not the words — a short word
        // still indexes itself (`PrefixTokenizer::tokenize`)
        tokensPrefixEdge(t, c.minTokenLen.getOrElse(1), c.maxTokenLen)
      case _ =>
        lengthRange(t, c.minTokenLen, c.maxTokenLen)
    }
  }

  /** Driver-side twin of [[analyzeWith]] for QUERY strings — the reference
    * tokenizes a text-match query once at parse time with the field's
    * analyzer (`index.rs:243-414`). Shares the fold/stem kernels with the
    * Column path so both sides agree exactly. */
  def analyzeQueryWith(text: String, c: graft.model.TextIndexConfig): Seq[String] = {
    def fold(s: String): String =
      if (!c.asciiFolding) s
      else StemKernels.asciiFold(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
    def stem(s: String): String =
      c.stemmerLang.fold(s)(l => graft.functions.Snowball.stem(l, s))
    if (c.tokenizer == "prefix") {
      // QUERY-side prefix tokenization (`PrefixTokenizer::tokenize_query`,
      // `tokenizers/mod.rs:86-140`): one token per word — the processed
      // word truncated to max_token_len. STOPWORDS ARE NOT APPLIED (a
      // partial word must match even when it spells a stopword: query
      // "the" must find "theory"); words shorter than min_token_len don't
      // exist in the index and drop.
      return text.split("[^\\p{L}\\p{N}]+").toSeq.filter(_.nonEmpty)
        .map { w0 =>
          val w1 = fold(w0)
          stem(if (c.lowercase) w1.toLowerCase else w1)
        }
        .filter(w => c.minTokenLen.forall(w.length >= _))
        .map(w => c.maxTokenLen.fold(w)(m => w.take(m)))
    }
    var toks: Seq[String] = c.tokenizer match {
      case "multilingual" => MultilingualTokenizer.tokenize(text)
      case "whitespace" =>
        val t = text.split(" ", -1).toSeq
        if (c.lowercase) t.map(_.toLowerCase) else t
      case _ =>
        val base = if (c.lowercase) text.toLowerCase else text
        base.split("[^\\p{L}\\p{N}]+").toSeq.filter(_.nonEmpty)
    }
    if (c.asciiFolding)
      toks = toks.map(s => StemKernels.asciiFold(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString)
    if (c.stopwords.nonEmpty) {
      val sw = c.stopwords.toSet
      toks = toks.filterNot(sw)
    }
    c.stemmerLang.foreach { l =>
      toks = toks.map(w => graft.functions.Snowball.stem(l, w))
    }
    // processed tokens outside [min, max] don't exist in the index
    toks.filter(w => c.minTokenLen.forall(w.length >= _) &&
      c.maxTokenLen.forall(w.length <= _))
  }

  /** Consecutive k-token shingles joined with a single space. */
  def shingles(tokens: Column, k: Int): Column = {
    val n = size(tokens)
    when(n >= k,
      transform(sequence(lit(1), n - (k - 1)), i =>
        concat_ws(" ", (0 until k).map(j => element_at(tokens, i + j)): _*)))
      .otherwise(array())
  }

  /** Distinct shingle set for jaccard-style comparisons. */
  def shingleSet(tokens: Column, k: Int): Column = array_distinct(shingles(tokens, k))

  // MinHash signatures, LSH band keys and SimHash fingerprints are
  // single-pass codegen'd kernels in TextKernels (the HOF formulations were
  // ~100× slower); `shingles`/`shingleSet` above define the string-level
  // semantics that TextKernels.shingleHashes hashes — cross-checked in
  // PipelineSpec.

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
