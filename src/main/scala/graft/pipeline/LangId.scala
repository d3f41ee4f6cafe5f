package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-trigram language identification (Cavnar & Trenkle, "N-Gram-Based
  * Text Categorization", 1994): a per-language profile of padded character
  * trigram frequencies; classification scores a text's trigrams against each
  * profile and takes the argmax.
  *
  * Profiles are built once per JVM from the public per-language stopword
  * lists already shipped under `/stopwords/` — function words are the
  * highest-frequency tokens of a language, so their trigram distribution is
  * a compact, honestly-public stand-in for a corpus-derived profile.
  * CJK text carries its signal in the script itself, so a script-range check
  * (fraction of CJK codepoints) short-circuits before trigram scoring, as
  * real language-ID systems do.
  *
  * Replaces the round-1 marker-word stand-in as the realistic path; the
  * marker-word variant stays as the SQL-expressible oracle fixture
  * (`TextAnalysis.langIdPredict`).
  */
object LangId {

  /** ISO code → stopword-resource language name — every shipped stopword
    * set under `/stopwords/` (30 languages) is a usable profile source. */
  val codeToLang: Map[String, String] = Map(
    "en" -> "english", "de" -> "german", "es" -> "spanish",
    "fr" -> "french", "it" -> "italian", "pt" -> "portuguese",
    "nl" -> "dutch", "ru" -> "russian", "zh" -> "chinese",
    "ar" -> "arabic", "az" -> "azerbaijani", "eu" -> "basque",
    "bn" -> "bengali", "ca" -> "catalan", "da" -> "danish",
    "fi" -> "finnish", "el" -> "greek", "he" -> "hebrew",
    "hu" -> "hungarian", "id" -> "indonesian", "ja" -> "japanese",
    "kk" -> "kazakh", "ne" -> "nepali", "no" -> "norwegian",
    "ro" -> "romanian", "sl" -> "slovene", "sv" -> "swedish",
    "tg" -> "tajik", "tr" -> "turkish")

  /** Padded trigrams of the lowercased text: non-letter runs collapse to a
    * single space, each word is padded with one space per side. */
  def trigrams(text: String): Seq[String] = {
    val cleaned = text.toLowerCase
      .map(c => if (Character.isLetter(c)) c else ' ')
      .replaceAll("\\s+", " ").trim
    if (cleaned.isEmpty) Seq.empty
    else {
      val padded = " " + cleaned + " "
      (0 to padded.length - 3).map(i => padded.substring(i, i + 3))
    }
  }

  /** Rank a trigram count map: most frequent first, ties broken by the
    * trigram itself (determinism), truncated to `maxRank`. */
  private def rankOf(counts: collection.Map[String, Int]): Map[String, Int] =
    counts.toSeq.sortBy { case (tg, n) => (-n, tg) }
      .take(maxRank).zipWithIndex
      .map { case ((tg, _), r) => tg -> r }.toMap

  private val maxRank = 300

  /** Trigram → frequency RANK over the language's stopword list (the
    * Cavnar-Trenkle profile: rank order, not raw frequency — raw-frequency
    * scoring biases toward small profiles whose relative frequencies run
    * high). */
  private val profileCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Int]]()

  def profile(lang: String): Map[String, Int] =
    profileCache.computeIfAbsent(lang, { l =>
      val words = graft.functions.Stopwords.forLanguage(l)
      require(words.nonEmpty, s"no stopword resource for language: $l")
      val counts = scala.collection.mutable.Map.empty[String, Int]
      for (w <- words; tg <- trigrams(w)) counts(tg) = counts.getOrElse(tg, 0) + 1
      rankOf(counts)
    })

  private def scriptRatios(text: String): (Double, Double) = {
    var cjk = 0; var kana = 0; var letters = 0
    for (c <- text) if (Character.isLetter(c)) {
      letters += 1
      val b = Character.UnicodeBlock.of(c)
      if (b == Character.UnicodeBlock.HIRAGANA ||
          b == Character.UnicodeBlock.KATAKANA) { kana += 1; cjk += 1 }
      else if (b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
          b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A) cjk += 1
    }
    if (letters == 0) (0.0, 0.0)
    else (cjk.toDouble / letters, kana.toDouble / letters)
  }

  private val stopsetCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]()
  private def stopset(lang: String): Set[String] =
    stopsetCache.computeIfAbsent(lang, graft.functions.Stopwords.forLanguage)

  /** Per-hit weight for exact stopword-token matches. Function words are
    * near-perfect language discriminators, and for closely related pairs
    * (es/ca, da/no/sv) the word level separates what the shared trigram
    * inventory cannot — e.g. Spanish "los"/"mientras" vs Catalan
    * "els"/"mentre". Same public resource as the profiles. The weight
    * makes one exact word match outweigh a handful of trigram-rank
    * differences; holdout accuracy is flat across 800–2000 (the word
    * evidence saturates), so the value is not fine-tuned. */
  private val stopwordBonus = 1000L

  /** Classify into one of `codes` (ISO codes from [[codeToLang]]):
    * Cavnar-Trenkle out-of-place measure (rank the text's own trigrams,
    * score each language as Σ |text rank − profile rank| with a max-rank
    * penalty for absent trigrams) MINUS a per-language exact stopword-hit
    * bonus; argmin wins. Script short-circuits first (kana → ja, han → zh)
    * — for those scripts the signal is the script itself, as real
    * language-ID systems use. Deterministic: ties break on the
    * lexicographically smallest code. */
  def classify(text: String, codes: Array[String]): String = {
    val (cjk, kana) = scriptRatios(text)
    if (codes.contains("ja") && kana > 0.05) return "ja"
    if (codes.contains("zh") && cjk > 0.3) return "zh"
    val cleaned = text.toLowerCase
      .map(c => if (Character.isLetter(c)) c else ' ')
      .replaceAll("\\s+", " ").trim
    val tokens = if (cleaned.isEmpty) Array.empty[String] else cleaned.split(' ')
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for (tg <- trigrams(text)) counts(tg) = counts.getOrElse(tg, 0) + 1
    val textRanks = rankOf(counts)
    var best: String = null
    var bestScore = Long.MaxValue
    for (code <- codes.sorted if code != "zh" && code != "ja") {
      val lang = codeToLang(code)
      val p = profile(lang)
      var s = 0L
      for ((tg, tr) <- textRanks)
        s += math.abs(tr - p.getOrElse(tg, maxRank)).toLong
      val sw = stopset(lang)
      var hits = 0L
      for (t <- tokens) if (sw.contains(t)) hits += 1
      s -= hits * stopwordBonus
      if (s < bestScore) { bestScore = s; best = code }
    }
    if (best == null) codes.sorted.head else best
  }

  private val codesCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** Kernel entry for codegen (UTF8String in/out; codes comma-joined —
    * a plain String keeps the Expression case class canonicalizable). */
  def classifyUtf8(text: UTF8String, codesCsv: String): UTF8String =
    UTF8String.fromString(classify(text.toString,
      codesCache.computeIfAbsent(codesCsv, _.split(','))))

  def langIdTrigram(text: Column, codes: Seq[String]): Column =
    org.apache.spark.sql.GraftShim.column(
      LangIdTrigramExpr(org.apache.spark.sql.GraftShim.expression(text),
        codes.mkString(",")))
}

/** Codegen'd trigram language-ID over a string column. */
case class LangIdTrigramExpr(child: Expression, codesCsv: String)
  extends UnaryExpression {
  require(codesCsv.nonEmpty &&
    codesCsv.split(',').forall(LangId.codeToLang.contains),
    s"unsupported language codes: $codesCsv")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    LangId.classifyUtf8(input.asInstanceOf[UTF8String], codesCsv)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdCodes", codesCsv, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.pipeline.LangId.classifyUtf8($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
