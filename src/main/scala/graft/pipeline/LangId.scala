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

  /** ISO code → stopword-resource language name, for the common set. */
  val codeToLang: Map[String, String] = Map(
    "en" -> "english", "de" -> "german", "es" -> "spanish",
    "fr" -> "french", "it" -> "italian", "pt" -> "portuguese",
    "nl" -> "dutch", "ru" -> "russian", "zh" -> "chinese")

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

  /** Trigram → relative frequency over the language's stopword list. */
  private val profileCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Double]]()

  def profile(lang: String): Map[String, Double] =
    profileCache.computeIfAbsent(lang, { l =>
      val words = graft.functions.Stopwords.forLanguage(l)
      require(words.nonEmpty, s"no stopword resource for language: $l")
      val counts = scala.collection.mutable.Map.empty[String, Int]
      for (w <- words; tg <- trigrams(w)) counts(tg) = counts.getOrElse(tg, 0) + 1
      val total = counts.values.sum.toDouble
      counts.map { case (k, v) => k -> v / total }.toMap
    })

  private def cjkRatio(text: String): Double = {
    var cjk = 0; var letters = 0
    for (c <- text) if (Character.isLetter(c)) {
      letters += 1
      val b = Character.UnicodeBlock.of(c)
      if (b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
          b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
          b == Character.UnicodeBlock.HIRAGANA ||
          b == Character.UnicodeBlock.KATAKANA) cjk += 1
    }
    if (letters == 0) 0.0 else cjk.toDouble / letters
  }

  /** Classify into one of `codes` (ISO codes from [[codeToLang]]).
    * Deterministic: ties break on the lexicographically smallest code. */
  def classify(text: String, codes: Array[String]): String = {
    if (codes.contains("zh") && cjkRatio(text) > 0.3) return "zh"
    val tgs = trigrams(text)
    var best: String = null
    var bestScore = -1.0
    for (code <- codes.sorted if code != "zh") {
      val p = profile(codeToLang(code))
      var s = 0.0
      for (tg <- tgs) s += p.getOrElse(tg, 0.0)
      if (s > bestScore) { bestScore = s; best = code }
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
