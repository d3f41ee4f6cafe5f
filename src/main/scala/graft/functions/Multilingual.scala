package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multilingual tokenizer (`TokenizerType::Multilingual`,
  * `lib/segment/src/data_types/index.rs:249-256`, impl
  * `full_text_index/tokenizers/multilingual.rs`):
  *  - runs of Unicode letters/digits form one token;
  *  - Han / Hiragana / Katakana characters tokenize per character (the
  *    reference segments Japanese with a trained model — vaporetto; this
  *    engine uses the standard CJK-unigram fallback, which is what its
  *    charabia path does for Chinese as well);
  *  - tokens are lowercased;
  *  - tokens with no alphabetic character (pure digits/punctuation) are
  *    skipped, mirroring `multilingual.rs:49-52`.
  */
object MultilingualTokenizer {

  private def isCjk(cp: Int): Boolean = {
    val s = Character.UnicodeScript.of(cp)
    s == Character.UnicodeScript.HAN || s == Character.UnicodeScript.HIRAGANA ||
    s == Character.UnicodeScript.KATAKANA
  }

  def tokenize(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val run = new java.lang.StringBuilder
    var runHasAlpha = false
    def flush(): Unit = {
      if (run.length > 0) {
        if (runHasAlpha) out += run.toString.toLowerCase(java.util.Locale.ROOT)
        run.setLength(0); runHasAlpha = false
      }
    }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val n = Character.charCount(cp)
      if (isCjk(cp)) {
        flush()
        out += new String(Character.toChars(cp)).toLowerCase(java.util.Locale.ROOT)
      } else if (Character.isLetterOrDigit(cp)) {
        run.appendCodePoint(cp)
        if (Character.isLetter(cp)) runHasAlpha = true
      } else if (run.length > 0 && {
        val t = Character.getType(cp)
        t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK
      }) {
        // combining marks (Indic vowel signs, virama, Arabic/Hebrew
        // diacritics — category Mn/Mc, not isLetter) CONTINUE the word:
        // without this, Tamil மாணவர்கள் shatters at every sign
        run.appendCodePoint(cp)
      } else flush()
      i += n
    }
    flush()
    out.result()
  }

  /** Codegen entry point. */
  def tokenizeUtf8(text: UTF8String): ArrayData =
    new GenericArrayData(
      tokenize(text.toString).map(UTF8String.fromString(_)).toArray[Any])

  def col(text: Column): Column =
    GraftShim.column(MultilingualTokenizeExpr(GraftShim.expression(text)))
}

/** Codegen'd multilingual tokenization — one pass per row inside
  * whole-stage codegen. */
case class MultilingualTokenizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MultilingualTokenizer.tokenizeUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MultilingualTokenizer.tokenizeUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-language stopword sets — the predefined-language arm of
  * `StopwordsInterface` (`lib/segment/src/data_types/index.rs:434-560`).
  * The lists are the standard NLTK-derived sets the reference bundles
  * (`full_text_index/stop_words/`), shipped as resources. */
object Stopwords {

  private val cache = scala.collection.concurrent.TrieMap.empty[String, Set[String]]

  /** Stopword set for a language name ("german", "english", ...); empty set
    * for languages without a bundled list. */
  def forLanguage(lang: String): Set[String] =
    cache.getOrElseUpdate(lang.toLowerCase, {
      val res = getClass.getResourceAsStream(s"/stopwords/${lang.toLowerCase}.txt")
      if (res == null) Set.empty
      else
        scala.util.Using.resource(scala.io.Source.fromInputStream(res, "UTF-8")) {
          _.getLines().filter(_.nonEmpty).toSet
        }
    })

  def available: Seq[String] = Seq("arabic", "azerbaijani", "basque",
    "bengali", "catalan", "chinese", "danish", "dutch", "english",
    "finnish", "french", "german", "greek", "hebrew", "hinglish",
    "hungarian", "indonesian", "italian", "japanese", "kazakh", "nepali",
    "norwegian", "portuguese", "romanian", "russian", "slovene", "spanish",
    "swedish", "tajik", "turkish")
}
