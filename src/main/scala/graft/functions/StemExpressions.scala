package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token normalizers for the full-text analyzer pipeline: English Porter
  * stemming and ASCII diacritic folding, as codegen'd per-token kernels.
  * Ref: qdrant's tokenizer options `lib/segment/src/data_types/index.rs:
  * 243-414` (Snowball stemmers, ascii_folding).
  */
object StemKernels {

  /** Porter (1980) stemming algorithm, standard five-step formulation. */
  def porter(s: UTF8String): UTF8String = {
    val w = s.toString
    if (w.length <= 2) return s
    UTF8String.fromString(porterStem(w))
  }

  def asciiFold(s: UTF8String): UTF8String = {
    val str = s.toString
    var needs = false
    var i = 0
    while (i < str.length && !needs) { if (str.charAt(i) > 127) needs = true; i += 1 }
    if (!needs) return s
    val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(norm.length)
    i = 0
    while (i < norm.length) {
      val c = norm.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  // ---- Porter stemmer internals (public-domain algorithm, Porter 1980) ----

  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** Measure m of the [C](VC)^m[V] form. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && isCons(w, i)) i += 1
    while (i < n) {
      while (i < n && !isCons(w, i)) i += 1
      if (i < n) { m += 1; while (i < n && isCons(w, i)) i += 1 }
    }
    m
  }

  private def hasVowel(w: String): Boolean =
    (0 until w.length).exists(i => !isCons(w, i))

  private def endsDoubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isCons(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def cvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && isCons(w, n - 1) && !isCons(w, n - 2) && isCons(w, n - 3) && {
      val c = w.charAt(n - 1); c != 'w' && c != 'x' && c != 'y'
    }
  }

  private def step1(w0: String): String = {
    var w = w0
    // 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)
    // 1b
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else {
      val trimmed =
        if (w.endsWith("ed") && hasVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      trimmed.foreach { t =>
        w = if (t.endsWith("at") || t.endsWith("bl") || t.endsWith("iz")) t + "e"
        else if (endsDoubleCons(t) && !"lsz".contains(t.last)) t.dropRight(1)
        else if (measure(t) == 1 && cvc(t)) t + "e"
        else t
      }
    }
    // 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"
    w
  }

  private val step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4Sufs = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def applyRules(w: String, rules: Seq[(String, String)]): String =
    rules.collectFirst {
      case (suf, rep) if w.endsWith(suf) && measure(w.dropRight(suf.length)) > 0 =>
        w.dropRight(suf.length) + rep
    }.getOrElse(w)

  private def porterStem(w0: String): String = {
    var w = step1(w0)
    w = applyRules(w, step2Rules)
    w = applyRules(w, step3Rules)
    // step 4: drop suffix when m(stem) > 1 ("ion" additionally needs s/t stem)
    step4Sufs.collectFirst {
      case suf if w.endsWith(suf) && measure(w.dropRight(suf.length)) > 1 &&
        (suf != "ion" || { val st = w.dropRight(3); st.nonEmpty && "st".contains(st.last) }) =>
        w.dropRight(suf.length)
    }.foreach(stemmed => w = stemmed)
    // step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      if (measure(stem) > 1 || (measure(stem) == 1 && !cvc(stem))) w = stem
    }
    // step 5b
    if (measure(w) > 1 && endsDoubleCons(w) && w.endsWith("l")) w = w.dropRight(1)
    w
  }
}

case class PorterStemExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    StemKernels.porter(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StemKernels.porter($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class AsciiFoldExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    StemKernels.asciiFold(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StemKernels.asciiFold($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd Snowball stemming for a fixed language — static dispatch into
  * [[Snowball]] stays inside whole-stage codegen. */
case class SnowballStemExpr(child: Expression, lang: String) extends UnaryExpression {
  require(lang == "english" || Snowball.supported(lang),
    s"unsupported snowball language: $lang")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Snowball.stem(lang, input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val langRef = ctx.addReferenceObj("snowballLang", lang, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |graft.functions.Snowball.stem($langRef, $c.toString()))""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
