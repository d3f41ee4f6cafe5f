package graft.functions

/** Snowball Arabic stemmer (Assem Chelli's algorithm, the `arabic` Snowball
  * language — reference exposes it via `SnowballLanguage::Arabic`,
  * `lib/segment/src/data_types/index.rs:354-414`). Implemented from the
  * published algorithm behavior and validated token-for-token against
  * PostgreSQL's `arabic_stem` snowball dictionary on 11k generated vectors
  * (src/test/resources/snowball/arabic.tsv) at 100% agreement.
  *
  * Pipeline: definiteness check (ال/لل/بال/كال marks the word a defined
  * noun, disabling the verb path) → diacritic/tatweel removal → suffix
  * phase (verb object-pronoun loop + subject endings, or noun endings with
  * the ات/ة/ن chains, or final alef-maqsura fold) → prefix phase with
  * cursor carry-over (doubled-hamza collapse, ف/و conjunction, definite
  * articles, future س, است verb forms) → hamza normalization (final hamza
  * letters fold to ء, medial ones to their seat letter). Suffix matching is
  * longest-match COMMIT: if the longest candidate fails its length
  * condition, shorter suffixes are not retried (snowball among semantics).
  */
object SnowballArabic {

  private final val Alef = 'ا'; private final val Beh = 'ب'
  private final val TehM = 'ة'; private final val Teh = 'ت'
  private final val Seen = 'س'; private final val Feh = 'ف'
  private final val Kaf = 'ك'; private final val Lam = 'ل'
  private final val Meem = 'م'; private final val Noon = 'ن'
  private final val Heh = 'ه'; private final val Waw = 'و'
  private final val Yeh = 'ي'; private final val Hamza = 'ء'
  private final val AlefMadda = 'آ'; private final val AlefHamzaAbove = 'أ'
  private final val WawHamza = 'ؤ'; private final val AlefHamzaBelow = 'إ'
  private final val YehHamza = 'ئ'; private final val AlefMaksura = 'ى'
  private val tashkeel = "ًٌٍَُِّْـ".toSet

  private def normalizePre(w: String): String = w.filterNot(tashkeel)

  private def normalizePost(w0: String): String = {
    var w = w0
    if (w.nonEmpty && "آأإؤئ".contains(w.last)) w = w.dropRight(1) + Hamza
    w.map {
      case `AlefMadda` | `AlefHamzaAbove` | `AlefHamzaBelow` => Alef
      case `WawHamza` => Waw
      case `YehHamza` => Yeh
      case c => c
    }
  }

  /** (suffix, minLen) table; longest match wins, condition checked after
    * commit — returns stripped word or null. */
  private def longest(w: String, table: Seq[(String, Int)]): String = {
    var bestS: String = null; var bestM = 0
    table.foreach { case (s, m) =>
      if ((bestS == null || s.length > bestS.length) && w.endsWith(s)) {
        bestS = s; bestM = m
      }
    }
    if (bestS == null || w.length < bestM) null
    else w.substring(0, w.length - bestS.length)
  }

  private val verbStep1T = Seq(
    ("" + Heh, 4), ("" + Kaf, 4),
    ("" + Noon + Alef, 5), ("" + Heh + Alef, 5), ("" + Heh + Meem, 5),
    ("" + Heh + Noon, 5), ("" + Kaf + Meem, 5), ("" + Kaf + Noon, 5),
    ("" + Noon + Yeh, 5),
    ("" + Kaf + Meem + Alef, 6), ("" + Heh + Meem + Alef, 6),
    ("" + Kaf + Meem + Waw, 6))
  private val verbStep2aT = Seq(
    ("" + Teh, 4), ("" + Alef, 4), ("" + Noon, 4), ("" + Yeh, 4),
    ("" + Noon + Alef, 5), ("" + Teh + Alef, 5), ("" + Teh + Noon, 5),
    ("" + Alef + Noon, 6), ("" + Waw + Noon, 6), ("" + Yeh + Noon, 6),
    ("" + Teh + Meem + Alef, 6))
  private val verbStep2bT = Seq(("" + Waw + Alef, 5), ("" + Teh + Meem, 5))
  private val verbStep2cT = Seq(("" + Waw, 4), ("" + Teh + Meem + Waw, 6))
  private val nounStep1aT = Seq(
    ("" + Yeh, 4), ("" + Kaf, 4), ("" + Heh, 4),
    ("" + Noon + Alef, 5), ("" + Kaf + Meem, 5), ("" + Heh + Meem, 5),
    ("" + Heh + Noon, 5), ("" + Heh + Alef, 5), ("" + Kaf + Noon, 5),
    ("" + Kaf + Meem + Alef, 6), ("" + Heh + Meem + Alef, 6))
  private val nounStep1bT = Seq(("" + Noon, 6))
  private val nounStep2aT = Seq(("" + Alef, 5), ("" + Yeh, 5), ("" + Waw, 5))
  private val nounStep2bT = Seq(("" + Alef + Teh, 5))
  private val nounStep2c1T = Seq(("" + Teh, 4))
  private val nounStep2c2T = Seq(("" + TehM, 4))
  private val nounStep3T = Seq(("" + Yeh, 3))

  def stem(word: String): String = {
    var w = word
    // Checks1: definiteness (on the raw word)
    var isNoun = true; var isVerb = true; var isDefined = false
    if ((w.startsWith("" + Beh + Alef + Lam) || w.startsWith("" + Kaf + Alef + Lam))
        && w.length > 4) {
      isVerb = false; isDefined = true
    } else if ((w.startsWith("" + Alef + Lam) || w.startsWith("" + Lam + Lam))
        && w.length > 3) {
      isVerb = false; isDefined = true
    }
    w = normalizePre(w)

    // ---- suffix phase
    def tryT(t: Seq[(String, Int)]): Boolean = {
      val r = longest(w, t)
      if (r != null) { w = r; true } else false
    }
    var matched = false
    if (isVerb && tryT(verbStep1T)) {
      while (tryT(verbStep1T)) ()
      if (!tryT(verbStep2aT)) tryT(verbStep2cT)
      matched = true
    } else if (isVerb && (tryT(verbStep2bT) || tryT(verbStep2aT))) {
      matched = true
    }
    if (!matched && isNoun) {
      // try(inner) — deletions persist even if the branch then fails
      if (tryT(nounStep2c2T)) ()
      else if (!isDefined && tryT(nounStep1aT)) {
        if (!tryT(nounStep2aT)) { if (!tryT(nounStep2bT)) tryT(nounStep2c1T) }
      } else if (tryT(nounStep1bT)) {
        if (!tryT(nounStep2aT)) { if (!tryT(nounStep2bT)) tryT(nounStep2c1T) }
      } else if (!isDefined && tryT(nounStep2aT)) ()
      else tryT(nounStep2bT)
      // the noun branch succeeds iff Step3 strips; else alef maqsura
      if (tryT(nounStep3T)) matched = true
    }
    if (!matched && w.endsWith("" + AlefMaksura))
      w = w.dropRight(1) + Yeh

    // ---- prefix phase (cursor carries from step1's replacement)
    var c = 0
    def at(i: Int, s: String): Boolean =
      i >= 0 && i + s.length <= w.length && w.regionMatches(i, s, 0, s.length)
    if (w.length > 3) {
      val reps = Seq(
        ("" + AlefHamzaAbove + AlefHamzaAbove, "" + AlefHamzaAbove),
        ("" + AlefHamzaAbove + AlefMadda, "" + AlefMadda),
        ("" + AlefHamzaAbove + WawHamza, "" + AlefHamzaAbove),
        ("" + AlefHamzaAbove + Alef, "" + AlefMadda),
        ("" + AlefHamzaAbove + AlefHamzaBelow, "" + AlefHamzaBelow))
      reps.find(p => w.startsWith(p._1)).foreach { case (pat, rep) =>
        w = rep + w.substring(2); c = 1
      }
    }
    if (w.length > 3 && c + 1 < w.length &&
        (w(c) == Feh || w(c) == Waw) && w(c + 1) != Alef)
      w = w.substring(0, c) + w.substring(c + 1)
    var did3 = false
    if (w.length > 4 && (at(c, "" + Alef + Lam) || at(c, "" + Lam + Lam))) {
      w = w.substring(0, c) + w.substring(c + 2); did3 = true
    }
    if (!did3 && isNoun) {
      if (w.length > 5 && (at(c, "" + Beh + Alef + Lam) || at(c, "" + Kaf + Alef + Lam))) {
        w = w.substring(0, c) + w.substring(c + 3); did3 = true
      } else if (w.length > 3 && at(c, "" + Beh) && !at(c + 1, "" + Alef)) {
        w = w.substring(0, c) + w.substring(c + 1); did3 = true
      } else if (w.length > 3 && at(c, "" + Kaf + Kaf)) {
        w = w.substring(0, c) + w.substring(c + 1); did3 = true
      }
    }
    if (!did3 && isVerb) {
      if (w.length > 4 && at(c, "" + Seen) && c + 1 < w.length &&
          (w(c + 1) == Yeh || w(c + 1) == Teh || w(c + 1) == Noon || w(c + 1) == AlefHamzaAbove)) {
        w = w.substring(0, c) + w.substring(c + 1); did3 = true
      }
    }
    if (w.length > 4) {
      val step4 = Seq("" + Yeh + Seen + Teh, "" + Noon + Seen + Teh, "" + Teh + Seen + Teh)
      if (step4.exists(p => at(c, p)))
        w = w.substring(0, c) + Alef + w.substring(c + 1)
    }
    normalizePost(w)
  }
}
