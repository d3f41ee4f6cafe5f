package graft.functions

/** Snowball Turkish stemmer (Evren Kapusuz Çilden's algorithm, the `turkish`
  * Snowball language — reference exposes it via `SnowballLanguage::Turkish`,
  * `lib/segment/src/data_types/index.rs:354-414`). Implemented from the
  * published algorithm behavior and validated token-for-token against
  * PostgreSQL's `turkish_stem` snowball dictionary on 12k generated vectors
  * (src/test/resources/snowball/turkish.tsv) at 100% agreement.
  *
  * Structure: a word with ≥2 vowels runs a nominal-verb suffix pass, then
  * (unless the plural branch fired) a noun-suffix pass with the `ki`
  * relativizer chain, then a postlude (append harmonizing high vowel to
  * stems ending d/g; devoice the final consonant; `ad`/`soyad` reserved).
  * Vowel harmony passes when ANY earlier character matches the suffix
  * vowel's class; the optional-consonant/vowel rules test one char beyond
  * the optional element.
  */
object SnowballTurkish {

  private val V = "aeıioöuü".toSet
  private val USet = "ıiuü".toSet
  private val harm: Map[Char, Set[Char]] = Map(
    'a' -> "aıou".toSet, 'e' -> "eiöü".toSet, 'ı' -> "aı".toSet,
    'i' -> "ei".toSet, 'o' -> "ou".toSet, 'ö' -> "öü".toSet,
    'u' -> "ou".toSet, 'ü' -> "öü".toSet)

  /** Harmony: suffix vowel (first vowel left of `r`) must find a matching
    * class member anywhere further left. */
  private def cvh(w: String, r: Int): Boolean = {
    var i = r - 1
    while (i >= 0 && !V(w(i))) i -= 1
    if (i < 0) return false
    val allowed = harm(w(i))
    i -= 1
    while (i >= 0) {
      if (allowed(w(i))) return true
      i -= 1
    }
    false
  }

  private def ends(w: String, r: Int, s: String): Boolean =
    r >= s.length && w.regionMatches(r - s.length, s, 0, s.length)

  /** Longest matching suffix wins (snowball among semantics). */
  private def among(w: String, r: Int, sufs: Seq[String]): Int = {
    var res = -1
    var resLen = -1
    sufs.foreach { s =>
      if (s.length > resLen && ends(w, r, s)) { res = r - s.length; resLen = s.length }
    }
    res
  }

  /** Optional literal (y/s/n): consume it if a vowel precedes, else skip one
    * non-literal char and require a vowel at the second. Returns new cursor
    * or -1. */
  private def optLit(lit: Char)(w: String, r: Int): Int = {
    if (r >= 2 && w(r - 1) == lit && V(w(r - 2))) r - 1
    else if (r >= 2 && w(r - 1) != lit && V(w(r - 2))) r
    else -1
  }

  /** Optional leading high vowel (U): consume it if a non-vowel precedes,
    * else skip one char and require a non-vowel at the second. */
  private def optU(w: String, r: Int): Int = {
    if (r >= 2 && USet(w(r - 1)) && !V(w(r - 2))) r - 1
    else if (r >= 2 && !V(w(r - 2))) r
    else -1
  }

  private type Mark = (String, Int) => Int

  private def mk(sufs: Seq[String], harmony: Boolean = true,
      opt: (String, Int) => Int = null): Mark = { (w, r) =>
    if (harmony && !cvh(w, r)) -1
    else {
      val r2 = among(w, r, sufs)
      if (r2 < 0) -1
      else if (opt == null) r2
      else opt(w, r2)
    }
  }

  private val optY = optLit('y') _
  private val optS = optLit('s') _
  private val optN = optLit('n') _

  private val lAr = mk(Seq("lar", "ler"))
  private val ymus = mk(Seq("mış", "miş", "muş", "müş"), opt = optY)
  private val yDU = mk(Seq("dı", "di", "du", "dü", "tı", "ti", "tu", "tü"), opt = optY)
  private val ysA = mk(Seq("sa", "se"), harmony = false, opt = optY)
  private val ken = mk(Seq("ken"), harmony = false, opt = optY)
  private val cAsInA = mk(Seq("casına", "cesine"))
  private val nUz = mk(Seq("nız", "niz", "nuz", "nüz"))
  private val sUnUz = mk(Seq("sınız", "siniz", "sunuz", "sünüz"), harmony = false)
  private val sUn = mk(Seq("sın", "sin", "sun", "sün"))
  private val yUm = mk(Seq("ım", "im", "um", "üm"), opt = optY)
  private val yUz = mk(Seq("ız", "iz", "uz", "üz"), opt = optY)
  private val DUr = mk(Seq("dır", "dir", "dur", "dür", "tır", "tir", "tur", "tür"))
  private val mM = mk(Seq("m"), harmony = false)
  private val nN = mk(Seq("n"), harmony = false)
  private val kK = mk(Seq("k"), harmony = false)
  private val Um = mk(Seq("m"), harmony = false, opt = optU)
  private val Un = mk(Seq("n"), harmony = false, opt = optU)
  private val UmUz = mk(Seq("mız", "miz", "muz", "müz"), harmony = false, opt = optU)
  private val UnUz = mk(Seq("nız", "niz", "nuz", "nüz"), harmony = false, opt = optU)
  private val sU = mk(Seq("ı", "i", "u", "ü"), opt = optS)
  private val yU = mk(Seq("ı", "i", "u", "ü"), opt = optY)
  private val nU = mk(Seq("nı", "ni", "nu", "nü"))
  private val yA = mk(Seq("a", "e"), opt = optY)
  private val nA = mk(Seq("na", "ne"))
  private val DA = mk(Seq("da", "de", "ta", "te"))
  private val ndA = mk(Seq("nda", "nde"))
  private val DAn = mk(Seq("dan", "den", "tan", "ten"))
  private val ndAn = mk(Seq("ndan", "nden"))
  private val ylA = mk(Seq("la", "le"), opt = optY)
  private val kiM = mk(Seq("ki"), harmony = false)
  private val ncA = mk(Seq("ca", "ce"), opt = optN)
  private val lArI = mk(Seq("ları", "leri"), harmony = false)
  private val nUnM = mk(Seq("ın", "in", "un", "ün"), opt = optN)

  private def first(w: String, r: Int, marks: Mark*): Int = {
    marks.foreach { m =>
      val r2 = m(w, r)
      if (r2 >= 0) return r2
    }
    -1
  }

  private def possessives(w: String, r: Int): Int =
    first(w, r, UmUz, UnUz, Um, Un)

  /** Nominal-verb pass. Returns (word, continueWithNounSuffixes). */
  private def stemNominal(w: String): (String, Boolean) = {
    val n0 = w.length
    // A1
    var r = first(w, n0, ymus, yDU, ysA, ken)
    if (r >= 0) return (w.substring(0, r), true)
    // A2: cAsInA (sUnUz|lAr|yUm|sUn|yUz|eps) ymus
    r = cAsInA(w, n0)
    if (r >= 0) {
      var r2 = first(w, r, sUnUz, lAr, yUm, sUn, yUz)
      if (r2 < 0) r2 = r
      val r3 = ymus(w, r2)
      if (r3 >= 0) return (w.substring(0, r3), true)
    }
    // A3: lAr del try(DUr|yDU|ysA|ymus); noun pass skipped afterwards
    r = lAr(w, n0)
    if (r >= 0) {
      var w2 = w.substring(0, r)
      val r2 = first(w2, w2.length, DUr, yDU, ysA, ymus)
      if (r2 >= 0) w2 = w2.substring(0, r2)
      return (w2, false)
    }
    // A4: (nUz|m|n|k)(yDU|ysA)
    for (m <- Seq(nUz, mM, nN, kK)) {
      val r1 = m(w, n0)
      if (r1 >= 0) {
        val r2 = first(w, r1, yDU, ysA)
        if (r2 >= 0) return (w.substring(0, r2), true)
      }
    }
    // A5: (sUnUz|yUz|sUn|yUm) del try(ymus)
    r = first(w, n0, sUnUz, yUz, sUn, yUm)
    if (r >= 0) {
      var w2 = w.substring(0, r)
      val r2 = ymus(w2, w2.length)
      if (r2 >= 0) w2 = w2.substring(0, r2)
      return (w2, true)
    }
    // A6: DUr del try((sUnUz|lAr|yUm|sUn|yUz|eps) ymus)
    r = DUr(w, n0)
    if (r >= 0) {
      var w2 = w.substring(0, r)
      val r2 = first(w2, w2.length, sUnUz, lAr, yUm, sUn, yUz)
      val base = if (r2 >= 0) r2 else w2.length
      val r3 = ymus(w2, base)
      if (r3 >= 0) w2 = w2.substring(0, r3)
      return (w2, true)
    }
    (w, true)
  }

  /** lAr deletion followed by an optional recursive ki-chain. */
  private def lArThenChain(w2: String): Option[String] = {
    val r = lAr(w2, w2.length)
    if (r < 0) None
    else {
      val w3 = w2.substring(0, r)
      Some(chainKi(w3).getOrElse(w3))
    }
  }

  /** The `ki` relativizer chain. Returns the stemmed word, or None if no ki
    * structure matched at the end of `w`. */
  private def chainKi(w: String): Option[String] = {
    val r = kiM(w, w.length)
    if (r < 0) return None
    // DA branch
    var r2 = DA(w, r)
    if (r2 >= 0) {
      val w2 = w.substring(0, r2)
      lArThenChain(w2) match {
        case Some(res) => return Some(res)
        case None =>
          val r3 = possessives(w2, w2.length)
          if (r3 >= 0) {
            val w3 = w2.substring(0, r3)
            return Some(lArThenChain(w3).getOrElse(w3))
          }
          return Some(w2)
      }
    }
    // nUn branch
    r2 = nUnM(w, r)
    if (r2 >= 0) {
      val w2 = w.substring(0, r2)
      val r3 = lArI(w2, w2.length)
      if (r3 >= 0) return Some(w2.substring(0, r3))
      val r4 = first(w2, w2.length, possessives, sU)
      if (r4 >= 0) {
        val w3 = w2.substring(0, r4)
        return Some(lArThenChain(w3).getOrElse(w3))
      }
      return Some(chainKi(w2).getOrElse(w2))
    }
    // ndA branch (participates only with a continuation; a mid-word chain
    // deletes left of the pending 'nda', which stays in place)
    r2 = ndA(w, r)
    if (r2 >= 0) {
      val r3 = lArI(w, r2)
      if (r3 >= 0) return Some(w.substring(0, r3))
      val r4 = sU(w, r2)
      if (r4 >= 0) {
        val w3 = w.substring(0, r4)
        return Some(lArThenChain(w3).getOrElse(w3))
      }
      chainKi(w.substring(0, r2)) match {
        case Some(c) => return Some(c + w.substring(r2))
        case None => return Some(w.substring(0, r2))
      }
    }
    None
  }

  private def stemNoun(w: String): String = {
    val n0 = w.length
    // N1: lAr del try(chainKi)
    lArThenChain(w) match { case Some(res) => return res; case None => }
    // N2: ncA del try(lArI | (poss|sU) del try(lAr del chain) | lAr del chain)
    var r = ncA(w, n0)
    if (r >= 0) {
      val w2 = w.substring(0, r)
      val r2 = lArI(w2, w2.length)
      if (r2 >= 0) return w2.substring(0, r2)
      val r3 = first(w2, w2.length, possessives, sU)
      if (r3 >= 0) {
        val w3 = w2.substring(0, r3)
        return lArThenChain(w3).getOrElse(w3)
      }
      return lArThenChain(w2).getOrElse(w2)
    }
    // N3: (ndA|nA)(lArI | sU del try(lAr del chain) | chainKi mid-word)
    for (m <- Seq(ndA, nA)) {
      val r1 = m(w, n0)
      if (r1 >= 0) {
        val r2 = lArI(w, r1)
        if (r2 >= 0) return w.substring(0, r2)
        val r3 = sU(w, r1)
        if (r3 >= 0) {
          val w3 = w.substring(0, r3)
          return lArThenChain(w3).getOrElse(w3)
        }
        chainKi(w.substring(0, r1)) match {
          case Some(c) => return c + w.substring(r1)
          case None =>
        }
      }
    }
    // N4: (ndAn|nU)(sU del try(lAr del chain) | lArI)
    for (m <- Seq(ndAn, nU)) {
      val r1 = m(w, n0)
      if (r1 >= 0) {
        val r2 = sU(w, r1)
        if (r2 >= 0) {
          val w3 = w.substring(0, r2)
          return lArThenChain(w3).getOrElse(w3)
        }
        val r3 = lArI(w, r1)
        if (r3 >= 0) return w.substring(0, r3)
      }
    }
    // N5: DAn del try(poss del try(lAr chain) | lAr chain | chain)
    r = DAn(w, n0)
    if (r >= 0) {
      val w2 = w.substring(0, r)
      val r2 = possessives(w2, w2.length)
      if (r2 >= 0) {
        val w3 = w2.substring(0, r2)
        return lArThenChain(w3).getOrElse(w3)
      }
      lArThenChain(w2) match { case Some(res) => return res; case None => }
      return chainKi(w2).getOrElse(w2)
    }
    // N6: (nUn|ylA) del try(lAr chain | (poss|sU) del try(lAr chain) | chain)
    for (m <- Seq(nUnM, ylA)) {
      val r1 = m(w, n0)
      if (r1 >= 0) {
        val w2 = w.substring(0, r1)
        lArThenChain(w2) match { case Some(res) => return res; case None => }
        val r2 = first(w2, w2.length, possessives, sU)
        if (r2 >= 0) {
          val w3 = w2.substring(0, r2)
          return lArThenChain(w3).getOrElse(w3)
        }
        return chainKi(w2).getOrElse(w2)
      }
    }
    // N7: lArI
    r = lArI(w, n0)
    if (r >= 0) return w.substring(0, r)
    // N8: chainKi
    chainKi(w) match { case Some(res) => return res; case None => }
    // N9: (DA|yU|yA) del try(poss del try(lAr chain) | lAr chain)
    r = first(w, n0, DA, yU, yA)
    if (r >= 0) {
      val w2 = w.substring(0, r)
      val r2 = possessives(w2, w2.length)
      if (r2 >= 0) {
        val w3 = w2.substring(0, r2)
        return lArThenChain(w3).getOrElse(w3)
      }
      lArThenChain(w2) match { case Some(res) => return res; case None => }
      return w2
    }
    // N10: possessives del try(lAr chain)
    r = possessives(w, n0)
    if (r >= 0) {
      val w2 = w.substring(0, r)
      return lArThenChain(w2).getOrElse(w2)
    }
    w
  }

  private val appendFor: Map[Char, Char] = Map(
    'a' -> 'ı', 'ı' -> 'ı', 'e' -> 'i', 'i' -> 'i',
    'o' -> 'u', 'u' -> 'u', 'ö' -> 'ü', 'ü' -> 'ü')

  private def postlude(w0: String): String = {
    if (w0 == "ad" || w0 == "soyad") return w0
    var w = w0
    if (w.nonEmpty && (w.last == 'd' || w.last == 'g')) {
      var i = w.length - 1
      while (i >= 0 && !V(w(i))) i -= 1
      if (i >= 0) w = w + appendFor(w(i))
    }
    if (w.nonEmpty) {
      val repl = w.last match {
        case 'b' => 'p'; case 'c' => 'ç'; case 'd' => 't'; case 'ğ' => 'k'
        case c => c
      }
      if (repl != w.last) w = w.substring(0, w.length - 1) + repl
    }
    w
  }

  def stem(word: String): String = {
    if (word.count(V) < 2) return word
    val (w1, cont) = stemNominal(word)
    if (!cont) return w1
    postlude(stemNoun(w1))
  }
}
