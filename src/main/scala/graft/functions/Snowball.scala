package graft.functions

/** Snowball stemmers (Porter's Snowball family), implemented from the
  * published algorithm definitions — the `stemmer` option of the full-text
  * analyzer (`StemmingAlgorithm`/`SnowballLanguage`,
  * `lib/segment/src/data_types/index.rs:313-433`; the reference delegates to
  * the rust-stemmers crate, we implement the algorithms directly).
  *
  * Every implementation is validated token-for-token against an independent
  * Snowball implementation (PostgreSQL's snowball dictionaries) on ~5k
  * generated words per language — see AnalyzerSpec and the TSV fixtures
  * under src/test/resources/snowball/.
  *
  * Common machinery: R1/R2 are the standard Snowball regions — R1 the part
  * after the first non-vowel following a vowel, R2 the same applied within
  * R1. RV is language-specific.
  */
object Snowball {

  /** Languages with a full Snowball implementation here. */
  def supported: Set[String] = stemmers.keySet + "english"

  private lazy val stemmers: Map[String, String => String] = Map(
    "german" -> German.stem _,
    "russian" -> Russian.stem _,
    "spanish" -> Spanish.stem _,
    "portuguese" -> Portuguese.stem _,
    "italian" -> Italian.stem _,
    "french" -> French.stem _,
    "dutch" -> Dutch.stem _,
    "danish" -> Danish.stem _,
    "norwegian" -> Norwegian.stem _,
    "swedish" -> Swedish.stem _,
    "finnish" -> Finnish.stem _,
    "hungarian" -> Hungarian.stem _,
    "romanian" -> Romanian.stem _,
    "armenian" -> Armenian.stem _,
    "turkish" -> SnowballTurkish.stem _,
    "arabic" -> SnowballArabic.stem _,
    "greek" -> SnowballGreek.stem _,
    "tamil" -> SnowballTamil.stem _,
  )

  /** Stem one lowercase word. Unknown language → identity (the reference's
    * `try_default_from_language` returns None likewise). English delegates
    * to the existing Porter implementation. */
  def stem(lang: String, word: String): String =
    if (lang == "english")
      StemKernels.porter(org.apache.spark.unsafe.types.UTF8String.fromString(word)).toString
    else stemmers.get(lang).map(_(word)).getOrElse(word)

  /** First position AFTER the first non-vowel that follows a vowel, scanning
    * from `from`; `len` if none — the standard R1/R2 region start. */
  private[functions] def regionAfterVC(s: String, from: Int, isVowel: Char => Boolean): Int = {
    var i = from
    while (i < s.length && !isVowel(s(i))) i += 1
    while (i < s.length && isVowel(s(i))) i += 1
    // s(i) is now the first non-vowel after a vowel (or end)
    if (i < s.length) i + 1 else s.length
  }

  // ---------------------------------------------------------------- German
  /** Snowball German. Ref algorithm: snowball German stemmer (public spec).
    * Validated against PostgreSQL german_stem. */
  object German {
    private val vowels = "aeiouyäöü".toSet
    private val sEnding = "bdfghklmnrt".toSet
    private val stEnding = "bdfghklmnt".toSet

    def stem(word: String): String = {
      if (word.isEmpty) return word
      var w = word.replace("ß", "ss")
      // u/y between vowels are consonants: mark uppercase
      val cs = w.toCharArray
      var i = 1
      while (i < cs.length - 1) {
        if ((cs(i) == 'u' || cs(i) == 'y') && vowels(cs(i - 1)) && vowels(cs(i + 1)))
          cs(i) = (cs(i) - 32).toChar
        i += 1
      }
      w = new String(cs)
      val isV = (c: Char) => vowels(c)
      // R2 is computed from the RAW R1; only R1 itself is then adjusted so
      // that at least 3 letters precede it
      val r1raw = regionAfterVC(w, 0, isV)
      val r2 = regionAfterVC(w, r1raw, isV)
      val r1 = if (r1raw < 3) 3 else r1raw

      def inR1(pos: Int) = pos >= r1
      def inR2(pos: Int) = pos >= r2

      // step 1: longest of (em ern er | e en es | s after valid s-ending)
      val s1a = Seq("em", "ern", "er")
      val s1b = Seq("en", "es", "e")
      var done1 = false
      for (suf <- Seq("ern", "em", "er", "en", "es", "e", "s").sortBy(-_.length) if !done1) {
        if (w.endsWith(suf)) {
          done1 = true
          val pos = w.length - suf.length
          if (s1a.contains(suf)) {
            if (inR1(pos)) w = w.substring(0, pos)
          } else if (s1b.contains(suf)) {
            if (inR1(pos)) {
              w = w.substring(0, pos)
              if (w.endsWith("niss")) w = w.substring(0, w.length - 1)
            }
          } else { // "s"
            if (inR1(pos) && pos > 0 && sEnding(w(pos - 1))) w = w.substring(0, pos)
          }
        }
      }

      // step 2: longest of (en er est | st after valid st-ending with >=3 before)
      var done2 = false
      for (suf <- Seq("est", "en", "er", "st") if !done2) {
        if (w.endsWith(suf)) {
          done2 = true
          val pos = w.length - suf.length
          if (suf == "st") {
            if (inR1(pos) && pos > 0 && stEnding(w(pos - 1)) && pos - 1 >= 3)
              w = w.substring(0, pos)
          } else if (inR1(pos)) w = w.substring(0, pos)
        }
      }

      // step 3: d-suffixes
      var done3 = false
      for (suf <- Seq("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik") if !done3) {
        if (w.endsWith(suf)) {
          done3 = true
          val pos = w.length - suf.length
          suf match {
            case "end" | "ung" =>
              if (inR2(pos)) {
                w = w.substring(0, pos)
                if (w.endsWith("ig") && inR2(w.length - 2) &&
                  !(w.length >= 3 && w(w.length - 3) == 'e'))
                  w = w.substring(0, w.length - 2)
              }
            case "ig" | "ik" | "isch" =>
              if (inR2(pos) && !(pos > 0 && w(pos - 1) == 'e'))
                w = w.substring(0, pos)
            case "lich" | "heit" =>
              if (inR2(pos)) {
                w = w.substring(0, pos)
                if ((w.endsWith("er") || w.endsWith("en")) && inR1(w.length - 2))
                  w = w.substring(0, w.length - 2)
              }
            case "keit" =>
              if (inR2(pos)) {
                w = w.substring(0, pos)
                for (p <- Seq("lich", "ig"))
                  if (w.endsWith(p) && inR2(w.length - p.length))
                    w = w.substring(0, w.length - p.length)
              }
            case _ =>
          }
        }
      }

      w.map {
        case 'U' => 'u'; case 'Y' => 'y'
        case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'
        case c => c
      }
    }
  }

  // --------------------------------------------------------------- Russian
  /** Snowball Russian. ё folds to е up front; RV = after the first vowel;
    * every ending must lie inside RV. Validated against russian_stem. */
  object Russian {
    private val vowels = "аеиоуыэюя".toSet

    // (pattern, chars to remove) — group-1 endings embed the preceding а/я
    // which stays part of the stem
    private def g1(sufs: Seq[String]): Seq[(String, Int)] =
      sufs.flatMap(s => Seq(("а" + s, s.length), ("я" + s, s.length)))
    private def g2(sufs: Seq[String]): Seq[(String, Int)] = sufs.map(s => (s, s.length))

    private val perfGerund =
      (g1(Seq("в", "вши", "вшись")) ++
        g2(Seq("ив", "ивши", "ившись", "ыв", "ывши", "ывшись"))).sortBy(-_._1.length)
    private val adjective = g2(Seq(
      "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой", "ем", "им",
      "ым", "ом", "его", "ого", "ему", "ому", "их", "ых", "ую", "юю", "ая",
      "яя", "ою", "ею")).sortBy(-_._1.length)
    private val participle =
      (g1(Seq("ем", "нн", "вш", "ющ", "щ")) ++
        g2(Seq("ивш", "ывш", "ующ"))).sortBy(-_._1.length)
    private val verb =
      (g1(Seq("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н", "ло", "но",
        "ет", "ют", "ны", "ть", "ешь", "нно")) ++
        g2(Seq("ила", "ыла", "ена", "ейте", "уйте", "ите", "или", "ыли", "ей",
          "уй", "ил", "ыл", "им", "ым", "ен", "ило", "ыло", "ено", "ят",
          "ует", "уют", "ит", "ыт", "ены", "ить", "ыть", "ишь", "ую", "ю")))
        .sortBy(-_._1.length)
    private val noun = g2(Seq(
      "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии", "и",
      "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам", "ом", "о",
      "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия", "ья", "я"))
      .sortBy(-_._1.length)

    def stem(word0: String): String = {
      var w = word0.replace("ё", "е")
      val isV = (c: Char) => vowels(c)
      var rv = 0
      while (rv < w.length && !isV(w(rv))) rv += 1
      rv += 1 // after the first vowel
      if (rv >= w.length) return w
      val r1raw = regionAfterVC(w, 0, isV)
      val r2 = regionAfterVC(w, r1raw, isV)

      // try the longest pattern of `table` whose match lies inside RV;
      // remove its removable part; true if something was removed
      def tryRemove(table: Seq[(String, Int)]): Boolean = {
        for ((pat, rem) <- table) {
          if (w.length - pat.length >= rv && w.endsWith(pat)) {
            w = w.substring(0, w.length - rem)
            return true
          }
        }
        false
      }

      // step 1
      if (!tryRemove(perfGerund)) {
        if (w.endsWith("ся") || w.endsWith("сь")) {
          if (w.length - 2 >= rv) w = w.substring(0, w.length - 2)
        }
        if (tryRemove(adjective)) { tryRemove(participle); () }
        else if (tryRemove(verb)) ()
        else tryRemove(noun)
      }
      // step 2: final и
      if (w.endsWith("и") && w.length - 1 >= rv) w = w.substring(0, w.length - 1)
      // step 3: derivational, in R2
      for (d <- Seq("ость", "ост"))
        if (w.endsWith(d) && w.length - d.length >= r2) {
          w = w.substring(0, w.length - d.length)
        }
      // step 4
      if (w.endsWith("нн") && w.length - 1 >= rv) w = w.substring(0, w.length - 1)
      else {
        var done = false
        for (sup <- Seq("ейше", "ейш") if !done)
          if (w.endsWith(sup) && w.length - sup.length >= rv) {
            w = w.substring(0, w.length - sup.length)
            done = true
            if (w.endsWith("нн") && w.length - 1 >= rv) w = w.substring(0, w.length - 1)
          }
        if (!done && w.endsWith("ь") && w.length - 1 >= rv)
          w = w.substring(0, w.length - 1)
      }
      w
    }
  }

  // --------------------------------------------------------------- Spanish
  /** Snowball Spanish: standard R1/R2 + Spanish RV; attached-pronoun step,
    * standard suffixes, y-verbs, verb suffixes, residuals, de-accenting.
    * Validated against spanish_stem. */
  object Spanish {
    private val vowels = "aeiouáéíóúü".toSet
    private def isV(c: Char) = vowels(c)

    private def rvOf(w: String): Int = {
      if (w.length < 3) return w.length
      if (!isV(w(1))) { // X C ... → after the next vowel
        var i = 2
        while (i < w.length && !isV(w(i))) i += 1
        if (i < w.length) i + 1 else w.length
      } else if (isV(w(0)) && isV(w(1))) { // V V → after the next consonant
        var i = 2
        while (i < w.length && isV(w(i))) i += 1
        if (i < w.length) i + 1 else w.length
      } else 3 // C V → after the third letter
    }

    private def deaccent(c: Char): Char = c match {
      case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
      case 'ó' => 'o'; case 'ú' => 'u'; case other => other
    }

    def stem(word: String): String = {
      var w = word
      val rv = rvOf(w)
      val r1 = regionAfterVC(w, 0, isV)
      val r2 = regionAfterVC(w, r1, isV)
      def inRv(pos: Int) = pos >= rv
      def inR1(pos: Int) = pos >= r1
      def inR2(pos: Int) = pos >= r2
      def del(n: Int): Unit = w = w.substring(0, w.length - n)

      // step 0: attached pronouns
      val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
        "los", "nos", "me", "se", "la", "le", "lo").sortBy(-_.length)
      val pre1 = Seq("iéndo", "ándo", "ár", "ér", "ír") // de-accent after removal
      val pre2 = Seq("iendo", "ando", "ar", "er", "ir")
      var done0 = false
      for (p <- pronouns if !done0) {
        if (w.endsWith(p)) {
          val base = w.length - p.length
          val stemPart = w.substring(0, base)
          val m1 = pre1.find(stemPart.endsWith)
          val m2 = pre2.find(stemPart.endsWith)
          if (m1.isDefined && inRv(base - m1.get.length)) {
            w = stemPart.map(deaccent)
            done0 = true
          } else if (m2.isDefined && inRv(base - m2.get.length)) {
            w = stemPart
            done0 = true
          } else if (stemPart.endsWith("yendo") &&
            base - 5 - 1 >= 0 && stemPart(base - 6) == 'u' && inRv(base - 5)) {
            w = stemPart
            done0 = true
          }
        }
      }

      // step 1: standard suffixes (longest match first)
      val before1 = w
      var matched1 = false
      def ends(s: String): Boolean = w.endsWith(s)
      def pos(s: String): Int = w.length - s.length

      val allSufs: Seq[String] = Seq(
        "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
        "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
        "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa",
        "adoras", "adores", "aciones", "adora", "ación", "antes",
        "ancias", "ador", "ante", "ancia",
        "logías", "logía", "uciones", "ución", "encias", "encia",
        "amente", "mente", "idades", "idad",
        "ivas", "ivos", "iva", "ivo").sortBy(-_.length)
      for (suf <- allSufs if !matched1) {
        if (ends(suf)) {
          matched1 = true
          val p = pos(suf)
          suf match {
            case "amente" =>
              if (inR1(p)) {
                del(6)
                if (ends("iv") && inR2(pos("iv"))) {
                  del(2)
                  if (ends("at") && inR2(pos("at"))) del(2)
                } else {
                  var d = false
                  for (x <- Seq("os", "ic", "ad") if !d)
                    if (ends(x) && inR2(pos(x))) { del(2); d = true }
                }
              }
            case "mente" =>
              if (inR2(p)) {
                del(5)
                var d = false
                for (x <- Seq("ante", "able", "ible") if !d)
                  if (ends(x) && inR2(pos(x))) { del(4); d = true }
              }
            case "idades" | "idad" =>
              if (inR2(p)) {
                del(suf.length)
                var d = false
                for (x <- Seq("abil", "ic", "iv") if !d)
                  if (ends(x) && inR2(pos(x))) { del(x.length); d = true }
              }
            case "ivas" | "ivos" | "iva" | "ivo" =>
              if (inR2(p)) {
                del(suf.length)
                if (ends("at") && inR2(pos("at"))) del(2)
              }
            case "logías" | "logía" =>
              if (inR2(p)) { del(suf.length); w = w + "log" }
            case "uciones" | "ución" =>
              if (inR2(p)) { del(suf.length); w = w + "u" }
            case "encias" | "encia" =>
              if (inR2(p)) { del(suf.length); w = w + "ente" }
            case "adoras" | "adores" | "aciones" | "adora" | "ación" | "antes" |
                "ancias" | "ador" | "ante" | "ancia" =>
              if (inR2(p)) {
                del(suf.length)
                if (ends("ic") && inR2(pos("ic"))) del(2)
              }
            case _ => // plain delete-if-R2 class
              if (inR2(p)) del(suf.length)
          }
        }
      }
      val did1 = w != before1

      // step 2a: verb suffixes beginning with y (only if step 1 did nothing)
      var did2a = false
      if (!did1) {
        val ys = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen", "yas",
          "yes", "ya", "ye", "yo", "yó").sortBy(-_.length)
        for (s <- ys if !did2a) {
          if (ends(s) && inRv(pos(s)) && pos(s) > 0 && w(pos(s) - 1) == 'u') {
            del(s.length); did2a = true
          }
        }
      }

      // step 2b: other verb suffixes (only if steps 1/2a did nothing)
      if (!did1 && !did2a) {
        val gu = Seq("en", "es", "éis", "emos")
        val plain = Seq("arían", "arías", "arán", "arás", "aríais", "aría",
          "aréis", "aríamos", "aremos", "ará", "aré", "erían", "erías",
          "erán", "erás", "eríais", "ería", "eréis", "eríamos", "eremos",
          "erá", "eré", "irían", "irías", "irán", "irás", "iríais", "iría",
          "iréis", "iríamos", "iremos", "irá", "iré", "aba", "ada", "ida",
          "ía", "ara", "iera", "ad", "ed", "id", "ase", "iese", "aste",
          "iste", "an", "aban", "ían", "aran", "ieran", "asen", "iesen",
          "aron", "ieron", "ado", "ido", "ando", "iendo", "ió", "ar", "er",
          "ir", "as", "abas", "adas", "idas", "ías", "aras", "ieras",
          "ases", "ieses", "ís", "áis", "abais", "íais", "arais", "ierais",
          "aseis", "ieseis", "asteis", "isteis", "ados", "idos", "amos",
          "ábamos", "íamos", "imos", "áramos", "iéramos", "iésemos",
          "ásemos")
        val all2 = (gu ++ plain).distinct.sortBy(-_.length)
        var d = false
        for (s <- all2 if !d) {
          if (ends(s) && inRv(pos(s))) {
            d = true
            del(s.length)
            if (gu.contains(s) && w.endsWith("gu")) del(1)
          }
        }
      }

      // step 3: residual suffix
      val res1 = Seq("os", "a", "o", "á", "í", "ó")
      val res2 = Seq("e", "é")
      var d3 = false
      for (s <- (res1 ++ res2).sortBy(-_.length) if !d3) {
        if (ends(s) && inRv(pos(s))) {
          d3 = true
          del(s.length)
          if (res2.contains(s) && w.endsWith("gu") && inRv(w.length - 1)) del(1)
        }
      }

      w.map(deaccent)
    }
  }
  // ------------------------------------------------------------ Portuguese
  /** Snowball Portuguese: nasal vowels ã/õ are rewritten a~/o~ during
    * processing (the '~' is a consonant for region purposes) and restored at
    * the end. Validated against portuguese_stem. */
  object Portuguese {
    private val vowels = "aeiouáéíóúâêô".toSet
    private def isV(c: Char) = vowels(c)

    private def rvOf(w: String): Int = {
      if (w.length < 3) return w.length
      if (!isV(w(1))) {
        var i = 2
        while (i < w.length && !isV(w(i))) i += 1
        if (i < w.length) i + 1 else w.length
      } else if (isV(w(0)) && isV(w(1))) {
        var i = 2
        while (i < w.length && isV(w(i))) i += 1
        if (i < w.length) i + 1 else w.length
      } else 3
    }

    private val verbSufs = Seq(
      "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá", "era",
      "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
      "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam", "aram",
      "eram", "iram", "avam", "em", "arem", "erem", "irem", "assem", "essem",
      "issem", "ado", "ido", "ando", "endo", "indo", "ara~o", "era~o",
      "ira~o", "ar", "er", "ir", "as", "adas", "idas", "ias", "arias",
      "erias", "irias", "arás", "aras", "erás", "eras", "irás", "avas", "es",
      "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses", "esses",
      "isses", "astes", "estes", "istes", "is", "ais", "iais", "ariais",
      "eriais", "iriais", "aras", "áreis", "areis", "éreis", "ereis",
      "íreis", "ireis", "ásseis", "asseis", "ésseis", "esseis", "ísseis",
      "isseis", "áveis", "aveis", "íeis", "ieis", "aríeis", "arieis",
      "eríeis", "erieis", "iríeis", "irieis", "ados", "idos", "amos",
      "ámos", "ávamos", "avamos", "íamos", "iamos", "aríamos", "ariamos",
      "eríamos", "eriamos", "iríamos", "iriamos", "áramos", "aramos",
      "éramos", "eramos", "íramos", "iramos", "ássemos", "assemos",
      "êssemos", "essemos", "íssemos", "issemos", "imos", "armos", "ermos",
      "irmos", "eu", "iu", "ou", "ira", "iras").distinct.sortBy(-_.length)

    private val std1 = Seq(
      "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos", "ável",
      "ível", "ista", "istas", "oso", "osa", "osos", "osas", "amento",
      "amentos", "imento", "imentos", "adora", "ador", "aça~o", "adoras",
      "adores", "aço~es", "ante", "antes", "ância").sortBy(-_.length)

    def stem(word: String): String = {
      var w = word.replace("ã", "a~").replace("õ", "o~")
      val rv = rvOf(w)
      val r1 = regionAfterVC(w, 0, isV)
      val r2 = regionAfterVC(w, r1, isV)
      def inRv(p: Int) = p >= rv
      def inR1(p: Int) = p >= r1
      def inR2(p: Int) = p >= r2
      def ends(s: String) = w.endsWith(s)
      def pos(s: String) = w.length - s.length
      def del(n: Int): Unit = w = w.substring(0, w.length - n)

      val orig = w
      // step 1: standard suffixes, longest match over all classes
      val all1 = (std1 ++ Seq("logia", "logias", "uça~o", "uço~es", "ência",
        "ências", "amente", "mente", "idade", "idades", "iva", "ivo", "ivas",
        "ivos", "ira", "iras")).sortBy(-_.length)
      var m1 = false
      for (suf <- all1 if !m1) {
        if (ends(suf)) {
          m1 = true
          val p = pos(suf)
          suf match {
            case "logia" | "logias" =>
              if (inR2(p)) { del(suf.length); w += "log" }
            case "uça~o" | "uço~es" =>
              if (inR2(p)) { del(suf.length); w += "u" }
            case "ência" | "ências" =>
              if (inR2(p)) { del(suf.length); w += "ente" }
            case "amente" =>
              if (inR1(p)) {
                del(6)
                if (ends("iv") && inR2(pos("iv"))) {
                  del(2)
                  if (ends("at") && inR2(pos("at"))) del(2)
                } else {
                  var d = false
                  for (x <- Seq("os", "ic", "ad") if !d)
                    if (ends(x) && inR2(pos(x))) { del(2); d = true }
                }
              }
            case "mente" =>
              if (inR2(p)) {
                del(5)
                var d = false
                for (x <- Seq("ante", "avel", "ível") if !d)
                  if (ends(x) && inR2(pos(x))) { del(4); d = true }
              }
            case "idade" | "idades" =>
              if (inR2(p)) {
                del(suf.length)
                var d = false
                for (x <- Seq("abil", "ic", "iv") if !d)
                  if (ends(x) && inR2(pos(x))) { del(x.length); d = true }
              }
            case "iva" | "ivo" | "ivas" | "ivos" =>
              if (inR2(p)) {
                del(suf.length)
                if (ends("at") && inR2(pos("at"))) del(2)
              }
            case "ira" | "iras" =>
              if (inRv(p) && p > 0 && w(p - 1) == 'e') {
                del(suf.length); w += "ir"
              }
            case _ =>
              if (inR2(p)) del(suf.length)
          }
        }
      }

      // step 2: verb suffixes (only if step 1 did nothing)
      if (w == orig) {
        var d = false
        for (s <- verbSufs if !d)
          if (ends(s) && inRv(pos(s))) { d = true; del(s.length) }
      }

      // step 3: final i preceded by c (only if steps 1-2 changed the word)
      if (w != orig) {
        if (ends("i") && inRv(pos("i")) && w.length > 1 && w(w.length - 2) == 'c')
          del(1)
      } else {
        // step 4: residual suffix
        var d = false
        for (s <- Seq("os", "a", "i", "o", "á", "í", "ó") if !d)
          if (ends(s) && inRv(pos(s))) { d = true; del(s.length) }
      }

      // step 5: residual form
      // residual form is an `among`: the e/é/ê branch and the ç branch are
      // alternatives — ç→c only when the word does not end e/é/ê
      var d5 = false
      for (s <- Seq("e", "é", "ê") if !d5)
        if (ends(s)) {
          d5 = true
          if (inRv(pos(s))) {
            del(1)
            if ((ends("gu") || ends("ci")) && inRv(w.length - 1)) del(1)
          }
        }
      if (!d5 && ends("ç")) w = w.substring(0, w.length - 1) + "c"

      w.replace("a~", "ã").replace("o~", "õ")
    }
  }

  // --------------------------------------------------------------- Italian
  /** Snowball Italian: acute accents normalize to grave; i/u between vowels
    * and u after q are consonant-marked. Validated against italian_stem. */
  object Italian {
    private val vowels = "aeiouàèìòù".toSet
    private def isV(c: Char) = vowels(c)

    private def rvOf(w: String): Int = {
      if (w.length < 3) return w.length
      if (!isV(w(1))) {
        var i = 2
        while (i < w.length && !isV(w(i))) i += 1
        if (i < w.length) i + 1 else w.length
      } else if (isV(w(0)) && isV(w(1))) {
        var i = 2
        while (i < w.length && isV(w(i))) i += 1
        if (i < w.length) i + 1 else w.length
      } else 3
    }

    private val pronouns = Seq("gliela", "gliele", "glieli", "glielo",
      "gliene", "sene", "mela", "mele", "meli", "melo", "mene", "tela",
      "tele", "teli", "telo", "tene", "cela", "cele", "celi", "celo",
      "cene", "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la",
      "le", "li", "lo", "mi", "ne", "si", "ti", "vi").sortBy(-_.length)

    private val verbSufs = Seq(
      "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
      "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano", "avate",
      "avi", "avo", "emmo", "enda", "ende", "endi", "endo", "erà", "erai",
      "eranno", "ere", "erebbe", "erebbero", "erei", "eremmo", "eremo",
      "ereste", "eresti", "erete", "erò", "erono", "essero", "ete", "eva",
      "evamo", "evano", "evate", "evi", "evo", "iamo", "immo", "irà", "irai",
      "iranno", "ire", "irebbe", "irebbero", "irei", "iremmo", "iremo",
      "ireste", "iresti", "irete", "irò", "irono", "isca", "iscano", "isce",
      "isci", "isco", "iscono", "issero", "isse", "issi", "issimo", "ita",
      "ite", "iti", "ito", "iva", "ivamo", "ivano", "ivate", "ivi", "ivo",
      "ono", "uta", "ute", "uti", "uto", "ar", "ir").sortBy(-_.length)

    def stem(word: String): String = {
      var w = word
        .replace('á', 'à').replace('é', 'è').replace('í', 'ì')
        .replace('ó', 'ò').replace('ú', 'ù')
      // mark consonant-u after q, and i/u between vowels
      var cs = w.toCharArray
      var i = 1
      while (i < cs.length) {
        if (cs(i) == 'u' && cs(i - 1) == 'q') cs(i) = 'U'
        i += 1
      }
      i = 1
      while (i < cs.length - 1) {
        if ((cs(i) == 'i' || cs(i) == 'u') && vowels(cs(i - 1)) && vowels(cs(i + 1)))
          cs(i) = (cs(i) - 32).toChar
        i += 1
      }
      w = new String(cs)
      val rv = rvOf(w)
      val r1 = regionAfterVC(w, 0, isV)
      val r2 = regionAfterVC(w, r1, isV)
      def inRv(p: Int) = p >= rv
      def inR1(p: Int) = p >= r1
      def inR2(p: Int) = p >= r2
      def ends(s: String) = w.endsWith(s)
      def pos(s: String) = w.length - s.length
      def del(n: Int): Unit = w = w.substring(0, w.length - n)

      // step 0: attached pronouns
      var done0 = false
      for (p <- pronouns if !done0) {
        if (ends(p)) {
          val base = w.length - p.length
          val st = w.substring(0, base)
          if ((st.endsWith("ando") || st.endsWith("endo")) && inRv(base - 4)) {
            w = st; done0 = true
          } else if ((st.endsWith("ar") || st.endsWith("er") || st.endsWith("ir"))
              && inRv(base - 2)) {
            w = st + "e"; done0 = true
          } else done0 = true // longest pronoun matched but no valid stem: stop
        }
      }

      val before1 = w
      // step 1: standard suffixes
      val all1 = Seq(
        "anza", "anze", "ico", "ici", "ica", "ice", "iche", "ichi", "ismo",
        "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste", "isti",
        "istà", "istè", "istì", "oso", "osi", "osa", "ose", "mente",
        "atrice", "atrici", "ante", "anti",
        "azione", "azioni", "atore", "atori",
        "logia", "logie", "uzione", "uzioni", "usione", "usioni",
        "enza", "enze", "amento", "amenti", "imento", "imenti",
        "amente", "ità", "ivo", "ivi", "iva", "ive").sortBy(-_.length)
      var m1 = false
      for (suf <- all1 if !m1) {
        if (ends(suf)) {
          m1 = true
          val p = pos(suf)
          suf match {
            case "azione" | "azioni" | "atore" | "atori" =>
              if (inR2(p)) {
                del(suf.length)
                if (ends("ic") && inR2(pos("ic"))) del(2)
              }
            case "logia" | "logie" =>
              if (inR2(p)) { del(suf.length); w += "log" }
            case "uzione" | "uzioni" | "usione" | "usioni" =>
              if (inR2(p)) { del(suf.length); w += "u" }
            case "enza" | "enze" =>
              if (inR2(p)) { del(suf.length); w += "ente" }
            case "amento" | "amenti" | "imento" | "imenti" =>
              if (inRv(p)) del(suf.length)
            case "amente" =>
              if (inR1(p)) {
                del(6)
                if (ends("iv") && inR2(pos("iv"))) {
                  del(2)
                  if (ends("at") && inR2(pos("at"))) del(2)
                } else {
                  var d = false
                  for (x <- Seq("os", "ic", "abil") if !d)
                    if (ends(x) && inR2(pos(x))) { del(x.length); d = true }
                }
              }
            case "ità" =>
              if (inR2(p)) {
                del(3)
                var d = false
                for (x <- Seq("abil", "ic", "iv") if !d)
                  if (ends(x) && inR2(pos(x))) { del(x.length); d = true }
              }
            case "ivo" | "ivi" | "iva" | "ive" =>
              if (inR2(p)) {
                del(3)
                if (ends("at") && inR2(pos("at"))) {
                  del(2)
                  if (ends("ic") && inR2(pos("ic"))) del(2)
                }
              }
            case _ =>
              if (inR2(p)) del(suf.length)
          }
        }
      }

      // step 2: verb suffixes if step 1 did nothing
      if (w == before1) {
        var d = false
        for (s <- verbSufs if !d)
          if (ends(s) && inRv(pos(s))) { d = true; del(s.length) }
      }

      // step 3a: final vowel (+ preceding i)
      var d3 = false
      for (s <- Seq("a", "e", "i", "o", "à", "è", "ì", "ò") if !d3)
        if (ends(s) && inRv(pos(s))) {
          d3 = true
          del(1)
          if (ends("i") && inRv(pos("i"))) del(1)
        }
      // step 3b: ch/gh → c/g when the pair starts inside RV
      if ((ends("ch") || ends("gh")) && inRv(w.length - 2)) del(1)

      w.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
    }
  }

  // ---------------------------------------------------- Scandinavian trio
  /** The Scandinavian stemmers match suffixes inside an R1 limit (snowball
    * `setlimit tomark p1`): an entry only matches when it lies entirely
    * inside R1, and the longest such entry wins — so a longer suffix that
    * starts before R1 does NOT shadow a shorter one. */
  private[functions] def longestInR1(w: String, r1: Int, table: Seq[String]): Option[String] =
    table.filter(s => w.endsWith(s) && w.length - s.length >= r1)
      .sortBy(-_.length).headOption

  /** Snowball Danish. Validated against danish_stem. */
  object Danish {
    private val vowels = "aeiouyæåø".toSet
    private val sEnding = "abcdfghjklmnoprtvyzå".toSet
    private def isV(c: Char) = vowels(c)

    private val step1 = Seq("hed", "ethed", "ered", "e", "erede", "ende",
      "erende", "ene", "erne", "ere", "en", "heden", "eren", "er", "heder",
      "erens", "ens", "ernes", "endes", "enes", "eres", "es", "hedens",
      "et", "ets", "erets", "eret", "ers", "erer", "erendes")

    def stem(word: String): String = {
      var w = word
      val r1raw = regionAfterVC(w, 0, isV)
      val r1 = if (r1raw < 3) 3 else r1raw
      def inR1(p: Int) = p >= r1
      def ends(s: String) = w.endsWith(s)
      def del(n: Int): Unit = w = w.substring(0, w.length - n)

      // step 1: a-suffixes or conditional s — one among inside the R1 limit
      longestInR1(w, r1, step1 :+ "s") match {
        case Some("s") =>
          if (w.length > 1 && sEnding(w(w.length - 2))) del(1)
        case Some(suf) => del(suf.length)
        case None =>
      }

      // step 2: gd/dt/gt/kt entirely inside R1 — drop the last letter
      for (p <- Seq("gd", "dt", "gt", "kt"))
        if (ends(p) && inR1(w.length - 2)) del(1)

      // step 3: igst → drop st; then d-suffixes (re-running step 2); løst→løs
      if (ends("igst")) del(2)
      longestInR1(w, r1, Seq("elig", "lig", "els", "ig")) match {
        case Some(suf) =>
          del(suf.length)
          for (p <- Seq("gd", "dt", "gt", "kt"))
            if (ends(p) && inR1(w.length - 2)) del(1)
        case None =>
          if (ends("løst") && inR1(w.length - 4)) del(1)
      }

      // step 4: undouble — final double consonant with its last char in R1
      if (w.length >= 2 && w(w.length - 1) == w(w.length - 2) &&
          !isV(w(w.length - 1)) && inR1(w.length - 1))
        del(1)
      w
    }
  }

  /** Snowball Norwegian. The s-ending set admits k only when not preceded
    * by a vowel. Validated against norwegian_stem. */
  object Norwegian {
    private val vowels = "aeiouyæåø".toSet
    private val sEnding = "bcdfghjlmnoprtvyz".toSet
    private def isV(c: Char) = vowels(c)

    private val step1 = Seq("a", "e", "ede", "ande", "ende", "ane", "ene",
      "hetene", "en", "heten", "ar", "er", "heter", "as", "es", "edes",
      "endes", "enes", "hetenes", "ens", "hetens", "ers", "ets", "et",
      "het", "ast", "erte", "ert")
    private val step3 = Seq("leg", "eleg", "ig", "eig", "lig", "elig",
      "els", "lov", "elov", "slov", "hetslov")

    def stem(word: String): String = {
      var w = word
      val r1raw = regionAfterVC(w, 0, isV)
      val r1 = if (r1raw < 3) 3 else r1raw
      def inR1(p: Int) = p >= r1
      def ends(s: String) = w.endsWith(s)
      def del(n: Int): Unit = w = w.substring(0, w.length - n)

      // step 1 within the R1 limit; erte/ert → er; conditional s
      longestInR1(w, r1, step1 :+ "s") match {
        case Some("s") =>
          val sPrev = if (w.length > 1) w(w.length - 2) else ' '
          if (sEnding(sPrev) ||
            (sPrev == 'k' && (w.length < 3 || !isV(w(w.length - 3))))) del(1)
        case Some(suf @ ("erte" | "ert")) => del(suf.length); w += "er"
        case Some(suf) => del(suf.length)
        case None =>
      }

      // step 2: dt/vt with the t in R1 — drop it
      for (p <- Seq("dt", "vt"))
        if (ends(p) && inR1(w.length - 1)) del(1)

      // step 3 within the R1 limit
      longestInR1(w, r1, step3).foreach(suf => del(suf.length))
      w
    }
  }

  /** Snowball Swedish. Validated against swedish_stem. */
  object Swedish {
    private val vowels = "aeiouyäåö".toSet
    private val sEnding = "bcdfghjklmnoprtvy".toSet
    private def isV(c: Char) = vowels(c)

    private val step1 = Seq("a", "arna", "erna", "heterna", "orna", "ad",
      "e", "ade", "ande", "arne", "are", "aste", "en", "anden", "aren",
      "heten", "ern", "ar", "er", "heter", "or", "as", "arnas", "ernas",
      "ornas", "es", "ades", "andes", "ens", "arens", "hetens", "erns",
      "at", "andet", "het", "ast")

    def stem(word: String): String = {
      var w = word
      val r1raw = regionAfterVC(w, 0, isV)
      val r1 = if (r1raw < 3) 3 else r1raw
      def inR1(p: Int) = p >= r1
      def ends(s: String) = w.endsWith(s)
      def del(n: Int): Unit = w = w.substring(0, w.length - n)

      // step 1 within the R1 limit; conditional s
      longestInR1(w, r1, step1 :+ "s") match {
        case Some("s") =>
          if (w.length > 1 && sEnding(w(w.length - 2))) del(1)
        case Some(suf) => del(suf.length)
        case None =>
      }

      // step 2: dd/gd/nn/dt/gt/kt/tt entirely inside R1 — drop the last letter
      for (p <- Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt"))
        if (ends(p) && inR1(w.length - 2)) del(1)

      // step 3: lig/ig/els delete; löst→lös; fullt→full
      longestInR1(w, r1, Seq("lig", "ig", "els")) match {
        case Some(suf) => del(suf.length)
        case None =>
          if (ends("löst") && inR1(w.length - 4)) del(1)
          else if (ends("fullt") && inR1(w.length - 5)) del(1)
      }
      w
    }
  }

  // ---------------------------------------------------------------- French
  /** Snowball French: i/u between vowels, y adjacent to a vowel and u after
    * q are consonant-marked; RV has the par/col/tap exception; steps 1/2a/2b
    * feed the alteration-conditional steps 3/4, then undoubling and
    * un-accenting. Validated against french_stem. */
  object French {
    private val vowels = "aeiouyâàëéêèïîôûù".toSet
    private def isV(c: Char) = vowels(c)

    def stem(word: String): String = {
      // Prelude — the sbl goto automaton, alternatives in order at each
      // cursor position: (1) a vowel consumes itself, then marks a following
      // u/i (when vowel-followed, consuming that vowel too) or y;
      // (2) y followed by a vowel marks Y; (3) u after q marks U;
      // (4) ë → He, (5) ï → Hi (H is a consonant marker the postlude folds
      // back — this also shifts the R-regions, as in the reference).
      // Prelude as the reference's single mutate-in-place pass: marking and
      // ë/ï expansion interleave, so a marker's trailing vowel can lead the
      // next match and a y before a (still unexpanded) ë sees a vowel.
      val buf = new java.lang.StringBuilder(word)
      var k = 0
      while (k < buf.length) {
        val c = buf.charAt(k)
        val m = if (k + 1 < buf.length) buf.charAt(k + 1) else '\u0000'
        if (c == 'ë') {
          buf.replace(k, k + 1, "He"); k += 1 // cursor at the inserted e
        } else if (c == 'ï') {
          buf.replace(k, k + 1, "Hi"); k += 1
        } else if (vowels(c) && (m == 'u' || m == 'i') &&
            k + 2 < buf.length && vowels(buf.charAt(k + 2))) {
          buf.setCharAt(k + 1, (m - 32).toChar)
          k += 2 // cursor lands on the tested vowel — it may match next
        } else if (vowels(c) && m == 'y') {
          buf.setCharAt(k + 1, 'Y'); k += 2
        } else if (c == 'y' && m != '\u0000' && vowels(m)) {
          buf.setCharAt(k, 'Y'); k += 1
        } else if (c == 'q' && m == 'u') {
          buf.setCharAt(k + 1, 'U'); k += 2
        } else k += 1
      }
      var w = buf.toString

      // RV: after the third letter if the word starts with two vowels or
      // with par/col/tap; else after the first vowel not in first position
      val rv: Int = {
        if (w.length >= 2 && isV(w(0)) && isV(w(1))) math.min(3, w.length)
        else if (w.startsWith("par") || w.startsWith("col") || w.startsWith("tap"))
          math.min(3, w.length)
        else {
          var j = 1
          while (j < w.length && !isV(w(j))) j += 1
          if (j < w.length) j + 1 else w.length
        }
      }
      val r1 = regionAfterVC(w, 0, isV)
      val r2 = regionAfterVC(w, r1, isV)
      def inRv(p: Int) = p >= rv
      def inR1(p: Int) = p >= r1
      def inR2(p: Int) = p >= r2
      def ends(s: String) = w.endsWith(s)
      def pos(s: String) = w.length - s.length
      def del(n: Int): Unit = w = w.substring(0, w.length - n)

      val original = w
      // ------------------------------------------------ step 1
      val sufs1 = Seq(
        "ance", "iqUe", "isme", "able", "iste", "eux", "ances", "iqUes",
        "ismes", "ables", "istes",
        "atrice", "ateur", "ation", "atrices", "ateurs", "ations",
        "logie", "logies", "usion", "ution", "usions", "utions",
        "ence", "ences", "ement", "ements", "ité", "ités",
        "if", "ive", "ifs", "ives", "eaux", "aux", "euse", "euses",
        "issement", "issements", "amment", "emment", "ment", "ments")
        .sortBy(-_.length)
      var matched1: Option[String] = None
      for (suf <- sufs1 if matched1.isEmpty) if (ends(suf)) matched1 = Some(suf)
      var altered1 = false
      var mentFound = false
      matched1 match {
        case Some(suf) =>
          val p = pos(suf)
          suf match {
            case "ance" | "iqUe" | "isme" | "able" | "iste" | "eux" |
                "ances" | "iqUes" | "ismes" | "ables" | "istes" =>
              if (inR2(p)) { del(suf.length); altered1 = true }
            case "atrice" | "ateur" | "ation" | "atrices" | "ateurs" | "ations" =>
              if (inR2(p)) {
                del(suf.length); altered1 = true
                if (ends("ic")) {
                  if (inR2(pos("ic"))) del(2)
                  else w = w.substring(0, pos("ic")) + "iqU"
                }
              }
            case "logie" | "logies" =>
              if (inR2(p)) { del(suf.length); w += "log"; altered1 = true }
            case "usion" | "ution" | "usions" | "utions" =>
              if (inR2(p)) { del(suf.length); w += "u"; altered1 = true }
            case "ence" | "ences" =>
              if (inR2(p)) { del(suf.length); w += "ent"; altered1 = true }
            case "ement" | "ements" =>
              if (inRv(p)) { del(suf.length); altered1 = true }
              if (altered1) {
                if (ends("iv") && inR2(pos("iv"))) {
                  del(2)
                  if (ends("at") && inR2(pos("at"))) del(2)
                } else if (ends("eus")) {
                  if (inR2(pos("eus"))) del(3)
                  else if (inR1(pos("eus"))) w = w.substring(0, pos("eus")) + "eux"
                } else if (ends("abl") && inR2(pos("abl"))) del(3)
                else if (ends("iqU") && inR2(pos("iqU"))) del(3)
                else if (ends("ièr") && inRv(pos("ièr"))) {
                  w = w.substring(0, pos("ièr")) + "i"
                } else if (ends("Ièr") && inRv(pos("Ièr"))) {
                  w = w.substring(0, pos("Ièr")) + "i"
                }
              }
            case "ité" | "ités" =>
              if (inR2(p)) {
                del(suf.length); altered1 = true
                if (ends("abil")) {
                  if (inR2(pos("abil"))) del(4)
                  else w = w.substring(0, pos("abil")) + "abl"
                } else if (ends("ic")) {
                  if (inR2(pos("ic"))) del(2)
                  else w = w.substring(0, pos("ic")) + "iqU"
                } else if (ends("iv") && inR2(pos("iv"))) del(2)
              }
            case "if" | "ive" | "ifs" | "ives" =>
              if (inR2(p)) {
                del(suf.length); altered1 = true
                if (ends("at") && inR2(pos("at"))) {
                  del(2)
                  if (ends("ic")) {
                    if (inR2(pos("ic"))) del(2)
                    else w = w.substring(0, pos("ic")) + "iqU"
                  }
                }
              }
            case "eaux" =>
              w = w.substring(0, p) + "eau"; altered1 = true
            case "aux" =>
              if (inR1(p)) { w = w.substring(0, p) + "al"; altered1 = true }
            case "euse" | "euses" =>
              if (inR2(p)) { del(suf.length); altered1 = true }
              else if (inR1(p)) { w = w.substring(0, p) + "eux"; altered1 = true }
            case "issement" | "issements" =>
              if (inR1(p) && p > 0 && !isV(w(p - 1))) { del(suf.length); altered1 = true }
            case "amment" =>
              if (inRv(p)) { w = w.substring(0, p) + "ant"; altered1 = true; mentFound = true }
            case "emment" =>
              if (inRv(p)) { w = w.substring(0, p) + "ent"; altered1 = true; mentFound = true }
            case "ment" | "ments" =>
              if (p > 0 && isV(w(p - 1)) && inRv(p - 1)) {
                del(suf.length); altered1 = true; mentFound = true
              }
            case _ =>
          }
        case None =>
      }

      // ------------------------------------------------ steps 2a / 2b
      val do2a = matched1.isEmpty || !altered1 || mentFound
      var altered2 = false
      if (do2a) {
        // both verb-suffix steps match INSIDE the RV limit: a suffix only
        // matches when it lies entirely within RV, longest such match wins
        val sufs2a = Seq("issaIent", "issantes", "iraIent", "issante",
          "issants", "issions", "irions", "issais", "issait", "issant",
          "issent", "issiez", "issons", "irais", "irait", "irent", "iriez",
          "irons", "iront", "isses", "issez", "îmes", "îtes", "irai",
          "iras", "irez", "isse", "ies", "ira", "ît", "ie", "ir", "is",
          "it", "i")
        longestInR1(w, rv, sufs2a) match {
          // preceded by a non-vowel other than the H diaeresis marker
          // (ï = Hi is a vowel of the original word)
          case Some(s) if pos(s) > 0 && !isV(w(pos(s) - 1)) &&
              w(pos(s) - 1) != 'H' && pos(s) - 1 >= rv =>
            del(s.length); altered2 = true
          case _ =>
            // step 2b — only when step 2a removed nothing
            val sufs2b = Seq("eraIent", "erions", "assent", "assiez",
              "assions", "èrent", "erais", "erait", "eriez", "erons",
              "eront", "aIent", "antes", "asses", "âmes", "âtes", "erai",
              "eras", "erez", "ante", "ants", "asse", "ées", "era", "iez",
              "ais", "ait", "ant", "ez", "ât", "ai", "as", "ée", "és",
              "er", "a", "é", "ions")
            longestInR1(w, rv, sufs2b) match {
              case Some("ions") =>
                if (inR2(pos("ions"))) { del(4); altered2 = true }
              case Some(s @ ("é" | "ée" | "ées" | "és" | "èrent" | "er" |
                  "era" | "erai" | "eraIent" | "erais" | "erait" | "eras" |
                  "erez" | "eriez" | "erions" | "erons" | "eront" | "ez" |
                  "iez")) =>
                del(s.length); altered2 = true
              case Some(s) =>
                del(s.length); altered2 = true
                if (ends("e") && inRv(pos("e"))) del(1)
              case None =>
            }
        }
      }

      val altered = altered1 || altered2
      if (altered) {
        // step 3: final Y → i, final ç → c
        if (ends("Y")) w = w.substring(0, w.length - 1) + "i"
        else if (ends("ç")) w = w.substring(0, w.length - 1) + "c"
      } else {
        // step 4
        if (ends("s") && w.length > 1 && {
          val prev = w(w.length - 2)
          // a preceding Hi (original ï) does not protect the s
          !"aiouès".contains(prev) ||
            (prev == 'i' && w.length > 2 && w(w.length - 3) == 'H')
        }) del(1)
        var d4 = false
        if (ends("ion") && inR2(pos("ion")) && pos("ion") > 0 &&
            (w(pos("ion") - 1) == 's' || w(pos("ion") - 1) == 't') &&
            pos("ion") - 1 >= rv) {
          del(3); d4 = true
        }
        if (!d4) {
          var m: Option[String] = None
          for (s <- Seq("ière", "Ière", "ier", "Ier") if m.isEmpty)
            if (ends(s)) m = Some(s)
          m match {
            case Some(s) => w = w.substring(0, pos(s)) + "i"; d4 = true
            case None =>
          }
        }
        if (!d4 && ends("e") && inRv(pos("e"))) { del(1); d4 = true }
      }

      // step 5: undouble enn/onn/ett/ell/eill
      for (p <- Seq("enn", "onn", "ett", "ell", "eill"))
        if (ends(p)) del(1)

      // step 6: é/è followed only by non-vowels → e
      var j = w.length - 1
      var nonV = 0
      while (j >= 0 && !isV(w(j)) && w(j) != 'é' && w(j) != 'è') { j -= 1; nonV += 1 }
      if (j >= 0 && nonV >= 1 && (w(j) == 'é' || w(j) == 'è'))
        w = w.substring(0, j) + "e" + w.substring(j + 1)

      // postlude: He→ë, Hi→ï, bare H dropped; unmark I/U/Y
      val out = new java.lang.StringBuilder(w.length)
      var z = 0
      while (z < w.length) {
        w(z) match {
          case 'H' =>
            if (z + 1 < w.length && w(z + 1) == 'e') { out.append('ë'); z += 1 }
            else if (z + 1 < w.length && w(z + 1) == 'i') { out.append('ï'); z += 1 }
          case 'I' => out.append('i')
          case 'U' => out.append('u')
          case 'Y' => out.append('y')
          case c => out.append(c)
        }
        z += 1
      }
      out.toString
    }
  }

  // ----------------------------------------------------------------- Dutch
  /** Snowball Dutch: accents strip, i-between-vowels / y marking, R1 with
    * the 3-letter head adjustment, kk/dd/tt undoubling and the final
    * double-vowel undoubling. Validated against dutch_stem. */
  object Dutch {
    private val vowels = "aeiouyè".toSet
    private def isV(c: Char) = vowels(c)

    def stem(word: String): String = {
      var w = word.map {
        case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'ï' | 'í' => 'i'
        case 'ö' | 'ó' => 'o'; case 'ü' | 'ú' => 'u'; case c => c
      }
      val cs = w.toCharArray
      var i = 0
      while (i < cs.length) {
        if (cs(i) == 'y' && (i == 0 || vowels(cs(i - 1)))) cs(i) = 'Y'
        else if (cs(i) == 'i' && i > 0 && i < cs.length - 1 &&
          vowels(cs(i - 1)) && vowels(cs(i + 1))) cs(i) = 'I'
        i += 1
      }
      w = new String(cs)
      // The reference implementation counts region offsets in UTF-8 BYTES
      // (the snowball runtime's cursor unit), which is observable when a
      // multibyte non-vowel like î sits near the word head: the "at least
      // 3 letters before R1" adjustment is an at-least-3-BYTES adjustment.
      def byteLen(c: Char): Int = if (c < 0x80) 1 else if (c < 0x800) 2 else 3
      def byteOf(charPos: Int): Int = {
        var b = 0; var q = 0
        while (q < charPos) { b += byteLen(w(q)); q += 1 }
        b
      }
      val r1raw = regionAfterVC(w, 0, isV)
      val r2c = regionAfterVC(w, r1raw, isV)
      val r1b = math.max(byteOf(r1raw), 3)
      val r2b = byteOf(r2c)
      def inR1(p: Int) = byteOf(p) >= r1b
      def inR2(p: Int) = byteOf(p) >= r2b
      def ends(s: String) = w.endsWith(s)
      def pos(s: String) = w.length - s.length
      def del(n: Int): Unit = w = w.substring(0, w.length - n)
      def undouble(): Unit =
        for (p <- Seq("kk", "dd", "tt")) if (ends(p)) del(1)
      def enOk(p: Int): Boolean =
        p > 0 && !isV(w(p - 1)) &&
          !(p >= 3 && w.substring(p - 3, p) == "gem")

      // step 1
      var d1 = false
      for (suf <- Seq("heden", "ene", "en", "se", "s") if !d1) {
        if (ends(suf)) {
          d1 = true
          val p = pos(suf)
          suf match {
            case "heden" =>
              if (inR1(p)) w = w.substring(0, p) + "heid"
            case "ene" | "en" =>
              if (inR1(p) && enOk(p)) { del(suf.length); undouble() }
            case "se" | "s" =>
              if (inR1(p) && p > 0 && !isV(w(p - 1)) && w(p - 1) != 'j')
                del(suf.length)
          }
        }
      }

      // step 2: final e after a non-vowel in R1
      var eFound = false
      if (ends("e") && inR1(pos("e")) && pos("e") > 0 && !isV(w(w.length - 2))) {
        del(1); eFound = true; undouble()
      }

      // step 3a: heid (not after c), then a preceding en as in step 1
      if (ends("heid") && inR2(pos("heid")) &&
          (pos("heid") == 0 || w(pos("heid") - 1) != 'c')) {
        del(4)
        if (ends("en") && inR1(pos("en")) && enOk(pos("en"))) {
          del(2); undouble()
        }
      }

      // step 3b: d-suffixes
      var d3 = false
      for (suf <- Seq("lijk", "baar", "end", "ing", "bar", "ig") if !d3) {
        if (ends(suf)) {
          d3 = true
          val p = pos(suf)
          suf match {
            case "end" | "ing" =>
              if (inR2(p)) {
                del(suf.length)
                if (ends("ig") && inR2(pos("ig")) &&
                    (pos("ig") == 0 || w(pos("ig") - 1) != 'e')) del(2)
                else undouble()
              }
            case "ig" =>
              if (inR2(p) && (p == 0 || w(p - 1) != 'e')) del(2)
            case "lijk" =>
              if (inR2(p)) {
                del(4)
                if (ends("e") && inR1(pos("e")) && pos("e") > 0 &&
                    !isV(w(w.length - 2))) { del(1); undouble() }
              }
            case "baar" =>
              if (inR2(p)) del(4)
            case "bar" =>
              if (inR2(p) && eFound) del(3)
            case _ =>
          }
        }
      }

      // step 4: undouble vowel — C vv D with D not I, vv in {aa,ee,oo,uu}
      if (w.length >= 4) {
        val n = w.length
        val (c0, v1, v2, d0) = (w(n - 4), w(n - 3), w(n - 2), w(n - 1))
        if (!isV(c0) && v1 == v2 && "aeou".contains(v1) &&
            !isV(d0) && d0 != 'I')
          w = w.substring(0, n - 2) + w(n - 1)
      }

      w.map { case 'I' => 'i'; case 'Y' => 'y'; case c => c }
    }
  }

  // --------------------------------------------------------------- Finnish
  /** Snowball Finnish: particle/possessive/case-ending/other-ending steps,
    * the ending_removed plural step and the five tidying rules. Validated
    * against finnish_stem. */
  object Finnish {
    private val vowels = "aeiouyäö".toSet
    private val restricted = "aeiouäö".toSet // V: vowels minus y
    private def isV(c: Char) = vowels(c)
    private def longVowel(a: Char, b: Char) =
      a == b && restricted(a) // aa ee ii oo uu ää öö

    def stem(word: String): String = {
      if (word.isEmpty) return word
      var w = word
      val r1 = regionAfterVC(w, 0, isV)
      val r2 = regionAfterVC(w, r1, isV)
      def inR1(p: Int) = p >= r1
      def inR2(p: Int) = p >= r2
      def ends(s: String) = w.endsWith(s)
      def pos(s: String) = w.length - s.length
      def del(n: Int): Unit = w = w.substring(0, w.length - n)
      def endsLV = w.length >= 2 && longVowel(w(w.length - 2), w(w.length - 1))

      // step 1: particle etc — longest suffix in R1; no shorter-match retry
      locally {
        val parts = Seq("kaan", "kään", "kin", "han", "hän", "sti", "ko",
          "kö", "pa", "pä")
        parts.find(s => ends(s) && inR1(pos(s))) match {
          case Some("sti") => if (inR2(pos("sti"))) del(3)
          case Some(s) =>
            val p = pos(s)
            if (p > 0 && (w(p - 1) == 'n' || w(p - 1) == 't' || isV(w(p - 1))))
              del(s.length)
          case None =>
        }
      }

      // step 2: possessive
      locally {
        val parts = Seq("nsa", "nsä", "mme", "nne", "si", "ni", "an", "än", "en")
        parts.find(s => ends(s) && inR1(pos(s))) match {
          case Some("si") => if (!(pos("si") > 0 && w(pos("si") - 1) == 'k')) del(2)
          case Some("ni") =>
            del(2)
            if (ends("kse")) w = w.substring(0, w.length - 1) + "i"
          case Some(s @ ("nsa" | "nsä" | "mme" | "nne")) => del(3)
          case Some("an") =>
            if (Seq("ta", "ssa", "sta", "lla", "lta", "na")
                .exists(p => w.substring(0, pos("an")).endsWith(p))) del(2)
          case Some("än") =>
            if (Seq("tä", "ssä", "stä", "llä", "ltä", "nä")
                .exists(p => w.substring(0, pos("än")).endsWith(p))) del(2)
          case Some("en") =>
            if (Seq("lle", "ine")
                .exists(p => w.substring(0, pos("en")).endsWith(p))) del(2)
          case _ =>
        }
      }

      // step 3: case endings; deletion sets ending_removed. Two guard
      // flavors (observable against the oracle): the hXn tests abort the
      // step on failure, while the Vi/LV/e/cv guards are evaluated during
      // suffix selection — on failure the next-longest suffix is tried
      // (e.g. bakotta → bakot via ta after the tta guard fails).
      var endingRemoved = false
      locally {
        val parts = Seq("siin", "tten", "seen", "han", "hen", "hin", "hon",
          "hän", "hön", "den", "tta", "ttä", "ssa", "ssä", "sta", "stä",
          "lla", "llä", "lta", "ltä", "lle", "ksi", "ine", "ta", "tä", "na",
          "nä", "a", "ä", "n")
        var i = 0
        var stop = false
        while (i < parts.length && !stop) {
          val s = parts(i)
          if (ends(s) && inR1(pos(s))) {
            val p = pos(s)
            s match {
              case "han" | "hen" | "hin" | "hon" | "hän" | "hön" =>
                // hXn preceded by the matching vowel X; test failure ends
                // the step without trying shorter suffixes
                stop = true
                if (p > 0 && w(p - 1) == s(1)) { del(3); endingRemoved = true }
              case "siin" | "den" | "tten" =>
                // guard: preceded by Vi; failure falls through
                if (p >= 2 && w(p - 1) == 'i' && restricted(w(p - 2))) {
                  del(s.length); endingRemoved = true; stop = true
                }
              case "seen" =>
                if (p >= 2 && longVowel(w(p - 2), w(p - 1))) {
                  del(4); endingRemoved = true; stop = true
                }
              case "a" | "ä" =>
                // guard: preceded by cv
                if (p >= 2 && isV(w(p - 1)) && !isV(w(p - 2))) {
                  del(1); endingRemoved = true; stop = true
                }
              case "tta" | "ttä" =>
                if (p > 0 && w(p - 1) == 'e') {
                  del(3); endingRemoved = true; stop = true
                }
              case "n" =>
                del(1); endingRemoved = true; stop = true
                if (endsLV || ends("ie")) del(1)
              case _ =>
                del(s.length); endingRemoved = true; stop = true
            }
          }
          i += 1
        }
      }

      // step 4: other endings, in R2
      locally {
        val parts = Seq("impi", "impa", "impä", "immi", "imma", "immä",
          "mpi", "mpa", "mpä", "mmi", "mma", "mmä", "eja", "ejä")
        parts.find(s => ends(s) && inR2(pos(s))) match {
          case Some(s @ ("mpi" | "mpa" | "mpä" | "mmi" | "mma" | "mmä")) =>
            if (!(pos(s) >= 2 && w.substring(0, pos(s)).endsWith("po")))
              del(3)
          case Some(s) => del(s.length)
          case None =>
        }
      }

      // step 5: plurals
      if (endingRemoved) {
        if ((ends("i") || ends("j")) && inR1(w.length - 1)) del(1)
      } else if (ends("t") && w.length >= 2 && isV(w(w.length - 2)) &&
          inR1(w.length - 1)) {
        del(1)
        if (ends("imma") && inR2(pos("imma"))) del(4)
        else if (ends("mma") && inR2(pos("mma")) &&
            !(pos("mma") >= 2 && w.substring(0, pos("mma")).endsWith("po")))
          del(3)
      }

      // step 6: tidying, tests restricted to R1
      if (endsLV && inR1(w.length - 2)) del(1) // (a)
      if (w.length >= 2 && inR1(w.length - 2) && !isV(w(w.length - 2)) &&
          "aäei".contains(w(w.length - 1))) del(1) // (b)
      if ((ends("oj") || ends("uj")) && inR1(pos("oj"))) del(1) // (c)
      if (ends("jo") && inR1(pos("jo"))) del(1) // (d)
      // (e) double consonant followed by zero or more vowels
      locally {
        var i = w.length - 1
        while (i >= 0 && isV(w(i))) i -= 1
        if (i >= 1 && !isV(w(i)) && w(i - 1) == w(i))
          w = w.substring(0, i) + w.substring(i + 1)
      }
      w
    }
  }

  // ------------------------------------------------------------- Hungarian
  /** Snowball Hungarian (the pre-2.0 revision that PostgreSQL ships, which
    * differs from the current published spec): digraph-aware R1; each step
    * picks the longest raw suffix match and then tests R1 (and any guard)
    * inside the action â a failed test ends the step with no shorter-suffix
    * retry. Owned (bare Ã© possessive) runs before the singular-owner step.
    * Validated against hungarian_stem. */
  object Hungarian {
    private val vowels = "aáeéiíoóöőuúüű".toSet
    private def isV(c: Char) = vowels(c)
    private val digraphs = Seq("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
    private val doubles = Seq("ccs", "ggy", "lly", "nny", "ssz", "tty",
      "zzs", "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
      "pp", "rr", "ss", "tt", "vv", "zz")

    def stem(word: String): String = {
      if (word.isEmpty) return word
      var w = word

      // R1: vowel-initial word -> after the first consonant (a digraph
      // counts as one consonant); consonant-initial -> after the first vowel
      val r1: Int = {
        if (isV(w(0))) {
          var i = 1
          while (i < w.length && isV(w(i))) i += 1
          if (i >= w.length) w.length
          else digraphs.find(d => w.startsWith(d, i)) match {
            case Some(d) => i + d.length
            case None => i + 1
          }
        } else {
          var i = 0
          while (i < w.length && !isV(w(i))) i += 1
          if (i >= w.length) w.length else i + 1
        }
      }
      def inR1(p: Int) = p >= r1
      def ends(s: String) = w.endsWith(s)
      def pos(s: String) = w.length - s.length
      def del(n: Int): Unit = w = w.substring(0, w.length - n)
      def replaceSuffix(s: String, by: String): Unit =
        w = w.substring(0, pos(s)) + by
      def doubleBefore(p: Int): Boolean =
        doubles.exists(d => p >= d.length && w.startsWith(d, p - d.length))
      def undoubleEnd(): Unit =
        doubles.find(ends).foreach(_ => w = w.substring(0, w.length - 2) + w.last)
      /** longest raw suffix match, R1 NOT yet tested */
      def longestRaw(parts: Seq[String]): Option[String] =
        parts.sortBy(-_.length).find(ends)

      // step 1: instrumental case (al/el after a double consonant)
      longestRaw(Seq("al", "el")).foreach { s =>
        if (inR1(pos(s)) && doubleBefore(pos(s))) { del(2); undoubleEnd() }
      }

      // step 2: frequent cases, then final á -> a / é -> e (R1)
      locally {
        val parts = Seq("ban", "ben", "ba", "be", "ra", "re", "nak", "nek",
          "val", "vel", "tól", "től", "ról", "ről", "ból", "ből", "hoz",
          "hez", "höz", "nál", "nél", "ig", "at", "et", "ot", "öt", "ért",
          "képp", "képpen", "kor", "ul", "ül", "vá", "vé", "onként",
          "enként", "anként", "ként", "en", "on", "an", "ön", "n", "t")
        longestRaw(parts).foreach { s =>
          if (inR1(pos(s))) {
            del(s.length)
            if (ends("á") && inR1(w.length - 1))
              w = w.substring(0, w.length - 1) + "a"
            else if (ends("é") && inR1(w.length - 1))
              w = w.substring(0, w.length - 1) + "e"
          }
        }
      }

      // step 3: special cases
      longestRaw(Seq("ánként", "án", "én")).foreach {
        case s @ ("ánként" | "án") => if (inR1(pos(s))) replaceSuffix(s, "a")
        case s => if (inR1(pos(s))) replaceSuffix(s, "e")
      }

      // step 4: other cases
      longestRaw(Seq("astul", "estül", "ástul", "éstül", "stul", "stül"))
        .foreach {
          case "ástul" => if (inR1(pos("ástul"))) replaceSuffix("ástul", "a")
          case "éstül" => if (inR1(pos("éstül"))) replaceSuffix("éstül", "e")
          case s => if (inR1(pos(s))) del(s.length)
        }

      // step 5: factive case
      longestRaw(Seq("á", "é")).foreach { s =>
        if (inR1(pos(s)) && doubleBefore(pos(s))) { del(1); undoubleEnd() }
      }

      // step 6: owned â the bare é possessive deletes (guard: not after
      // another é; éé is the plural-owner step's business)
      locally {
        val dels = Seq("oké", "öké", "aké", "eké", "áké", "éké", "ké",
          "áéi", "ééi", "éi", "é")
        longestRaw(dels).foreach {
          case "é" =>
            val p = pos("é")
            if (inR1(p) && !(p > 0 && w(p - 1) == 'é')) del(1)
          case s => if (inR1(pos(s))) del(s.length)
        }
      }

      // step 7: singular owner
      locally {
        val dels = Seq("ünk", "unk", "nk", "juk", "jük", "uk", "ük", "em",
          "om", "am", "m", "od", "ed", "ad", "öd", "d", "ja", "je", "a", "e", "o")
        val toA = Seq("ánk", "ájuk", "ám", "ád", "á")
        val toE = Seq("énk", "éjük", "ém", "éd", "é")
        longestRaw(dels ++ toA ++ toE).foreach { s =>
          if (inR1(pos(s))) {
            if (toA.contains(s)) replaceSuffix(s, "a")
            else if (toE.contains(s)) replaceSuffix(s, "e")
            else del(s.length)
          }
        }
      }

      // step 8: plural owner (note: itek exists but itok does not in this
      // revision, and éé lives here â both asymmetries oracle-verified)
      locally {
        val dels = Seq("jaitok", "jeitek", "aitok", "eitek", "itek", "jaik",
          "jeik", "aik", "eik", "ik", "jaim", "jeim", "aim", "eim", "im",
          "jaid", "jeid", "aid", "eid", "id", "jai", "jei", "ai", "ei", "i",
          "éé")
        val toA = Seq("áitok", "áik", "áim", "áid", "ái")
        val toE = Seq("éitek", "éik", "éim", "éid", "éi")
        longestRaw(dels ++ toA ++ toE).foreach { s =>
          if (inR1(pos(s))) {
            if (toA.contains(s)) replaceSuffix(s, "a")
            else if (toE.contains(s)) replaceSuffix(s, "e")
            else del(s.length)
          }
        }
      }

      // step 9: plural
      longestRaw(Seq("ák", "ék", "ök", "ok", "ek", "ak", "k")).foreach {
        case "ák" => if (inR1(pos("ák"))) replaceSuffix("ák", "a")
        case "ék" => if (inR1(pos("ék"))) replaceSuffix("ék", "e")
        case s => if (inR1(pos(s))) del(s.length)
      }

      w
    }
  }

  // -------------------------------------------------------------- Romanian
  /** Snowball Romanian (cedilla-form ş/ţ as shipped pre-Unicode-5.2):
    * plural simplification, repeated combining-suffix reduction, standard
    * suffixes in R2, verb suffixes in RV gated on steps 1-2 removing
    * nothing, final-vowel removal. Validated against romanian_stem. */
  object Romanian {
    private val vowels = "aăâeiîou".toSet
    private def isV(c: Char) = vowels(c)

    def stem(word: String): String = {
      if (word.isEmpty) return word
      // prelude: i/u between vowels are consonants — mark uppercase
      val cs = word.toCharArray
      var i = 1
      while (i < cs.length - 1) {
        if ((cs(i) == 'i' || cs(i) == 'u') && vowels(cs(i - 1)) && vowels(cs(i + 1)))
          cs(i) = (cs(i) - 32).toChar
        i += 1
      }
      var w = new String(cs)

      val r1 = Snowball.regionAfterVC(w, 0, isV)
      val r2 = Snowball.regionAfterVC(w, r1, isV)
      // RV: second letter consonant → after next vowel; first two letters
      // vowels → after next consonant; else (cons-vowel) → after 3rd letter
      val rv: Int = {
        if (w.length < 3) w.length
        else if (!isV(w(1))) {
          var j = 2
          while (j < w.length && !isV(w(j))) j += 1
          if (j >= w.length) w.length else j + 1
        } else if (isV(w(0)) && isV(w(1))) {
          var j = 2
          while (j < w.length && isV(w(j))) j += 1
          if (j >= w.length) w.length else j + 1
        } else 3
      }
      def inR1(p: Int) = p >= r1
      def inR2(p: Int) = p >= r2
      def inRv(p: Int) = p >= rv
      def ends(s: String) = w.endsWith(s)
      def pos(s: String) = w.length - s.length
      def del(n: Int): Unit = w = w.substring(0, w.length - n)
      def replace(s: String, by: String): Unit = w = w.substring(0, pos(s)) + by
      def longest(parts: Seq[String]): Option[String] =
        parts.sortBy(-_.length).find(ends)

      // step 0: removal of plurals, in R1
      locally {
        val parts = Seq("ului", "iilor", "atei", "aţie", "aţia", "ilor",
          "iile", "elor", "aua", "iua", "iei", "ile", "ele", "ii", "ul", "ea")
        longest(parts).foreach { s =>
          if (inR1(pos(s))) s match {
            case "ul" | "ului" => del(s.length)
            case "aua" => replace(s, "a")
            case "ea" | "ele" | "elor" => replace(s, "e")
            case "ii" | "iua" | "iei" | "iile" | "iilor" | "ilor" => replace(s, "i")
            case "ile" =>
              if (!(pos(s) >= 2 && w.substring(0, pos(s)).endsWith("ab")))
                replace(s, "i")
            case "atei" => replace(s, "at")
            case "aţie" | "aţia" => replace(s, "aţi")
            case _ =>
          }
        }
      }

      // step 1: reduction of combining suffixes, in R1, repeated
      var stepDone = true
      var removed1 = false
      while (stepDone) {
        stepDone = false
        val toAbil = Seq("abilitate", "abilitati", "abilităi", "abilităţi")
        val toIbil = Seq("ibilitate")
        val toIv = Seq("ivitate", "ivitati", "ivităi", "ivităţi")
        val toIc = Seq("icitate", "icitati", "icităi", "icităţi", "icator",
          "icatori", "iciv", "iciva", "icive", "icivi", "icivă", "ical",
          "icala", "icale", "icali", "icală")
        val toAt = Seq("ativ", "ativa", "ative", "ativi", "ativă", "aţiune",
          "atoare", "ator", "atori", "ătoare", "ător", "ători")
        val toIt = Seq("itiv", "itiva", "itive", "itivi", "itivă", "iţiune",
          "itoare", "itor", "itori")
        longest(toAbil ++ toIbil ++ toIv ++ toIc ++ toAt ++ toIt).foreach { s =>
          if (inR1(pos(s))) {
            val by =
              if (toAbil.contains(s)) "abil"
              else if (toIbil.contains(s)) "ibil"
              else if (toIv.contains(s)) "iv"
              else if (toIc.contains(s)) "ic"
              else if (toAt.contains(s)) "at"
              else "it"
            replace(s, by)
            stepDone = true; removed1 = true
          }
        }
      }

      // step 2: standard suffixes, in R2
      var removed2 = false
      locally {
        val dels = Seq("at", "ata", "ată", "ati", "ate", "ut", "uta", "ută",
          "uti", "ute", "it", "ita", "ită", "iti", "ite", "ic", "ica", "ice",
          "ici", "ică", "abil", "abila", "abile", "abili", "abilă", "ibil",
          "ibila", "ibile", "ibili", "ibilă", "oasa", "oasă", "oase", "os",
          "osi", "oşi", "ant", "anta", "ante", "anti", "antă", "ator",
          "atori", "itate", "itati", "ităi", "ităţi", "iv", "iva", "ive",
          "ivi", "ivă")
        val toIst = Seq("ism", "isme", "ist", "ista", "iste", "isti", "istă",
          "işti")
        val iune = Seq("iune", "iuni")
        longest(dels ++ toIst ++ iune).foreach { s =>
          if (inR2(pos(s))) {
            if (iune.contains(s)) {
              if (pos(s) > 0 && w(pos(s) - 1) == 'ţ') {
                w = w.substring(0, pos(s) - 1) + "t"
                removed2 = true
              }
            } else if (toIst.contains(s)) { replace(s, "ist"); removed2 = true }
            else { del(s.length); removed2 = true }
          }
        }
      }

      // step 3: verb suffixes — the whole match is limited to RV (the
      // Snowball `setlimit tomark pV`), so an entry must lie entirely
      // within RV to participate in longest-match; the winning entry's
      // condition is final (no backtracking to shorter entries). The
      // conditional group deletes only when preceded, still within RV, by
      // a non-vowel or literal 'u'. Entry table reverse-engineered against
      // the independent oracle (PG snowball revision): the pluperfect
      // families {a,i,u,â}×{se,sem,seşi,seră,serăm,serăţi} are
      // conditional; "aţi em eţi im iţi âm âţi ăm" and the perfect
      // "se sei seşi seră serăm serăţi" + "sese(m/şi/ră...)" forms are
      // unconditional; "ăţi sem seţi eră erăm erăţi" are NOT entries.
      if (!removed1 && !removed2) {
        val condDel = Seq("are", "ere", "ire", "âre", "ind", "ând", "indu",
          "ându", "eze", "ească", "ez", "ezi", "ează", "esc", "eşti",
          "eşte", "ăsc", "ăşti", "ăşte", "am", "ai", "au", "eam", "eai",
          "eau", "ia", "iam", "iai", "iau", "ui", "âi", "aşi",
          "arăm", "arăţi", "ară", "irăm", "irăţi", "iră",
          "ârăm", "ârăţi", "âră",
          "ase", "asem", "aseşi", "aseră", "aserăm", "aserăţi",
          "ise", "isem", "iseşi", "iseră", "iserăm", "iserăţi",
          "use", "usem", "useşi", "useră", "userăm", "userăţi",
          "âse", "âsem", "âseşi", "âseră", "âserăm", "âserăţi")
        val plainDel = Seq("aţi", "em", "eţi", "im", "iţi", "âm", "âţi",
          "ăm", "se", "sei", "seşi", "seră", "serăm", "serăţi",
          "sese", "sesem", "seseşi", "seseră", "seserăm", "seserăţi")
        (condDel ++ plainDel).sortBy(-_.length)
          .find(s => ends(s) && inRv(pos(s))).foreach { s =>
            if (plainDel.contains(s)) del(s.length)
            else {
              val p = pos(s)
              if (p - 1 >= rv && (!isV(w(p - 1)) || w(p - 1) == 'u'))
                del(s.length)
            }
          }
      }

      // step 4: final vowel, in RV
      longest(Seq("ie", "a", "e", "i", "ă")).foreach { s =>
        if (inRv(pos(s))) del(s.length)
      }

      w.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
    }
  }

  /** Armenian Snowball stemmer. Four suffix passes applied backwards within
    * RV (= after the first vowel), in order: case/article endings (gated on
    * R2), verb endings, adjective/adverb suffixes, noun derivation
    * suffixes. Each pass is a longest-match among; a failed condition on
    * the longest match ends the pass (no backtracking). */
  object Armenian {
    private val vowels = "աեէըիոօւ".toSet

    private val ending = Seq("եր", "ներ", "ց", "ուց", "ից", "երից",
      "ներից", "ցից", "վանից", "ոջից", "վից", "ոց", "սա", "վա", "ամբ",
      "դ", "երդ", "ներդ", "ուդ", "անդ", "ությանդ", "վանդ", "ոջդ", "ը",
      "երը", "ները", "անը", "ությանը", "վանը", "ոջը", "ի", "երի", "ների",
      "վի", "երում", "ներում", "անում", "ն", "երն", "ներն", "ուն", "ան",
      "ության", "վան", "ին", "երին", "ներին", "ությանն", "ոջ", "ությանս",
      "վանս", "ոջս", "ով", "երով", "ներով", "անով", "վով")
        .sortBy(-_.length)

    private val verb = Seq("ար", "ացար", "եցար", "ացրիր", "ացիր", "եցիր",
      "վեցիր", "ալուց", "ելուց", "աց", "եց", "ացրեց", "ալու", "ելու",
      "աք", "ցաք", "ացաք", "ացրիք", "ացիք", "եցիք", "վեցիք", "անք",
      "ցանք", "ացանք", "ացրինք", "ացինք", "եցինք", "վեցինք", "ա", "ացա",
      "եցա", "վե", "ացրի", "ացի", "եցի", "վեցի", "ալ", "ըալ", "ացնալ",
      "անալ", "ենալ", "ել", "ըել", "նել", "ցնել", "եցնել", "չել", "վել",
      "ացվել", "եցվել", "տել", "ատել", "ոտել", "կոտել", "ված", "ում",
      "վում", "ան", "ցան", "ացան", "ացրին", "ացին", "եցին", "վեցին",
      "ալիս", "ելիս", "ավ", "ացավ", "եցավ", "ալով", "ելով")
        .sortBy(-_.length)

    private val adjective = Seq("բար", "րորդ", "երորդ", "ալի", "ակի",
      "որակ", "եղ", "վուն", "արան", "ական", "են", "երեն", "եկեն", "որէն",
      "ին", "գին", "ովին", "լայն", "պես", "իվ", "ատ", "ավետ", "կոտ")
        .sortBy(-_.length)

    private val noun = Seq("գար", "վոր", "ավոր", "անօց", "ոց", "ու", "ք",
      "արք", "չեք", "իք", "ալիք", "անիք", "վածք", "ույք", "ունք", "մունք",
      "ենք", "ոնք", "իչք", "որդ", "ույթ", "ցի", "ուհի", "իլ", "ուկ",
      "ակ", "յակ", "անակ", "իկ", "յուն", "ություն", "ան", "արան", "պան",
      "ստան", "եղէն", "ածո", "իչ", "ուս", "ուստ")
        .sortBy(-_.length)

    def stem(word: String): String = {
      val n = word.length
      var i = 0
      while (i < n && !vowels(word(i))) i += 1
      val pV = if (i >= n) n else i + 1
      // p2: past vowel, non-vowel, vowel, non-vowel from the start
      var j = pV
      while (j < n && vowels(word(j))) j += 1 // first non-vowel after pV
      var p2 = n
      if (j < n) {
        j += 1 // past it (end of R1)
        while (j < n && !vowels(word(j))) j += 1
        if (j < n) {
          j += 1 // past next vowel
          while (j < n && vowels(word(j))) j += 1
          if (j < n) p2 = j + 1
        }
      }
      var w = word
      def strip(list: Seq[String], needR2: Boolean): Unit =
        list.find(s => w.endsWith(s) && w.length - s.length >= pV).foreach {
          s =>
            if (!needR2 || w.length - s.length >= p2)
              w = w.substring(0, w.length - s.length)
        }
      strip(ending, needR2 = true)
      strip(verb, needR2 = false)
      strip(adjective, needR2 = false)
      strip(noun, needR2 = false)
      w
    }
  }

}
