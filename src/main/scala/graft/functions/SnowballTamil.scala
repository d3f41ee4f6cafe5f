package graft.functions

/** Tamil Snowball-family stemmer (`SnowballLanguage::Tamil`,
  * `lib/segment/src/data_types/index.rs:390`, dispatch :415).
  *
  * Reverse-engineered against an independent Snowball engine (PostgreSQL's
  * `tamil_stem` dictionary) over ~6.5k oracled vectors plus ~550 targeted
  * probes (see `tools/snowball_lab/tamil_proto_v9.py`, the converged v9
  * model). Structure: two pre-steps (question prefix/suffix), then suffix
  * FAMILIES tried in order with first-match-wins — tense (three suffix
  * groups with group-specific fix cascades), the plural complex
  * (ுக்கள்/ங்கள்/ட்கள்/ற்கள்/வைகள்/கள்), um, common word endings,
  * vetrumai case markers (per-suffix fix classes), the command suffix —
  * and a bare-word ending cascade when nothing fired. Each family runs its
  * own "fix endings" table (longest-match, per-rule length gates, repeat
  * to fixpoint), mirroring the published algorithm's fix_endings shape.
  *
  * The round-7 (v9) refit discovered the model's unifying principle: most
  * suffix-family remainders CONTINUE into the shared bare ending cascade
  * (ுக்கு/க்கு/வை/ுக்கள்/வைகள்/invalid-join-ை: நண்பனுக்கு→நண்,
  * தண்ணீர்வை→தண், மாணவர்க்கு→மாண), and stacked plural+case re-enters the
  * whole pipeline so the plural family applies its gated rules
  * (மரங்களில்→மரங் but நகரங்களில்→நகரம் — the same length gate as the bare
  * plural). Sonorant geminate ை joins reduce without the ன் over-delete
  * (அரசன்னை→அரசன்).
  *
  * Agreement with the PG oracle: 96.9% over the full generated corpus
  * (6305/6507) and 99.0% (3608/3643) on the valid-orthography subset
  * (`tamil_valid.tsv`); the residual tail is invalid-orthography randoms
  * (pulli-initial clusters, mid-word independent vowels, 3-consonant
  * clusters) where the reference engine's incidental rule interplay is not
  * abstracted. Enforced in AnalyzerSpec: ≥96.5% on the full TSV, ≥99% on
  * the valid-orthography TSV.
  */
object SnowballTamil {

  private final val Pu = '்'
  private final val Signs = "ாிீுூெேைொோௌ".toSet
  private final val Stops = "கசடதநபவற"
  private final val Cons = "கஙசஞடணதநபமயரலவழளறன"

  /** (suffix, replacement, gate): fires while word length > gate
    * (gate < 0 = ungated). */
  private final case class R(s: String, r: String, g: Int = -1)

  /** Longest-match repeat-to-fixpoint ending fixer. */
  private def fix(word: String, rules: Seq[R]): String = {
    var w = word
    var changed = true
    while (changed) {
      changed = false
      var best: R = null
      for (rule <- rules)
        if (w.endsWith(rule.s) && (rule.g < 0 || w.length > rule.g) &&
            (best == null || rule.s.length > best.s.length))
          best = rule
      if (best != null) {
        val w2 = w.substring(0, w.length - best.s.length) + best.r
        if (w2 != w) { w = w2; changed = true }
      }
    }
    w
  }

  // sandhi doubles: plain (singles reduce) and ungated-cascade variants
  // (stop doubles delete both: கப்புக்கள்→க, மரத்துக்கு→மர)
  private val Dbl = Seq(
    R("ட்ட்", "டு"), R("ற்ற்", ""), R("ன்ற்", "ல்"),
    R("ட்க்", "ள்"), R("ற்க்", "ல்"),
    R("க்க்", "க்"), R("ப்ப்", "ப்"), R("த்த்", "த்"),
    R("ல்ல்", "ல்"), R("ண்ண்", "ண்"), R("ள்ள்", "ள்"), R("ன்ன்", "ன்"))
  private val DblU = Seq(
    R("ட்ட்", "டு"), R("ற்ற்", ""), R("ன்ற்", "ல்"),
    R("ட்க்", "ள்"), R("ற்க்", "ல்"),
    R("க்க்", ""), R("ப்ப்", ""), R("த்த்", ""), R("ச்ச்", ""),
    R("ல்ல்", "ல்"), R("ண்ண்", "ண்"), R("ள்ள்", "ள்"), R("ன்ன்", "ன்"))
  // invalid double-pulli joins: final C் preceded by ் (sonorants ungated,
  // stops gated)
  private val Junk: Seq[R] =
    Cons.map(c => R(s"$Pu$c$Pu", Pu.toString, if ("கசடதபற".contains(c)) 4 else -1))

  private val Ung: Seq[R] = Junk ++ DblU ++
    Stops.map(c => R(s"$c$Pu", "", 3)) ++
    "கசடதநபயவன".map(c => R(c.toString, "", 3))
  private val Dl: Seq[R] = Junk ++ DblU ++ Seq(R("ள்", Pu.toString, 4)) ++
    Stops.map(c => R(s"$c$Pu", "", -1)) ++
    "கசடதநபயவன".map(c => R(c.toString, "", -1))
  // ில்/ின்/ால்/ோடு class: த்த்→ம், gated ள், stops(>4), வ்(>3),
  // ய் after ி/ை(>3) or a bare consonant(>4); no ன், no ங்→ம்
  private val Il: Seq[R] = Junk ++ Seq(
    R("த்த்", "ம்"), R("ட்ட்", "டு"), R("ற்ற்", ""), R("ன்ற்", "ல்"),
    R("ட்க்", "ள்"), R("ற்க்", "ல்"),
    R("க்க்", ""), R("ப்ப்", ""), R("ச்ச்", ""),
    R("ல்ல்", "ல்"), R("ண்ண்", "ண்"), R("ள்ள்", "ள்"), R("ன்ன்", "ன்"),
    R("ள்", Pu.toString, 4)) ++
    Stops.filterNot("யவ".contains(_)).map(c => R(s"$c$Pu", "", 4)) ++
    Seq(R("வ்", "", 3)) ++
    "ிை".map(s => R(s"${s}ய்", s.toString, 3)) ++
    Cons.map(c => R(s"${c}ய்", c.toString, 4))
  private val Ai: Seq[R] = Il ++ Seq(
    R("ன்", "", 4), R("ந்", "", 2), R("ங்", "ம்", 3), R("த்து", "", 5))
  private val Plu: Seq[R] = Junk ++ Seq(R(s"${Pu}வி", s"${Pu}வ்")) ++ Dbl ++ Seq(
    R("வர்", "", 4), R("பர்", "", 4), R("ங்", "ம்", 4),
    R("னம்", "", 4), R("ீர்", Pu.toString, 4),
    R("வன்", "", 4), R("வள்", "", 4)) ++
    "ாிீூெேைொோௌ".map(s => R(s"${s}ங்", s.toString)) ++
    Seq(R("ுங்", Pu.toString)) ++
    Stops.map(c => R(s"$c$Pu", "", 4))
  private val Cmd: Seq[R] = Junk ++ Dbl ++
    Seq(R("ங்", "ம்", 3), R("ார்", Pu.toString, 4)) ++
    Stops.map(c => R(s"$c$Pu", "", 3))
  private val Qf: Seq[R] = Junk ++ Dbl ++
    Seq(R("ங்", "ம்", 3), R("ா", Pu.toString, 4)) ++
    Cons.map(c => R(s"$Pu${c}ல்", s"$Pu$c$Pu")) ++
    Cons.map(c => R(s"$Pu${c}ள்", s"$Pu$c$Pu")) ++
    Stops.map(c => R(s"$c$Pu", "", 3))
  private val Pfx: Seq[R] = Seq(R("னம்", ""), R("ை", Pu.toString, 4)) ++ Dbl ++
    Stops.map(c => R(s"$c$Pu", "", 3)) ++ Seq(R("ங்", "ம்", 3))
  private val BareCascade: Seq[R] = Junk ++ DblU ++ Seq(
    R("வர்", "", 4), R("பர்", "", 5), R("த்து", "", 5),
    R("னம்", "", 4), R("ீர்", Pu.toString, 4),
    R("வன்", "", 4), R("பன்", "", 5), R("வள்", "", 4),
    R("க", "", 4)) ++
    "ாிீுூெேைொோௌ".map(s => R(s"${s}ங்", Pu.toString, 4)) ++
    Cons.map(c => R(s"${c}ங்", s"${c}ம்", 3)) ++
    Stops.map(c => R(s"$c$Pu", "", if (c == 'வ') 4 else 3)) ++ Seq(
    R("ய", "", 3), R("வ", "", 3), R("ன", "", 4),
    R("ப", "", 5), R("த", "", 4), R("ந்", "", 3),
    R("ீய்", "ி", 4), R("ீவ்", "ி", 4)) ++
    "ாிீுூெேைொோௌ".map(sg => R(s"${sg}வி", sg.toString, 4)) ++ Seq(
    R("ா", Pu.toString, 4), R("ோ", Pu.toString, 4), R("ே", Pu.toString, 4))

  private val NasalPairs = Set("ஙக", "ஞச", "ணட", "நத", "மப", "னற")

  private def barecascade(word: String): String = {
    var w = word
    var changed = true
    while (changed) {
      var w2 = fix(w, BareCascade)
      if (w2.endsWith("ை") && w2.length >= 4 && w2(w2.length - 3) == Pu &&
          w2(w2.length - 4) != w2(w2.length - 2) &&
          !NasalPairs.contains(s"${w2(w2.length - 4)}${w2(w2.length - 2)}"))
        w2 = fix(w2.dropRight(2), Junk)
      changed = w2 != w
      w = w2
    }
    // short long-sign+ங் assimilates instead of deleting (தூங்→தூம்,
    // நேங்→நேம்; the gated delete in the table handles longer words)
    if (w.length <= 4 && w.length >= 3 && w.endsWith("ங்") &&
        "ாீூேோ".contains(w(w.length - 3)))
      w.dropRight(2) + "ம்"
    else w
  }

  private def barefix(word: String): String = {
    var w = word
    // one-shot rules on the ORIGINAL word only (கழௌயல்→கழௌய் but the
    // cascade never re-applies them: கழௌயல்னக் stops at கழௌயல்)
    if (w.length > 4 && w.endsWith("ல்") && w(w.length - 3) != Pu &&
        !Signs.contains(w(w.length - 3)))
      w = w.dropRight(2) + Pu
    else if (w.length > 4 && w.endsWith("பீ")) w = w.dropRight(2)
    else if (w.length > 4 && w.endsWith("ீ")) w = w.dropRight(1) + "ி"
    else if (w.length > 6 && w.last == Pu && w(w.length - 3) == 'ீ' &&
        "கசடதபற".contains(w(w.length - 2)))
      w = w.dropRight(3) + "ி" // ீ + stop junk: both go, long ீ shortens
    if (w.length > 4 && w.endsWith("வி")) w = w.dropRight(2)
    barecascade(w)
  }

  // tense suffix groups: A = க்-doubled (fix gets ungated ு→்), B = plain,
  // G = bare participles ந்த/த்த (fix gets the ி/ை/ல் extras), P = person
  private val TenseA = Seq(
    "க்கிறான்", "க்கிறாள்", "க்கிறார்கள்", "க்கிறார்", "க்கிறேன்",
    "க்கிறோம்", "க்கிறீர்கள்", "க்கிறது", "க்கின்றான்", "க்கின்றாள்",
    "க்கின்றேன்", "க்கின்றது", "க்கின்றன", "க்கின்றோம்")
  private val TenseB = Seq(
    "கிறான்", "கிறாள்", "கிறார்கள்", "கிறார்", "கிறேன்", "கிறோம்",
    "கிறீர்கள்", "கிறது", "கின்றான்", "கின்றாள்", "கின்றேன்",
    "கின்றது", "கின்றன", "கின்றோம்",
    "ந்தான்", "ந்தாள்", "ந்தேன்", "ந்தது",
    "த்தான்", "த்தாள்", "த்தேன்", "த்தது",
    "ந்தார்கள்", "த்தார்கள்", "ந்தீர்கள்", "த்தீர்கள்",
    "ந்தோம்", "த்தோம்", "ந்தார்", "த்தார்",
    "னான்", "னாள்", "னார்", "வேன்", "வான்", "வாள்", "வார்",
    "வோம்", "வார்கள்", "ப்பேன்", "ப்பான்", "ப்பாள்", "ப்பார்",
    "ப்போம்", "தான்")
  private val TenseG = Seq("ந்த", "த்த")
  private val Person = Seq("ேன்", "ான்", "ாள்", "ார்", "ோம்")

  private def longestOf(w: String, sfxs: Seq[String], minRem: Int): String = {
    var best: String = null
    for (s <- sfxs)
      if (w.endsWith(s) && w.length - s.length >= minRem &&
          (best == null || s.length > best.length))
        best = s
    best
  }

  private def fixTense(word: String, uUngated: Boolean, extras: Boolean): String = {
    var w = word
    var changed = true
    while (changed) {
      changed = false
      val n = w.length
      var bs: String = null; var br: String = null
      def consider(s: String, r: String): Unit =
        if (bs == null || s.length > bs.length) { bs = s; br = r }
      for (rule <- Dbl) {
        val r = if (rule.s == "க்க்") "" else rule.r
        if (w.endsWith(rule.s)) consider(rule.s, r)
      }
      if (extras && w.endsWith("ை") && n >= 4 && w(n - 3) == Pu && w(n - 4) == w(n - 2))
        consider("ை", Pu.toString)
      if (extras && w.endsWith(s"${Pu}வி")) consider("வி", "வ்")
      if (extras && n > 4 && w.endsWith("ல்") && Signs.contains(w(n - 3)))
        consider(s"${w(n - 3)}ல்", Pu.toString)
      if (w.endsWith("த்து") && n - 4 >= 2) consider("த்து", "")
      if (w.endsWith("ார்") && n > 4) consider("ார்", Pu.toString)
      for (c <- Stops) if (w.endsWith(s"$c$Pu") && n > 3) consider(s"$c$Pu", "")
      if (w.endsWith("ங்") && n > 3) consider("ங்", "ம்")
      if (w.endsWith("ன") && n > 4) consider("ன", "")
      if (w.endsWith("ு") &&
          (uUngated || (n >= 3 && w(n - 3) == Pu && "கத".contains(w(n - 2)))))
        consider("ு", Pu.toString)
      if (bs != null) {
        val w2 = w.substring(0, w.length - bs.length) + br
        if (w2 != w) { w = w2; changed = true }
      }
    }
    w
  }

  private def tryTense(w: String): Option[String] = {
    var kind = ' '; var suf: String = null
    def offer(k: Char, s: String): Unit =
      if (s != null && (suf == null || s.length > suf.length)) { kind = k; suf = s }
    offer('A', longestOf(w, TenseA, 1))
    offer('B', longestOf(w, TenseB, 1))
    offer('G', longestOf(w, TenseG, 1))
    offer('P', longestOf(w, Person, 1))
    if (w.endsWith("து") && w.length > 4 && {
          val c = w(w.length - 3); !Signs.contains(c) && c != Pu
        } && (suf == null || suf.length < 2)) offer('B', "து")
    if (suf == null) return None
    val rest = w.substring(0, w.length - suf.length)
    if (kind == 'P') {
      val base =
        if (rest.nonEmpty && (Signs.contains(rest.last) || rest.last == Pu)) rest
        else rest + Pu
      Some(fixTense(base, uUngated = false, extras = false))
    } else
      // full-delete remainders also take the shared ending cascade
      // (தண்ணீர்கின்றான்→தண் — same reduction as the bare form)
      Some(barecascade(fixTense(rest, uUngated = kind == 'A', extras = kind == 'G')))
  }

  private def pfxfix(w: String): String =
    if (w.endsWith("னம்") && w.length - 3 >= 2) fix(w.dropRight(3), Pfx)
    else if (w.endsWith("ை") && w.length > 4) fix(w.dropRight(1) + Pu, Pfx)
    else if (w.endsWith("ி") && w.length >= 3 && w(w.length - 3) == Pu)
      fix(w.dropRight(1) + Pu, Pfx)
    else w

  /** Plural remainders ending ்கு/்து continue into the command family
    * (நாக்குகள்→நா, பந்துகள்→பந்; த்து stays for vetrumai shapes). */
  private def commandAfter(w: String): String =
    if (w.length > 4 && (w.endsWith("்கு") ||
        (w.endsWith("்து") && !w.endsWith("த்து"))))
      fix(w.dropRight(1) + Pu, Cmd)
    else w

  def stem(word: String): String = {
    var w = word
    var fired = false
    var prefixed = false

    // question prefix: [அஇஉஎ]C் with C in the doubling-sandhi set
    if (w.length >= 5 && "அஇஉஎ".contains(w(0)) &&
        "கசதபவநமயஙஞ".contains(w(1)) && w(2) == Pu) {
      w = w.substring(3); fired = true; prefixed = true
    }
    // question suffix ா/ோ/ே → ்
    if (w.length > 4 && "ாோே".contains(w.last)) {
      w = fix(w.dropRight(1) + Pu, Qf); fired = true
    }

    // ---- families, first match wins ----
    if (w.length > 4) tryTense(w) match {
      case Some(res) => return res
      case None => ()
    }

    if (w.length > 4 && w.endsWith("ீர்கள்"))
      return barecascade(fix(w.dropRight(6) + Pu, Il))

    if (w.length > 4) {
      if (w.endsWith("ுக்கள்") && w.length - 6 >= 1)
        // remainder continues into the shared cascade (தூங்குக்கள்→தூம்)
        return barecascade(fix(w.dropRight(6) + Pu, Ung))
      if (w.endsWith("ங்கள்") && w.length >= 8 && {
            val c6 = w(w.length - 6)
            (c6 == 'ு' && "கசடதபற".contains(w(w.length - 7))) ||
            c6 == 'ி' || c6 == 'ீ' || (!Signs.contains(c6) && c6 != Pu)
          })
        return w.dropRight(5) + "ம்"
      if (w.endsWith("ட்கள்") && !w.endsWith("்ட்கள்"))
        return w.dropRight(5) + "ள்"
      if (w.endsWith("ற்கள்") && !w.endsWith("்ற்கள்"))
        return w.dropRight(5) + "ல்"
      if (w.endsWith("வைகள்") && w.length - 5 >= 3)
        // remainder continues into the shared cascade (வானம்வைகள்→வா)
        return barecascade(commandAfter(fix(w.dropRight(5), Ung)))
      if (w.endsWith("கள்")) {
        val base = w.dropRight(3)
        val jw = fix(base, Junk)
        if (jw != base) return jw // invalid-join strip only
        return commandAfter(fix(jw, Plu))
      }
    }

    if (w.length > 4) {
      val ums = Seq("ாகியும்" -> "", "ையும்" -> "ை", "ாலும்" -> Pu.toString,
        "ிலும்" -> Pu.toString, "ோடும்" -> "ோ", "ும்" -> Pu.toString)
      val s = longestOf(w, ums.map(_._1), 2)
      if (s != null)
        return fix(w.substring(0, w.length - s.length) + ums.toMap.apply(s), Ung)
    }

    if (w.length > 4) {
      if (w.endsWith("ுடன்")) return fix(w.dropRight(4) + Pu, Dl)
      if (w.endsWith("ிடம்")) return fix(w.dropRight(4) + Pu, Dl)
      val commons = Seq("ிலிருந்து" -> "ில்", "ிருந்து" -> "",
        "ாகிய" -> Pu.toString, "ாய" -> Pu.toString, "ின்றி" -> Pu.toString,
        "ாக" -> Pu.toString, "ான" -> Pu.toString, "ாத" -> Pu.toString,
        "ாமல்" -> Pu.toString, "ாய்" -> Pu.toString,
        "ாம்" -> Pu.toString, "ென" -> Pu.toString, "ேயான" -> "ேய்",
        "ியது" -> "ி", "ிய" -> "ி")
      var s = longestOf(w, commons.map(_._1), 2)
      if (s == "ான" && w.length <= 5) s = null // மரமான→மரமா via bare-ன
      if (s == "ாக" && w.length <= 5) s = null // திறாக→திறா via bare-க
      if (s != null)
        return fix(w.substring(0, w.length - s.length) + commons.toMap.apply(s), Ung)
    }

    if (w.length > 4) {
      if (w.endsWith("த்து") && w.length - 4 >= 2)
        return fix(w.dropRight(4), Ung)
      if (w.endsWith("ை") && ("யரலவழளனணமஞங".contains(w(w.length - 2)) ||
          (w.length >= 3 && w(w.length - 3) == Pu))) {
        // stacked plural+case (மரங்களை, பூக்களை) re-enters the pipeline so
        // the plural family does its gated work
        if (w.dropRight(1).endsWith("கள") && w.length > 6)
          return stem(w.dropRight(1) + Pu)
        if (w.length >= 4 && w(w.length - 3) == Pu) {
          val pair = s"${w(w.length - 4)}${w(w.length - 2)}"
          // SONORANT geminate reduces only, then the shared cascade
          // (அரசன்னை→அரசன், கண்ணை→கண்; no ன் over-delete). Stop geminates
          // (த்தை) keep the AI sandhi-undo path.
          if (w(w.length - 4) == w(w.length - 2) &&
              "னணலளரழயவம".contains(w(w.length - 2)))
            return barecascade(fix(w.dropRight(1) + Pu, Dbl))
          if (w(w.length - 4) == w(w.length - 2) || NasalPairs.contains(pair))
            return fix(w.dropRight(1) + Pu, Ai)
          // invalid-join strip continues into the shared cascade
          // (தண்ணீர்வை→தண், மாணவன்னை→மாண)
          return barecascade(fix(w.dropRight(2), Junk))
        }
        // a remainder ending ்கு/்து continues into the command family
        // (பேருந்துவை→பேரு), then the shared cascade
        return barecascade(commandAfter(fix(w.dropRight(1) + Pu, Ai)))
      }
      // the UNG remainder continues into the shared bare cascade
      // (நண்பனுக்கு→நண், மாணவனுக்கு→மாண; no-op for அரசன்/மகன்/மரங்கள்)
      if (w.endsWith("ுக்கு")) return barecascade(fix(w.dropRight(5) + Pu, Ung))
      if (w.endsWith("ற்கு")) return w.dropRight(4)
      if (w.endsWith("க்கு") && w.length >= 5 && Signs.contains(w(w.length - 5)))
        return w.dropRight(4)
      for (s <- Seq("ோடு", "ால்", "ில்", "ின்"))
        if (w.endsWith(s)) {
          val w1 = w.substring(0, w.length - s.length) + Pu
          // stacked plural+case (மரங்களில்) re-enters the pipeline
          if (w1.endsWith("கள்") && w1.length > 5) return stem(w1)
          return barecascade(fix(w1, Il))
        }
    }

    // command: final ்கு / ்து; remainder continues into the shared bare
    // cascade (மாணவர்க்கு→மாண, தண்ணீர்க்கு→தண்; no-op for தூம்/அவர்)
    if (w.length > 4 && (w.endsWith("்கு") || w.endsWith("்து")))
      return barecascade(fix(w.dropRight(1) + Pu, Cmd))

    if (prefixed) pfxfix(w)
    else if (!fired) barefix(w)
    else w
  }
}
