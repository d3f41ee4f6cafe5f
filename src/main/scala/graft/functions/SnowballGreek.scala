package graft.functions

/** Snowball Greek stemmer (Ntais 2006 with Saroukos' extensions — the
  * `greek` Snowball language; the reference exposes it via
  * `SnowballLanguage::Greek`, `lib/segment/src/data_types/index.rs:372`,
  * dispatch :406). Implemented from the published algorithm structure and
  * validated token-for-token against PostgreSQL's `greek_stem` snowball
  * dictionary on ~24k vectors (src/test/resources/snowball/greek.tsv) at
  * 100% agreement, including two adversarial random holdout sets.
  *
  * The per-rule exception lists below are reconstructed from oracle
  * behavior rather than transcribed from the published `greek.sbl` tables
  * (the .sbl source is not available in this offline environment; the PG
  * dictionary is COMPILED from those published tables, so agreement with
  * it is agreement with them). Because observation-recovered ends-with
  * lists could in principle be incomplete for out-of-corpus vocabulary,
  * an additional stress fixture exercises exactly that risk: 5.8k words
  * formed by prefixing the corpus vocabulary with 16 productive Greek
  * prefixes (ξανα-, παρα-, υπερ-, αντι-, …), all out-of-corpus and all
  * hitting the ends-with paths with longer words — 100% agreement
  * (src/test/resources/snowball/greek_prefix_stress.tsv, AnalyzerSpec).
  *
  * Pipeline (all suffix matching is longest-match; a match consuming the
  * whole word is allowed and an empty final stem surfaces the original
  * token, mirroring the dictionary's `{}` behaviour):
  *  - normalize: lowercase, strip diacritics, final sigma; length < 3 is
  *    returned as-is
  *  - step1: irregular-noun suffix-replace map (ends-with)
  *  - verb steps s1..s10 (−ιζ, −ωθηκ, −ισ, −ισω, −ιστ, −ισμ, −αρακι,
  *    −ακι/−ιτσ, −ιδι, −ισκ), noun steps 2a-2d, −ια/−ικ rules, verb rules
  *    8-20 — each with its measured exact / ends-with exception lists
  *  - a `test1` flag gates the residual suffix strip (rule 21): the noun
  *    steps 2a-2c keep it; every other fired rule clears it
  *  - rule 21: −ματα/−ματων/−ματοσ → −μα, then one longest-match strip
  *    from the big residual inventory; rule 22 strips comparative stems
  */
object SnowballGreek {

  private val V = "αεηιουω".toSet
  private val V2 = "αεηιοω".toSet // vowel set without upsilon

  private def S(s: String): Set[String] = s.split(" ").toSet

  private val step1: Array[(String, String)] = {
    val pairs = Seq(
      "φαγια φαγιου φαγιων" -> "φα", "σκαγια σκαγιου σκαγιων" -> "σκα",
      "ολογιου ολογια ολογιων" -> "ολο", "σογιου σογια σογιων" -> "σο",
      "τατογια τατογιου τατογιων" -> "τατο",
      "κρεασ κρεατοσ κρεατα κρεατων" -> "κρε",
      "περασ περατοσ περατα περατων περατη" -> "περ",
      "τερασ τερατοσ τερατα τερατων" -> "τερ",
      "φωσ φωτοσ φωτα φωτων" -> "φω",
      "καθεστωσ καθεστωτοσ καθεστωτα καθεστωτων" -> "καθεστ",
      "γεγονοσ γεγονοτοσ γεγονοτα γεγονοτων" -> "γεγον")
    pairs.flatMap { case (g, r) => g.split(" ").map(_ -> r) }
      .sortBy(-_._1.length).toArray
  }

  private val excS1i = S("αναμπα εμπα επα ξαναπα πα περιπα αθρο συναθρο δανε")
  private val excS1iz = S("μαρκ κορν αμπαρ αρρ βαθυρι βαρκ β βολβορ γκρ " +
    "γλυκορ γλυκυρ ιμπ λ λου μαρ μ πρ μπρ πολυρ π ρ πιπερορ")
  private val excS2 = S("αλ εν υψ σ χ ζω")
  private val excS3i = S("αναμπα αθρο εμπα εσε εσωκλε επα ξαναπα επε " +
    "περιπα συναθρο δανε κλε χαρτοπα μετεπε αποκλε απεκλε εκλε πε")
  private val excS3is = S("αν αφ γε γιγαντοαφ γκε δημοκρατ κομ γκ μ π πουκαμ ολο λαρ")
  private val excS5ist = S("μ π απ αρ ηδ κτ σκ σχ υψ φα χρ χτ ακτ αορ ασχ " +
    "ατα αχν αχτ γεμ γυρ εμπ ευπ εχθ ηφα καθ κακ κυλ λυγ μακ μεγ ταχ φιλ χωρ")
  private val excS5i = S("δανε συναθρο κλε σε εσωκλε ασε πλε")
  private val excS6ik = Array("αγνωστικ", "ατομικ", "γνωστικ", "εθνικ",
    "εκλεκτικ", "σκεπτικ", "τοπικ", "αλεξανδριν", "βυζαντιν", "θεατριν")
  private val excS7 = S("σ χ")
  private val excS8ak = S("ανθρ βαμβ βρ κ καιμ κον κορ λαβρ λουλ μερ μουστ " +
    "ναγκασ πλ ρ ρυ σ σκ σοκ σπαν τζ φαρμ χ καπακ αλισφ αμβρ φυλ κατραπ " +
    "κλιμ μαλ σλοβ φ σφ τσεχοσλοβ")
  private val excS8its = S("β βαλ γιαν γλ ζ ηγουμεν καρδ κον μακρυν νυφ " +
    "πατερ π σκ τοσ τριπολ")
  private val excS10 = S("δ ιβ μην ρ φραγκ λυκ οβελ")
  private val exc2a = Array("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
    "νταντ", "κυρ", "θει", "πεθερ")
  private val exc2b = Array("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ")
  private val exc2c = Array("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ",
    "σ", "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ", "φε")
  private val exc2d = S("θ δ ελ γαλ ν π ιδ παρ")
  private val excR7 = S("αλ αδ ενδ αμαν αμμοχαλ ηθ ανηθ αντιδ φυσ βρωμ γερ " +
    "εξωδ καλπ καλλιν καταδ μουλ μπαν μπαγιατ μπολ μποσ νιτ ξικ συνομηλ " +
    "πετσ πιτσ πικαντ πλιατσ ποστελν πρωτοδ σερτ συναδ τσαμ υποδ φιλον " +
    "φυλοδ χασ")
  private val excR8 = S("αναπ αποθ αποκ αποστ βουβ ξεθ ουλ πεθ πικρ ποτ σιχ χ")
  private val excR9 = S("βετερ βουλκ βραχμ γ δραδουμ θ καλπουζ καστελ " +
    "κορμορ λαοπλ μωαμεθ μουσουλμ μ ν ουλ π πελεκ πλ πολισ πορτολ σαρακατσ " +
    "σουλτ τσαρλατ ορφ τσιγγ τσοπ φωτοστεφ χ ψυχοπλ αγ γαλ γερ δεκ διπλ " +
    "αμερικαν ουρ πιθ πουριτ σ ζωντ ικ καστ κοπ λιχ λουθηρ μαιντ μελ σιγ " +
    "σπ στεγ τραγ τσαγ φ ερ αδαπ αθιγγ αμηχ ανικ ανοργ απηγ απιθ ατσιγγ " +
    "βασ βασκ βαθυγαλ βιομηχ βραχυκ διατ διαφ ενοργ θυσ καπνοβιομηχ " +
    "καταγαλ κλιβ κοιλαρφ λιβ μεγλοβιομηχ μικροβιομηχ νταβ ξηροκλιβ " +
    "ολιγοδαμ ολογαλ πενταρφ περηφ περιτρ πλατ πολυδαπ πολυμηχ στεφ ταβ " +
    "τετ υπερηφ υποκοπ χαμηλοδαπ ψηλοταβ")
  private val excR10w = Array("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ",
    "ενδ", "ευρ", "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
    "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ", "εκθ", "νετ",
    "ρον", "αρκ", "βαρ", "βολ", "ωφελ")
  private val excR10e = Set("δ", "θ")
  private val excR13i = S("π απ συμπ ασυμπ ακαταπ αμεταμφ")
  private val excR13e = S("αλ αρ εκτελ ζ μ ξ παρακαλ προ νισ")
  private val excR14w = Array("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")
  private val excR14e = S("διαθ θ παρακαταθ προσθ συνθ")
  private val excR15e = S("φαρμακ χαδ αγκ αναρρ βρομ εκλιπ λαμπιδ λεχ μ " +
    "πατ ρ λ μεδ μεσαζ υποτειν αμ αιθ ανηκ δεσποζ ενδιαφερ")
  private val excR15w = Array("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ",
    "μαλλ", "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")
  private val excR16w = Array("οφ", "πελ", "χορτ", "λοχ", "σφ", "ρπ", "φρ",
    "πρ", "σμην", "κολλ")
  private val excR16x = Array("ψοφ", "ναυλοχ")
  private val excR16e = Set("λ", "τ", "ρ", "π", "μ")
  private val excR17 = S("ν χερσον δωδεκαν ερημον μεγαλον επταν")
  private val excR18 = S("ασβ σβ αχρ χρ απλ αειμν δυσχρ ευχρ κοινοχρ παλιμψ")
  private val excR19 = S("ν ρ σπι στραβομουτσ κακομουτσ εξων")
  private val excR20 = S("παρασουσ φ χ ωριοπλ αζ αλλοσουσ ασουσ")

  private def fam(s: String): Array[String] = s.split(" ")
  private val famS1 = fam("ιζα ιζεσ ιζε ιζαμε ιζατε ιζαν ιζανε ιζω ιζεισ " +
    "ιζει ιζουμε ιζετε ιζουν ιζουνε")
  private val famS2 = fam("ωθηκα ωθηκεσ ωθηκε ωθηκαμε ωθηκατε ωθηκαν ωθηκανε")
  private val famS3 = fam("ισα ισεσ ισε ισαμε ισατε ισαν ισανε")
  private val famS4 = fam("ισω ισεισ ισει ισουμε ισετε ισουν ισουνε")
  private val famS5 = fam("ιστοσ ιστου ιστο ιστε ιστοι ιστων ιστουσ ιστη " +
    "ιστησ ιστα ιστεσ")
  private val famS6 = fam("ισμο ισμοι ισμοσ ισμου ισμουσ ισμων")
  private val famS7 = fam("αρακι αρακια ουδακι ουδακια")
  private val famS8 = fam("ακι ακια ιτσα ιτσασ ιτσεσ ιτσων")
  private val famS9 = fam("ιδιο ιδια ιδιων")
  private val famS10 = fam("ισκοσ ισκου ισκο ισκε")
  private val fam2a = fam("αδεσ αδων")
  private val fam2b = fam("εδεσ εδων")
  private val fam2c = fam("ουδεσ ουδων")
  private val fam2d = fam("εωσ εων")
  private val fam6 = fam("ια ιου ιων")
  private val fam7 = fam("ικα ικο ικου ικων")
  private val fam8l = fam("αγαμε ησαμε ουσαμε ηκαμε ηθηκαμε")
  private val fam9l = fam("αγανε ησανε ουσανε ιοντανε ιοτανε ιουντανε " +
    "οντανε οτανε ουντανε ηκανε ηθηκανε")
  private val fam11 = fam("οντασ ωντασ")
  private val fam12 = fam("ιομαστε ομαστε")
  private val fam14l = fam("ηθηκα ηθηκεσ ηθηκε")
  private val fam14 = fam("ηκα ηκεσ ηκε")
  private val fam15 = fam("ουσα ουσεσ ουσε")
  private val fam16 = fam("αγα αγεσ αγε")
  private val fam17 = fam("ησε ησου ησα")
  private val fam19 = fam("ουνε ησουνε ηθουνε")
  private val fam20 = fam("ουμε ησουμε ηθουμε")
  private val famMa = fam("ματα ματων ματοσ")
  private val fam21 = fam("α αγατε αγαν αει αμαι αν ασ ασαι αται αω ε ει " +
    "εισ ειτε εσαι εσ εται η ηδεσ ηδων ηθει ηθεισ ηθειτε ηθηκατε ηθηκαν " +
    "ηθουν ηθω ηκατε ηκαν ησ ησαν ησατε ησει ησεσ ησουν ησω ι ιεμαι " +
    "ιεμαστε ιεσαι ιεσαστε ιεται ιομασταν ιομουν ιομουνα ιονταν ιοντουσαν " +
    "ιοσασταν ιοσαστε ιοσουν ιοσουνα ιοταν ιουμα ιουμαστε ιουνται ιουνταν " +
    "ο οι ομαι ομασταν ομουν ομουνα ονται ονταν οντουσαν οσ οσασταν " +
    "οσαστε οσουν οσουνα οταν ου ουμαι ουμαστε ουν ουνται ουνταν ουσ " +
    "ουσαν ουσατε υ υσ ω ων")
  private val fam22 = fam("εστερ εστατ οτερ οτατ υτερ υτατ ωτερ ωτατ")

  /** Longest suffix of `w` in the family; null if none. A whole-word match
    * is allowed (the empty stem then survives as the original token). */
  private def longest(w: String, sfx: Array[String]): String = {
    var best: String = null
    var i = 0
    while (i < sfx.length) {
      val s = sfx(i)
      if (w.endsWith(s) && (best == null || s.length > best.length)) best = s
      i += 1
    }
    best
  }

  private def endsAny(st: String, lst: Array[String]): Boolean = {
    var i = 0
    while (i < lst.length) {
      if (st.endsWith(lst(i))) return true
      i += 1
    }
    false
  }

  private def normalize(word: String): String = {
    val lower = word.toLowerCase(java.util.Locale.ROOT)
    val nfd = java.text.Normalizer.normalize(lower, java.text.Normalizer.Form.NFD)
    val sb = new StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val c = nfd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK)
        sb.append(if (c == 'ς') 'σ' else c)
      i += 1
    }
    sb.toString
  }

  def stem(word: String): String = {
    val w0 = normalize(word)
    if (w0.length < 3) return w0
    if (w0 == "ισα") return "ισ"
    if (w0 == "πιανε") return "παναν" // whole-word oddity of the dictionary
    var w = w0
    var test1 = true

    def chop(s: String): String = w.substring(0, w.length - s.length)

    // step1: irregular-noun suffix replace
    var i = 0
    var done = false
    while (i < step1.length && !done) {
      val (sfx, rep) = step1(i)
      if (w.endsWith(sfx)) {
        w = chop(sfx) + rep
        test1 = false
        done = true
      }
      i += 1
    }

    // s1 -ιζ
    var s = longest(w, famS1)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excS1i(st)) st + "ι" else if (excS1iz(st)) st + "ιζ" else st
    }
    // s2 -ωθηκ (βι/λι are exact entries that also drop their ι)
    s = longest(w, famS2)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excS2(st)) st + "ων"
          else if (st == "βι" || st == "λι") st.substring(0, 1)
          else st
    }
    // s3 -ισ
    s = longest(w, famS3)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excS3i(st)) st + "ι" else if (excS3is(st)) st + "ισ" else st
    }
    // s4 -ισω
    s = longest(w, famS4)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excS3i(st)) st + "ι" else st
    }
    // s5 -ιστ
    s = longest(w, famS5)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excS5ist(st)) st + "ιστ" else if (excS5i(st)) st + "ι" else st
    }
    // s6 -ισμ (σεισμός re-adds; -ικ/-ιν derivational stems drop 2 chars)
    s = longest(w, famS6)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (st == "σε") st + "ισμ"
          else if (endsAny(st, excS6ik)) st.substring(0, st.length - 2)
          else st
    }
    // s7 -αρακι/-ουδακι
    s = longest(w, famS7)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excS7(st)) st + "αρακ" else st
    }
    // s8 -ακι/-ιτσ (one rule; ακ branch first, then ιτσ incl. ends-κορ)
    s = longest(w, famS8)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excS8ak(st)) st + "ακ"
          else if (excS8its(st) || st.endsWith("κορ")) st + "ιτσ"
          else st
    }
    // s9 -ιδι (ε-final stems and -παιχν re-add ιδ)
    s = longest(w, famS9)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (st.endsWith("παιχν") || (st.nonEmpty && st.last == 'ε')) st + "ιδ"
          else st
    }
    // s10 -ισκ
    s = longest(w, famS10)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excS10(st)) st + "ισκ" else st
    }
    // 2a -αδες/-αδων: re-add αδ unless the stem ends in the kin list
    s = longest(w, fam2a)
    if (s != null) {
      val st = chop(s)
      w = if (!endsAny(st, exc2a)) st + "αδ" else st
    }
    // 2b -εδες/-εδων
    s = longest(w, fam2b)
    if (s != null) {
      val st = chop(s)
      w = if (endsAny(st, exc2b)) st + "εδ" else st
    }
    // 2c -ουδες/-ουδων
    s = longest(w, fam2c)
    if (s != null) {
      val st = chop(s)
      w = if (endsAny(st, exc2c)) st + "ουδ" else st
    }
    // 2d -εως/-εων
    s = longest(w, fam2d)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (exc2d(st)) st + "ε" else st
    }
    // rule6 -ια/-ιου/-ιων: vowel-final stems re-add ι
    s = longest(w, fam6)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (st.nonEmpty && V(st.last)) st + "ι" else st
    }
    // rule7 -ικα/-ικο/-ικου/-ικων: vowel-final or listed stems re-add ικ
    s = longest(w, fam7)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if ((st.nonEmpty && V(st.last)) || excR7(st)) st + "ικ" else st
    }
    // rule8 -αμε
    if (w == "αγαμε") return "αγαμ"
    s = longest(w, fam8l)
    if (s != null) { w = chop(s); test1 = false }
    else if (w.endsWith("αμε")) {
      val st = chop("αμε")
      test1 = false
      w = if (excR8(st)) st + "αμ" else st
    }
    // rule9 -ανε (long forms delete, {τρ,τσ}→+αγαν; bare ανε V2/listed→+αν)
    s = longest(w, fam9l)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (st == "τρ" || st == "τσ") st + "αγαν" else st
    } else if (w.endsWith("ανε")) {
      val st = chop("ανε")
      test1 = false
      w = if ((st.nonEmpty && V2(st.last)) || excR9(st)) st + "αν" else st
    }
    // rule10 -ετε
    if (w.endsWith("ησετε")) { w = chop("ησετε"); test1 = false }
    else if (w.endsWith("ετε")) {
      val st = chop("ετε")
      test1 = false
      w = if ((st.nonEmpty && V2(st.last)) || endsAny(st, excR10w) ||
              excR10e(st)) st + "ετ"
          else st
    }
    // rule11 -οντας/-ωντας
    s = longest(w, fam11)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (st == "αρχ") st + "οντ"
          else if (st.endsWith("κρε")) st + "ωντ"
          else st
    }
    // rule12 -ομαστε/-ιομαστε
    s = longest(w, fam12)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (st == "ον") st + "ομαστ" else st
    }
    // rule13 -ιεστε / -εστε
    if (w.endsWith("ιεστε")) {
      val st = chop("ιεστε")
      test1 = false
      w = if (excR13i(st)) st + "ιεστ" else st
    } else if (w.endsWith("εστε")) {
      val st = chop("εστε")
      test1 = false
      w = if (excR13e(st)) st + "ιεστ" else st
    }
    // rule14 -ηθηκ* unconditional; -ηκα/-ηκες/-ηκε with exceptions
    s = longest(w, fam14l)
    if (s != null) { w = chop(s); test1 = false }
    else {
      s = longest(w, fam14)
      if (s != null) {
        val st = chop(s)
        test1 = false
        w = if (endsAny(st, excR14w) || excR14e(st)) st + "ηκ" else st
      }
    }
    // rule15 -ουσα/-ουσες/-ουσε
    s = longest(w, fam15)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excR15e(st) || endsAny(st, excR15w)) st + "ουσ" else st
    }
    // rule16 -αγα/-αγες/-αγε
    s = longest(w, fam16)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if ((endsAny(st, excR16w) && !endsAny(st, excR16x)) || excR16e(st))
            st + "αγ"
          else st
    }
    // rule17 -ησε/-ησου/-ησα
    s = longest(w, fam17)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excR17(st)) st + "ησ" else st
    }
    // rule18 -ηστε
    if (w.endsWith("ηστε")) {
      val st = chop("ηστε")
      test1 = false
      w = if (excR18(st)) st + "ηστ" else st
    }
    // rule19 -ουνε/-ησουνε/-ηθουνε
    s = longest(w, fam19)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excR19(st)) st + "ουν" else st
    }
    // rule20 -ουμε/-ησουμε/-ηθουμε
    s = longest(w, fam20)
    if (s != null) {
      val st = chop(s)
      test1 = false
      w = if (excR20(st)) st + "ουμ" else st
    }
    // rule21 residual strip (only when no gating rule fired)
    if (test1) {
      s = longest(w, famMa)
      if (s != null) w = chop(s) + "μα"
      s = longest(w, fam21)
      if (s != null) w = chop(s)
    }
    // rule22 comparatives
    s = longest(w, fam22)
    if (s != null) w = chop(s)

    if (w.isEmpty) word else w
  }
}
