package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.filters.TypedResolver
import graft.model._
import graft.ops.Reads
import graft.pipeline.{Dedup, Sharding, TextAnalysis}

/** Full-text match + training-data text pipeline catalog (SURVEY.md §2.2
  * Match::Text family; dedup/quality per the north-star extensions). */
/** Shared fixture for the multilingual-analyzer entry: per-language
  * sentences and the (lang-code, stopword) pairs, used identically by the
  * Spark query and the generated DuckDB oracle. */
object MultilangFixture {
  val sentences: Map[String, String] = Map(
    "de" -> "Die Häuser und die Bücher der schönsten Städte 99",
    "es" -> "Los vectores y las consultas rápidas de la base 7",
    "fr" -> "Les vecteurs et les requêtes rapides de la base",
    "zh" -> "向量搜索引擎非常好用 123",
    "en" -> "The vectors and the fast queries of the engine")

  private val langNames = Seq(
    "de" -> "german", "es" -> "spanish", "fr" -> "french",
    "zh" -> "chinese", "en" -> "english")

  def stopwordPairs: Seq[(String, String)] = {
    val pairs = langNames.flatMap { case (code, full) =>
      graft.functions.Stopwords.forLanguage(full).toSeq.sorted.map(code -> _)
    }
    // Loud failure beats silently-empty stopword sets: an empty result here
    // means the classpath is missing /stopwords/*.txt (e.g. `sbt compile`
    // without copyResources), which would corrupt both the Spark query and
    // the generated oracle SQL (`VALUES` with no rows is a parse error).
    require(pairs.nonEmpty, "stopword resources missing from classpath")
    pairs
  }

  /** DuckDB SQL reproducing the exact pipeline (tokenizer as a regexp over
    * the controlled fixture alphabet, same stopword pairs as VALUES). */
  def oracleSql: String = {
    def esc(s: String) = s.replace("'", "''")
    val caseExpr = sentences.filterNot(_._1 == "en")
      .map { case (c, s) => s"WHEN '$c' THEN '${esc(s)}'" }
      .mkString(" ")
    val pairs = stopwordPairs
      .map { case (c, w) => s"('$c','${esc(w)}')" }.mkString(",")
    s"""WITH src AS (SELECT lang,
       |    CASE lang $caseExpr ELSE '${esc(sentences("en"))}' END AS t
       |  FROM documents WHERE doc_id < 200),
       |tok AS (SELECT lang, unnest(regexp_extract_all(lower(t),
       |    '[\\x{4e00}-\\x{9fff}]|[a-z0-9ßà-öø-ÿ]+')) AS term FROM src),
       |alpha AS (SELECT lang, term FROM tok WHERE regexp_matches(term, '[^0-9]')),
       |sw(sw_lang, sw_word) AS (VALUES $pairs)
       |SELECT term, count(*)::BIGINT AS cnt FROM alpha a
       |WHERE NOT EXISTS (SELECT 1 FROM sw
       |                  WHERE sw.sw_lang = a.lang AND sw.sw_word = a.term)
       |GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 30""".stripMargin
  }
}

/** Fixture for phrase matching over the ANALYZED token stream (the
  * reference's `phrase_matching` index option works on positions produced by
  * the configured analyzer, incl. multilingual tokenizer + stemmer —
  * `lib/segment/src/index/field_index/full_text_index/`, params
  * `lib/segment/src/data_types/index.rs:243-312`). Stopword removal
  * compresses positions, so a phrase spanning a dropped stopword still
  * matches — exactly what the forward phrases below exercise; the reversed
  * phrases must NOT match (order sensitivity).
  *
  * The DuckDB oracle reproduces the analyzer: same tokenizer regex as
  * [[MultilangFixture]], same inline stopword list, and a (lang, token) →
  * stem mapping over the closed fixture vocabulary generated from
  * [[graft.functions.Snowball]] — each stemmer itself is independently
  * verified at 100% agreement against PostgreSQL's snowball dictionaries in
  * AnalyzerSpec, so the mapping is data, not circular logic under test. */
object PhraseFixture {
  /** Custom stopword set (the analyzer's explicit `stopwords` option). */
  val stopwords: Seq[String] = Seq("the", "and", "of", "die", "der", "und",
    "los", "las", "la", "y", "de", "les", "et", "le", "du")

  val langNames: Map[String, String] = Map("de" -> "german", "es" -> "spanish",
    "fr" -> "french", "zh" -> "chinese", "en" -> "english")

  /** Forward phrases: present consecutively in the analyzed stream (some
    * only once a stopword between the words is dropped). */
  val phrasesFwd: Map[String, String] = Map(
    "de" -> "Bücher der schönsten",
    "es" -> "consultas rápidas de la base",
    "fr" -> "requêtes rapides de la base",
    "en" -> "the fast queries",
    "zh" -> "搜索引擎")

  /** Reversed/reordered phrases: same tokens, wrong order — must not match. */
  val phrasesRev: Map[String, String] = Map(
    "de" -> "schönsten Bücher",
    "es" -> "base rápidas",
    "fr" -> "rapides requêtes",
    "en" -> "queries fast",
    "zh" -> "引擎搜索")

  /** Query-side analysis: the same tokenize → stopwords → stem pipeline the
    * index side runs (phrase queries are analyzed with the field analyzer). */
  def analyzePhrase(code: String, phrase: String): Seq[String] =
    graft.functions.MultilingualTokenizer.tokenize(phrase)
      .filterNot(stopwords.contains)
      .map(graft.functions.Snowball.stem(langNames(code), _))

  /** (lang, token) → stem pairs over the closed fixture vocabulary. */
  private def stemPairs: Map[String, Seq[(String, String)]] =
    MultilangFixture.sentences.map { case (code, sent) =>
      val vocab = (graft.functions.MultilingualTokenizer.tokenize(sent) ++
        graft.functions.MultilingualTokenizer.tokenize(
          phrasesFwd(code) + " " + phrasesRev(code)))
        .distinct.filterNot(stopwords.contains)
      code -> vocab.map(w =>
        w -> graft.functions.Snowball.stem(langNames(code), w))
    }

  def oracleSql: String = {
    def esc(s: String) = s.replace("'", "''")
    val sentCase = MultilangFixture.sentences.filterNot(_._1 == "en")
      .map { case (c, s) => s"WHEN '$c' THEN '${esc(s)}'" }.mkString(" ")
    val swList = stopwords.map(w => s"'${esc(w)}'").mkString(", ")
    val stemCase = stemPairs.map { case (code, pairs) =>
      val inner = pairs.filter(p => p._1 != p._2)
        .map { case (w, st) => s"WHEN '${esc(w)}' THEN '${esc(st)}'" }
        .mkString(" ")
      if (inner.isEmpty) s"WHEN '$code' THEN x"
      else s"WHEN '$code' THEN (CASE x $inner ELSE x END)"
    }.mkString(" ")
    def phraseCase(ps: Map[String, String]): String =
      ps.map { case (code, p) =>
        val analyzed = analyzePhrase(code, p).mkString(" ", " ", " ")
        s"WHEN '$code' THEN '${esc(analyzed)}'"
      }.mkString(" ")
    s"""WITH src AS (SELECT doc_id, lang,
       |    CASE lang $sentCase ELSE '${esc(MultilangFixture.sentences("en"))}' END AS t
       |  FROM documents WHERE doc_id < 200),
       |tok AS (SELECT doc_id, lang, list_filter(
       |    regexp_extract_all(lower(t), '[\\x{4e00}-\\x{9fff}]|[a-z0-9ßà-öø-ÿ]+'),
       |    x -> regexp_matches(x, '[^0-9]') AND NOT list_contains([$swList], x)) AS toks
       |  FROM src),
       |st AS (SELECT doc_id, lang,
       |    ' ' || array_to_string(list_transform(toks,
       |      x -> CASE lang $stemCase ELSE x END), ' ') || ' ' AS s
       |  FROM tok)
       |SELECT doc_id, lang,
       |  CASE WHEN contains(s, CASE lang ${phraseCase(phrasesFwd)} END) THEN 1 ELSE 0 END AS m_fwd,
       |  CASE WHEN contains(s, CASE lang ${phraseCase(phrasesRev)} END) THEN 1 ELSE 0 END AS m_rev
       |FROM st ORDER BY doc_id ASC LIMIT 100""".stripMargin
  }
}

/** Fixture for Match::Text / TextAny / Phrase THROUGH a declared text-index
  * analyzer (word tokenizer + lowercase + ascii folding + stopwords +
  * English Snowball stemmer — `TextIndexParams`, `index.rs:243-414`). The
  * closed English vocabulary lets the DuckDB oracle reproduce the whole
  * pipeline: regexp word tokenization + strip_accents + stopword filter in
  * SQL, and a (token → stem) CASE map generated from
  * [[graft.functions.Snowball]] — the stemmer itself is independently
  * verified against PostgreSQL snowball fixtures in AnalyzerSpec, so the
  * mapping is data, not circular logic under test.
  *
  * The queries deliberately need the analyzer to match: "Running ENGINE"
  * only matches via lowercase + stemming (stored forms are "engines" /
  * "engine" / "runs"), "CAFÉ" only via folding, and the phrase "runs the
  * fastest" only matches because the dropped stopword compresses
  * positions. The old whitespace-token path matches NONE of them. */
object TextMatchFixture {
  import graft.model.TextIndexConfig

  val stopwords: Seq[String] = Seq("the", "and", "of", "are")

  /** Sentence per (doc_id % 4) bucket. */
  val sentences: Seq[String] = Seq(
    "The engines are running quickly and smoothly",
    "He runs the fastest queries of the Engine",
    "National libraries keep running records in the café",
    "Completely unrelated cooking pasta words")

  val cfg: TextIndexConfig = TextIndexConfig(
    tokenizer = "word", lowercase = true, asciiFolding = true,
    stopwords = stopwords, stemmerLang = Some("english"),
    // m_phrase needs stored positions (`phrase_matching`); without the
    // flag the compiler correctly refuses phrase queries
    phraseMatching = true)

  val textQuery = "Running ENGINE"   // m_text: ALL stemmed tokens present
  val anyQuery = "cooking engines"   // m_any: ANY stemmed token present
  val phraseQuery = "runs the fastest" // m_phrase: consecutive post-stopword
  val cafeQuery = "CAFÉ"        // m_cafe: folding + lowercase

  private def esc(s: String) = s.replace("'", "''")

  /** Analyzed query token lists, via the engine's driver-side analyzer
    * (shared fold/stem kernels; AnalyzerSpec independence argument). */
  private def q(text: String): Seq[String] =
    graft.functions.TextFunctions.analyzeQueryWith(text, cfg)

  /** Closed-vocabulary (token → stem) pairs for the oracle's CASE map. */
  private def stemPairs: Seq[(String, String)] = {
    val vocab = sentences
      .flatMap(_.toLowerCase.split("[^\\p{L}\\p{N}]+")).filter(_.nonEmpty)
      .map(w => graft.functions.StemKernels.asciiFold(
        org.apache.spark.unsafe.types.UTF8String.fromString(w)).toString)
      .distinct.filterNot(stopwords.contains)
    vocab.map(w => w -> graft.functions.Snowball.stem("english", w))
  }

  def oracleSql: String = {
    val sentCase = sentences.zipWithIndex.map { case (s, i) =>
      s"WHEN $i THEN '${esc(s)}'"
    }.mkString(" ")
    val swList = stopwords.map(w => s"'${esc(w)}'").mkString(", ")
    val stemCase = stemPairs.filter(p => p._1 != p._2)
      .map { case (w, st) => s"WHEN '${esc(w)}' THEN '${esc(st)}'" }
      .mkString(" ")
    def lst(ts: Seq[String]) = ts.map(t => s"'${esc(t)}'").mkString(", ")
    val phrase = q(phraseQuery).mkString(" ", " ", " ")
    s"""WITH src AS (SELECT doc_id,
       |    CASE (doc_id % 4) $sentCase END AS t FROM documents),
       |tok AS (SELECT doc_id,
       |    list_transform(
       |      list_filter(regexp_extract_all(strip_accents(lower(t)), '[a-z0-9]+'),
       |                  w -> NOT list_contains([$swList], w)),
       |      w -> CASE w $stemCase ELSE w END) AS toks
       |  FROM src)
       |SELECT doc_id,
       |  list_has_all(toks, [${lst(q(textQuery).distinct)}])::INT AS m_text,
       |  list_has_any(toks, [${lst(q(anyQuery).distinct)}])::INT AS m_any,
       |  CASE WHEN contains(' ' || array_to_string(toks, ' ') || ' ',
       |    '${esc(phrase)}') THEN 1 ELSE 0 END AS m_phrase,
       |  list_has_all(toks, [${lst(q(cafeQuery).distinct)}])::INT AS m_cafe
       |FROM tok ORDER BY doc_id ASC""".stripMargin
  }
}

/** Held-out open-text sample for trigram language-ID validation: authored
  * sentences (everyday prose, NOT drawn from the stopword lists that build
  * the profiles — content words dominate), one per supported language
  * across 22 languages / 8 scripts. The oracle encodes the TRUE language as
  * the expected prediction for every row — a 100% holdout-accuracy bar. */
object LangIdHoldoutFixture {
  val rows: Seq[(Long, String, String)] = Seq(
    1L -> "en" -> "the quick brown fox jumps over the lazy dog while the children watch from the garden near the old wooden bridge",
    2L -> "de" -> "die Kinder spielen im Garten hinter dem alten Haus und die Mutter kocht das Abendessen für die ganze Familie",
    3L -> "es" -> "los niños juegan en el jardín detrás de la casa vieja mientras la madre prepara la cena para toda la familia",
    4L -> "fr" -> "les enfants jouent dans le jardin derrière la vieille maison pendant que la mère prépare le dîner pour toute la famille",
    5L -> "it" -> "i bambini giocano nel giardino dietro la vecchia casa mentre la madre prepara la cena per tutta la famiglia",
    6L -> "pt" -> "não sei se você está em casa mas as crianças já estão no jardim com uma bola e não querem fazer mais nada além de brincar até a noite",
    7L -> "nl" -> "de kinderen spelen in de tuin achter het oude huis terwijl de moeder het avondeten voor het hele gezin kookt",
    8L -> "ru" -> "дети играют в саду за старым домом пока мать готовит ужин для всей семьи вечером после работы",
    9L -> "da" -> "børnene leger i haven bag det gamle hus mens moderen laver aftensmad til hele familien om aftenen",
    10L -> "sv" -> "barnen leker i trädgården bakom det gamla huset medan mamman lagar middag till hela familjen på kvällen",
    11L -> "no" -> "hva slags mat liker dere å lage av grønnsakene fra hagen når noen av vennene deres kommer på besøk om kvelden",
    12L -> "fi" -> "lapset leikkivät puutarhassa vanhan talon takana kun äiti valmistaa illallista koko perheelle illalla",
    13L -> "hu" -> "a gyerekek a kertben játszanak a régi ház mögött míg az anya vacsorát készít az egész családnak",
    14L -> "tr" -> "çocuklar eski evin arkasındaki bahçede oynuyor ve anne bütün aile için akşam yemeği hazırlıyor",
    15L -> "el" -> "τα παιδιά παίζουν στον κήπο πίσω από το παλιό σπίτι ενώ η μητέρα ετοιμάζει το δείπνο για όλη την οικογένεια",
    16L -> "ar" -> "يلعب الأطفال في الحديقة خلف المنزل القديم بينما تعد الأم العشاء لجميع أفراد العائلة في المساء",
    17L -> "he" -> "הילדים משחקים בגינה מאחורי הבית הישן בזמן שהאמא מכינה ארוחת ערב לכל המשפחה",
    18L -> "id" -> "anak anak bermain di kebun di belakang rumah tua sementara ibu menyiapkan makan malam untuk seluruh keluarga",
    19L -> "ca" -> "els nens juguen al jardí darrere de la casa vella mentre la mare prepara el sopar per a tota la família",
    20L -> "ro" -> "copiii se joacă în grădină în spatele casei vechi în timp ce mama pregătește cina pentru toată familia",
    21L -> "zh" -> "孩子们在老房子后面的花园里玩耍而母亲正在为全家人准备晚餐",
    22L -> "ja" -> "子供たちは古い家の裏の庭で遊んでいて母親は家族のために夕食を作っています",
  ).map { case ((id, code), text) => (id, code, text) }

  val codes: Seq[String] = rows.map(_._2).distinct.sorted

  /** VALUES oracle: expected prediction = true language for every row. */
  def oracleSql: String = {
    val vals = rows.map { case (id, code, _) => s"($id, '$code', '$code')" }
      .mkString(", ")
    s"""SELECT row_id::BIGINT AS row_id, lang, predicted
       |FROM (VALUES $vals) t(row_id, lang, predicted)
       |ORDER BY row_id ASC""".stripMargin
  }
}

/** Wide open-text holdout for the trigram language classifier: 22
  * languages × 9 authored sentences across distinct domains (weather,
  * food, travel, work, animals, sea, music, market, science) — all prose
  * OUTSIDE the profile source (profiles are built from stopword lists;
  * these sentences are dominated by content words). Unlike the 1-sentence
  * smoke holdout, this one carries a stated accuracy BAR (≥95%) rather
  * than a 100% pin: closely related pairs (da/no/sv, es/ca/pt) are
  * legitimately confusable at sentence length. */
object LangIdWideFixture {
  private val data: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(
      "heavy rain fell through the night and the river rose above the stone wall by morning",
      "she sliced the bread and spread butter on it before the coffee finished brewing",
      "the train to the coast leaves early so we packed our bags the evening before",
      "he finished the report late and sent it to the office before anyone arrived",
      "a grey cat slept on the warm roof while swallows circled above the chimney",
      "the fishermen pulled their nets from the cold water as the sun climbed higher",
      "the band played an old song and everyone in the hall began to sing along",
      "fresh apples and pears were cheap at the market stall near the church",
      "the experiment failed twice before the students found the broken wire"),
    "de" -> Seq(
      "der starke Regen fiel die ganze Nacht und der Fluss stieg bis zum Morgen über die Mauer",
      "sie schnitt das Brot und strich Butter darauf bevor der Kaffee fertig war",
      "der Zug zur Küste fährt früh deshalb haben wir die Koffer am Abend vorher gepackt",
      "er beendete den Bericht spät und schickte ihn ins Büro bevor jemand ankam",
      "eine graue Katze schlief auf dem warmen Dach während Schwalben über dem Schornstein kreisten",
      "die Fischer zogen ihre Netze aus dem kalten Wasser als die Sonne höher stieg",
      "die Kapelle spielte ein altes Lied und alle im Saal begannen mitzusingen",
      "frische Äpfel und Birnen waren am Marktstand neben der Kirche billig",
      "der Versuch schlug zweimal fehl bevor die Studenten den gebrochenen Draht fanden"),
    "es" -> Seq(
      "la lluvia cayó toda la noche y el río subió por encima del muro de piedra antes del amanecer",
      "ella cortó el pan y le puso mantequilla antes de que el café estuviera listo",
      "el tren hacia la costa sale temprano así que hicimos las maletas la noche anterior",
      "terminó el informe tarde y lo envió a la oficina antes de que llegara nadie",
      "un gato gris dormía sobre el tejado caliente mientras las golondrinas volaban sobre la chimenea",
      "los pescadores sacaron sus redes del agua fría cuando el sol subió más alto",
      "la banda tocó una canción vieja y todos en la sala empezaron a cantar",
      "las manzanas y las peras estaban baratas en el puesto del mercado junto a la iglesia",
      "el experimento falló dos veces antes de que los estudiantes encontraran el cable roto"),
    "fr" -> Seq(
      "la pluie est tombée toute la nuit et la rivière a dépassé le mur de pierre avant le matin",
      "elle a coupé le pain et étalé du beurre dessus avant que le café soit prêt",
      "le train pour la côte part tôt alors nous avons fait les valises la veille au soir",
      "il a terminé le rapport tard et l'a envoyé au bureau avant que quelqu'un arrive",
      "un chat gris dormait sur le toit chaud pendant que les hirondelles tournaient au-dessus de la cheminée",
      "les pêcheurs ont tiré leurs filets de l'eau froide quand le soleil est monté plus haut",
      "l'orchestre a joué une vieille chanson et tout le monde dans la salle s'est mis à chanter",
      "les pommes et les poires étaient bon marché au stand du marché près de l'église",
      "l'expérience a échoué deux fois avant que les étudiants trouvent le fil cassé"),
    "it" -> Seq(
      "la pioggia è caduta tutta la notte e il fiume è salito sopra il muro di pietra prima del mattino",
      "lei ha tagliato il pane e ci ha spalmato il burro prima che il caffè fosse pronto",
      "il treno per la costa parte presto quindi abbiamo preparato le valigie la sera prima",
      "ha finito la relazione tardi e l'ha mandata in ufficio prima che arrivasse qualcuno",
      "un gatto grigio dormiva sul tetto caldo mentre le rondini giravano sopra il camino",
      "i pescatori hanno tirato le reti dall'acqua fredda quando il sole è salito più in alto",
      "la banda ha suonato una vecchia canzone e tutti nella sala hanno cominciato a cantare",
      "le mele e le pere erano economiche alla bancarella del mercato vicino alla chiesa",
      "l'esperimento è fallito due volte prima che gli studenti trovassero il filo rotto"),
    "pt" -> Seq(
      "a chuva caiu a noite toda e o rio subiu acima do muro de pedra antes do amanhecer",
      "ela cortou o pão e passou manteiga antes de o café ficar pronto",
      "o comboio para a costa parte cedo por isso arrumámos as malas na véspera",
      "ele terminou o relatório tarde e enviou-o ao escritório antes de alguém chegar",
      "um gato cinzento dormia no telhado quente enquanto as andorinhas voavam sobre a chaminé",
      "os pescadores puxaram as redes da água fria quando o sol subiu mais alto",
      "a banda tocou uma canção antiga e todos na sala começaram a cantar",
      "as maçãs e as peras estavam baratas na banca do mercado ao lado da igreja",
      "a experiência falhou duas vezes antes de os estudantes encontrarem o fio partido"),
    "nl" -> Seq(
      "de regen viel de hele nacht en de rivier steeg voor de ochtend boven de stenen muur",
      "zij sneed het brood en smeerde er boter op voordat de koffie klaar was",
      "de trein naar de kust vertrekt vroeg dus pakten we de koffers de avond ervoor",
      "hij maakte het verslag laat af en stuurde het naar kantoor voordat iemand aankwam",
      "een grijze kat sliep op het warme dak terwijl zwaluwen boven de schoorsteen cirkelden",
      "de vissers trokken hun netten uit het koude water toen de zon hoger klom",
      "de band speelde een oud lied en iedereen in de zaal begon mee te zingen",
      "verse appels en peren waren goedkoop bij de marktkraam naast de kerk",
      "de proef mislukte twee keer voordat de studenten de gebroken draad vonden"),
    "ru" -> Seq(
      "дождь шёл всю ночь и река поднялась выше каменной стены ещё до утра",
      "она нарезала хлеб и намазала масло пока варился кофе",
      "поезд к побережью уходит рано поэтому мы собрали чемоданы накануне вечером",
      "он закончил отчёт поздно и отправил его в контору прежде чем кто-то пришёл",
      "серый кот спал на тёплой крыше пока ласточки кружили над трубой",
      "рыбаки вытащили сети из холодной воды когда солнце поднялось выше",
      "оркестр играл старую песню и все в зале начали подпевать",
      "яблоки и груши были дешёвые на рынке возле церкви",
      "опыт не удался дважды прежде чем студенты нашли оборванный провод"),
    "da" -> Seq(
      "regnen faldt hele natten og floden steg over stenmuren inden morgenen",
      "hun skar brødet og smurte smør på inden kaffen var færdig",
      "toget til kysten kører tidligt så vi pakkede kufferterne aftenen før",
      "han blev sent færdig med rapporten og sendte den til kontoret inden nogen kom",
      "en grå kat sov på det varme tag mens svalerne kredsede over skorstenen",
      "fiskerne trak deres garn op af det kolde vand da solen steg højere",
      "orkestret spillede en gammel sang og alle i salen begyndte at synge med",
      "friske æbler og pærer var billige ved boden på torvet ved siden af kirken",
      "forsøget mislykkedes to gange inden de studerende fandt den knækkede ledning"),
    "sv" -> Seq(
      "regnet föll hela natten och floden steg över stenmuren före morgonen",
      "hon skar brödet och bredde smör på innan kaffet var klart",
      "tåget till kusten går tidigt så vi packade väskorna kvällen innan",
      "han blev klar med rapporten sent och skickade den till kontoret innan någon kom",
      "en grå katt sov på det varma taket medan svalorna kretsade över skorstenen",
      "fiskarna drog upp sina nät ur det kalla vattnet när solen steg högre",
      "orkestern spelade en gammal sång och alla i salen började sjunga med",
      "färska äpplen och päron var billiga vid ståndet på torget bredvid kyrkan",
      "försöket misslyckades två gånger innan studenterna hittade den trasiga sladden"),
    "no" -> Seq(
      "regnet falt hele natten og elva steg over steinmuren før morgenen",
      "hun skar brødet og smurte smør på før kaffen var ferdig",
      "toget til kysten går tidlig så vi pakket koffertene kvelden før",
      "han ble ferdig med rapporten sent og sendte den til kontoret før noen kom",
      "en grå katt sov på det varme taket mens svalene sirklet over pipa",
      "fiskerne dro garnene opp av det kalde vannet da sola steg høyere",
      "orkesteret spilte en gammel sang og alle i salen begynte å synge med",
      "ferske epler og pærer var billige på boden ved torget ved siden av kirka",
      "forsøket mislyktes to ganger før studentene fant den ødelagte ledningen"),
    "fi" -> Seq(
      "sade jatkui koko yön ja joki nousi kivimuurin yli ennen aamua",
      "hän leikkasi leivän ja levitti voita ennen kuin kahvi oli valmista",
      "juna rannikolle lähtee aikaisin joten pakkasimme laukut edellisenä iltana",
      "hän sai raportin valmiiksi myöhään ja lähetti sen toimistoon ennen kuin kukaan saapui",
      "harmaa kissa nukkui lämpimällä katolla kun pääskyset kiersivät savupiipun yllä",
      "kalastajat vetivät verkkonsa kylmästä vedestä kun aurinko nousi korkeammalle",
      "orkesteri soitti vanhan laulun ja kaikki salissa alkoivat laulaa mukana",
      "tuoreet omenat ja päärynät olivat halpoja torin kojulla kirkon vieressä",
      "koe epäonnistui kahdesti ennen kuin opiskelijat löysivät katkenneen johdon"),
    "hu" -> Seq(
      "az eső egész éjjel esett és a folyó reggelre a kőfal fölé emelkedett",
      "felvágta a kenyeret és vajat kent rá mielőtt a kávé elkészült",
      "a vonat a partra korán indul ezért előző este összecsomagoltuk a bőröndöket",
      "későn fejezte be a jelentést és elküldte az irodába mielőtt bárki megérkezett",
      "egy szürke macska aludt a meleg tetőn míg a fecskék a kémény fölött köröztek",
      "a halászok kihúzták a hálóikat a hideg vízből amikor a nap magasabbra emelkedett",
      "a zenekar egy régi dalt játszott és a teremben mindenki énekelni kezdett",
      "a friss alma és körte olcsó volt a piaci standon a templom mellett",
      "a kísérlet kétszer nem sikerült mire a diákok megtalálták a szakadt vezetéket"),
    "tr" -> Seq(
      "yağmur bütün gece yağdı ve nehir sabaha kadar taş duvarın üzerine yükseldi",
      "kahve hazır olmadan önce ekmeği kesti ve üzerine tereyağı sürdü",
      "sahile giden tren erken kalkıyor bu yüzden valizleri bir akşam önceden hazırladık",
      "raporu geç bitirdi ve kimse gelmeden önce ofise gönderdi",
      "gri bir kedi sıcak çatıda uyurken kırlangıçlar bacanın üzerinde dönüyordu",
      "balıkçılar güneş yükselirken ağlarını soğuk sudan çektiler",
      "orkestra eski bir şarkı çaldı ve salondaki herkes söylemeye başladı",
      "taze elma ve armut kilisenin yanındaki pazar tezgahında ucuzdu",
      "öğrenciler kopuk teli bulmadan önce deney iki kez başarısız oldu"),
    "el" -> Seq(
      "η βροχή έπεφτε όλη τη νύχτα και το ποτάμι ανέβηκε πάνω από τον πέτρινο τοίχο πριν το πρωί",
      "έκοψε το ψωμί και άλειψε βούτυρο πριν ετοιμαστεί ο καφές",
      "το τρένο για την ακτή φεύγει νωρίς γι αυτό ετοιμάσαμε τις βαλίτσες από το προηγούμενο βράδυ",
      "τελείωσε την αναφορά αργά και την έστειλε στο γραφείο πριν φτάσει κανείς",
      "μια γκρίζα γάτα κοιμόταν στη ζεστή στέγη ενώ τα χελιδόνια γύριζαν πάνω από την καμινάδα",
      "οι ψαράδες τράβηξαν τα δίχτυα από το κρύο νερό όταν ο ήλιος ανέβηκε ψηλότερα",
      "η ορχήστρα έπαιξε ένα παλιό τραγούδι και όλοι στην αίθουσα άρχισαν να τραγουδούν",
      "τα φρέσκα μήλα και τα αχλάδια ήταν φτηνά στον πάγκο της αγοράς δίπλα στην εκκλησία",
      "το πείραμα απέτυχε δύο φορές πριν οι φοιτητές βρουν το κομμένο καλώδιο"),
    "ar" -> Seq(
      "هطل المطر طوال الليل وارتفع النهر فوق الجدار الحجري قبل الصباح",
      "قطعت الخبز ووضعت عليه الزبدة قبل أن تجهز القهوة",
      "يغادر القطار إلى الساحل مبكرا لذلك حزمنا الحقائب في المساء السابق",
      "أنهى التقرير متأخرا وأرسله إلى المكتب قبل وصول أي شخص",
      "نامت قطة رمادية على السطح الدافئ بينما حلقت السنونو فوق المدخنة",
      "سحب الصيادون شباكهم من الماء البارد عندما ارتفعت الشمس",
      "عزفت الفرقة أغنية قديمة وبدأ الجميع في القاعة بالغناء",
      "كان التفاح والكمثرى رخيصين في سوق قرب الكنيسة",
      "فشلت التجربة مرتين قبل أن يجد الطلاب السلك المقطوع"),
    "he" -> Seq(
      "הגשם ירד כל הלילה והנהר עלה מעל חומת האבן לפני הבוקר",
      "היא פרסה את הלחם ומרחה חמאה לפני שהקפה היה מוכן",
      "הרכבת לחוף יוצאת מוקדם ולכן ארזנו את המזוודות בערב הקודם",
      "הוא סיים את הדוח מאוחר ושלח אותו למשרד לפני שמישהו הגיע",
      "חתול אפור ישן על הגג החם בזמן שהסנוניות חגו מעל הארובה",
      "הדייגים משכו את הרשתות מהמים הקרים כשהשמש עלתה גבוה יותר",
      "התזמורת ניגנה שיר ישן וכולם באולם התחילו לשיר",
      "תפוחים ואגסים טריים היו זולים בדוכן השוק ליד הכנסייה",
      "הניסוי נכשל פעמיים לפני שהסטודנטים מצאו את החוט הקרוע"),
    "id" -> Seq(
      "hujan turun sepanjang malam dan sungai naik di atas tembok batu sebelum pagi",
      "dia memotong roti dan mengoleskan mentega sebelum kopi selesai diseduh",
      "kereta ke pantai berangkat pagi sekali jadi kami mengemas koper malam sebelumnya",
      "dia menyelesaikan laporan terlambat dan mengirimkannya ke kantor sebelum ada yang datang",
      "seekor kucing abu abu tidur di atap yang hangat sementara burung layang layang berputar di atas cerobong",
      "para nelayan menarik jala mereka dari air dingin ketika matahari naik lebih tinggi",
      "band itu memainkan lagu lama dan semua orang di aula mulai ikut bernyanyi",
      "apel dan pir segar murah di lapak pasar di samping gereja",
      "percobaan itu gagal dua kali sebelum para mahasiswa menemukan kabel yang putus"),
    "ca" -> Seq(
      "la pluja va caure tota la nit i el riu va pujar per sobre del mur de pedra abans del matí",
      "ella va tallar el pa i hi va untar mantega abans que el cafè estigués a punt",
      "el tren cap a la costa surt aviat així que vam fer les maletes el vespre abans",
      "va acabar l'informe tard i el va enviar al despatx abans que arribés ningú",
      "un gat gris dormia sobre la teulada calenta mentre les orenetes giraven sobre la xemeneia",
      "els pescadors van treure les xarxes de l'aigua freda quan el sol va pujar més amunt",
      "la banda va tocar una cançó vella i tothom a la sala va començar a cantar",
      "les pomes i les peres eren barates a la parada del mercat al costat de l'església",
      "l'experiment va fallar dues vegades abans que els estudiants trobessin el fil trencat"),
    "ro" -> Seq(
      "ploaia a căzut toată noaptea și râul a crescut peste zidul de piatră înainte de dimineață",
      "ea a tăiat pâinea și a întins unt înainte ca niște cafea să fie gata",
      "trenul spre coastă pleacă devreme așa că ne-am făcut bagajele cu o seară înainte",
      "a terminat raportul târziu și l-a trimis la birou înainte să ajungă cineva",
      "o pisică gri dormea pe acoperișul cald în timp ce rândunelele se roteau deasupra hornului",
      "pescarii și-au tras plasele din apa rece când soarele a urcat mai sus",
      "fanfara a cântat un cântec vechi și toți din sală au început să cânte",
      "merele și perele proaspete erau ieftine la taraba din piață de lângă biserică",
      "experimentul a eșuat de două ori înainte ca studenții să găsească firul rupt"),
    "zh" -> Seq(
      "大雨下了一整夜河水在早晨之前涨过了石墙",
      "她切好面包涂上黄油这时咖啡还没有煮好",
      "去海边的火车很早出发所以我们前一天晚上就收拾好了行李",
      "他很晚才写完报告在别人到达之前把它送到了办公室",
      "一只灰猫睡在温暖的屋顶上燕子在烟囱上空盘旋",
      "太阳升高的时候渔民们从冰冷的水里拉起了渔网",
      "乐队演奏了一首老歌大厅里的所有人都跟着唱了起来",
      "新鲜的苹果和梨在教堂旁边的市场摊位上很便宜",
      "学生们找到断了的电线之前实验失败了两次"),
    "ja" -> Seq(
      "雨が一晩中降り続き川は朝までに石垣を越えて増水した",
      "彼女はパンを切ってコーヒーができる前にバターを塗った",
      "海岸行きの列車は朝早く出るので前の晩に荷物をまとめた",
      "彼は報告書を遅くに書き終えて誰かが来る前に事務所へ送った",
      "灰色の猫が暖かい屋根の上で眠りツバメが煙突の上を旋回していた",
      "太陽が高く昇るころ漁師たちは冷たい水から網を引き上げた",
      "楽団が古い歌を演奏すると会場のみんなが歌い始めた",
      "新鮮なりんごと梨は教会のそばの市場の屋台で安かった",
      "学生たちが切れた電線を見つけるまで実験は二度失敗した"),
  )

  val rows: Seq[(Long, String, String)] =
    data.flatMap { case (code, sents) => sents.map(code -> _) }
      .zipWithIndex.map { case ((code, text), i) => (i.toLong + 1, code, text) }

  val codes: Seq[String] = data.map(_._1).sorted

  /** Bar: ≥95% over the full fixture (related-language pairs may confuse). */
  val minCorrect: Long = math.ceil(rows.size * 0.95).toLong
}

object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def r(d: DataFrame) = new TypedResolver(d.schema, "doc_id")

  private val LangMarkers = Seq("en" -> "the", "es" -> "data", "zh" -> "spark")

  /** Shared oracle CTEs for the component entries: the ngram-Jaccard pair
    * graph at `minJ` (same shingle/df-cap construction as `ngram_jaccard`),
    * both directions, plus a recursive transitive closure assigning each
    * node the minimum reachable id. Must be spliced after WITH RECURSIVE. */
  private def componentCte(minJ: String): String =
    s"""toks AS (SELECT doc_id, lang, string_split(text,' ') AS t FROM documents),
       |sh AS (SELECT DISTINCT doc_id, lang, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
       |       FROM toks, unnest(range(1, len(t)-1)) AS u(i) WHERE len(t) >= 3),
       |rare AS (SELECT s FROM (SELECT s, count(*) AS c FROM sh GROUP BY s) WHERE c <= 40),
       |shc AS (SELECT sh.* FROM sh JOIN rare USING (s)),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |           FROM shc a JOIN shc b ON a.s = b.s AND a.lang = b.lang
       |             AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2),
       |p AS (SELECT id_a, id_b
       |      FROM common
       |      JOIN sizes sa ON sa.doc_id = id_a
       |      JOIN sizes sb ON sb.doc_id = id_b
       |      WHERE round(inter::DOUBLE / (sa.n + sb.n - inter), 6) >= $minJ),
       |e AS (SELECT id_a AS u, id_b AS v FROM p
       |      UNION SELECT id_b, id_a FROM p),
       |reach(id, node) AS (
       |  SELECT u, u FROM e
       |  UNION
       |  SELECT r.id, e.v FROM reach r JOIN e ON r.node = e.u),
       |comp AS (SELECT id, min(node) AS component FROM reach GROUP BY id)""".stripMargin

  /** Shared oracle CTEs for the duplicate-passage entries: positional
    * 8-gram shingles, cross-doc (distinct-doc frequency ≥ 2) window marks,
    * and consecutive-run span merge — the SQL mirror of
    * [[graft.pipeline.Dedup.duplicatePassages]] over shingle strings
    * (the engine's xxhash64 values stand in for the strings — exact up to
    * 64-bit hash collisions, the same guarantee the minhash/simhash
    * operators state for their hash families). */
  private val DupPassageCte: String =
    """t AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
      |g AS (SELECT doc_id, i - 1 AS pos,
      |    l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4]||' '||
      |    l[i+5]||' '||l[i+6]||' '||l[i+7] AS s
      |  FROM t, unnest(range(1, len(l)-6)) AS u(i) WHERE len(l) >= 8),
      |x AS (SELECT s FROM (SELECT s, count(DISTINCT doc_id) AS d
      |                     FROM g GROUP BY s) WHERE d >= 2),
      |h AS (SELECT doc_id, pos FROM g WHERE s IN (SELECT s FROM x)),
      |b AS (SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) = pos - 1
      |         THEN 0 ELSE 1 END AS brk FROM h),
      |rn AS (SELECT doc_id, pos,
      |    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM b),
      |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 8 AS e
      |       FROM rn GROUP BY doc_id, grp)""".stripMargin

  /** Shared oracle CTEs for the repetition-signal entries: per-doc word
    * 1/2/3-grams (indexed-lambda construction), occurrence counts, and the
    * duplicate/top fractions per n — the SQL mirror of
    * [[graft.functions.TextKernels.repetitionStats]]. */
  private val RepetitionStatsCte: String =
    """t AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
      |gr AS (SELECT doc_id, l AS g1,
      |  list_transform(l[1:len(l)-1], (x,i) -> x || ' ' || l[i+1]) AS g2,
      |  list_transform(l[1:len(l)-2], (x,i) -> x || ' ' || l[i+1] || ' ' || l[i+2]) AS g3
      |  FROM t),
      |u AS (SELECT doc_id, 1 AS n, unnest(g1) AS gram FROM gr
      |  UNION ALL SELECT doc_id, 2, unnest(g2) FROM gr
      |  UNION ALL SELECT doc_id, 3, unnest(g3) FROM gr),
      |c AS (SELECT doc_id, n, gram, count(*) AS cnt FROM u GROUP BY 1, 2, 3),
      |s AS (SELECT doc_id, n,
      |  round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE / sum(cnt), 6) AS dup_frac,
      |  round(max(cnt)::DOUBLE / sum(cnt), 6) AS top_frac
      |  FROM c GROUP BY 1, 2)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "match_text" -> ((s, dir) => {
      val d = docs(s, dir)
      Reads.scrollById(d, "doc_id",
        Some(Filter.mustAll(MatchText("text", "spark window"))), r(d),
        offsetId = None, limit = 100, projection = Seq("doc_id", "lang"))
    }),
    "match_text_any" -> ((s, dir) => {
      val d = docs(s, dir)
      Reads.scrollById(d, "doc_id",
        Some(Filter.mustAll(MatchTextAny("text", "vector hash"))), r(d),
        offsetId = None, limit = 100, projection = Seq("doc_id", "lang"))
    }),
    "match_phrase" -> ((s, dir) => {
      val d = docs(s, dir)
      Reads.scrollById(d, "doc_id",
        Some(Filter.mustAll(MatchPhrase("text", "batch stream"))), r(d),
        offsetId = None, limit = 100, projection = Seq("doc_id", "lang"))
    }),
    // Phrase matching over the ANALYZED token stream (multilingual tokenize
    // → custom stopwords → per-language Snowball stem): forward phrases
    // match consecutively in the post-stopword position space, reversed
    // phrases must not. See PhraseFixture scaladoc for the oracle design.
    "match_phrase_analyzed" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      import PhraseFixture._
      val d = docs(s, dir).filter(col("doc_id") < 200)
      val t = MultilangFixture.sentences.foldLeft(
        lit(MultilangFixture.sentences("en"))) { case (acc, (code, sent)) =>
          when(col("lang") === code, lit(sent)).otherwise(acc)
        }
      def flag(phrases: Map[String, String]): org.apache.spark.sql.Column =
        phrases.foldLeft(lit(0)) { case (acc, (code, p)) =>
          val filtered = dropStopwords(tokensMultilingual(t), stopwords)
          // no stemmer for zh — identity, like the reference's None default
          val analyzed =
            if (graft.functions.Snowball.supported(langNames(code)))
              stemTokensLang(filtered, langNames(code))
            else filtered
          when(col("lang") === code,
            graft.functions.TextKernels.containsTokenSeqCol(
              analyzed, analyzePhrase(code, p)).cast("int")).otherwise(acc)
        }
      d.select(col("doc_id"), col("lang"),
          flag(phrasesFwd).as("m_fwd"), flag(phrasesRev).as("m_rev"))
        .orderBy(col("doc_id").asc)
        .limit(100)
    }),
    // Match::Text/TextAny/Phrase THROUGH a declared text-index analyzer
    // (word tokenizer + lowercase + folding + stopwords + English stemmer):
    // the queries only match via the analyzer — the raw whitespace-token
    // path matches none of them. See TextMatchFixture for the oracle design.
    "match_text_analyzed" -> ((s, dir) => {
      import TextMatchFixture._
      val src = docs(s, dir).select(col("doc_id"),
        element_at(typedLit(sentences),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int")).as("t"))
      val fc = new graft.filters.FilterCompiler(
        new TypedResolver(src.schema, "doc_id"),
        textIndexes = Map("t" -> cfg))
      src.select(col("doc_id"),
          fc.condition(MatchText("t", textQuery)).cast("int").as("m_text"),
          fc.condition(MatchTextAny("t", anyQuery)).cast("int").as("m_any"),
          fc.condition(MatchPhrase("t", phraseQuery)).cast("int").as("m_phrase"),
          fc.condition(MatchText("t", cafeQuery)).cast("int").as("m_cafe"))
        .orderBy(col("doc_id").asc)
    }),
    // Custom-stopword case handling (the reference's issue #8724
    // regression, `tests/openapi/test_stopwords.py`): with
    // `lowercase: false` the custom stopword set is stored VERBATIM and
    // token matching is case-sensitive — "lazy" is not a stopword even
    // though "LAZY" is; with `lowercase: true` the set folds to lowercase
    // at build (`StopwordsFilter::add_stopword`). A stopword-only query
    // matches NOTHING (`TokenSet::has_subset` is false on empty).
    "match_text_stopwords_case" -> ((s, dir) => {
      import s.implicits._
      import graft.api.RequestCodec
      val src = Seq(
        (1L, "The quick brown fox jumps over the lazy dog"),
        (2L, "THE LAZY DOG SLEEPS ALL DAY"),
        (3L, "a dog barks on Lazy afternoons")).toDF("doc_id", "t")
      val (_, _, csCfg, _) = RequestCodec.parseFieldIndexRequest(
        """{"field_name": "t", "field_schema": {
          |  "type": "text", "tokenizer": "word", "lowercase": false,
          |  "stopwords": {"custom": ["the", "The", "LAZY"]}}}""".stripMargin)
      val (_, _, ciCfg, _) = RequestCodec.parseFieldIndexRequest(
        """{"field_name": "t", "field_schema": {
          |  "type": "text", "tokenizer": "word", "lowercase": true,
          |  "stopwords": {"custom": ["LAZY"]}}}""".stripMargin)
      def ids(cfg: graft.model.TextIndexConfig, q: String): String = {
        val fc = new graft.filters.FilterCompiler(
          new TypedResolver(src.schema, "doc_id"),
          textIndexes = Map("t" -> cfg))
        src.filter(fc.condition(MatchText("t", q)))
          .collect().map(_.getLong(0)).sorted.mkString(",")
      }
      Seq(
        ("cs_lazy", ids(csCfg.get, "lazy")),
        ("cs_The_stopword", ids(csCfg.get, "The")),
        ("cs_LAZY_stopword", ids(csCfg.get, "LAZY")),
        ("cs_Lazy_verbatim", ids(csCfg.get, "Lazy")),
        ("ci_LAZY_folded_stopword", ids(ciCfg.get, "LAZY")),
        ("ci_dog", ids(ciCfg.get, "dog")))
        .toDF("arm", "ids")
    }),
    // UNINDEXED full-text semantics (`payload_storage/condition_checker
    // .rs:174-193`): on a field WITHOUT a declared text index the
    // reference does NOT tokenize — Match::Text and Match::Phrase are one
    // raw `stored.contains(text)` substring test (mid-word hits match:
    // "batch" hits "rebatched", phrase "batch stream" hits "rebatch
    // streamer"), Match::TextAny is any-whitespace-token-is-a-substring,
    // an empty Text query matches every string value, and non-string
    // values never match. The contrast arms run the SAME queries through
    // a DECLARED word-tokenizer index (token-boundary semantics) and a
    // phrase query against an index without `phrase_matching` (matches
    // NOTHING — no stored positions, `on_disk_inverted_index/mod.rs:601`).
    "match_text_unindexed_substring" -> ((s, dir) => {
      import s.implicits._
      import graft.api.RequestCodec
      val src = Seq(
        (1L, "rebatched jobs", 10L),
        (2L, "batch stream processing", 20L),
        (3L, "rebatch streamer node", 30L),
        (4L, "stream batch reversed", 40L),
        (5L, "unrelated text", 50L)).toDF("doc_id", "t", "n")
      val wordCfg = RequestCodec.parseFieldIndexRequest(
        """{"field_name": "t",
          |  "field_schema": {"type": "text", "tokenizer": "word"}}""".stripMargin)._3.get
      val posCfg = RequestCodec.parseFieldIndexRequest(
        """{"field_name": "t",
          |  "field_schema": {"type": "text", "tokenizer": "word",
          |    "phrase_matching": true}}""".stripMargin)._3.get
      def ids(c: Condition,
          idx: Map[String, graft.model.TextIndexConfig] = Map.empty): String = {
        val fc = new graft.filters.FilterCompiler(
          new TypedResolver(src.schema, "doc_id"), textIndexes = idx)
        src.filter(fc.condition(c))
          .collect().map(_.getLong(0)).sorted.mkString(",")
      }
      Seq(
        ("text_midword", ids(MatchText("t", "batch"))),
        ("text_whole_query", ids(MatchText("t", "batch stream"))),
        ("text_empty_query", ids(MatchText("t", ""))),
        ("textany_midword", ids(MatchTextAny("t", "batch xyzzy"))),
        ("phrase_midword", ids(MatchPhrase("t", "batch stream"))),
        ("text_nonstring_field", ids(MatchText("n", "2"))),
        ("idx_text_token_boundary",
          ids(MatchText("t", "batch"), Map("t" -> wordCfg))),
        ("idx_phrase_no_positions",
          ids(MatchPhrase("t", "batch stream"), Map("t" -> wordCfg))),
        ("idx_phrase_with_positions",
          ids(MatchPhrase("t", "batch stream"), Map("t" -> posCfg))))
        .toDF("arm", "ids")
    }),
    // PREFIX tokenizer (`Tokenizer::Prefix`, `tokenizers/mod.rs:57-140`;
    // `test_fts.py::test_scroll_with_prefix`): documents index edge
    // n-grams of each processed word (bounded by min/max_token_len; a word
    // SHORTER than min still indexes itself), queries tokenize to ONE
    // max-truncated token per word with stopwords skipped and sub-min
    // words dropped. Plus the word tokenizer's token-length range: an
    // over-max query token doesn't exist in the index, so the match finds
    // nothing rather than falling back to a raw comparison.
    "match_text_prefix_tokenizer" -> ((s, dir) => {
      import s.implicits._
      import graft.api.RequestCodec
      val src = Seq(
        (1L, "Robocop saves the day"),
        (2L, "robotic arm"),
        (3L, "ROBOT uprising"),
        (4L, "car chase"),
        (5L, "internationalization effort")).toDF("doc_id", "t")
      def cfgOf(body: String) =
        RequestCodec.parseFieldIndexRequest(body)._3.get
      val pDefault = cfgOf(
        """{"field_name": "t",
          |  "field_schema": {"type": "text", "tokenizer": "prefix"}}""".stripMargin)
      val pMinMax = cfgOf(
        """{"field_name": "t",
          |  "field_schema": {"type": "text", "tokenizer": "prefix",
          |    "min_token_len": 3, "max_token_len": 5}}""".stripMargin)
      val wordMax = cfgOf(
        """{"field_name": "t",
          |  "field_schema": {"type": "text", "tokenizer": "word",
          |    "max_token_len": 10}}""".stripMargin)
      def ids(cfg: graft.model.TextIndexConfig, q: String): String = {
        val fc = new graft.filters.FilterCompiler(
          new TypedResolver(src.schema, "doc_id"),
          textIndexes = Map("t" -> cfg))
        src.filter(fc.condition(MatchText("t", q)))
          .collect().map(_.getLong(0)).sorted.mkString(",")
      }
      Seq(
        ("prefix_ROBO", ids(pDefault, "ROBO")),
        ("prefix_full_short_word", ids(pDefault, "car")),
        ("prefix_the", ids(pDefault, "the")),
        ("prefix_minmax_truncated_query", ids(pMinMax, "internatio")),
        ("prefix_minmax_below_min", ids(pMinMax, "io")),
        ("word_over_max_token", ids(wordMax, "internationalization")),
        ("word_within_max", ids(wordMax, "effort")))
        .toDF("arm", "ids")
    }),
    // Field-index creation through the WIRE (`PUT /collections/{c}/index`
    // with full text params — tokenizer, lowercase, folding, custom
    // stopwords, snowball stemmer): the parsed config drives the SAME
    // analyzer-aware Match path as `match_text_analyzed` (same oracle).
    "api_create_field_index" -> ((s, dir) => {
      import TextMatchFixture._
      val (field, dt, textCfg, _) = graft.api.RequestCodec.parseFieldIndexRequest(
        """{
          |  "field_name": "t",
          |  "field_schema": {
          |    "type": "text", "tokenizer": "word", "lowercase": true,
          |    "ascii_folding": true, "phrase_matching": true,
          |    "stopwords": {"custom": ["the", "and", "of", "are"]},
          |    "stemmer": {"type": "snowball", "language": "english"}
          |  }
          |}""".stripMargin)
      require(field == "t" && dt == org.apache.spark.sql.types.StringType)
      require(textCfg.get.copy(stopwords = textCfg.get.stopwords.sorted) ==
        cfg.copy(stopwords = cfg.stopwords.sorted),
        s"wire text params diverge from the fixture config: $textCfg")
      val src = docs(s, dir).select(col("doc_id"),
        element_at(typedLit(sentences),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int")).as("t"))
      val fc = new graft.filters.FilterCompiler(
        new TypedResolver(src.schema, "doc_id"),
        textIndexes = Map(field -> textCfg.get))
      src.select(col("doc_id"),
          fc.condition(MatchText("t", textQuery)).cast("int").as("m_text"),
          fc.condition(MatchTextAny("t", anyQuery)).cast("int").as("m_any"),
          fc.condition(MatchPhrase("t", phraseQuery)).cast("int").as("m_phrase"),
          fc.condition(MatchText("t", cafeQuery)).cast("int").as("m_cafe"))
        .orderBy(col("doc_id").asc)
    }),
    // analyzer pipeline (tokenize → stopwords) feeding a term-frequency
    // aggregation; stemming/folding are property-tested in AnalyzerSpec
    "analyzed_term_facet" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(graft.functions.TextFunctions.analyze(col("text"),
          word = false, stopwords = Seq("the", "a", "of", "and"))).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term").asc)
        .limit(10)),
    // Multilingual analyzer end-to-end over a genuinely multilingual
    // fixture: per-row-language text (German/Spanish/French/Chinese/
    // English), multilingual tokenizer (unicode word runs + CJK unigrams +
    // lowercase + drops non-alphabetic tokens), per-language NLTK stopword
    // sets applied via a broadcast anti-join. Stemming is excluded here so
    // DuckDB can reproduce the pipeline exactly; Snowball stemming is
    // verified against independent oracle vectors in AnalyzerSpec.
    "analyzed_multilang_facet" -> ((s, dir) => {
      import graft.functions.{Stopwords, TextFunctions}
      val d = docs(s, dir).filter(col("doc_id") < 200)
      val t = MultilangFixture.sentences.foldLeft(
        lit(MultilangFixture.sentences("en"))) { case (acc, (code, sent)) =>
          when(col("lang") === code, lit(sent)).otherwise(acc)
        }
      val toks = d.select(col("lang"),
        explode(TextFunctions.tokensMultilingual(t)).as("term"))
      val swPairs = MultilangFixture.stopwordPairs
      val swDf = s.createDataFrame(swPairs).toDF("sw_lang", "sw_word")
      toks.join(broadcast(swDf),
          toks("lang") === swDf("sw_lang") && toks("term") === swDf("sw_word"),
          "left_anti")
        .groupBy(col("term"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term").asc)
        .limit(30)
    }),
    "token_count" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .orderBy(col("doc_id"))),
    "quality_features" -> ((s, dir) =>
      TextAnalysis.withQualityFeatures(docs(s, dir), "text")
        .select("doc_id", "n_tokens", "stop_ratio", "avg_token_len")
        .orderBy(col("doc_id"))),
    // Gopher-style repetition signals (Rae et al. 2021 §A1.1 at word
    // granularity): duplicate/top n-gram fractions for n=1..3, one codegen'd
    // pass per row, shuffle-free at any corpus size.
    "repetition_signals" -> ((s, dir) =>
      TextAnalysis.withRepetitionSignals(docs(s, dir), "text")
        .select("doc_id", "dup_word_frac", "top_word_frac",
          "dup_2gram_frac", "top_2gram_frac", "dup_3gram_frac", "top_3gram_frac")
        .orderBy(col("doc_id"))),
    "quality_filter_gopher" -> ((s, dir) =>
      TextAnalysis.withGopherKeep(docs(s, dir), "text")
        .select("doc_id", "keep")
        .orderBy(col("doc_id"))),
    "lang_id" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          TextAnalysis.langIdPredict(col("text"), LangMarkers).as("predicted"))
        .orderBy(col("doc_id"))),
    "fingerprint_md5" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))),
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir), "doc_id", "text")),
    "dedup_keep_first" -> ((s, dir) =>
      Dedup.exactKeepFirst(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),
    // skew cap ON (maxDf): hot stopword-like shingles are dropped before the
    // pair join — the plan shape that survives 100 TB (df² join rows per hot
    // shingle otherwise). The oracle applies the identical df cap.
    "ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", k = 3,
          blockCol = Some("lang"), maxDf = Some(40))
        .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
        .limit(20)),
    // Pairs → clusters: distributed connected components (alternating
    // large-star/small-star) over the n-gram similarity graph, oracled by a
    // DuckDB recursive-CTE transitive closure. At sf0.01 the graph has
    // multi-node components with chains — non-trivial merge structure.
    "neardup_components" -> ((s, dir) =>
      Dedup.connectedComponents(
          Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", k = 3,
            blockCol = Some("lang"), maxDf = Some(40), minJaccard = 0.02))
        .orderBy(col("id"))),
    // Benchmark decontamination: eval set = exact-dup keepers (guaranteed
    // 8-gram overlap with their surviving copies) + a deterministic slice;
    // every remaining training doc gets a contaminated flag. Broadcast
    // semi-join on the eval shingle-hash set — the 100 TB shape.
    "decontaminate" -> ((s, dir) => {
      val d = docs(s, dir)
      val groups = d.groupBy(md5(col("text")).as("_fp"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("_c"))
      val evalIds = groups.filter(col("_c") > 1).select("doc_id")
        .union(d.filter(col("doc_id") % 11 === 0).select("doc_id"))
        .distinct()
      val evalDocs = d.join(evalIds, "doc_id")
      val trainDocs = d.join(evalIds, Seq("doc_id"), "left_anti")
      Dedup.decontaminate(trainDocs, "doc_id", "text", evalDocs, "text", k = 8)
        .select(col("doc_id"), col("contaminated"))
        .orderBy(col("doc_id"))
    }),
    // Span-level dedup (ExactSubstr family, Lee et al. 2022 re-shaped for
    // Spark): maximal token spans whose every 8-gram occurs in >= 2 distinct
    // docs. Positional k-gram hashes + distinct-doc frequency + per-doc run
    // merge — no doc x doc join anywhere, so corpus-wide boilerplate costs
    // O(occurrences) not O(df^2). The oracle replays the identical pipeline
    // on the shingle STRINGS (the engine's 64-bit hashes stand in for them,
    // exact up to xxhash64 collisions — negligible but nonzero at corpus
    // scale, like the other hash-family operators).
    "duplicate_passages" -> ((s, dir) =>
      Dedup.duplicatePassages(docs(s, dir), "doc_id", "text", k = 8)),
    // Scoring form: per-doc duplicated-token budget with overlapping spans
    // union-merged (windows at p and p+2 share tokens; counting both would
    // overstate dup_frac).
    "dup_passage_stats" -> ((s, dir) =>
      Dedup.duplicatePassageStats(docs(s, dir), "doc_id", "text", k = 8)),
    // Shard packing: documents → fixed-token-budget training shards via a
    // two-pass distributed prefix sum (one range shuffle + O(partitions)
    // driver offsets) — NOT the single-task global window the naive SQL
    // formulation implies. The oracle IS that naive window (fine at oracle
    // scale); PipelineSpec asserts the Spark plan contains no Window and
    // that the result is partition-count-invariant.
    "pack_shards" -> ((s, dir) =>
      Sharding.packShards(
        docs(s, dir).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 4096)
        .orderBy(col("doc_id"))),
    // PII scrubbing with PLANTED deterministic PII: both engines append the
    // same synthetic email + phone to every doc (a pure function of doc_id),
    // then redact and count — row-level parity on counts, redacted length,
    // and the md5 of the redacted text. Patterns are RE2-safe (no
    // lookaround), so Java regex and DuckDB RE2 agree exactly.
    "pii_redact" -> ((s, dir) => {
      val planted = docs(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" Contact: user"),
          col("doc_id").cast("string"), lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
          .as("text"))
      TextAnalysis.redactPii(planted, "text")
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          md5(col("text_redacted")).as("red_fp"),
          length(col("text_redacted")).cast("long").as("red_len"))
        .orderBy(col("doc_id"))
    }),
    // Sequence chunking: documents → overlapping 64-token context windows
    // every 48 tokens (the step before pack_shards in shard assembly).
    // Narrow per-row explode, no shuffle; tail windows may be short.
    "chunk_sequences" -> ((s, dir) =>
      Sharding.chunkSequences(docs(s, dir), "doc_id", "text",
        chunkTokens = 64, stride = 48)
        .orderBy(col("doc_id"), col("chunk_idx"))),
    // Deterministic mixture re-weighting: keep 100% en, 60% de/fr, 35%
    // es/zh, decided by a content hash of (lang, id) — reproducible
    // row-for-row in the oracle, monotone in the rate (raising a group's
    // weight only ADDS documents between training runs).
    "mixture_sample" -> ((s, dir) =>
      Sharding.mixtureSample(docs(s, dir).select("doc_id", "lang"),
        "doc_id", "lang",
        Map("en" -> 1.0, "de" -> 0.6, "fr" -> 0.6,
          "es" -> 0.35, "zh" -> 0.35))
        .orderBy(col("doc_id"))),
    // Capstone: the whole training-data preprocessing funnel as ONE
    // declarative plan — raw corpus → near-dup clustering (keep-first per
    // component) → Gopher quality gate → per-language funnel stats. The
    // oracle recomputes every stage relationally (recursive-CTE closure +
    // n-gram repetition CTEs + the same gate bounds).
    "scenario_training_pipeline" -> ((s, dir) => {
      val d = docs(s, dir)
      val pairs = Dedup.ngramJaccardPairs(d, "doc_id", "text", k = 3,
        blockCol = Some("lang"), maxDf = Some(40), minJaccard = 0.02)
      val surv = Dedup.nearDupRepresentatives(d, "doc_id", pairs)
        .filter(col("keep") === 1).drop("keep", "component")
      val gated = TextAnalysis.withGopherKeep(surv, "text")
        .filter(col("keep") === 1)
      val aggRaw = d.groupBy("lang").agg(count(lit(1)).as("n_raw"))
      val aggDedup = surv.groupBy("lang").agg(count(lit(1)).as("n_dedup"))
      val aggQ = gated.groupBy("lang").agg(count(lit(1)).as("n_quality"),
        sum(col("n_tokens")).as("sum_tokens"))
      aggRaw.join(aggDedup, "lang").join(aggQ, "lang")
        .withColumn("avg_tokens",
          round(col("sum_tokens").cast("double") / col("n_quality"), 6))
        .orderBy(col("lang"))
    }),
    // Scenario: the shard-assembly chain end-to-end — chunk documents into
    // context windows, drop short tails, reweight languages by the
    // deterministic mixture predicate, pack into ~2048-token shards, and
    // report per-shard stats. The oracle recomputes the whole chain
    // relationally (lateral-unnest chunking + md5 predicate + global
    // window prefix sum — the naive form of what packShards distributes).
    "scenario_shard_assembly" -> ((s, dir) => {
      val d = docs(s, dir)
      val chunks = Sharding.chunkSequences(d, "doc_id", "text",
          chunkTokens = 64, stride = 48)
        .filter(col("n_chunk_tokens") >= 16)
        .withColumn("chunk_id", col("doc_id") * 1000 + col("chunk_idx"))
      val withLang = chunks.join(d.select("doc_id", "lang"), "doc_id")
      val mixed = Sharding.mixtureSample(withLang, "chunk_id", "lang",
        Map("en" -> 1.0), defaultRate = 0.5)
      Sharding.packShards(
          mixed.select("chunk_id", "doc_id", "n_chunk_tokens"),
          "chunk_id", "n_chunk_tokens", budget = 2048)
        .groupBy("shard_id").agg(
          count(lit(1)).as("n_chunks"),
          sum("n_chunk_tokens").as("sum_tokens"),
          countDistinct("doc_id").as("n_docs"))
        .orderBy(col("shard_id"))
    }),
    // Clusters → survivors: keep-first per component, singletons keep
    // themselves — `filter(keep = 1)` IS the deduplicated corpus.
    "dedup_representatives" -> ((s, dir) =>
      Dedup.nearDupRepresentatives(docs(s, dir), "doc_id",
          Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", k = 3,
            blockCol = Some("lang"), maxDf = Some(40), minJaccard = 0.02))
        .select(col("doc_id"), col("component"), col("keep"))
        .orderBy(col("doc_id"))),
    // Blocked by IVF cell — the 100 TB path: pairs only form within a
    // centroid cell (quadratic only in the cell, linear overall), never the
    // all-pairs cartesian. Centroids are deterministic Forgy picks (the 4
    // lowest vec_ids, 0 Lloyd iterations) so the DuckDB oracle reproduces
    // the exact same assignment with an argmin-L2 over the same 4 vectors.
    "embedding_neardup" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") < 4).orderBy(col("vec_id"))
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      val assigned = graft.index.IvfIndex.assign(e, "embedding",
        graft.index.IvfIndex.Model(cents))
      Dedup.embeddingNearDupPairs(assigned, "vec_id", "embedding", 0.4,
        blockCol = Some("centroid_id"))
    }),
    // SemDeDup-shaped semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    // efficient learning at web-scale through semantic deduplication"):
    // cluster-blocked cosine pairs -> connected components -> one survivor
    // (min id) per semantic group. Same deterministic 4-centroid blocking
    // as `embedding_neardup`, so the DuckDB oracle replays the WHOLE funnel
    // — assignment, pairs, recursive-CTE closure, survivor pick — in SQL.
    "semantic_dedup" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") < 4).orderBy(col("vec_id"))
        .select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toSeq).toSeq
      val assigned = graft.index.IvfIndex.assign(e, "embedding",
        graft.index.IvfIndex.Model(cents))
      val pairs = Dedup.embeddingNearDupPairs(assigned, "vec_id", "embedding",
        0.4, blockCol = Some("centroid_id"))
      Dedup.nearDupRepresentatives(e.select("vec_id"), "vec_id", pairs)
        .orderBy(col("vec_id"))
    }),
    // Auto-sized IVF blocking contract (the engine-default 100 TB path):
    // cell count is DERIVED from the data (k = max(4, ceil(N/cellSize)),
    // the SCALEPROBE_r05 scale law), not hand-picked. Planted duplicates
    // (scaled copies, cosine ~= 1.0 — scaling preserves cosine) must
    // co-locate in a cell and be recovered by the blocked join: >= 95%
    // planted recall. Thresholded at 0.99 the exact pair set IS the
    // planted set (max non-planted cosine in this table is ~0.51), so
    // the recall denominator is exact.
    "embedding_neardup_auto" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val copies = e.select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
      val planted = e.unionByName(copies)
      val pairs = Dedup.embeddingNearDupAuto(planted, "vec_id", "embedding",
        threshold = 0.99, targetCellSize = 64,
        cachePath = Some("/tmp/graft_runtime/neardup_cents_planted64_" +
          dir.replaceAll("[^A-Za-z0-9]", "_"))).persist()
      try {
        val nPairs = pairs.count()
        val canonical = pairs.filter(col("id_a") >= col("id_b")).count() == 0
        val distinctOk =
          pairs.select("id_a", "id_b").distinct().count() == nPairs
        val found = pairs.filter(col("id_b") === col("id_a") + 1000000L).count()
        val total = e.count()
        import s.implicits._
        Seq((canonical, distinctOk, found >= math.ceil(total * 0.95).toLong))
          .toDF("canonical_ok", "distinct_ok", "planted_recall_ok")
      } finally { pairs.unpersist(); () }
    }),
    // MinHash-LSH derived contract (hash family not SQL-expressible; the
    // oracle asserts this one-row contract): pairs are canonical
    // (id_a < id_b) and distinct, and on the bounded doc_id<1000 subset the
    // banded index recovers >= 80% of the exact n-gram-Jaccard >= 0.6 pairs
    // (16 bands x 4 rows: P(miss | J=0.6) = (1-0.6^4)^16 ~= 0.1; the hash
    // family is seeded/deterministic so the observed recall is stable).
    "minhash_lsh" -> ((s, dir) => {
      // pair sets are small (thousands) but their generating joins are not —
      // persist so the contract's multiple actions run the join once
      val lsh = Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        k = 3, bands = 16, rowsPerBand = 4, threshold = 0.05).persist()
      // bounded recall corpus (fixed id range — constant cost at any SF);
      // the default df cap applies, so "exact" = the capped-exact pair set
      // the ngram_jaccard entry itself defines (LSH is uncapped, so the cap
      // can only remove required pairs, never excuse a MinHash miss)
      val sub = docs(s, dir).filter(col("doc_id") < 1000)
      val exact = Dedup.ngramJaccardPairs(sub, "doc_id", "text", k = 3)
        .filter(col("jaccard") >= 0.6).persist()
      try {
        val nPairs = lsh.count()
        val canonical = lsh.filter(col("id_a") >= col("id_b")).count() == 0
        val distinctOk =
          lsh.select("id_a", "id_b").distinct().count() == nPairs
        val found = exact.join(
          lsh.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_semi").count()
        val total = exact.count()
        import s.implicits._
        Seq((canonical, distinctOk, found >= math.ceil(total * 0.8).toLong))
          .toDF("canonical_ok", "distinct_ok", "recall_ok")
      } finally { lsh.unpersist(); exact.unpersist(); () }
    }),
    // SimHash derived contract: returned pairs are canonical, distinct, and
    // within the hamming budget; and on the bounded doc_id<300 subset the
    // 4x16-bit band join is COMPLETE for hamming <= 3 (pigeonhole: 4 bands,
    // <= 3 differing bits => some band is equal) — every exact <= 3 pair is
    // returned. The catalog runs the sound default radius 3 (the only
    // regime that is both complete and sub-quadratic at scale —
    // SCALEPROBE_r05); larger radii remain an explicit opt-in on the
    // operator and log a warning.
    "simhash_pairs" -> ((s, dir) => {
      val pairs = Dedup.simhashPairs(docs(s, dir), "doc_id", "text",
        maxHamming = 3).persist()
      try {
        val nPairs = pairs.count()
        val canonical = pairs.filter(col("id_a") >= col("id_b")).count() == 0
        val distinctOk =
          pairs.select("id_a", "id_b").distinct().count() == nPairs
        val withinOk = pairs.filter(col("hamming") > 3).count() == 0
        import graft.functions.{TextFunctions, TextKernels}
        val fp = docs(s, dir).filter(col("doc_id") < 300)
          .select(col("doc_id"),
            TextKernels.simhash64Col(TextFunctions.tokensWs(col("text"))).as("fp"))
        val exact3 = fp.as("x").join(fp.as("y"),
            col("x.doc_id") < col("y.doc_id") &&
              TextFunctions.hamming64(col("x.fp"), col("y.fp")) <= 3)
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        val missed = exact3.join(
          pairs.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti").count()
        import s.implicits._
        Seq((canonical, distinctOk, withinOk, missed == 0L))
          .toDF("canonical_ok", "distinct_ok", "within_ok", "complete3_ok")
      } finally { pairs.unpersist(); () }
    }),
    // Multimodal end-to-end with a REAL decoder: synthetic 8×8 24bpp BMPs
    // (closed-form pixel formula per media_id) → binary column →
    // partition-local BMP parse + pixel-stat featurize → cosine top-k. The
    // DuckDB oracle computes the same pixel statistics from the formula
    // directly (no BMP parsing) — any encode/decode/featurize defect breaks
    // the score parity. Codec roundtrip is additionally tested in
    // PipelineSpec on random images.
    "multimodal_embed_knn" -> ((s, dir) => {
      import graft.pipeline.Multimodal
      val media = Multimodal.syntheticBmp(
        docs(s, dir).filter(col("doc_id") < 500), "doc_id")
      val embedded = Multimodal.featurize(media, "media_id", "bytes",
        new Multimodal.BmpStatsDecoder)
      // featurize ONLY the one query row (not a second full-scan job)
      val q = Multimodal.featurize(
          Multimodal.syntheticBmp(docs(s, dir).filter(col("doc_id") === 0L), "doc_id"),
          "media_id", "bytes", new Multimodal.BmpStatsDecoder)
        .head().getSeq[Float](1).map(_.toDouble)
      graft.ops.Search.knn(embedded, "media_id", "embedding", q,
        Cosine, k = 10)
    }),
    // The decoded pixel statistics themselves, row-per-media — the direct
    // correctness check on the BMP parse (features are exact integers).
    "multimodal_decode_stats" -> ((s, dir) => {
      import graft.pipeline.Multimodal
      val media = Multimodal.syntheticBmp(
        docs(s, dir).filter(col("doc_id") < 500), "doc_id")
      val feat = Multimodal.featurize(media, "media_id", "bytes",
        new Multimodal.BmpStatsDecoder)
      feat.select(col("media_id") +:
          (0 until 7).map(i => col("embedding")(i).cast("long").as(s"f$i")): _*)
        .orderBy(col("media_id"))
    }),
    // Realistic language-ID: Cavnar-Trenkle char-trigram profiles (built
    // from the public per-language stopword lists) + CJK script detection,
    // over the per-language fixture sentences. The oracle asserts 100%
    // accuracy on the fixture (predicted = lang for every row).
    "lang_id_trigram" -> ((s, dir) => {
      val d = docs(s, dir).filter(col("doc_id") < 200)
      val t = MultilangFixture.sentences.foldLeft(
        lit(MultilangFixture.sentences("en"))) { case (acc, (code, sent)) =>
          when(col("lang") === code, lit(sent)).otherwise(acc)
        }
      d.select(col("doc_id"), col("lang"),
          graft.pipeline.LangId.langIdTrigram(t,
            Seq("en", "de", "es", "fr", "zh")).as("predicted"))
        .orderBy(col("doc_id"))
    }),
    // Open-text holdout for the trigram classifier: 22 languages / 8
    // scripts of authored prose OUTSIDE the profile source (profiles come
    // from stopword lists; these sentences are dominated by content words).
    // The oracle pins predicted = true language for every row — a 100%
    // holdout bar over the full 22-way label space.
    "lang_id_holdout" -> ((s, dir) => {
      import s.implicits._
      LangIdHoldoutFixture.rows.toDF("row_id", "lang", "text")
        .select(col("row_id"), col("lang"),
          graft.pipeline.LangId.langIdTrigram(col("text"),
            LangIdHoldoutFixture.codes).as("predicted"))
        .orderBy(col("row_id"))
    }),
    // Wide holdout: 22 languages × 9 domain-varied authored sentences
    // (198 rows) with a stated ≥95% accuracy bar instead of a 100% pin —
    // related-language pairs (da/no/sv, es/ca/pt) are legitimately
    // confusable at sentence length, so a 100% pin would either be
    // fragile or force cherry-picked sentences. The oracle asserts the
    // row count, the full 22-language coverage, and the bar.
    "lang_id_holdout_wide" -> ((s, dir) => {
      import s.implicits._
      val scored = LangIdWideFixture.rows.toDF("row_id", "lang", "text")
        .select(col("lang"),
          graft.pipeline.LangId.langIdTrigram(col("text"),
            LangIdWideFixture.codes).as("predicted"))
      val agg = scored.agg(
        count(lit(1)).as("n"),
        countDistinct(col("lang")).as("langs"),
        sum(when(col("predicted") === col("lang"), 1L).otherwise(0L)).as("ok"))
        .head()
      Seq((agg.getLong(0), agg.getLong(1),
          agg.getLong(2) >= LangIdWideFixture.minCorrect))
        .toDF("n_rows", "languages", "accuracy_ok")
    }),
  )

  val oracles: Map[String, String] = Map(
    "match_text" ->
      """SELECT doc_id, lang FROM documents
        |WHERE contains(text, 'spark window')
        |ORDER BY doc_id ASC LIMIT 100""".stripMargin,
    "match_text_any" ->
      """SELECT doc_id, lang FROM documents
        |WHERE contains(text, 'vector') OR contains(text, 'hash')
        |ORDER BY doc_id ASC LIMIT 100""".stripMargin,
    "match_phrase" ->
      """SELECT doc_id, lang FROM documents
        |WHERE contains(text, 'batch stream')
        |ORDER BY doc_id ASC LIMIT 100""".stripMargin,
    "analyzed_term_facet" ->
      """SELECT term, count(*)::BIGINT AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |WHERE term NOT IN ('the', 'a', 'of', 'and')
        |GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 10""".stripMargin,
    "analyzed_multilang_facet" -> MultilangFixture.oracleSql,
    "match_phrase_analyzed" -> PhraseFixture.oracleSql,
    "match_text_analyzed" -> TextMatchFixture.oracleSql,
    "match_text_prefix_tokenizer" ->
      """SELECT * FROM (VALUES
        |  ('prefix_ROBO', '1,2,3'),
        |  ('prefix_full_short_word', '4'),
        |  ('prefix_the', '1'),
        |  ('prefix_minmax_truncated_query', '5'),
        |  ('prefix_minmax_below_min', ''),
        |  ('word_over_max_token', ''),
        |  ('word_within_max', '5'))
        |AS t(arm, ids)""".stripMargin,
    // Every arm DuckDB can recompute is recomputed over the same inline
    // rows (substring arms via contains(), the declared-index contrast
    // arms via the token/adjacency form the analyzer reduces to on this
    // lowercase single-space fixture); only the two semantic-constant
    // arms (non-string never matches, phrase-without-positions matches
    // nothing) are literals.
    "match_text_unindexed_substring" ->
      """WITH src AS (SELECT * FROM (VALUES
        |    (1, 'rebatched jobs'),
        |    (2, 'batch stream processing'),
        |    (3, 'rebatch streamer node'),
        |    (4, 'stream batch reversed'),
        |    (5, 'unrelated text')) AS v(doc_id, txt))
        |SELECT 'text_midword' AS arm, coalesce(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
        |    FILTER (WHERE contains(txt, 'batch')), '') AS ids FROM src
        |UNION ALL SELECT 'text_whole_query', coalesce(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
        |    FILTER (WHERE contains(txt, 'batch stream')), '') FROM src
        |UNION ALL SELECT 'text_empty_query', coalesce(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
        |    FILTER (WHERE contains(txt, '')), '') FROM src
        |UNION ALL SELECT 'textany_midword', coalesce(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
        |    FILTER (WHERE contains(txt, 'batch') OR contains(txt, 'xyzzy')), '') FROM src
        |UNION ALL SELECT 'phrase_midword', coalesce(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
        |    FILTER (WHERE contains(txt, 'batch stream')), '') FROM src
        |UNION ALL SELECT 'text_nonstring_field', ''
        |UNION ALL SELECT 'idx_text_token_boundary', coalesce(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
        |    FILTER (WHERE list_contains(string_split(txt, ' '), 'batch')), '') FROM src
        |UNION ALL SELECT 'idx_phrase_no_positions', ''
        |UNION ALL SELECT 'idx_phrase_with_positions', coalesce(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
        |    FILTER (WHERE contains(' ' || txt || ' ', ' batch stream ')), '') FROM src""".stripMargin,
    "match_text_stopwords_case" ->
      """SELECT * FROM (VALUES
        |  ('cs_lazy', '1'),
        |  ('cs_The_stopword', ''),
        |  ('cs_LAZY_stopword', ''),
        |  ('cs_Lazy_verbatim', '3'),
        |  ('ci_LAZY_folded_stopword', ''),
        |  ('ci_dog', '1,2,3'))
        |AS t(arm, ids)""".stripMargin,
    "api_create_field_index" -> TextMatchFixture.oracleSql,
    "token_count" ->
      """SELECT doc_id, len(string_split(text,' '))::BIGINT AS n_tokens
        |FROM documents ORDER BY doc_id ASC""".stripMargin,
    "quality_features" ->
      """SELECT doc_id,
        |  len(t)::BIGINT AS n_tokens,
        |  round(len(list_filter(t, x -> x IN ('the','a')))::DOUBLE / len(t), 6) AS stop_ratio,
        |  round((length(text) - (len(t)-1))::DOUBLE / len(t), 6) AS avg_token_len
        |FROM (SELECT doc_id, text, string_split(text,' ') AS t FROM documents)
        |ORDER BY doc_id ASC""".stripMargin,
    "neardup_components" ->
      s"""WITH RECURSIVE ${componentCte("0.02")}
         |SELECT id, component FROM comp ORDER BY id ASC""".stripMargin,
    "decontaminate" ->
      """WITH keepers AS (SELECT min(doc_id) AS doc_id FROM documents
        |  GROUP BY md5(text) HAVING count(*) > 1),
        |ev AS (SELECT doc_id FROM keepers
        |  UNION SELECT doc_id FROM documents WHERE doc_id % 11 = 0),
        |t AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4]||' '||
        |    l[i+5]||' '||l[i+6]||' '||l[i+7] AS s
        |  FROM t, unnest(range(1, len(l)-6)) AS u(i) WHERE len(l) >= 8),
        |evalsh AS (SELECT DISTINCT s FROM sh
        |  WHERE doc_id IN (SELECT doc_id FROM ev)),
        |cont AS (SELECT DISTINCT doc_id FROM sh
        |  WHERE doc_id NOT IN (SELECT doc_id FROM ev)
        |    AND s IN (SELECT s FROM evalsh))
        |SELECT d.doc_id,
        |  (CASE WHEN d.doc_id IN (SELECT doc_id FROM cont)
        |        THEN 1 ELSE 0 END)::INT AS contaminated
        |FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM ev)
        |ORDER BY d.doc_id ASC""".stripMargin,
    "duplicate_passages" ->
      s"""WITH $DupPassageCte
         |SELECT doc_id, s::BIGINT AS start_pos, e::BIGINT AS end_pos,
         |       (e - s)::BIGINT AS n_tokens
         |FROM sp ORDER BY doc_id ASC, start_pos ASC""".stripMargin,
    "dup_passage_stats" ->
      s"""WITH $DupPassageCte,
         |nb AS (SELECT doc_id, s, e,
         |    CASE WHEN s >= coalesce(max(e) OVER (PARTITION BY doc_id
         |      ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |      THEN 1 ELSE 0 END AS newblk FROM sp),
         |blk AS (SELECT doc_id, s, e,
         |    sum(newblk) OVER (PARTITION BY doc_id ORDER BY s) AS blk FROM nb),
         |cov AS (SELECT doc_id, sum(mx - mn) AS dup_tokens FROM
         |    (SELECT doc_id, blk, min(s) AS mn, max(e) AS mx
         |     FROM blk GROUP BY doc_id, blk) GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(c.dup_tokens, 0)::BIGINT AS dup_tokens,
         |  len(string_split(d.text,' '))::BIGINT AS n_tokens,
         |  round(coalesce(c.dup_tokens, 0)::DOUBLE
         |    / len(string_split(d.text,' ')), 6) AS dup_frac
         |FROM documents d LEFT JOIN cov c USING (doc_id)
         |ORDER BY d.doc_id ASC""".stripMargin,
    "pack_shards" ->
      """SELECT doc_id, n_tokens,
        |  coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |    // 4096 AS shard_id
        |FROM (SELECT doc_id, len(string_split(text,' '))::BIGINT AS n_tokens
        |      FROM documents)
        |ORDER BY doc_id ASC""".stripMargin,
    "scenario_shard_assembly" ->
      """WITH ch AS (SELECT doc_id, i AS chunk_idx,
        |    len(l[i*48+1 : i*48+64])::BIGINT AS n_chunk_tokens
        |  FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        |    unnest(range(0, (len(l)-1) // 48 + 1)) AS u(i)
        |  WHERE len(l[i*48+1 : i*48+64]) >= 16),
        |ck AS (SELECT doc_id, doc_id*1000 + chunk_idx AS chunk_id,
        |    n_chunk_tokens FROM ch),
        |wl AS (SELECT ck.*, d.lang FROM ck JOIN documents d USING (doc_id)),
        |mx AS (SELECT * FROM wl
        |  WHERE '0' || substr(md5(lang || ':' || chunk_id::VARCHAR), 1, 4) <
        |    CASE lang WHEN 'en' THEN '10000' ELSE '08000' END),
        |pk AS (SELECT doc_id, chunk_id, n_chunk_tokens,
        |    coalesce(sum(n_chunk_tokens) OVER (ORDER BY chunk_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
        |      // 2048 AS shard_id
        |  FROM mx)
        |SELECT shard_id, count(*)::BIGINT AS n_chunks,
        |  sum(n_chunk_tokens)::BIGINT AS sum_tokens,
        |  count(DISTINCT doc_id)::BIGINT AS n_docs
        |FROM pk GROUP BY shard_id ORDER BY shard_id ASC""".stripMargin,
    "pii_redact" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' Contact: user' || doc_id::VARCHAR || '@example.com or +1-555-'
        |    || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS text FROM documents),
        |r AS (SELECT doc_id,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(text, '\+\d{1,2}-\d{3}-\d{4}'))::BIGINT AS n_phones,
        |  regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+\d{1,2}-\d{3}-\d{4}', '<PHONE>', 'g') AS red FROM t)
        |SELECT doc_id, n_emails, n_phones, md5(red) AS red_fp,
        |  length(red)::BIGINT AS red_len
        |FROM r ORDER BY doc_id ASC""".stripMargin,
    "chunk_sequences" ->
      """SELECT doc_id, i AS chunk_idx,
        |  len(l[i*48+1 : i*48+64])::BIGINT AS n_chunk_tokens,
        |  array_to_string(l[i*48+1 : i*48+64], ' ') AS chunk_text
        |FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents),
        |  unnest(range(0, (len(l)-1) // 48 + 1)) AS u(i)
        |ORDER BY doc_id ASC, chunk_idx ASC""".stripMargin,
    "mixture_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE '0' || substr(md5(lang || ':' || doc_id::VARCHAR), 1, 4) <
        |  CASE lang WHEN 'en' THEN '10000' WHEN 'de' THEN '0999a'
        |            WHEN 'fr' THEN '0999a' WHEN 'es' THEN '0599a'
        |            WHEN 'zh' THEN '0599a' ELSE '00000' END
        |ORDER BY doc_id ASC""".stripMargin,
    "scenario_training_pipeline" ->
      s"""WITH RECURSIVE ${componentCte("0.02")},
         |t2 AS (SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
         |gr AS (SELECT doc_id, l AS g1,
         |  list_transform(l[1:len(l)-1], (x,i) -> x || ' ' || l[i+1]) AS g2,
         |  list_transform(l[1:len(l)-2], (x,i) -> x || ' ' || l[i+1] || ' ' || l[i+2]) AS g3
         |  FROM t2),
         |un AS (SELECT doc_id, 1 AS n, unnest(g1) AS gram FROM gr
         |  UNION ALL SELECT doc_id, 2, unnest(g2) FROM gr
         |  UNION ALL SELECT doc_id, 3, unnest(g3) FROM gr),
         |cn AS (SELECT doc_id, n, gram, count(*) AS cnt FROM un GROUP BY 1, 2, 3),
         |st AS (SELECT doc_id, n,
         |  round(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::DOUBLE / sum(cnt), 6) AS dup_frac,
         |  round(max(cnt)::DOUBLE / sum(cnt), 6) AS top_frac
         |  FROM cn GROUP BY 1, 2),
         |rep AS (SELECT t2.doc_id, len(l)::BIGINT AS n_tokens,
         |  round((length(text) - (len(l)-1))::DOUBLE / len(l), 6) AS avg_token_len,
         |  coalesce(max(CASE WHEN n=1 THEN top_frac END),0) AS top_word_frac,
         |  coalesce(max(CASE WHEN n=2 THEN dup_frac END),0) AS dup_2gram_frac,
         |  coalesce(max(CASE WHEN n=3 THEN dup_frac END),0) AS dup_3gram_frac
         |  FROM t2 LEFT JOIN st ON t2.doc_id = st.doc_id
         |  GROUP BY t2.doc_id, len(l), text),
         |survivors AS (SELECT d.doc_id, d.lang
         |  FROM documents d LEFT JOIN comp cp ON cp.id = d.doc_id
         |  WHERE coalesce(cp.component, d.doc_id) = d.doc_id),
         |kept AS (SELECT sv.doc_id, sv.lang, r.n_tokens
         |  FROM survivors sv JOIN rep r USING (doc_id)
         |  WHERE r.n_tokens BETWEEN 30 AND 100000
         |    AND r.avg_token_len BETWEEN 3.0 AND 10.0
         |    AND r.top_word_frac <= 0.12 AND r.dup_2gram_frac <= 0.09
         |    AND r.dup_3gram_frac <= 0.05),
         |agg_raw AS (SELECT lang, count(*)::BIGINT AS n_raw FROM documents GROUP BY lang),
         |agg_dedup AS (SELECT lang, count(*)::BIGINT AS n_dedup FROM survivors GROUP BY lang),
         |agg_q AS (SELECT lang, count(*)::BIGINT AS n_quality,
         |  sum(n_tokens)::BIGINT AS sum_tokens FROM kept GROUP BY lang)
         |SELECT r.lang, n_raw, n_dedup, n_quality, sum_tokens,
         |  round(sum_tokens::DOUBLE / n_quality, 6) AS avg_tokens
         |FROM agg_raw r JOIN agg_dedup USING (lang) JOIN agg_q USING (lang)
         |ORDER BY r.lang ASC""".stripMargin,
    "dedup_representatives" ->
      s"""WITH RECURSIVE ${componentCte("0.02")}
         |SELECT d.doc_id,
         |  coalesce(c.component, d.doc_id) AS component,
         |  (CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id
         |        THEN 1 ELSE 0 END)::INT AS keep
         |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
         |ORDER BY d.doc_id ASC""".stripMargin,
    "repetition_signals" ->
      s"""WITH $RepetitionStatsCte
         |SELECT t.doc_id,
         |  coalesce(max(CASE WHEN n=1 THEN dup_frac END),0) AS dup_word_frac,
         |  coalesce(max(CASE WHEN n=1 THEN top_frac END),0) AS top_word_frac,
         |  coalesce(max(CASE WHEN n=2 THEN dup_frac END),0) AS dup_2gram_frac,
         |  coalesce(max(CASE WHEN n=2 THEN top_frac END),0) AS top_2gram_frac,
         |  coalesce(max(CASE WHEN n=3 THEN dup_frac END),0) AS dup_3gram_frac,
         |  coalesce(max(CASE WHEN n=3 THEN top_frac END),0) AS top_3gram_frac
         |FROM t LEFT JOIN s ON t.doc_id = s.doc_id
         |GROUP BY t.doc_id ORDER BY t.doc_id ASC""".stripMargin,
    "quality_filter_gopher" ->
      s"""WITH $RepetitionStatsCte,
         |rep AS (
         |  SELECT t.doc_id,
         |    len(l)::BIGINT AS n_tokens,
         |    round((length(text) - (len(l)-1))::DOUBLE / len(l), 6) AS avg_token_len,
         |    coalesce(max(CASE WHEN n=1 THEN top_frac END),0) AS top_word_frac,
         |    coalesce(max(CASE WHEN n=2 THEN dup_frac END),0) AS dup_2gram_frac,
         |    coalesce(max(CASE WHEN n=3 THEN dup_frac END),0) AS dup_3gram_frac
         |  FROM t LEFT JOIN s ON t.doc_id = s.doc_id
         |  GROUP BY t.doc_id, len(l), text)
         |SELECT doc_id,
         |  (CASE WHEN n_tokens BETWEEN 30 AND 100000
         |        AND avg_token_len BETWEEN 3.0 AND 10.0
         |        AND top_word_frac <= 0.12
         |        AND dup_2gram_frac <= 0.09
         |        AND dup_3gram_frac <= 0.05 THEN 1 ELSE 0 END)::INT AS keep
         |FROM rep ORDER BY doc_id ASC""".stripMargin,
    "lang_id" ->
      """WITH c AS (SELECT doc_id,
        |  len(list_filter(string_split(text,' '), x -> x = 'the')) AS c_en,
        |  len(list_filter(string_split(text,' '), x -> x = 'data')) AS c_es,
        |  len(list_filter(string_split(text,' '), x -> x = 'spark')) AS c_zh
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN c_en >= c_es AND c_en >= c_zh THEN 'en'
        |       WHEN c_es >= c_zh THEN 'es' ELSE 'zh' END AS predicted
        |FROM c ORDER BY doc_id ASC""".stripMargin,
    "fingerprint_md5" ->
      "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id ASC",
    "dedup_exact" ->
      """SELECT md5(text) AS fp, count(*)::BIGINT AS cnt, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY fp ASC""".stripMargin,
    "dedup_keep_first" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY doc_id ASC""".stripMargin,
    "ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id, lang, string_split(text,' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, lang, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        |       FROM toks, unnest(range(1, len(t)-1)) AS u(i) WHERE len(t) >= 3),
        |rare AS (SELECT s FROM (SELECT s, count(*) AS c FROM sh GROUP BY s) WHERE c <= 40),
        |shc AS (SELECT sh.* FROM sh JOIN rare USING (s)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |           FROM shc a JOIN shc b ON a.s = b.s AND a.lang = b.lang
        |             AND a.doc_id < b.doc_id
        |           GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(inter::DOUBLE / (sa.n + sb.n - inter), 6) AS jaccard
        |FROM common
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |ORDER BY jaccard DESC, id_a ASC, id_b ASC LIMIT 20""".stripMargin,
    // derived contract (k-means assignment not SQL-expressible): the
    // engine asserts canonicality, distinctness, and >= 95% planted recall
    "embedding_neardup_auto" ->
      """SELECT true AS canonical_ok, true AS distinct_ok,
        |       true AS planted_recall_ok""".stripMargin,
    "semantic_dedup" ->
      """WITH RECURSIVE
        |cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |          FROM embeddings WHERE vec_id < 4),
        |dist AS (SELECT e.vec_id, c.cid,
        |           list_sum(list_transform(range(1, len(e.embedding)+1),
        |             i -> (e.embedding[i]::DOUBLE - c.cv[i])
        |                * (e.embedding[i]::DOUBLE - c.cv[i]))) AS d
        |         FROM embeddings e, cents c),
        |cell AS (SELECT vec_id, cid FROM (
        |           SELECT vec_id, cid,
        |             row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
        |           FROM dist) WHERE rn = 1),
        |p AS (SELECT id_a, id_b FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        |      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
        |         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS score
        |  FROM embeddings a
        |  JOIN embeddings b ON a.vec_id < b.vec_id
        |  JOIN cell ca ON ca.vec_id = a.vec_id
        |  JOIN cell cb ON cb.vec_id = b.vec_id AND ca.cid = cb.cid)
        |  WHERE score >= 0.4),
        |e AS (SELECT id_a AS u, id_b AS v FROM p
        |      UNION SELECT id_b, id_a FROM p),
        |reach(id, node) AS (
        |  SELECT u, u FROM e
        |  UNION
        |  SELECT r.id, e.v FROM reach r JOIN e ON r.node = e.u),
        |comp AS (SELECT id, min(node) AS component FROM reach GROUP BY id)
        |SELECT v.vec_id,
        |  coalesce(c.component, v.vec_id)::BIGINT AS component,
        |  (CASE WHEN coalesce(c.component, v.vec_id) = v.vec_id
        |        THEN 1 ELSE 0 END)::INT AS keep
        |FROM embeddings v LEFT JOIN comp c ON c.id = v.vec_id
        |ORDER BY v.vec_id ASC""".stripMargin,
    "embedding_neardup" ->
      """WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |               FROM embeddings WHERE vec_id < 4),
        |dist AS (SELECT e.vec_id, c.cid,
        |           list_sum(list_transform(range(1, len(e.embedding)+1),
        |             i -> (e.embedding[i]::DOUBLE - c.cv[i])
        |                * (e.embedding[i]::DOUBLE - c.cv[i]))) AS d
        |         FROM embeddings e, cents c),
        |cell AS (SELECT vec_id, cid FROM (
        |           SELECT vec_id, cid,
        |             row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
        |           FROM dist) WHERE rn = 1)
        |SELECT id_a, id_b, score FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        |      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
        |         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS score
        |  FROM embeddings a
        |  JOIN embeddings b ON a.vec_id < b.vec_id
        |  JOIN cell ca ON ca.vec_id = a.vec_id
        |  JOIN cell cb ON cb.vec_id = b.vec_id AND ca.cid = cb.cid)
        |WHERE score >= 0.4 ORDER BY id_a ASC, id_b ASC""".stripMargin,
    // BMP pixel-stat features from the closed-form generator formula —
    // the oracle never parses BMP; it recomputes what a correct
    // encode→decode→featurize pipeline must produce. Quadrants in top-down
    // coords: q = 2·[y≥4] + [x≥4] on the 8×8 fixture.
    "multimodal_decode_stats" ->
      """SELECT d.doc_id AS media_id,
        |  sum((d.doc_id*7  + g.x*3 + g.y*5) % 256)::BIGINT AS f0,
        |  sum((d.doc_id*11 + g.x   + g.y*2) % 256)::BIGINT AS f1,
        |  sum((d.doc_id*13 + g.x*4 + g.y  ) % 256)::BIGINT AS f2,
        |  sum(CASE WHEN g.y < 4 AND g.x < 4 THEN
        |    (d.doc_id*7+g.x*3+g.y*5)%256 + (d.doc_id*11+g.x+g.y*2)%256
        |      + (d.doc_id*13+g.x*4+g.y)%256 ELSE 0 END)::BIGINT AS f3,
        |  sum(CASE WHEN g.y < 4 AND g.x >= 4 THEN
        |    (d.doc_id*7+g.x*3+g.y*5)%256 + (d.doc_id*11+g.x+g.y*2)%256
        |      + (d.doc_id*13+g.x*4+g.y)%256 ELSE 0 END)::BIGINT AS f4,
        |  sum(CASE WHEN g.y >= 4 AND g.x < 4 THEN
        |    (d.doc_id*7+g.x*3+g.y*5)%256 + (d.doc_id*11+g.x+g.y*2)%256
        |      + (d.doc_id*13+g.x*4+g.y)%256 ELSE 0 END)::BIGINT AS f5,
        |  sum(CASE WHEN g.y >= 4 AND g.x >= 4 THEN
        |    (d.doc_id*7+g.x*3+g.y*5)%256 + (d.doc_id*11+g.x+g.y*2)%256
        |      + (d.doc_id*13+g.x*4+g.y)%256 ELSE 0 END)::BIGINT AS f6
        |FROM documents d
        |CROSS JOIN (SELECT tx.range AS x, ty.range AS y
        |            FROM range(0,8) tx CROSS JOIN range(0,8) ty) g
        |WHERE d.doc_id < 500
        |GROUP BY d.doc_id ORDER BY media_id ASC""".stripMargin,
    "multimodal_embed_knn" ->
      """WITH g AS (SELECT tx.range AS x, ty.range AS y
        |           FROM range(0,8) tx CROSS JOIN range(0,8) ty),
        |f AS (SELECT d.doc_id AS media_id, [
        |    sum((d.doc_id*7  + g.x*3 + g.y*5) % 256),
        |    sum((d.doc_id*11 + g.x   + g.y*2) % 256),
        |    sum((d.doc_id*13 + g.x*4 + g.y  ) % 256),
        |    sum(CASE WHEN g.y < 4 AND g.x < 4 THEN
        |      (d.doc_id*7+g.x*3+g.y*5)%256 + (d.doc_id*11+g.x+g.y*2)%256
        |        + (d.doc_id*13+g.x*4+g.y)%256 ELSE 0 END),
        |    sum(CASE WHEN g.y < 4 AND g.x >= 4 THEN
        |      (d.doc_id*7+g.x*3+g.y*5)%256 + (d.doc_id*11+g.x+g.y*2)%256
        |        + (d.doc_id*13+g.x*4+g.y)%256 ELSE 0 END),
        |    sum(CASE WHEN g.y >= 4 AND g.x < 4 THEN
        |      (d.doc_id*7+g.x*3+g.y*5)%256 + (d.doc_id*11+g.x+g.y*2)%256
        |        + (d.doc_id*13+g.x*4+g.y)%256 ELSE 0 END),
        |    sum(CASE WHEN g.y >= 4 AND g.x >= 4 THEN
        |      (d.doc_id*7+g.x*3+g.y*5)%256 + (d.doc_id*11+g.x+g.y*2)%256
        |        + (d.doc_id*13+g.x*4+g.y)%256 ELSE 0 END)]::DOUBLE[] AS v
        |  FROM documents d
        |  CROSS JOIN g WHERE d.doc_id < 500 GROUP BY d.doc_id),
        |q AS (SELECT v FROM f WHERE media_id = 0)
        |SELECT f.media_id AS media_id,
        |  round(list_dot_product(f.v, q.v)
        |    / (sqrt(list_dot_product(f.v, f.v)) * sqrt(list_dot_product(q.v, q.v))), 6) AS score
        |FROM f, q ORDER BY score DESC, media_id ASC LIMIT 10""".stripMargin,
    // trigram lang-id over the closed multilingual fixture: predicted must
    // equal the row language for every row (100% fixture accuracy)
    "lang_id_trigram" ->
      """SELECT doc_id, lang, lang AS predicted FROM documents
        |WHERE doc_id < 200 ORDER BY doc_id ASC""".stripMargin,
    "lang_id_holdout" -> LangIdHoldoutFixture.oracleSql,
    "lang_id_holdout_wide" ->
      """SELECT 198::BIGINT AS n_rows, 22::BIGINT AS languages,
        |       true AS accuracy_ok""".stripMargin,
    // minhash_lsh / simhash_pairs hash families are not expressible in
    // DuckDB — the entries emit one-row derived contracts the oracle asserts
    // (see their scaladoc); exactness additionally covered in PipelineSpec.
    "minhash_lsh" ->
      "SELECT true AS canonical_ok, true AS distinct_ok, true AS recall_ok",
    "simhash_pairs" ->
      "SELECT true AS canonical_ok, true AS distinct_ok, true AS within_ok, true AS complete3_ok",
  )
}
