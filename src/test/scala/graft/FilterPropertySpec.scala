package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.filters.{FilterCompiler, JsonResolver}
import graft.model._

/** Property-based filter-algebra fidelity (the reference's proptest
  * pattern, SURVEY.md §5.2): random boolean filter trees over a fixed
  * corpus with every payload shape (absent / JSON null / scalar / array /
  * empty array), evaluated by the compiled Catalyst predicate AND by an
  * independent driver-side reference evaluator; results must agree on
  * every row. */
class FilterPropertySpec extends SparkTestBase {

  // (id, city: String|Seq[String]|null|absent, price: Double|null|absent,
  //  bio: String|Seq[String]|null|absent)
  private val rows: Seq[(Long, Option[Any], Option[Any], Option[Any], Seq[(Double, String)])] = Seq(
    (1L, Some("Berlin"), Some(10.0), Some("the quick brown fox jumps"),
      Seq((1.0, "x"), (5.0, "y"))),
    (2L, Some(Seq("Berlin", "London")), Some(11.0), Some("quick brown the fox"),
      Seq((5.0, "x"))),
    (3L, Some(Seq("Berlin", "Moscow")), Some(9.5), Some(Seq("lazy dog", "quick fox")),
      Seq((2.0, "y"), (3.0, "y"))),
    (4L, Some(Seq("London", "Moscow")), Some(9.0), Some("brown dog sleeps"), Seq()),
    (5L, None, Some(0.0), None, Seq((9.0, "x"), (1.0, "z"))),
    (6L, None, None, Some(null), Seq()),
    (7L, Some(null), Some(null), Some("the the the"), Seq((4.0, "z"))),
    (8L, Some(Seq()), Some(25.0), Some(Seq()), Seq((5.0, "y"), (5.0, "x"))),
    (9L, Some("Paris"), None, Some("fox"), Seq()),
    (10L, Some(Seq("Rome")), Some(-3.5), Some(Seq("quick brown", "dog fox brown")),
      Seq((0.5, "x"))),
  )

  private def jsonOf(city: Option[Any], price: Option[Any], bio: Option[Any],
      items: Seq[(Double, String)]): String = {
    def v(a: Any): String = a match {
      case null => "null"
      case s: String => "\"" + s + "\""
      case d: Double => d.toString
      case xs: Seq[_] => xs.map(v).mkString("[", ",", "]")
    }
    val itemsJson =
      if (items.isEmpty) None
      else Some(items.map { case (q, t) => s"""{"q":$q,"tag":"$t"}""" }
        .mkString("[", ",", "]"))
    val parts = city.map(c => "\"city\":" + v(c)).toSeq ++
      price.map(p => "\"price\":" + v(p)).toSeq ++
      bio.map(b => "\"bio\":" + v(b)).toSeq ++
      itemsJson.map(ij => "\"items\":" + ij).toSeq
    parts.mkString("{", ",", "}")
  }

  private lazy val df: DataFrame = {
    import spark.implicits._
    rows.map { case (id, c, p, b, it) => (id, jsonOf(c, p, b, it)) }
      .toDF("id", "payload").cache()
  }

  private lazy val resolver = new JsonResolver(
    col("payload"),
    Map("city" -> StringType, "price" -> DoubleType, "bio" -> StringType,
      "items.q" -> DoubleType, "items.tag" -> StringType), col("id"))

  // ---- reference evaluator (independent of the Spark path) ----

  private def fieldOf(row: Row4, key: String): Option[Any] =
    key match {
      case "city" => row._2
      case "price" => row._3
      case "bio" => row._4
      case _ => None
    }

  private type Row4 = (Long, Option[Any], Option[Any], Option[Any], Seq[(Double, String)])

  private def valuesOf(row: Row4, key: String): Seq[Any] =
    fieldOf(row, key) match {
      case None => Nil
      case Some(null) => Nil
      case Some(xs: Seq[_]) => xs.filter(_ != null)
      case Some(x) => Seq(x)
    }

  private def isJsonNull(row: Row4, key: String): Boolean =
    fieldOf(row, key) match {
      case Some(null) => true
      case Some(xs: Seq[_]) => xs.contains(null)
      case _ => false
    }

  private def inRange(v: Double, gt: Option[Any], gte: Option[Any],
      lt: Option[Any], lte: Option[Any]): Boolean =
    gt.forall(b => v > b.asInstanceOf[Double]) &&
      gte.forall(b => v >= b.asInstanceOf[Double]) &&
      lt.forall(b => v < b.asInstanceOf[Double]) &&
      lte.forall(b => v <= b.asInstanceOf[Double])

  private def evalCond(row: Row4, c: Condition): Boolean =
    c match {
      case MatchValue(k, v) => valuesOf(row, k).contains(v)
      case MatchAny(k, vs) => valuesOf(row, k).exists(vs.contains)
      case MatchExcept(k, vs) => valuesOf(row, k).exists(v => !vs.contains(v))
      // unindexed full-text = raw substring semantics
      // (`condition_checker.rs:174-193`): Text/Phrase test the WHOLE
      // query text with contains, TextAny any whitespace query token
      case MatchText(k, text) =>
        valuesOf(row, k).exists(_.asInstanceOf[String].contains(text))
      case MatchTextAny(k, text) =>
        val qs = text.split("\\s+").filter(_.nonEmpty)
        valuesOf(row, k).exists { v =>
          val s = v.asInstanceOf[String]
          qs.exists(s.contains)
        }
      case MatchPhrase(k, text) =>
        valuesOf(row, k).exists(_.asInstanceOf[String].contains(text))
      case MatchPrefix(k, p) =>
        valuesOf(row, k).exists(_.asInstanceOf[String].startsWith(p))
      case RangeCond(k, gt, gte, lt, lte) =>
        valuesOf(row, k).exists(v => inRange(v.asInstanceOf[Double], gt, gte, lt, lte))
      case ValuesCount(k, gt, gte, lt, lte) =>
        val n = valuesOf(row, k).size.toLong
        gt.forall(n > _) && gte.forall(n >= _) && lt.forall(n < _) && lte.forall(n <= _)
      case IsEmpty(k) =>
        fieldOf(row, k).isEmpty ||
          (valuesOf(row, k).isEmpty && !isJsonNull(row, k))
      case IsNullCond(k) => isJsonNull(row, k)
      case HasId(ids) => ids.contains(row._1)
      case NestedCond("items", f) =>
        row._5.exists { case (q, tag) =>
          evalNestedFilter(q, tag, f)
        }
      case SubFilter(f) => evalFilter(row, f)
      case other => throw new IllegalArgumentException(other.toString)
    }

  private def evalNestedCond(q: Double, tag: String, c: Condition): Boolean = c match {
    case MatchValue("tag", v) => tag == v
    case RangeCond("q", gt, gte, lt, lte) => inRange(q, gt, gte, lt, lte)
    case other => throw new IllegalArgumentException("nested " + other)
  }

  private def evalNestedFilter(q: Double, tag: String, f: Filter): Boolean = {
    val mustOk = f.must.forall(evalNestedCond(q, tag, _))
    val shouldOk = f.should.isEmpty || f.should.exists(evalNestedCond(q, tag, _))
    mustOk && shouldOk
  }

  private def evalFilter(row: Row4, f: Filter): Boolean = {
    val mustOk = f.must.forall(evalCond(row, _))
    val shouldOk = f.should.isEmpty || f.should.exists(evalCond(row, _))
    val minOk = f.minShould.forall(ms =>
      ms.conditions.count(evalCond(row, _)) >= ms.minCount)
    val notOk = !f.mustNot.exists(evalCond(row, _))
    mustOk && shouldOk && minOk && notOk
  }

  // ---- generators ----

  private val genCity: Gen[String] =
    Gen.oneOf("Berlin", "London", "Moscow", "Paris", "Rome", "Nowhere")
  private val genBound: Gen[Option[Any]] =
    Gen.option(Gen.oneOf(-5.0, 0.0, 9.0, 9.5, 10.0, 11.0, 20.0).map(_.asInstanceOf[Any]))

  private val genLeaf: Gen[Condition] = Gen.oneOf[Gen[Condition]](
    genCity.map(MatchValue("city", _)),
    Gen.nonEmptyListOf(genCity).map(vs => MatchAny("city", vs.distinct)),
    Gen.nonEmptyListOf(genCity).map(vs => MatchExcept("city", vs.distinct)),
    Gen.oneOf("B", "Lo", "X", "Pa").map(MatchPrefix("city", _)),
    for (gt <- genBound; lt <- genBound) yield RangeCond("price", gt = gt, lt = lt),
    for (gte <- genBound; lte <- genBound) yield RangeCond("price", gte = gte, lte = lte),
    for (gte <- Gen.option(Gen.chooseNum(0L, 3L)); lt <- Gen.option(Gen.chooseNum(1L, 4L)))
      yield ValuesCount("city", gte = gte, lt = lt),
    Gen.oneOf("city", "price", "missing").map(IsEmpty(_)),
    Gen.oneOf("city", "price", "missing").map(IsNullCond(_)),
    Gen.someOf(1L to 10L).map(ids => HasId(ids.toSeq)),
    genPhraseText.map(MatchText("bio", _)),
    genPhraseText.map(MatchTextAny("bio", _)),
    genPhraseText.map(MatchPhrase("bio", _)),
    genNested,
  ).flatMap(identity)

  private lazy val genNested: Gen[Condition] = for {
    tag <- Gen.oneOf("x", "y", "z", "w")
    lo <- Gen.option(Gen.oneOf(0.0, 1.0, 4.0, 5.0).map(_.asInstanceOf[Any]))
    hi <- Gen.option(Gen.oneOf(2.0, 5.0, 8.0).map(_.asInstanceOf[Any]))
    useShould <- Gen.oneOf(true, false)
    conds = Seq(MatchValue("tag", tag), RangeCond("q", gte = lo, lt = hi))
  } yield NestedCond("items",
    if (useShould) Filter(should = conds) else Filter(must = conds))

  private lazy val genPhraseText: Gen[String] =
    Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("the", "quick", "brown", "fox", "dog", "zzz"))
        .map(_.mkString(" ")))

  private def genFilter(depth: Int): Gen[Filter] = {
    val cond: Gen[Condition] =
      if (depth <= 0) genLeaf
      else Gen.frequency(4 -> genLeaf, 1 -> genFilter(depth - 1).map(SubFilter(_)))
    for {
      must <- Gen.listOfN(2, cond).map(_.take(2))
      nMust <- Gen.chooseNum(0, 2)
      should <- Gen.listOfN(2, cond)
      nShould <- Gen.chooseNum(0, 2)
      mustNot <- Gen.listOfN(1, cond)
      nNot <- Gen.chooseNum(0, 1)
      minShould <- Gen.option(for {
        cs <- Gen.listOfN(3, cond)
        n <- Gen.chooseNum(1, 3)
      } yield MinShould(cs, n))
    } yield Filter(must.take(nMust), should.take(nShould), minShould, mustNot.take(nNot))
  }

  test("compiled filters agree with the reference evaluator on every row") {
    val compiler = new FilterCompiler(resolver)
    val gen = genFilter(2)
    // deterministic sampling: fixed seeds, so failures reproduce exactly
    val filters = (1 to 60).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(filters.size >= 55, "generator failed too often")
    for (f <- filters) {
      val got = df.filter(compiler.compile(f))
        .select("id").collect().map(_.getLong(0)).toSet
      val expect = rows.filter(evalFilter(_, f)).map(_._1).toSet
      assert(got == expect, s"\nfilter: $f\nspark: $got\nmodel: $expect")
    }
  }
}
