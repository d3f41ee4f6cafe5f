package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.filters.PayloadSelect

/** Table tests for payload include/exclude selectors, mirroring the
  * reference's unit expectations (`lib/segment/src/types.rs:6043-6260`:
  * test_payload_selector_{include,array_include,no_implicit_array_include,
  * exclude,array_exclude}). Comparison is structural (Jackson tree
  * equality), so serialization details don't matter. */
class SelectorSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def sel(json: String, keys: Seq[String], include: Boolean): String =
    PayloadSelect.select(json, keys.map(PayloadSelect.parse).toArray, include)
  private def assertJson(got: String, expected: String): Unit =
    assert(mapper.readTree(got) == mapper.readTree(expected), s"got $got")

  private val nested =
    """{"a":1,"b":{"c":123,"e":{"f":[1,2,3],"g":7,"h":"text",
      |"i":[{"j":1,"k":2},{"j":3,"k":4}]}}}""".stripMargin.replace("\n", "")

  test("include root & nested keeps only matched subtrees") {
    assertJson(sel(nested, Seq("a", "b.e.f"), include = true),
      """{"a":1,"b":{"e":{"f":[1,2,3]}}}""")
  }

  test("include handles duplicate patterns") {
    val p = """{"a":1,"b":{"c":123,"f":[1,2,3,4,5]}}"""
    assertJson(sel(p, Seq("a", "a"), include = true), """{"a":1}""")
  }

  test("concrete array-index patterns are inert") {
    // traversal produces only wildcard items, so [0] never matches
    assertJson(sel("""{"a":1}""", Seq("b.f[0]"), include = true), "{}")
    val p = """{"b":{"c":123,"f":[1,2,3,4,5]}}"""
    assertJson(sel(p, Seq("b.f[0]"), include = false), p)
  }

  test("no implicit array traversal on include") {
    val p = """{"a":1,"b":{"c":[{"d":1,"e":2},{"d":3,"e":4}]}}"""
    // path stops at the array: whole array kept
    assertJson(sel(p, Seq("b.c"), include = true),
      """{"b":{"c":[{"d":1,"e":2},{"d":3,"e":4}]}}""")
    // explicit [] traverses into elements
    assertJson(sel(p, Seq("b.c[].d"), include = true),
      """{"b":{"c":[{"d":1},{"d":3}]}}""")
    // dotted path without [] shortcuts the traversal: empty array remains
    assertJson(sel(p, Seq("b.c.d"), include = true), """{"b":{"c":[]}}""")
  }

  test("exclude removes root and nested paths, keeps the rest") {
    assertJson(sel(nested, Seq("a", "b.e.f"), include = false),
      """{"b":{"c":123,"e":{"g":7,"h":"text",
        |"i":[{"j":1,"k":2},{"j":3,"k":4}]}}}""".stripMargin.replace("\n", ""))
  }

  test("exclude handles duplicate patterns") {
    val p = """{"a":1,"b":{"c":123,"f":[1,2,3,4,5]}}"""
    assertJson(sel(p, Seq("a", "a"), include = false),
      """{"b":{"c":123,"f":[1,2,3,4,5]}}""")
  }

  test("column expression applies selector inside a plan") {
    val spark = SparkTestBase.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, nested)).toDF("id", "payload")
      .withColumn("s", PayloadSelect.includeCol(col("payload"), Seq("b.e.g")))
    val out = df.select("s").head().getString(0)
    assertJson(out, """{"b":{"e":{"g":7}}}""")
  }
}
