package graft

import org.apache.spark.sql.functions._

import graft.model._
import graft.ops.Search

/** Physical-plan shape assertions — the properties the 100 TB design relies
  * on (SURVEY.md §7, README scale notes). These catch regressions where a
  * change silently turns a pushed filter into a post-scan one, or a
  * partial top-k into a global sort.
  */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("single-query knn plans as TakeOrderedAndProject (partial top-k, no global sort)") {
    val p = plan(SparkEntry.queries("knn_dot")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(!p.contains("\nSort "), "knn must not globally sort:\n" + p.take(800))
  }

  test("typed filters push down to the parquet scan") {
    val d = Tables.load(spark, sf, "documents")
    val pred = new graft.filters.FilterCompiler(
      new graft.filters.TypedResolver(d.schema, "doc_id"))
      .compile(Filter.mustAll(MatchValue("lang", "en"),
        RangeCond("n_chars", lt = Some(300L))))
    val p = plan(d.filter(pred).select("doc_id"))
    // scalar equality/range conditions must reach PushedFilters
    assert(p.contains("PushedFilters: [") && p.contains("EqualTo(lang,en)"),
      "filter not pushed to scan:\n" + p)
    // and the projection must prune the scan schema (no text column read)
    assert(!p.contains("ReadSchema: struct<doc_id:bigint,text"),
      "column pruning failed:\n" + p)
  }

  test("batch knn broadcasts the query side") {
    val e = Tables.load(spark, sf, "embeddings")
    val qs = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val p = plan(Search.knnBatch(e, "vec_id", "embedding", qs, "qid", "qv", Dot, k = 3))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query side not broadcast:\n" + p.take(1200))
  }

  test("similarity scoring stays inside whole-stage codegen") {
    val e = Tables.load(spark, sf, "embeddings")
    val q = Tables.embeddingOf(spark, sf, 1L)
    val scored = e.select(Search.scoreExpr(Dot, col("embedding"), typedLit(q)).as("s"))
    // the "*(n)" operator prefix marks whole-stage-codegen membership
    assert(plan(scored).contains("*(1)"), plan(scored).take(300))
  }

  test("slice filter is a deterministic scan-stage predicate (no shuffle)") {
    val e = Tables.load(spark, sf, "embeddings")
    val pred = new graft.filters.FilterCompiler(
      new graft.filters.TypedResolver(e.schema, "vec_id"))
      .compile(Filter.mustAll(SliceCond(total = 4, index = 1)))
    val p = plan(e.filter(pred).select("vec_id"))
    assert(!p.contains("Exchange"), "slice filter must not shuffle:\n" + p.take(800))
  }
}
