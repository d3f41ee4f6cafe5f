package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.filters.TypedResolver
import graft.model._
import graft.ops.Reads

/** Count / facet / scroll query catalog (SURVEY.md §2.4) with DuckDB oracles. */
object ReadQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "count_filtered" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val f = Filter(
        must = Seq(
          RangeCond("l_quantity", gte = Some(5.0), lt = Some(30.0)),
          MatchAny("l_returnflag", Seq("A", "N"))),
        mustNot = Seq(MatchValue("l_linestatus", "F")))
      Reads.count(li, Some(f), new TypedResolver(li.schema, "l_orderkey"))
    }),
    "facet_lang" -> ((s, dir) => {
      val d = docs(s, dir)
      Reads.facet(d, "doc_id", "lang", None, new TypedResolver(d.schema, "doc_id"), limit = 10)
    }),
    "facet_source_filtered" -> ((s, dir) => {
      val d = docs(s, dir)
      val f = Filter(must = Seq(RangeCond("n_chars", gte = Some(150L), lte = Some(400L))))
      Reads.facet(d, "doc_id", "source", Some(f),
        new TypedResolver(d.schema, "doc_id"), limit = 5)
    }),
    "scroll_by_id" -> ((s, dir) => {
      val d = docs(s, dir)
      val f = Filter(must = Seq(MatchValue("lang", "en"), RangeCond("n_chars", lt = Some(300L))))
      Reads.scrollById(d, "doc_id", Some(f), new TypedResolver(d.schema, "doc_id"),
        offsetId = Some(100L), limit = 20,
        projection = Seq("doc_id", "lang", "n_chars"))
    }),
    "order_by_ts" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val f = Filter(must = Seq(MatchValue("event_type", "click")))
      Reads.scrollByField(ev, "event_id", "ts", asc = false, Some(f),
        new TypedResolver(ev.schema, "event_id"), startFrom = None, limit = 50,
        projection = Seq("event_id", "user_id", "value"))
    }),
    "min_should_filter" -> ((s, dir) => {
      val d = docs(s, dir)
      // at-least-2-of: lang in (en,de) / n_chars>=200 / source prefix 'src1'
      val f = Filter(
        minShould = Some(MinShould(Seq(
          MatchAny("lang", Seq("en", "de")),
          RangeCond("n_chars", gte = Some(200L)),
          MatchPrefix("source", "src1")), 2)))
      Reads.scrollById(d, "doc_id", Some(f), new TypedResolver(d.schema, "doc_id"),
        offsetId = None, limit = 100,
        projection = Seq("doc_id", "lang", "source", "n_chars"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "count_filtered" ->
      """SELECT count(*)::BIGINT AS cnt FROM lineitem
        |WHERE l_quantity >= 5.0 AND l_quantity < 30.0
        |  AND l_returnflag IN ('A','N') AND NOT l_linestatus = 'F'""".stripMargin,
    "facet_lang" ->
      """SELECT lang AS value, count(DISTINCT doc_id)::BIGINT AS cnt
        |FROM documents GROUP BY lang
        |ORDER BY cnt DESC, value ASC LIMIT 10""".stripMargin,
    "facet_source_filtered" ->
      """SELECT source AS value, count(DISTINCT doc_id)::BIGINT AS cnt
        |FROM documents WHERE n_chars >= 150 AND n_chars <= 400
        |GROUP BY source ORDER BY cnt DESC, value ASC LIMIT 5""".stripMargin,
    "scroll_by_id" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE lang = 'en' AND n_chars < 300 AND doc_id >= 100
        |ORDER BY doc_id ASC LIMIT 20""".stripMargin,
    "order_by_ts" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'click'
        |ORDER BY ts DESC, event_id ASC LIMIT 50""".stripMargin,
    "min_should_filter" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE (CASE WHEN lang IN ('en','de') THEN 1 ELSE 0 END
        |     + CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END
        |     + CASE WHEN starts_with(source, 'src1') THEN 1 ELSE 0 END) >= 2
        |ORDER BY doc_id ASC LIMIT 100""".stripMargin,
  )
}
