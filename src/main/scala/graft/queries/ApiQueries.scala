package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.api.RequestCodec
import graft.api.RequestCodec.{Ctx, VectorSpace}
import graft.filters.TypedResolver
import graft.model._
import graft.ops.{PointQuery, Reads}

/** Wire-format parity entries: each runs a literal qdrant REST JSON body
  * through `api/RequestCodec` → `PointQuery.execute` and must produce the
  * EXACT rows of the equivalent hand-built catalog entry — the DuckDB
  * oracles are the same SQL. This is the "switch engines without rewriting
  * requests" contract: the JSON below is what a qdrant client would send to
  * `POST /collections/{c}/points/query` (`src/actix/api/query_api.rs:31`).
  *
  * Query-vector ids in the requests resolve against the embeddings table
  * (`VectorInput::Id`, `lib/api/src/rest/schema.rs:563`; resolve step
  * `lib/collection/src/collection/query.rs:456-546`).
  */
object ApiQueries {

  private def ctx(s: SparkSession, dir: String): Ctx = Ctx(
    spaces = Map(
      "" -> VectorSpace("embedding", Dot),
      "cosine" -> VectorSpace("embedding", Cosine)),
    resolveId = id => Tables.embeddingOf(s, dir, id.asInstanceOf[Long]))

  private def runOnEmbeddings(s: SparkSession, dir: String, json: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    PointQuery.execute(s, e, "vec_id", new TypedResolver(e.schema, "vec_id"),
      RequestCodec.parseQueryRequest(json, ctx(s, dir)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // knn + filter + offset + threshold; nearest-by-id; must_not given as a
    // single object (MaybeOneOrMany). Mirrors `knn_filtered`.
    "api_query_knn_filtered" -> ((s, dir) => runOnEmbeddings(s, dir,
      """{
        |  "query": {"nearest": 7},
        |  "filter": {
        |    "must": [
        |      {"key": "label", "match": {"any": [1, 3, 5, 7]}},
        |      {"key": "vec_id", "range": {"gte": 10}}
        |    ],
        |    "must_not": {"key": "label", "match": {"value": 5}}
        |  },
        |  "limit": 10, "offset": 3, "score_threshold": -100.0
        |}""".stripMargin)),
    // recommend best_score with by-id positives/negatives. Mirrors
    // `recommend_best_score`.
    "api_query_recommend_best" -> ((s, dir) => runOnEmbeddings(s, dir,
      """{
        |  "query": {"recommend": {
        |    "positive": [1, 2, 3], "negative": [4], "strategy": "best_score"}},
        |  "limit": 10
        |}""".stripMargin)),
    // discover with target + context pairs by id. Mirrors `discover`.
    "api_query_discover" -> ((s, dir) => runOnEmbeddings(s, dir,
      """{
        |  "query": {"discover": {
        |    "target": 5,
        |    "context": [
        |      {"positive": 10, "negative": 20},
        |      {"positive": 30, "negative": 40}
        |    ]}},
        |  "limit": 10
        |}""".stripMargin)),
    // two prefetches (default Dot space and the named cosine space) fused
    // by RRF with explicit k and weights. Mirrors `fusion_rrf`.
    "api_query_fusion_rrf" -> ((s, dir) => runOnEmbeddings(s, dir,
      """{
        |  "prefetch": [
        |    {"query": {"nearest": 7}, "limit": 20},
        |    {"query": {"nearest": 42}, "using": "cosine", "limit": 20}
        |  ],
        |  "query": {"rrf": {"k": 2, "weights": [1.0, 2.0]}},
        |  "limit": 10
        |}""".stripMargin)),
    // formula rescore over a prefetch: score blend + gauss decay on a
    // payload field + division. Mirrors `formula_rescore`.
    "api_query_formula" -> ((s, dir) => runOnEmbeddings(s, dir,
      """{
        |  "prefetch": {"query": {"nearest": 7}, "limit": 50},
        |  "query": {"formula": {"sum": [
        |    {"mult": [0.6, "$score[0]"]},
        |    {"mult": [0.3, {"gauss_decay": {
        |      "x": "label", "target": 5.0, "midpoint": 0.5, "scale": 3.0}}]},
        |    {"div": {"left": 10.0, "right": {"sum": ["vec_id", 1.0]}}}
        |  ]}},
        |  "limit": 10
        |}""".stripMargin)),
    // order-by scroll with a numeric descending start_from cursor
    // (`OrderByInterface::Struct`, Desc → lte range, `order_by.rs:31-40`).
    "api_query_order_by" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      PointQuery.execute(s, ev, "event_id",
        new TypedResolver(ev.schema, "event_id"),
        RequestCodec.parseQueryRequest(
          """{
            |  "query": {"order_by": {
            |    "key": "value", "direction": "desc", "start_from": 900.5}},
            |  "limit": 40
            |}""".stripMargin, ctx(s, dir)))
    }),
    // datetime range filter with RFC3339 string bounds parsed from the wire
    // form (array + mixed precisions). Mirrors `range_datetime_rfc3339`.
    "api_filter_datetime_count" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val f = RequestCodec.parseFilter(
        """{
          |  "must": [
          |    {"key": "ts", "range": {"gte": "2024-01-10T06:30:00Z"}},
          |    {"key": "ts", "range": {"gt": "2024-01-09T22:00:00-04:00"}},
          |    {"key": "ts", "range": {"lt": "2024-01-20 18:45:30.250"}},
          |    {"key": "ts", "range": {"lte": "2024-02-01"}}
          |  ]
          |}""".stripMargin)
      Reads.count(ev, Some(f), new TypedResolver(ev.schema, "event_id"))
    }),
  )

  /** Oracles: the SAME SQL as the mirrored hand-built entries — wire parity
    * means rows-identical results, and the hash compare enforces it. */
  val oracles: Map[String, String] = Map(
    "api_query_knn_filtered" -> VectorQueries.oracles("knn_filtered"),
    "api_query_recommend_best" -> RankQueries.oracles("recommend_best_score"),
    "api_query_discover" -> RankQueries.oracles("discover"),
    "api_query_fusion_rrf" -> RankQueries.oracles("fusion_rrf"),
    "api_query_formula" -> PayloadGeoQueries.oracles("formula_rescore"),
    "api_query_order_by" ->
      """SELECT event_id, value FROM events
        |WHERE value <= 900.5
        |ORDER BY value DESC, event_id ASC LIMIT 40""".stripMargin,
    "api_filter_datetime_count" -> ReadQueries.oracles("range_datetime_rfc3339"),
  )
}
