package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.filters.TypedResolver
import graft.model._
import graft.ops.Search

/** KNN query catalog over the `embeddings` table (driver correctness gate).
  * Each entry has a DuckDB oracle in [[oracles]] computing the same score in
  * DOUBLE precision with round(·,6) and (score, id) deterministic ordering.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
  private def resolver(df: DataFrame) = new TypedResolver(df.schema, "vec_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_dot" -> ((s, dir) => {
      val q = Tables.embeddingOf(s, dir, 7L)
      Search.knn(emb(s, dir), "vec_id", "embedding", q, Dot, k = 10)
    }),
    "knn_cosine" -> ((s, dir) => {
      val q = Tables.embeddingOf(s, dir, 42L)
      Search.knn(emb(s, dir), "vec_id", "embedding", q, Cosine, k = 10)
    }),
    "knn_euclid" -> ((s, dir) => {
      val q = Tables.embeddingOf(s, dir, 13L)
      Search.knn(emb(s, dir), "vec_id", "embedding", q, Euclid, k = 10)
    }),
    "knn_manhattan" -> ((s, dir) => {
      val q = Tables.embeddingOf(s, dir, 99L)
      Search.knn(emb(s, dir), "vec_id", "embedding", q, Manhattan, k = 10)
    }),
    // batch KNN: one top-k per query row; the 100 TB shape — points stream
    // once, query side broadcast, per-query window ranking
    "knn_batch" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val e = emb(s, dir)
      val qs = e.filter(col("vec_id").isin(3L, 7L, 11L))
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      Search.knnBatch(e, "vec_id", "embedding", qs, "query_id", "qvec", Dot, k = 5)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "knn_filtered" -> ((s, dir) => {
      val df = emb(s, dir)
      val q = Tables.embeddingOf(s, dir, 7L)
      val f = Filter(
        must = Seq(
          MatchAny("label", Seq(1, 3, 5, 7)),
          RangeCond("vec_id", gte = Some(10L))),
        mustNot = Seq(MatchValue("label", 5)))
      Search.knn(df, "vec_id", "embedding", q, Dot,
        filter = Some(f), resolver = Some(resolver(df)),
        k = 10, offset = 3, scoreThreshold = Some(-100.0))
    }),
  )

  val oracles: Map[String, String] = Map(
    "knn_batch" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id IN (3, 7, 11)),
        |s AS (SELECT q.query_id AS query_id, e.vec_id AS vec_id,
        |        round(list_dot_product(e.embedding::DOUBLE[], q.qv), 6) AS score
        |      FROM embeddings e CROSS JOIN q),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
        |      FROM s)
        |SELECT query_id, vec_id, score, rank FROM r WHERE rank <= 5
        |ORDER BY query_id ASC, rank ASC""".stripMargin,
    "knn_dot" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7)
        |SELECT e.vec_id AS vec_id,
        |       round(list_dot_product(e.embedding::DOUBLE[], q.v), 6) AS score
        |FROM embeddings e, q
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    "knn_cosine" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 42)
        |SELECT e.vec_id AS vec_id,
        |       round(list_dot_product(e.embedding::DOUBLE[], q.v)
        |             / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
        |                * sqrt(list_dot_product(q.v, q.v))), 6) AS score
        |FROM embeddings e, q
        |ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,
    "knn_euclid" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 13)
        |SELECT e.vec_id AS vec_id,
        |       round(list_distance(e.embedding::DOUBLE[], q.v), 6) AS score
        |FROM embeddings e, q
        |ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "knn_manhattan" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 99)
        |SELECT e.vec_id AS vec_id,
        |       round(list_sum(list_transform(list_zip(e.embedding::DOUBLE[], q.v),
        |             x -> abs(x[1] - x[2]))), 6) AS score
        |FROM embeddings e, q
        |ORDER BY score ASC, vec_id ASC LIMIT 10""".stripMargin,
    "knn_filtered" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7)
        |SELECT e.vec_id AS vec_id,
        |       round(list_dot_product(e.embedding::DOUBLE[], q.v), 6) AS score
        |FROM embeddings e, q
        |WHERE e.label IN (1, 3, 5, 7) AND e.vec_id >= 10 AND NOT e.label = 5
        |  AND round(list_dot_product(e.embedding::DOUBLE[], q.v), 6) > -100.0
        |ORDER BY score DESC, vec_id ASC LIMIT 10 OFFSET 3""".stripMargin,
  )
}
