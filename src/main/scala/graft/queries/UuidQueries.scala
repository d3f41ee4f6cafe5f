package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.filters.TypedResolver
import graft.model._
import graft.ops.{Reads, Search}
import graft.pipeline.Dedup

/** UUID point-id catalog — `ExtendedPointId::Uuid` parity
  * (ref `lib/segment/src/types.rs:174-196`): every read operator here runs
  * over a collection whose id column is a canonical hyphenated UUID string
  * instead of a Long.
  *
  * Canonical lowercase-hex UUID strings sort identically to their 128-bit
  * value (equal length, aligned hyphens), so keyset scroll order, knn id
  * tiebreaks and dedup keepers need no special casing — the same operators
  * run unchanged over either id type.
  *
  * The fixture derives a deterministic UUID-shaped id from the numeric id
  * (md5 hex grouped 8-4-4-4-12) so the DuckDB oracle can derive the
  * identical ids with the same expression.
  */
object UuidQueries {

  /** UUID-shaped string from any column, derived via md5 (deterministic and
    * reproducible in ANSI SQL). */
  def uuidOf(c: Column): Column = {
    val m = md5(c.cast("string"))
    concat_ws("-",
      substring(m, 1, 8), substring(m, 9, 4), substring(m, 13, 4),
      substring(m, 17, 4), substring(m, 21, 12))
  }

  /** Driver-side twin of [[uuidOf]] for building literal id sets. */
  def uuidOfLong(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20, 32)}"
  }

  /** SQL fragment computing [[uuidOf]] over column `c` (DuckDB). */
  private def uuidSql(c: String): String =
    s"concat_ws('-', substr(md5($c::VARCHAR),1,8), substr(md5($c::VARCHAR),9,4), " +
      s"substr(md5($c::VARCHAR),13,4), substr(md5($c::VARCHAR),17,4), " +
      s"substr(md5($c::VARCHAR),21,12))"

  private def embUuid(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(uuidOf(col("vec_id")).as("id"), col("embedding"), col("label"))

  private def docsUuid(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(uuidOf(col("doc_id")).as("id"), col("text"), col("lang"),
        col("n_chars"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // filtered knn where HasId carries UUID literals and the id tiebreak is
    // the uuid string
    "knn_filtered_uuid" -> ((s, dir) => {
      val df = embUuid(s, dir)
      val q = Tables.embeddingOf(s, dir, 7L)
      val f = Filter(
        must = Seq(RangeCond("label", gte = Some(1))),
        mustNot = Seq(HasId(Seq(uuidOfLong(3L), uuidOfLong(7L)))))
      Search.knn(df, "id", "embedding", q, Dot,
        filter = Some(f), resolver = Some(new TypedResolver(df.schema, "id")),
        k = 10)
    }),
    // keyset scroll over the uuid id space, cursor mid-range
    "scroll_uuid" -> ((s, dir) => {
      val d = docsUuid(s, dir)
      Reads.scrollById(d, "id",
        Some(Filter.mustAll(MatchValue("lang", "en"))),
        new TypedResolver(d.schema, "id"),
        offsetId = Some("8"), limit = 25, projection = Seq("id", "lang"))
    }),
    // UUID scroll leaf under RRF: the scroll's fusion contribution is LIST
    // POSITION (row_number over the leaf's own id order) — a uuid string
    // cast to double is NULL for every row, so value-based rank surrogates
    // cannot order this leaf; position can (`scroll.rs:131` + the
    // position-based `reciprocal_rank_fusion.rs`).
    "prefetch_rrf_uuid_scroll" -> ((s, dir) => {
      import graft.ops.PointQuery
      import graft.ops.PointQuery._
      val df = embUuid(s, dir)
      val q = Tables.embeddingOf(s, dir, 7L)
      val query = Query(
        scoring = FusionQ("rrf"),
        prefetches = Seq(
          Query(Nearest("embedding", Dot, q), limit = 15),
          Query(ScrollById, limit = 15)),
        limit = 10)
      PointQuery.execute(s, df, "id", new TypedResolver(df.schema, "id"), query)
    }),
    "retrieve_uuid" -> ((s, dir) =>
      Reads.retrieve(docsUuid(s, dir), "id",
        Seq(uuidOfLong(3L), uuidOfLong(5L), uuidOfLong(8L)),
        projection = Seq("id", "lang", "n_chars"))),
    // exact-dedup keeper over uuid ids: keeper = lexicographically lowest
    // uuid == lowest 128-bit id
    "dedup_keep_first_uuid" -> ((s, dir) =>
      Dedup.exactKeepFirst(docsUuid(s, dir), "id", "text")
        .select(col("id"), col("lang"))
        .orderBy(col("id"))),
    // facet over a uuid-typed payload field (`FacetValue::Uuid`,
    // `lib/segment/src/data_types/facets.rs:33-38,87`): uuid values group,
    // count and tie-break like keywords — canonical lowercase-hex order
    // equals the 128-bit order the reference buckets on.
    "facet_uuid" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          uuidOf(pmod(col("doc_id"), lit(7))).as("owner"))
      Reads.facet(d, "doc_id", "owner",
        Some(Filter.mustAll(MatchValue("lang", "en"))),
        new TypedResolver(d.schema, "doc_id"), limit = 5)
    }),
  )

  val oracles: Map[String, String] = Map(
    "prefetch_rrf_uuid_scroll" ->
      s"""WITH ids AS (SELECT ${uuidSql("vec_id")} AS id, embedding FROM embeddings),
        |q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7),
        |a AS (SELECT i.id, round(list_dot_product(i.embedding::DOUBLE[], q.v), 6) AS s
        |      FROM ids i, q ORDER BY s DESC, id ASC LIMIT 15),
        |ar AS (SELECT id, row_number() OVER (ORDER BY s DESC, id ASC) AS pos FROM a),
        |b AS (SELECT id FROM ids ORDER BY id ASC LIMIT 15),
        |br AS (SELECT id, row_number() OVER (ORDER BY id ASC) AS pos FROM b),
        |u AS (SELECT id, 1.0/(pos + 1.0) AS c FROM ar
        |      UNION ALL SELECT id, 1.0/(pos + 1.0) AS c FROM br)
        |SELECT id, round(sum(c), 6) AS score FROM u GROUP BY id
        |ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,
    "knn_filtered_uuid" ->
      s"""WITH u AS (SELECT ${uuidSql("vec_id")} AS id, embedding, label, vec_id
        |           FROM embeddings),
        |q AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 7)
        |SELECT u.id AS id,
        |       round(list_dot_product(u.embedding::DOUBLE[], q.v), 6) AS score
        |FROM u, q
        |WHERE u.label >= 1 AND u.vec_id NOT IN (3, 7)
        |ORDER BY score DESC, id ASC LIMIT 10""".stripMargin,
    "scroll_uuid" ->
      s"""SELECT id, lang FROM
        |  (SELECT ${uuidSql("doc_id")} AS id, lang FROM documents)
        |WHERE lang = 'en' AND id >= '8'
        |ORDER BY id ASC LIMIT 25""".stripMargin,
    "retrieve_uuid" ->
      s"""SELECT id, lang, n_chars FROM
        |  (SELECT ${uuidSql("doc_id")} AS id, lang, n_chars FROM documents)
        |WHERE id IN (SELECT ${uuidSql("doc_id")} FROM documents
        |             WHERE doc_id IN (3, 5, 8))
        |ORDER BY id ASC""".stripMargin,
    "dedup_keep_first_uuid" ->
      s"""SELECT id, lang FROM (
        |  SELECT ${uuidSql("doc_id")} AS id, lang,
        |    row_number() OVER (PARTITION BY md5(text)
        |                       ORDER BY ${uuidSql("doc_id")} ASC) AS rn
        |  FROM documents)
        |WHERE rn = 1 ORDER BY id ASC""".stripMargin,
    "facet_uuid" ->
      s"""SELECT v AS value, count(DISTINCT doc_id)::BIGINT AS cnt FROM (
        |  SELECT doc_id, ${uuidSql("(doc_id % 7)")} AS v
        |  FROM documents WHERE lang = 'en')
        |GROUP BY v ORDER BY cnt DESC, v ASC LIMIT 5""".stripMargin,
  )
}
