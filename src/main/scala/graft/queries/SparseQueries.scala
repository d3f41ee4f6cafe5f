package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.index.SparseIndex

/** Sparse scoring / BM25 / IDF catalog (SURVEY.md §2.3 sparse + IDF
  * modifier; `lib/bm25` embedding). Postings derive from `documents.text`
  * term frequencies — the bulk inverted-index layout. */
object SparseQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sparse_dot_tokens" -> ((s, dir) => {
      import s.implicits._
      // dim filter pushes below the TF aggregate into the explode stage:
      // only query-term postings are ever counted or shuffled
      val post = SparseIndex.postingsFromTokens(docs(s, dir), "doc_id", "text")
        .filter(col("dim").isin("spark", "vector", "the"))
      val q = Seq(("spark", 1.0), ("vector", 2.0), ("the", 0.5)).toDF("dim", "qw")
      SparseIndex.search(post, "doc_id", q, idf = None, k = 10)
    }),
    "bm25_idf_search" -> ((s, dir) =>
      SparseIndex.bm25SearchText(docs(s, dir), "doc_id", "text",
        queryTerms = Seq(("spark", 1.0), ("vector", 1.0)),
        k1 = 1.2, b = 0.75, k = 10)),
    // IDF corpus scoping (`params.idf.corpus`, ref query_context.rs:278-300
    // + types.rs:701-748): N, avgdl and document frequencies come from the
    // FILTERED corpus, not the whole collection
    "bm25_corpus_scoped" -> ((s, dir) =>
      SparseIndex.bm25SearchText(
        docs(s, dir).filter(col("lang") === "en"), "doc_id", "text",
        queryTerms = Seq(("spark", 1.0), ("data", 1.0)),
        k1 = 1.2, b = 0.75, k = 10)),
  )

  val oracles: Map[String, String] = Map(
    "sparse_dot_tokens" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |  len(list_filter(toks, x -> x = 'spark'))::DOUBLE AS c1,
        |  len(list_filter(toks, x -> x = 'vector'))::DOUBLE AS c2,
        |  len(list_filter(toks, x -> x = 'the'))::DOUBLE AS c3
        |  FROM t)
        |SELECT doc_id, round(c1 * 1.0 + c2 * 2.0 + c3 * 0.5, 6) AS score
        |FROM c WHERE c1 > 0 OR c2 > 0 OR c3 > 0
        |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "bm25_corpus_scoped" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks
        |           FROM documents WHERE lang = 'en'),
        |lens AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM t),
        |params AS (SELECT (SELECT avg(dl) FROM lens) AS avgdl,
        |                  (SELECT count(*) FROM t)::DOUBLE AS n),
        |tf AS (SELECT doc_id, 'spark' AS dim,
        |         len(list_filter(toks, x -> x = 'spark'))::DOUBLE AS cnt FROM t
        |       UNION ALL
        |       SELECT doc_id, 'data' AS dim,
        |         len(list_filter(toks, x -> x = 'data'))::DOUBLE AS cnt FROM t),
        |tfpos AS (SELECT * FROM tf WHERE cnt > 0),
        |dfreq AS (SELECT dim, count(*)::DOUBLE AS df FROM tfpos GROUP BY dim),
        |scored AS (SELECT f.doc_id,
        |    sum((f.cnt * 2.2 / (1.2 * (1 - 0.75 + 0.75 * l.dl / p.avgdl) + f.cnt))
        |        * 1.0 * ln((p.n - d.df + 0.5) / (d.df + 0.5) + 1)) AS sc
        |  FROM tfpos f
        |  JOIN lens l USING (doc_id) JOIN dfreq d USING (dim), params p
        |  GROUP BY f.doc_id)
        |SELECT doc_id, round(sc, 6) AS score FROM scored
        |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
    "bm25_idf_search" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        |lens AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM t),
        |params AS (SELECT (SELECT avg(dl) FROM lens) AS avgdl,
        |                  (SELECT count(*) FROM t)::DOUBLE AS n),
        |tf AS (SELECT doc_id, 'spark' AS dim,
        |         len(list_filter(toks, x -> x = 'spark'))::DOUBLE AS cnt FROM t
        |       UNION ALL
        |       SELECT doc_id, 'vector' AS dim,
        |         len(list_filter(toks, x -> x = 'vector'))::DOUBLE AS cnt FROM t),
        |tfpos AS (SELECT * FROM tf WHERE cnt > 0),
        |dfreq AS (SELECT dim, count(*)::DOUBLE AS df FROM tfpos GROUP BY dim),
        |scored AS (SELECT f.doc_id,
        |    sum((f.cnt * 2.2 / (1.2 * (1 - 0.75 + 0.75 * l.dl / p.avgdl) + f.cnt))
        |        * 1.0 * ln((p.n - d.df + 0.5) / (d.df + 0.5) + 1)) AS sc
        |  FROM tfpos f
        |  JOIN lens l USING (doc_id) JOIN dfreq d USING (dim), params p
        |  GROUP BY f.doc_id)
        |SELECT doc_id, round(sc, 6) AS score FROM scored
        |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,
  )
}
