package graft.storage

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet-table metadata memo — the repeated-read fast path.
  *
  * Measured (r16 optimization round, sf0.1, local[32]): a bare
  * `spark.read.parquet(dir)` costs 80–115 ms of pure DRIVER work per call
  * — footer-based schema inference dominates (~70 ms), directory listing
  * the rest — and the query catalogs re-open the same immutable test
  * tables and collection directories dozens of times per entry, so this
  * fixed cost was the single largest overhead across the bench surface.
  * At cluster scale the same cost is an object-store LIST + footer GET per
  * query against an unchanged table — the problem manifest-based table
  * formats exist to remove (optimization guide §6, "file listing").
  *
  * The memo keeps only the SCHEMA per (path, version) and hands every
  * caller a fresh `spark.read.schema(s).parquet(path)` DataFrame, so plan
  * instances stay distinct (no self-join attribute aliasing surprises) and
  * NO row data or computed result is ever cached — every action still
  * scans the parquet files. Schema reuse is sound only while the files are
  * unchanged, so every table-mutation site bumps [[bump]] for its path:
  * [[Collection]]'s `write`/`writeShardScoped`/`deleteShardKey`,
  * `Collection.create`, and [[Catalog.delete]]. A bumped version makes the
  * next read re-infer from the new footers (id-type widening on upsert is
  * the case that exercises this).
  */
private[graft] object ParquetMeta {

  private val versions = new ConcurrentHashMap[String, java.lang.Long]()
  // latest (version, schema) per path — stale versions are dropped on
  // replace, so the map is bounded by the number of live table paths
  private val schemas = new ConcurrentHashMap[String, (Long, StructType)]()

  /** Current data version of `path` (0 until first bump). */
  def version(path: String): Long =
    versions.getOrDefault(path, 0L)

  /** Invalidate the memoized schema for `path` — MUST be called by every
    * code path that creates, rewrites, or deletes data under it. */
  def bump(path: String): Unit = {
    versions.merge(path, 1L, (a, b) => a + b)
    schemas.remove(path)
    ()
  }

  /** Read `path` as parquet with the memoized schema when current —
    * skipping per-call footer inference — or infer-and-memoize on first
    * touch / after a bump. A miss returns the inferring DataFrame itself
    * (one path resolution, not infer + re-read) — fresh-path-per-call
    * workloads like the streaming micro-batch stores stay at exactly the
    * pre-memo cost. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val v = version(path)
    val cached = schemas.get(path)
    if (cached != null && cached._1 == v)
      spark.read.schema(cached._2).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemas.put(path, (v, df.schema))
      df
    }
  }
}
