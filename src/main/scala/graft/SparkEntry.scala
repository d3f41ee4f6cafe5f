package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-area catalogs; every entry that is
  * SQL-expressible has a DuckDB oracle in `oracleSql` with identical column
  * names, DOUBLE scores rounded to 6 decimals, and a deterministic
  * (score, id) total order on both sides.
  */
object SparkEntry {

  import graft.queries._

  private val catalogs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (VectorQueries.queries, VectorQueries.oracles),
      (ReadQueries.queries, ReadQueries.oracles),
      (RankQueries.queries, RankQueries.oracles),
      (TextQueries.queries, TextQueries.oracles),
      (SparseQueries.queries, SparseQueries.oracles),
      (PayloadGeoQueries.queries, PayloadGeoQueries.oracles),
      (IndexQueries.queries, IndexQueries.oracles),
      (StorageQueries.queries, StorageQueries.oracles),
      (UuidQueries.queries, UuidQueries.oracles),
      (ScenarioQueries.queries, ScenarioQueries.oracles),
      (ApiQueries.queries, ApiQueries.oracles),
      (EndpointQueries.queries, EndpointQueries.oracles),
      (TenantQueries.queries, TenantQueries.oracles),
      (ShardWriteQueries.queries, ShardWriteQueries.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_dot")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    catalogs.map(_._2).reduce(_ ++ _)
}
