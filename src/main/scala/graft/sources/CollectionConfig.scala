package graft.sources

import org.apache.spark.sql.types.DataType

import graft.model.{Float32, Metric, VectorDatatype}

/** Per-name dense vector config (qdrant `VectorDataConfig`,
  * `lib/segment/src/types.rs:2153`: size + distance + multivector flag +
  * storage element type `datatype`, `vectors.rs:253-257`). Declaring
  * `datatype = Float16 | Uint8` makes Collection encode at upsert and score
  * through the fused reduced-width kernels — callers keep sending and
  * reading `array<float>`. */
/** Declared quantization for a named vector (`QuantizationConfig`,
  * `types.rs:930-1120`): fit at ingest, stored as an extra column, searched
  * two-phase (approx top-k·oversampling on the quantized column → exact
  * rescore) unless the caller opts out. */
final case class QuantizationSpec(
    kind: String, // "scalar" (int8) | "binary" | "product"
    /** binary only: one_bit | one_and_half_bits | two_bits
      * (`BinaryQuantizationEncoding`, `types.rs:1036-1041`). */
    encoding: String = "one_bit",
    /** scalar only: quantile clip (`ScalarQuantizationConfig.quantile`). */
    quantile: Double = 1.0,
    /** product only: compression ratio x4..x64
      * (`CompressionRatio`, `types.rs:920-928`) — dims-per-byte bucket
      * 1/2/4/8/16 (`quantized_vectors.rs:236-245`), so the subspace count
      * is dim / bucket. */
    compression: String = "x16") {

  /** product: PQ subspace count for a vector of `dim` dims. */
  def pqSubspaces(dim: Int): Int = {
    val bucket = compression match {
      case "x4" => 1
      case "x8" => 2
      case "x16" => 4
      case "x32" => 8
      case "x64" => 16
      case other =>
        throw new IllegalArgumentException(s"unknown PQ compression '$other'")
    }
    require(dim % bucket == 0,
      s"dim $dim not divisible by the $compression bucket size $bucket")
    dim / bucket
  }
}

/** Declared IVF ANN index for a named vector — the batch-regime analog of
  * the reference's per-collection HNSW config (`HnswConfig`,
  * `types.rs:622-680`; SURVEY §2.6: IVF substitutes HNSW for bulk).
  * `cells` KMeans centroids become a physical partition column of the
  * table, so a query that probes the `nprobe` nearest cells prunes
  * (cells−nprobe)/cells of the data at the parquet directory level.
  * `nprobe` is the declared recall/latency knob (the hnsw_ef analog;
  * request-level `SearchParams.hnsw_ef` overrides it per query).
  * Composes with [[QuantizationSpec]]: probe-pruned ADC scan + exact
  * rescore = the classic IVFADC layout for billion-scale corpora. */
final case class IvfSpec(cells: Int, nprobe: Int = 4)

final case class VectorConfig(
    name: String,
    dim: Int,
    metric: Metric,
    multivector: Boolean = false,
    datatype: VectorDatatype = Float32,
    quantization: Option[QuantizationSpec] = None,
    /** Declared ANN index; None = exact scan (the plain index default). */
    ann: Option[IvfSpec] = None)

/** Sparse vector config (`SparseVectorDataConfig` `types.rs:2275`);
  * modifier = Some("idf") enables the IDF weighting. */
final case class SparseVectorConfig(name: String, modifier: Option[String] = None)

/** Collection schema: fixed vector schema + schema-free JSON payload with
  * optional declared per-field types (the payload index schema,
  * `lib/shard/src/payload_index_schema.rs`). */
final case class CollectionConfig(
    idCol: String = "id",
    payloadCol: String = "payload",
    vectors: Seq[VectorConfig] = Nil,
    sparse: Seq[SparseVectorConfig] = Nil,
    payloadTypes: Map[String, DataType] = Map.empty,
    /** Custom-sharding key column (`ShardKey`, hash-ring placement
      * `lib/collection/src/hash_ring.rs`): the table partitions by this
      * column, so a `shard_key` selector prunes whole shard directories at
      * the scan — the Spark analog of only fanning out to selected shards. */
    shardKeyCol: Option[String] = None,
    /** Declared strict mode (`StrictModeConfig`, `types.rs:1323-1430`):
      * when enabled, `Collection.query` and the update bridge gate every
      * request BEFORE execution (`lib/collection/src/operations/
      * verification/`) and reject over-limit requests with a
      * StrictModeViolation — the reference's HTTP 403. */
    strictMode: Option[graft.api.StrictModeConfig] = None,
    /** Payload fields declared `is_tenant: true` on their keyword/uuid
      * index (`KeywordIndexParams.is_tenant`, `data_types/index.rs:32`;
      * the optimizer turns every tenant field into a segment defragment
      * key, `lib/shard/src/optimize.rs:253-268` →
      * `segment_builder.rs:279-340` sorts merged points by the key's
      * hash so one tenant's points are contiguous on disk). Spark analog:
      * each tenant key becomes a PHYSICAL partition column
      * `tenantb_<field> = xxhash64(value) % TenantBuckets`, so a filtered
      * query with a must-match on the field prunes (B−1)/B of the table
      * at the parquet directory level — same machinery as the IVF cell
      * prune, which is what makes per-tenant queries flat-latency at
      * 100 TB. */
    tenantKeys: Seq[String] = Nil,
    /** Payload fields declared `is_principal: true` on their
      * integer/float/datetime index (`IntegerIndexParams.is_principal`;
      * `PayloadSchemaParams::tenant_optimization`, `types.rs:2674-2685`
      * routes principal fields into the SAME defragment-ordering pass).
      * Spark analog: writes sort rows within each task by the principal
      * value, so parquet row-group min/max stats prune range scans on the
      * field (via its `idx_` projection pushdown) to the matching span —
      * the time-series layout. */
    principalKeys: Seq[String] = Nil) {

  def vectorNames: Seq[String] = vectors.map(_.name)

  /** Column name for a named vector; qdrant's default unnamed vector ""
    * maps to plain "vector". */
  def vectorCol(name: String): String =
    if (name.isEmpty) "vector" else s"vector_$name"

  def sparseCol(name: String): String = s"sparse_$name"

  /** Column holding the quantized form of a named vector. */
  def quantCol(name: String): String = s"quant_${vectorCol(name)}"

  /** IVF cell-assignment column for a named vector (a PARTITION column of
    * the stored table when the vector declares [[IvfSpec]]). */
  def cellCol(name: String): String = s"ivfcell_${vectorCol(name)}"

  /** Key characters outside [A-Za-z0-9_] sanitize to `_` in derived
    * column names: JsonPath dots are not legal in a parquet partition
    * directory, and an un-sanitized dot in a data column name breaks
    * every later `col("idx_a.b")` reference (parsed as field access). */
  private def sanitizeKey(key: String): String =
    key.replaceAll("[^A-Za-z0-9_]", "_")

  /** Tenant-bucket partition column for a declared tenant field. */
  def tenantBucketCol(key: String): String = "tenantb_" + sanitizeKey(key)

  /** Geohash cell column for a declared geo payload index (rides beside
    * the `idx_` struct projection; [[graft.index.GeoIndex.ColumnPrecision]]
    * cells) — the prune column geo filter conditions push to the scan. */
  def geoCellCol(key: String): String = "geocell_" + sanitizeKey(key)

  /** Per-point geohash cells column (`array<string>`) for ARRAY-valued
    * rows of a declared geo index — the reference posts EVERY point of an
    * array value into its geohash postings
    * (`field_index/geo_index/mod.rs`), so multi-point rows prune too:
    * the compiler ANDs an exists-overlap conjunct over this column behind
    * the scalar [[geoCellCol]] membership (which stays the pushable
    * half). Null for scalar-valued / non-array rows. */
  def geoCellsCol(key: String): String = "geocells_" + sanitizeKey(key)

  /** Typed projection column for a declared payload field index
    * ("create payload index", SURVEY §2.5). Sanitized so a NESTED index
    * key (`country.capital`, `test_nested_payload_indexing.py`) yields a
    * referenceable column; identical to the raw `idx_<key>` for plain
    * keys. */
  def idxCol(key: String): String = "idx_" + sanitizeKey(key)

  def vectorConfig(name: String): VectorConfig =
    vectors.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown vector '$name'"))
}
