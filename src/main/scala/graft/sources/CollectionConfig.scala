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
    kind: String, // "scalar" (int8) | "binary"
    /** binary only: one_bit | one_and_half_bits | two_bits
      * (`BinaryQuantizationEncoding`, `types.rs:1036-1041`). */
    encoding: String = "one_bit",
    /** scalar only: quantile clip (`ScalarQuantizationConfig.quantile`). */
    quantile: Double = 1.0)

final case class VectorConfig(
    name: String,
    dim: Int,
    metric: Metric,
    multivector: Boolean = false,
    datatype: VectorDatatype = Float32,
    quantization: Option[QuantizationSpec] = None)

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
    shardKeyCol: Option[String] = None) {

  def vectorNames: Seq[String] = vectors.map(_.name)

  /** Column name for a named vector; qdrant's default unnamed vector ""
    * maps to plain "vector". */
  def vectorCol(name: String): String =
    if (name.isEmpty) "vector" else s"vector_$name"

  def sparseCol(name: String): String = s"sparse_$name"

  /** Column holding the quantized form of a named vector. */
  def quantCol(name: String): String = s"quant_${vectorCol(name)}"

  def vectorConfig(name: String): VectorConfig =
    vectors.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown vector '$name'"))
}
