package graft.model

/** Dense-vector STORAGE element type, declared per named vector in the
  * collection config — the reference's `Datatype`
  * (`lib/segment/src/data_types/vectors.rs:253-257`) surfaced on
  * `VectorDataConfig.datatype` (`lib/segment/src/types.rs:2153`,
  * storage enum `VectorStorageDatatype` `types.rs:2039`).
  *
  * The element width is a first-order scan-cost lever at 100 TB: Float16
  * halves and Uint8 quarters the vector bytes read per query. Encoding
  * happens transparently at upsert and decoding is fused into the scoring
  * kernels (never materialized per row) — callers declare the datatype once
  * and keep sending/reading `array<float>`.
  */
sealed trait VectorDatatype
case object Float32 extends VectorDatatype
case object Float16 extends VectorDatatype
case object Uint8 extends VectorDatatype
