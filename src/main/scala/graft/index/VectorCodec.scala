package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.VecKernels

/** Reduced-width dense-vector STORAGE element types — the reference's
  * `VectorStorageDatatype` (`lib/segment/src/types.rs:2039`; element types
  * f32/f16/u8 `lib/segment/src/data_types/vectors.rs:253-257`). The default
  * column type everywhere else in this engine is `array<float>`; these
  * codecs re-encode that column so the parquet scan reads 2× (f16) or 4×
  * (i8) fewer vector bytes — at 100 TB the scan is the dominant cost, so
  * element width is a first-order lever the reference ships natively.
  *
  * Scoring decodes INLINE inside codegen'd kernels (no decoded array is
  * materialized per row), so the narrow column is also the column that
  * streams through the whole-stage-codegen loop.
  */
object VectorCodec {

  /** Symmetric i8 quantization: round-half-up(x·127) clamped to [−127,127],
    * computed in DOUBLE (`floor(x·127 + 0.5)`) so any engine reproduces the
    * exact same bytes — the integer dot of two encoded vectors is then
    * engine-independent EXACT arithmetic (cf. the reference's u8 storage,
    * `vectors.rs:257`). */
  def toI8(v: Column): Column =
    transform(v, x =>
      greatest(lit(-127.0d), least(lit(127.0d),
        floor(x.cast("double") * lit(127.0d) + lit(0.5d)))).cast("byte"))

  /** Σ aᵢ·bᵢ over two i8-encoded vectors, exact BIGINT. */
  def i8Dot(a: Column, b: Column): Column = VecKernels.i8Dot(a, b)

  /** array<float> → array<smallint> of IEEE-754 binary16 bits. Relative
    * quantization error ≤ 2⁻¹¹ per element for normal values. */
  def toF16(v: Column): Column = VecKernels.f16Encode(v)

  /** Fused half-decode + dot against a float/double query vector. */
  def f16Dot(halfBits: Column, q: Column): Column = VecKernels.f16Dot(halfBits, q)
}
