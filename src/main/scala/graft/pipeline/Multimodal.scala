package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata; decode/featurize as partition-local batch transforms.
  *
  * The decode step is STUBBED (no media libraries in this container) with a
  * deterministic byte-hash featurizer — the Spark-side plumbing is real:
  * binary columns travel untouched through shuffles, featurization is a
  * narrow mapPartitions (no shuffle), and the output embedding column feeds
  * the same ANN/dedup operators as text embeddings.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("bytes", BinaryType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Pluggable decoder; implementations must be serializable (shipped to
    * executors). */
  trait Decoder extends Serializable {
    def dim: Int
    def decode(bytes: Array[Byte]): Array[Float]
  }

  /** STUB: deterministic pseudo-embedding from a rolling byte hash. Replace
    * with a real image/audio model at deploy time — same signature, same
    * plan shape. */
  final class StubDecoder(val dim: Int) extends Decoder {
    def decode(bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      var d = 0
      while (d < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(d) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
        d += 1
      }
      out
    }
  }

  /** Batched featurization: one decoder instance per partition (model load
    * amortized), rows streamed — the Scala analog of `mapInPandas`. */
  def featurize(
      df: DataFrame,
      idCol: String,
      binCol: String,
      decoder: Decoder): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rdd = df.select(col(idCol), col(binCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.getLong(0), if (bytes == null) null else decoder.decode(bytes).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic frame sampling stub: split the byte stream into `n`
    * equal chunks (stand-in for video frame extraction), keeping the
    * (id, frame_no, frame_bytes) explode shape of the real pipeline. */
  def frameSample(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame = {
    val len = length(col(binCol))
    val chunk = greatest((len / n).cast("int"), lit(1))
    df.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(n - 1)), i =>
          col(binCol).substr((i * chunk + 1).cast("int"), chunk)))
          .as(Seq("frame_no", "frame_bytes")))
      .filter(length(col("frame_bytes")) > 0)
  }
}
