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

  /** Minimal real image codec: uncompressed 24-bit BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, bottom-up BGR rows padded to 4 bytes) — zero
    * dependencies, full roundtrip. Gives the multimodal path one genuinely
    * decodable format so the featurize step stops being a stub for it. */
  object Bmp {
    private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    private def getU16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    private def getI32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

    private def rowSize(width: Int): Int = ((width * 3 + 3) / 4) * 4

    /** `rgbTopDown`: row-major top-down pixels as 0xRRGGBB. */
    def encode24(width: Int, height: Int, rgbTopDown: Array[Int]): Array[Byte] = {
      require(rgbTopDown.length == width * height, "pixel count mismatch")
      val rs = rowSize(width)
      val imageSize = rs * height
      val out = new Array[Byte](54 + imageSize)
      out(0) = 'B'; out(1) = 'M'
      putU32(out, 2, out.length); putU32(out, 10, 54)
      putU32(out, 14, 40); putU32(out, 18, width); putU32(out, 22, height)
      putU16(out, 26, 1); putU16(out, 28, 24); putU32(out, 30, 0)
      putU32(out, 34, imageSize)
      putU32(out, 38, 2835); putU32(out, 42, 2835)
      var sy = 0
      while (sy < height) {
        val y = height - 1 - sy // stored bottom-up
        var x = 0
        while (x < width) {
          val p = rgbTopDown(y * width + x)
          val off = 54 + sy * rs + x * 3
          out(off) = (p & 0xFF).toByte             // B
          out(off + 1) = ((p >> 8) & 0xFF).toByte  // G
          out(off + 2) = ((p >> 16) & 0xFF).toByte // R
          x += 1
        }
        sy += 1
      }
      out
    }

    /** Parse a 24bpp uncompressed BMP → (width, height, top-down 0xRRGGBB). */
    def decode24(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
        "not a BMP stream")
      val offset = getI32(bytes, 10)
      val width = getI32(bytes, 18)
      val height = getI32(bytes, 22)
      require(width > 0 && height > 0, "unsupported BMP orientation/size")
      require(getU16(bytes, 28) == 24, "only 24bpp BMP supported")
      require(getI32(bytes, 30) == 0, "only uncompressed BMP supported")
      val rs = rowSize(width)
      val px = new Array[Int](width * height)
      var sy = 0
      while (sy < height) {
        val y = height - 1 - sy
        var x = 0
        while (x < width) {
          val off = offset + sy * rs + x * 3
          px(y * width + x) =
            ((bytes(off + 2) & 0xFF) << 16) | ((bytes(off + 1) & 0xFF) << 8) |
              (bytes(off) & 0xFF)
          x += 1
        }
        sy += 1
      }
      (width, height, px)
    }
  }

  /** Real pixel-stat featurizer over decoded BMP pixels — 7 exact-integer
    * features (all sums fit a Float mantissa, so the DuckDB oracle can
    * reproduce them bit-exactly): [Σr, Σg, Σb, Σrgb per quadrant 0..3],
    * quadrants in top-down coordinates (q = 2·[y≥h/2] + [x≥w/2]). */
  final class BmpStatsDecoder extends Decoder {
    val dim = 7
    def decode(bytes: Array[Byte]): Array[Float] = {
      val (w, h, px) = Bmp.decode24(bytes)
      val f = new Array[Float](dim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = px(y * w + x)
          val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
          f(0) += r; f(1) += g; f(2) += b
          val q = (if (y * 2 < h) 0 else 2) + (if (x * 2 < w) 0 else 1)
          f(3 + q) += r + g + b
          x += 1
        }
        y += 1
      }
      f
    }
  }

  /** Deterministic synthetic "camera": per id, an 8×8 24bpp BMP whose pixel
    * (x, y) channels follow a closed-form formula — so a SQL oracle can
    * compute the expected pixel statistics without parsing BMP. Exercises
    * the real encode → binary column → decode path end-to-end. */
  def syntheticBmp(df: DataFrame, idCol: String,
      width: Int = 8, height: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType), StructField("bytes", BinaryType)))
    val (w, h) = (width, height)
    val rdd = df.select(col(idCol)).rdd.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(0)
        val px = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = ((id * 7 + x * 3 + y * 5) % 256).toInt
            val g = ((id * 11 + x + y * 2) % 256).toInt
            val b = ((id * 13 + x * 4 + y) % 256).toInt
            px(y * w + x) = (r << 16) | (g << 8) | b
            x += 1
          }
          y += 1
        }
        Row(id, Bmp.encode24(w, h, px))
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
