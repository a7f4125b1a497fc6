package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the decode / feature-extract seams a training
  * pipeline needs.
  *
  * The actual media decoding is STUBBED (this environment ships no image or
  * audio codecs): [[decodeStub]] produces a deterministic fake decode and is
  * clearly marked as the plug-in point. Everything around the stub — the
  * schema, the partition-wise batch shape, the expression-level metadata
  * extraction — is real Spark plumbing and is what matters at 100 TB:
  * binary payloads never pass through a shuffle here; metadata extraction is
  * a narrow codegen'd projection; feature extraction streams partition-wise
  * with bounded memory.
  */
object Multimodal {

  /** Canonical multimodal record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("media_type", StringType), // sniffed: png | jpeg | pdf | unknown
    StructField("n_bytes", LongType)))

  /** Magic-byte content sniffing as pure expressions (no decode). */
  def sniffType(payload: Column): Column =
    when(hex(substring(payload, 1, 4)) === "89504E47", "png")
      .when(hex(substring(payload, 1, 3)) === "FFD8FF", "jpeg")
      .when(hex(substring(payload, 1, 4)) === "25504446", "pdf")
      .when(hex(substring(payload, 1, 4)) === "52494646", "riff") // wav/avi
      .otherwise("unknown")

  /** Expression-level metadata: byte length, content hash, header hex.
    * Narrow projection — runs inside whole-stage codegen.
    */
  def metadataColumns(payload: Column): Seq[(String, Column)] = Seq(
    "n_bytes" -> length(payload).cast("long"),
    "sha256" -> sha2(payload, 256),
    "header_hex" -> hex(substring(payload, 1, 4)),
    "media_type" -> sniffType(payload))

  /** REAL image decoding through the JDK's own bundled codecs
    * (`javax.imageio`: PNG, JPEG, BMP, GIF, WBMP — zero external
    * dependencies): the decode seam made executable for every format the
    * JVM itself ships. Partition-wise with bounded memory — one image in
    * flight per task, payloads never shuffle; a real pipeline swaps the
    * JDK reader for libjpeg-turbo/ffmpeg behind the same signature. Per
    * payload: a decodable flag (corrupt or non-image bytes are DATA, not
    * errors — the audit must show them), exact pixel dimensions, and a
    * 4×4 block-averaged grayscale thumbnail as 16 exact integer luma
    * cells (0-255; sums and counts in integer arithmetic, so tests pin
    * the values bit-for-bit) — the real visual feature the byte-histogram
    * stub stands in for (near-dup blocking, brightness screens).
    * Video/audio stay behind [[decodeStub]]: the JDK ships no codecs for
    * them.
    */
  def decodeImages(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) (id, false, 0, 0, Array.empty[Long])
          else {
            val w = img.getWidth
            val h = img.getHeight
            val sums = new Array[Long](16)
            val cnts = new Array[Long](16)
            var y = 0
            while (y < h) {
              val cy = math.min(y * 4 / h, 3)
              var x = 0
              while (x < w) {
                val cx = math.min(x * 4 / w, 3)
                val rgb = img.getRGB(x, y)
                val c = cy * 4 + cx
                sums(c) +=
                  ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
                cnts(c) += 1L
                x += 1
              }
              y += 1
            }
            val g = Array.tabulate(16)(i =>
              if (cnts(i) == 0L) 0L else sums(i) / (3L * cnts(i)))
            (id, true, w, h, g)
          }
        }
      }
      .toDF(idCol, "decodable", "width", "height", "gray4x4")
  }

  /** ??? — real decoder for NON-IMAGE media goes here (ffmpeg via JNI, or
    * a Python worker via a Pandas-UDF-equivalent); images already decode
    * for real through [[decodeImages]]. The stub derives deterministic
    * fake dimensions/duration from the payload hash so downstream plumbing
    * (schema, joins, aggregations) is fully exercisable in tests.
    */
  def decodeStub(payload: Column): Column = {
    val h = TextAnalysis.hash60(sha2(payload, 256))
    struct(
      pmod(h, lit(1920)).cast("int").as("width"),
      pmod(h, lit(1080)).cast("int").as("height"),
      (pmod(h, lit(3600)).cast("double") / 10.0).as("duration_s"))
  }

  /** Partition-wise feature extraction over binary payloads: the batch
    * shape a real model-encoder would use (iterate a partition, bounded
    * memory, emit fixed-size vectors). The per-payload "features" are a
    * deterministic byte-histogram projection — the STUB; swap `embed` for a
    * real encoder.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
      dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real implementation: load the encoder once per partition here
        def embed(bytes: Array[Byte]): Array[Float] = {
          val acc = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) {
            acc(java.lang.Byte.toUnsignedInt(bytes(i)) % dim) += 1f
            i += 1
          }
          val n = math.max(bytes.length, 1).toFloat
          acc.map(_ / n)
        }
        it.map { case (id, bytes) => (id, embed(bytes)) }
      }
      .toDF(idCol, "features")
  }

  /** Frame/chunk sampling stub for video/audio payloads: every k-th slice
    * of the binary, as (media_id, chunk_index, chunk) rows — the explode
    * shape real frame extraction produces.
    */
  def sampleChunks(df: DataFrame, idCol: String, payloadCol: String,
      chunkBytes: Int, everyK: Int): DataFrame = {
    val n = length(col(payloadCol))
    val nChunks = (n / chunkBytes).cast("int")
    val idx = sequence(lit(0), greatest(nChunks - 1, lit(0)), lit(everyK))
    df.select(col(idCol), col(payloadCol), explode(idx).as("chunk_index"))
      .select(col(idCol), col("chunk_index"),
        expr(s"substring($payloadCol, chunk_index * $chunkBytes + 1, $chunkBytes)")
          .as("chunk"))
  }
}
