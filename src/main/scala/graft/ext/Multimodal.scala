package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the decode / feature-extract seams a training
  * pipeline needs.
  *
  * Image decoding is REAL ([[decodeImages]] — the JDK's javax.imageio
  * codecs) and so is audio ([[decodeAudio]] — javax.sound.sampled's WAV/PCM
  * codec); only VIDEO decoding is STUBBED (the JDK ships no video codec):
  * [[decodeStub]] produces a deterministic fake decode and is
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
    StructField("media_type", StringType), // sniffed: png|jpeg|pdf|wav|avi|riff|unknown
    StructField("n_bytes", LongType)))

  /** Magic-byte content sniffing as pure expressions (no decode). RIFF
    * containers disambiguate on the form type at bytes 9-12 (WAVE / AVI).
    */
  def sniffType(payload: Column): Column =
    when(hex(substring(payload, 1, 4)) === "89504E47", "png")
      .when(hex(substring(payload, 1, 3)) === "FFD8FF", "jpeg")
      .when(hex(substring(payload, 1, 4)) === "25504446", "pdf")
      .when(hex(substring(payload, 1, 4)) === "52494646",
        when(hex(substring(payload, 9, 4)) === "57415645", "wav")
          .when(hex(substring(payload, 9, 4)) === "41564920", "avi")
          .otherwise("riff"))
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

  /** REAL audio decoding through the JDK's own bundled codec
    * (`javax.sound.sampled`: WAV / AIFF / AU containers, PCM payloads —
    * zero external dependencies, same posture as [[decodeImages]]).
    * Partition-wise, bounded memory, payloads never shuffle. Per payload:
    * a decodable flag (non-audio or unsupported encodings are DATA, not
    * errors), the container-declared sample rate, and EXACT integer sample
    * statistics over the decoded 16-bit signed PCM stream (count, min,
    * max, sum) — integer arithmetic end to end, so the correctness gate
    * (q302) verifies the encode→decode→stat round trip of the real codec
    * against a closed form computed codec-free by the oracle. Payloads
    * that decode to anything other than 16-bit signed PCM mono report
    * decodable=false (the supported-profile contract is explicit; a real
    * pipeline swaps in ffmpeg behind the same signature for the rest).
    */
  def decodeAudio(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val decoded =
            try {
              val ain = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              val f = ain.getFormat
              if (f.getEncoding !=
                    javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
                  f.getSampleSizeInBits != 16 || f.getChannels != 1) null
              else {
                val raw = ain.readAllBytes()
                val n = raw.length / 2
                var i = 0
                var mn = Long.MaxValue
                var mx = Long.MinValue
                var sm = 0L
                while (i < n) {
                  val lo = java.lang.Byte.toUnsignedInt(raw(2 * i))
                  val hi = java.lang.Byte.toUnsignedInt(raw(2 * i + 1))
                  val s: Long =
                    if (f.isBigEndian) ((lo << 8) | hi).toShort.toLong
                    else ((hi << 8) | lo).toShort.toLong
                  if (s < mn) mn = s
                  if (s > mx) mx = s
                  sm += s
                  i += 1
                }
                if (n == 0) (id, true, f.getSampleRate.toInt, 0L, 0L, 0L, 0L)
                else (id, true, f.getSampleRate.toInt, n.toLong, mn, mx, sm)
              }
            } catch { case scala.util.control.NonFatal(_) => null }
          if (decoded == null) (id, false, 0, 0L, 0L, 0L, 0L) else decoded
        }
      }
      .toDF(idCol, "decodable", "sample_rate", "n_samples",
        "s_min", "s_max", "s_sum")
  }

  /** ??? — real decoder for VIDEO goes here (ffmpeg via JNI, or a Python
    * worker via a Pandas-UDF-equivalent); images decode for real through
    * [[decodeImages]] and audio through [[decodeAudio]] — video is the one
    * modality the JDK ships no codec for. The stub derives deterministic
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
