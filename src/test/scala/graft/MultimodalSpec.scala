package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: magic-byte sniffing, metadata projection, the
  * partition-wise feature-extraction batch shape, and chunk sampling.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A)
  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
  private val pdf = "%PDF-1.7 fake".getBytes("UTF-8")
  private val junk = "hello world".getBytes("UTF-8")

  test("magic-byte sniffing") {
    val out = Seq((1L, png), (2L, jpeg), (3L, pdf), (4L, junk))
      .toDF("media_id", "payload")
      .select(Multimodal.sniffType($"payload").as("t"))
      .as[String].collect()
    assert(out.toSeq == Seq("png", "jpeg", "pdf", "unknown"))
  }

  test("metadata projection: lengths and stable hashes") {
    val meta = Seq((1L, junk)).toDF("media_id", "payload")
      .select($"media_id" +:
        Multimodal.metadataColumns($"payload").map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(meta.getAs[Long]("n_bytes") == junk.length)
    assert(meta.getAs[String]("sha256").length == 64)
    assert(meta.getAs[String]("media_type") == "unknown")
  }

  test("decode stub is deterministic and bounded") {
    val d = Seq((1L, png), (2L, png)).toDF("media_id", "payload")
      .select(Multimodal.decodeStub($"payload").as("d"))
      .select($"d.width", $"d.height", $"d.duration_s")
      .collect()
    assert(d(0) == d(1)) // same payload -> same fake decode
    assert(d(0).getInt(0) >= 0 && d(0).getInt(0) < 1920)
  }

  test("partition-wise feature extraction emits normalized fixed-dim vectors") {
    val df = Seq((1L, junk), (2L, pdf)).toDF("media_id", "payload")
    val feats = Multimodal.extractFeatures(df, "media_id", "payload", dim = 8)
      .as[(Long, Array[Float])].collect().toMap
    assert(feats(1L).length == 8)
    assert(math.abs(feats(1L).sum - 1.0f) < 1e-5) // histogram normalized
    assert(feats(1L).toSeq != feats(2L).toSeq)
  }

  test("chunk sampling covers the payload") {
    val payload = Array.tabulate(100)(_.toByte)
    val chunks = Multimodal.sampleChunks(
      Seq((1L, payload)).toDF("media_id", "payload"),
      "media_id", "payload", chunkBytes = 10, everyK = 2)
      .collect()
    assert(chunks.length == 5) // indices 0,2,4,6,8
    assert(chunks.forall(_.getAs[Array[Byte]]("chunk").length == 10))
  }
}
