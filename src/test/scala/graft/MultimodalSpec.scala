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

  /** Encode a w×h image whose pixel (x, y) has the given gray level,
    * through the JDK's own codec — REAL bytes, not magic-byte fakes. */
  private def encode(w: Int, h: Int, fmt: String,
      gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("decodeImages really decodes PNG: exact dims and exact 4x4 " +
      "grayscale thumbnail; JPEG decodes; junk is flagged, not an error") {
    // 8x8 PNG, pixel gray = 32*cy + 8*cx within each 2x2 thumbnail cell
    // (constant per cell) -> every cell average is EXACTLY its gray value
    val pngBytes = encode(8, 8, "png",
      (x, y) => 32 * (y * 4 / 8) + 8 * (x * 4 / 8))
    val jpegBytes = encode(16, 12, "jpeg", (_, _) => 128)
    val rows = Seq((1L, pngBytes), (2L, jpegBytes), (3L, junk), (4L, pdf))
    val out = Multimodal.decodeImages(
      rows.toDF("media_id", "payload"), "media_id", "payload")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    // the synthesized bytes are REAL containers: the sniffer agrees
    val sniffed = rows.toDF("media_id", "payload")
      .select(Multimodal.sniffType($"payload").as("t")).as[String].collect()
    assert(sniffed.toSeq == Seq("png", "jpeg", "unknown", "pdf"))
    val p = out(1L)
    assert(p.getAs[Boolean]("decodable"))
    assert(p.getAs[Int]("width") == 8 && p.getAs[Int]("height") == 8)
    val expected = (0 until 16).map(c => (32 * (c / 4) + 8 * (c % 4)).toLong)
    assert(p.getAs[scala.collection.Seq[Long]]("gray4x4").toSeq == expected)
    // JPEG: lossy, so pin dims + near-flat luma rather than exact cells
    val j = out(2L)
    assert(j.getAs[Boolean]("decodable"))
    assert(j.getAs[Int]("width") == 16 && j.getAs[Int]("height") == 12)
    assert(j.getAs[scala.collection.Seq[Long]]("gray4x4").toSeq.forall(v => (v - 128).abs <= 4))
    // non-image payloads are flagged rows the audit can count, not errors
    Seq(3L, 4L).foreach { id =>
      assert(!out(id).getAs[Boolean]("decodable"))
      assert(out(id).getAs[scala.collection.Seq[Long]]("gray4x4").toSeq.isEmpty)
    }
  }

  /** Encode 16-bit signed PCM samples through the JDK's own audio writer
    * into the given container — REAL bytes via the real codec. */
  private def encodeAudio(samples: Array[Short], rate: Float,
      container: javax.sound.sampled.AudioFileFormat.Type,
      bigEndian: Boolean): Array[Byte] = {
    val raw = new Array[Byte](2 * samples.length)
    samples.zipWithIndex.foreach { case (s, i) =>
      if (bigEndian) {
        raw(2 * i) = ((s >> 8) & 0xFF).toByte; raw(2 * i + 1) = (s & 0xFF).toByte
      } else {
        raw(2 * i) = (s & 0xFF).toByte; raw(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, bigEndian)
    val ain = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ain, container, out)
    out.toByteArray
  }

  test("decodeAudio really decodes: WAV (little-endian) and AIFF " +
      "(big-endian) round-trip IDENTICAL exact stats; corrupt, truncated " +
      "and stereo payloads are flagged data, not errors") {
    import javax.sound.sampled.AudioFileFormat.Type
    val samples = Array.tabulate(96)(i =>
      (((i * 2731 + 17) % 65536) - 32768).toShort)
    val n = samples.length.toLong
    val mn = samples.map(_.toLong).min
    val mx = samples.map(_.toLong).max
    val sm = samples.map(_.toLong).sum
    val wav = encodeAudio(samples, 8000f, Type.WAVE, bigEndian = false)
    val aiff = encodeAudio(samples, 8000f, Type.AIFF, bigEndian = true)
    // stereo WAV: outside the 16-bit-mono profile -> decodable=false
    val stereoFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val stereoIn = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](64)), stereoFmt, 16L)
    val stereoOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stereoIn, Type.WAVE, stereoOut)
    val rows = Seq(
      (1L, wav), (2L, aiff), (3L, junk),
      (4L, wav.take(10)), // truncated header
      (5L, stereoOut.toByteArray))
    val out = Multimodal.decodeAudio(
      rows.toDF("media_id", "payload"), "media_id", "payload")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    Seq(1L, 2L).foreach { id =>
      val r = out(id)
      assert(r.getAs[Boolean]("decodable"), s"media $id")
      assert(r.getAs[Int]("sample_rate") == 8000, s"media $id")
      assert(r.getAs[Long]("n_samples") == n, s"media $id")
      assert(r.getAs[Long]("s_min") == mn && r.getAs[Long]("s_max") == mx &&
        r.getAs[Long]("s_sum") == sm,
        s"media $id: ${r.getAs[Long]("s_min")}/${r.getAs[Long]("s_max")}/" +
          s"${r.getAs[Long]("s_sum")} vs $mn/$mx/$sm")
    }
    Seq(3L, 4L, 5L).foreach { id =>
      assert(!out(id).getAs[Boolean]("decodable"), s"media $id")
    }
    // the RIFF container sniffs down to its WAVE form type
    val sniffed = Seq((1L, wav)).toDF("media_id", "payload")
      .select(Multimodal.sniffType($"payload").as("t")).as[String].head()
    assert(sniffed == "wav")
    // an AVI-form RIFF header sniffs as avi; a bare RIFF stays riff
    val aviHdr = "RIFF1234AVI LIST".getBytes("US-ASCII")
    val bareRiff = "RIFF1234XXXX".getBytes("US-ASCII")
    val two = Seq((1L, aviHdr), (2L, bareRiff)).toDF("media_id", "payload")
      .select(Multimodal.sniffType($"payload").as("t")).as[String].collect()
    assert(two.toSeq == Seq("avi", "riff"))
  }

  test("decodeVideo really parses RIFF/AVI with raw DIB frames: " +
      "geometry-exact round trip, top-down/bottom-up parity, dc fourcc, " +
      "zero frames, and corrupt/compressed payloads flagged as data") {
    val rnd = new scala.util.Random(42)
    val w = 5; val h = 3; val nf = 4 // stride 15 -> padded to 16
    val frames = Seq.fill(nf)(Array.fill(w * h)(rnd.nextInt(1 << 24)))
    def rgbSum(v: Int): Long =
      ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
    var px = 0L; var ws = 0L
    for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
      val s = rgbSum(frames(f)(y * w + x))
      px += s; ws += (1L + x + 2L * y + 3L * f) * s
    }
    val fsums = (0 until nf).map(f => frames(f).map(rgbSum).sum)
    val bu = Multimodal.encodeAvi(w, h, 33333, frames)
    val td = Multimodal.encodeAvi(w, h, 33333, frames, topDown = true)
    // both row orders decode to the SAME top-down coordinates and stats
    assert(Multimodal.parseAvi(bu)
      .contains((w, h, 33333, nf.toLong, px, ws, fsums)))
    assert(Multimodal.parseAvi(td)
      .contains((w, h, 33333, nf.toLong, px, ws, fsums)))
    // a 'dc' frame fourcc with biCompression=0 is still raw DIB: patch
    // the fourccs on an all-0xFF-pixel clip (no byte collisions with data)
    val white = Seq.fill(2)(Array.fill(w * h)(0xFFFFFF))
    val wsWhite = (for (f <- 0 until 2; y <- 0 until h; x <- 0 until w)
      yield (1L + x + 2L * y + 3L * f) * 765L).sum
    val dc = Multimodal.encodeAvi(w, h, 33333, white).clone()
    var i = 0
    var patched = 0
    while (i + 4 <= dc.length) {
      if (dc(i) == '0' && dc(i + 1) == '0' && dc(i + 2) == 'd' &&
          dc(i + 3) == 'b') { dc(i + 3) = 'c'; patched += 1 }
      i += 1
    }
    assert(patched == 2)
    assert(Multimodal.parseAvi(dc)
      .contains((w, h, 33333, 2L, 765L * 2 * w * h, wsWhite,
        Seq(765L * w * h, 765L * w * h))))
    // zero-frame clips are decodable with zeroed stats
    assert(Multimodal.parseAvi(Multimodal.encodeAvi(w, h, 1000, Seq.empty))
      .contains((w, h, 1000, 0L, 0L, 0L, Seq.empty[Long])))
    // failure modes: non-AVI bytes, truncation (header-level and
    // mid-movi), and a compressed biCompression are DATA, not errors
    assert(Multimodal.parseAvi(junk).isEmpty)
    assert(Multimodal.parseAvi(bu.take(40)).isEmpty)
    assert(Multimodal.parseAvi(bu.dropRight(10)).isEmpty)
    val comp = bu.clone()
    val strfAt = comp.indexOfSlice("strf".getBytes("US-ASCII"))
    assert(strfAt > 0)
    comp(strfAt + 8 + 16) = 1 // biCompression != BI_RGB
    assert(Multimodal.parseAvi(comp).isEmpty)
    // the DataFrame decode: schema + decodable flags end to end
    val out = Multimodal.decodeVideo(
      Seq((1L, bu), (2L, junk)).toDF("media_id", "payload"),
      "media_id", "payload")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("decodable"))
    assert(out(1L).getAs[Int]("width") == w &&
      out(1L).getAs[Int]("height") == h &&
      out(1L).getAs[Int]("us_per_frame") == 33333 &&
      out(1L).getAs[Long]("n_frames") == nf.toLong &&
      out(1L).getAs[Long]("px_sum") == px &&
      out(1L).getAs[Long]("w_sum") == ws)
    assert(!out(2L).getAs[Boolean]("decodable"))
    // an encoded clip sniffs as avi
    val sniffed = Seq((1L, bu)).toDF("media_id", "payload")
      .select(Multimodal.sniffType($"payload").as("t")).as[String].head()
    assert(sniffed == "avi")
  }

  test("dHash24 computes the documented gradient bits, is brightness-" +
      "invariant, and the q308 construction keeps in-group distance <= 4 " +
      "with the low band identical") {
    // hand-computed: cells row-major cy*4+cx; a strictly increasing row
    // sets no horizontal bits (a > b is false left-to-right ascending)
    def hashOf(cells: Seq[Long]): Long =
      Seq(cells).toDF("g")
        .select(Multimodal.dHash24($"g").as("h")).as[Long].head()
    // all-equal cells: every comparison false -> hash 0
    assert(hashOf(Seq.fill(16)(7L)) == 0L)
    // one descending step at row 0, cx=1>cx=2: bit cy*3+cx = 0*3+1 = 1
    val oneH = Seq(5L, 9L, 3L, 3L) ++ Seq.fill(12)(3L)
    // cell0=5 > cell4=3 -> vertical bit 12+0; cell1=9 > cell5=3 -> 12+1
    // cell0(5) < cell1(9): no bit 0; cell1(9) > cell2(3): bit 1;
    // cell2(3) = cell3(3): no bit 2
    assert(hashOf(oneH) == ((1L << 1) | (1L << 12) | (1L << 13)))
    // brightness invariance: +40 on every cell leaves the hash unchanged
    val rnd = new scala.util.Random(7)
    val cells = Seq.fill(16)(rnd.nextInt(200).toLong)
    assert(hashOf(cells) == hashOf(cells.map(_ + 40L)))
    // q308's group construction: a uniform shift on row 3 flips only the
    // row-2->row-3 vertical gradients (bits 20-23): distance <= 4 and
    // the low 12 bits (band 0) agree exactly
    val shifted = cells.zipWithIndex.map { case (v, i) =>
      if (i / 4 == 3) v + 39L else v
    }
    val (h1, h2) = (hashOf(cells), hashOf(shifted))
    assert(((h1 ^ h2) & ((1L << 20) - 1)) == 0L, s"low bits differ: $h1 $h2")
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 4)
  }

  test("decodeAudioWindows frames the decoded PCM into exact integer " +
      "energies; gradientHash captures the contour and ignores gain") {
    // 8 samples, 4 windows of 2: energies are hand-computed sums of s^2
    val samples = Array[Short](3, -4, 0, 2, 5, 5, -1, 1)
    val pcm = new Array[Byte](16)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ain = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 8L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ain,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val row = Multimodal.decodeAudioWindows(
      Seq((1L, out.toByteArray), (2L, junk)).toDF("media_id", "payload"),
      "media_id", "payload", nWindows = 4)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(row(1L).getAs[Boolean]("decodable"))
    assert(row(1L).getAs[Long]("n_samples") == 8L)
    assert(row(1L).getAs[scala.collection.Seq[Long]]("win_energy").toSeq ==
      Seq(25L, 4L, 50L, 2L)) // (9+16, 0+4, 25+25, 1+1)
    assert(!row(2L).getAs[Boolean]("decodable"))
    // contour: falls at steps 0 (25>4) and 2 (50>2), rises at 1
    val fp = Seq(Seq(25L, 4L, 50L, 2L)).toDF("e")
      .select(Multimodal.gradientHash($"e", 3).as("h")).as[Long].head()
    assert(fp == ((1L << 0) | (1L << 2)))
    // gain invariance: scaling energies by 9 (gain x3) keeps the hash
    val fp3 = Seq(Seq(225L, 36L, 450L, 18L)).toDF("e")
      .select(Multimodal.gradientHash($"e", 3).as("h")).as[Long].head()
    assert(fp3 == fp)
    // uneven split: 6 samples into 4 windows assigns sample i to window
    // i*4/6 -> windows get samples {0,1},{2},{3,4},{5}
    val six = Array[Short](1, 2, 3, 4, 5, 6)
    val pcm6 = new Array[Byte](12)
    six.zipWithIndex.foreach { case (s, i) =>
      pcm6(2 * i) = (s & 0xFF).toByte
      pcm6(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val ain6 = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm6), fmt, 6L)
    val out6 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ain6,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out6)
    val r6 = Multimodal.decodeAudioWindows(
      Seq((1L, out6.toByteArray)).toDF("media_id", "payload"),
      "media_id", "payload", nWindows = 4).collect()(0)
    assert(r6.getAs[scala.collection.Seq[Long]]("win_energy").toSeq ==
      Seq(1L + 4L, 9L, 16L + 25L, 36L))
  }

  test("decodeMedia one-pass dispatch: each payload routes to its codec " +
      "and the features equal the per-modality decoders' output") {
    // png: 2x2 gray ramp
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 2) {
      val g = 50 * (y * 2 + x)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val pngOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pngOut)
    // wav: 4 samples
    val pcm = new Array[Byte](8)
    Array[Short](3, -4, 5, 6).zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xFF).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val wavOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 4L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavOut)
    // avi: 2 frames of 1x1 (levels 10 then 7 -> frame sums 30, 21)
    val avi = Multimodal.encodeAvi(1, 1, 1000,
      Seq(Array(0x0A0A0A), Array(0x070707)))
    val out = Multimodal.decodeMedia(
      Seq((1L, pngOut.toByteArray), (2L, wavOut.toByteArray), (3L, avi),
        (4L, junk)).toDF("media_id", "payload"),
      "media_id", "payload", audioWindows = 2)
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    def feats(id: Long): Seq[Long] =
      out(id).getAs[scala.collection.Seq[Long]]("features").toSeq
    assert(out(1L).getAs[String]("media_type") == "png" &&
      out(1L).getAs[Boolean]("decodable"))
    // 2x2 image: each pixel fills 4 thumbnail cells of a 4x4 grid; the
    // per-modality decoder must agree exactly
    val viaImages = Multimodal.decodeImages(
      Seq((1L, pngOut.toByteArray)).toDF("media_id", "payload"),
      "media_id", "payload")
      .collect()(0).getAs[scala.collection.Seq[Long]]("gray4x4").toSeq
    assert(feats(1L) == viaImages)
    assert(out(2L).getAs[String]("media_type") == "wav" &&
      out(2L).getAs[Boolean]("decodable"))
    assert(feats(2L) == Seq(9L + 16L, 25L + 36L))
    assert(out(3L).getAs[String]("media_type") == "avi" &&
      out(3L).getAs[Boolean]("decodable"))
    assert(feats(3L) == Seq(30L, 21L))
    assert(out(4L).getAs[String]("media_type") == "unknown" &&
      !out(4L).getAs[Boolean]("decodable"))
  }

  test("decodeImages thumbnail averages exactly on non-aligned dims") {
    // 6x5 image, gray = x*7 + y*11: cells have ragged pixel counts, the
    // expected integer averages are computed here by the same block rule
    val w = 6; val h = 5
    val bytes = encode(w, h, "png", (x, y) => x * 7 + y * 11)
    val sums = new Array[Long](16); val cnts = new Array[Long](16)
    for (y <- 0 until h; x <- 0 until w) {
      val c = math.min(y * 4 / h, 3) * 4 + math.min(x * 4 / w, 3)
      sums(c) += 3L * (x * 7 + y * 11); cnts(c) += 1
    }
    val expected = (0 until 16).map(i =>
      if (cnts(i) == 0) 0L else sums(i) / (3L * cnts(i)))
    val r = Multimodal.decodeImages(
      Seq((1L, bytes)).toDF("media_id", "payload"), "media_id", "payload")
      .head()
    assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
    assert(r.getAs[scala.collection.Seq[Long]]("gray4x4").toSeq == expected)
  }

  test("NULL payloads are data, not task failures, across every decoder") {
    // a crawl's binary column is nullable; the documented contract is
    // decodable=false / media_type unknown — previously decodeMedia and
    // decodeVideo NPE'd the task on a null blob
    val df = Seq((1L, null.asInstanceOf[Array[Byte]]), (2L, junk))
      .toDF("media_id", "payload")
    val m = Multimodal.decodeMedia(df, "media_id", "payload")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(m(1L).getAs[String]("media_type") == "unknown" &&
      !m(1L).getAs[Boolean]("decodable"))
    val v = Multimodal.decodeVideo(df, "media_id", "payload")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(!v(1L).getAs[Boolean]("decodable"))
    val i = Multimodal.decodeImages(df, "media_id", "payload")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(!i(1L).getAs[Boolean]("decodable"))
    val a = Multimodal.decodeAudio(df, "media_id", "payload")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(!a(1L).getAs[Boolean]("decodable"))
  }

  test("lossy JPEG flat-block round trip: decoded thumbnail cells stay " +
      "inside the band margin the q306/q311 fixtures rely on") {
    // 32x32, one flat 8x8 block per thumbnail cell, band-centered lumas
    // (32*band + 16): after a REAL JPEG encode (quality 0.9) + decode,
    // each cell must land within +-8 of its source so div-32 banding and
    // >=16-level gradient signs are exact — the provable-margin
    // contract the lossy gates are built on
    def cellLuma(cx: Int, cy: Int): Int = 32 * ((5 * cx + 3 * cy) % 7) + 16
    val img = new java.awt.image.BufferedImage(
      32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val g = cellLuma(x / 8, y / 8)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.9f)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    val r = Multimodal.decodeImages(
      Seq((1L, out.toByteArray)).toDF("media_id", "payload"),
      "media_id", "payload").head()
    assert(r.getAs[Boolean]("decodable"))
    assert(r.getAs[Int]("width") == 32 && r.getAs[Int]("height") == 32)
    val cells = r.getAs[scala.collection.Seq[Long]]("gray4x4")
    for (cy <- 0 until 4; cx <- 0 until 4) {
      val src = cellLuma(cx, cy)
      val dec = cells(cy * 4 + cx)
      assert(math.abs(dec - src) <= 8,
        s"cell ($cx,$cy): src=$src decoded=$dec drifted past the margin")
      assert(dec / 32 == src / 32, s"cell ($cx,$cy) crossed its band")
    }
  }
}
