package graft

import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style invariants over seeded random inputs (SURVEY.md §5.4):
  * running total = prefix sum, scaffold density, window dedup keeps exactly
  * the max-load row per key, jaccard bounds, quality-score bounds.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  test("running total is the prefix sum, for random daily series") {
    (1 to 5).foreach { _ =>
      val days = (1 to 30).map(d =>
        (java.sql.Date.valueOf(f"2026-01-$d%02d"), rnd.nextInt(1000).toDouble))
      val df = days.toDF("d", "v")
      val w = Window.orderBy($"d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = df.withColumn("rt", sum($"v").over(w))
        .orderBy($"d").select($"rt").as[Double].collect()
      val want = days.map(_._2).scanLeft(0.0)(_ + _).tail
      assert(got.toSeq == want.toSeq)
    }
  }

  test("dense scaffold always yields |dates| x 24 rows, sums preserved") {
    (1 to 3).foreach { _ =>
      val events = (1 to 200).map { _ =>
        (java.sql.Timestamp.valueOf(
          f"2026-02-${1 + rnd.nextInt(5)}%02d ${rnd.nextInt(24)}%02d:15:00"),
          rnd.nextInt(100).toLong)
      }
      val df = events.toDF("ts", "steps")
      val hourly = df.groupBy(to_date($"ts").as("date"), hour($"ts").as("hour"))
        .agg(sum($"steps").as("steps"))
      val scaffold = df.select(to_date($"ts").as("date")).distinct()
        .select($"date", explode(sequence(lit(0), lit(23))).as("hour"))
      val dense = scaffold.join(hourly, Seq("date", "hour"), "left")
        .na.fill(0L, Seq("steps"))
      val nDates = df.select(to_date($"ts")).distinct().count()
      assert(dense.count() == nDates * 24)
      assert(dense.agg(sum($"steps")).as[Long].head() == events.map(_._2).sum)
    }
  }

  test("latest-per-key dedup keeps exactly one row per key, with max load_id") {
    (1 to 3).foreach { _ =>
      val rows = (1 to 300).map { i =>
        (s"k${rnd.nextInt(40)}", rnd.nextInt(10).toLong, i.toLong)
      }
      val df = rows.toDF("key", "load_id", "payload")
      val w = Window.partitionBy($"key")
        .orderBy($"load_id".desc, $"payload".desc)
      val dedup = df.withColumn("rn", row_number().over(w)).where($"rn" === 1)
      val keys = rows.map(_._1).distinct
      assert(dedup.count() == keys.size)
      val maxLoads = rows.groupBy(_._1).map { case (k, rs) =>
        k -> rs.map(_._2).max
      }
      dedup.select($"key", $"load_id").as[(String, Long)].collect()
        .foreach { case (k, l) => assert(l == maxLoads(k), s"key $k") }
    }
  }

  test("jaccard is within [0,1], symmetric inputs give 1") {
    val words = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    (1 to 3).foreach { _ =>
      val docs = (1L to 20L).map { i =>
        (i, Seq.fill(8 + rnd.nextInt(10))(words(rnd.nextInt(words.size)))
          .mkString(" "))
      }.toDF("doc_id", "text")
      val sh = Dedup.hashedShingleRows(docs, "doc_id", "text")
      val all = sh.select($"doc_id".as("doc_a"))
        .crossJoin(sh.select($"doc_id".as("doc_b")))
        .where($"doc_a" < $"doc_b").distinct()
      val j = Dedup.jaccardFor(all, sh, "doc_id")
        .select($"jaccard").as[Double].collect()
      assert(j.forall(x => x >= 0.0 && x <= 1.0))
    }
  }

  test("containment dominates jaccard on every pair (|A∩B|/|A| >= |A∩B|/|A∪B|)") {
    val words = Seq("a", "b", "c", "d", "e", "f")
    val docs = (1L to 20L).map { i =>
      (i, Seq.fill(8 + rnd.nextInt(10))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val sh = Dedup.hashedShingleRows(docs, "doc_id", "text")
    val all = sh.select($"doc_id".as("doc_a"))
      .crossJoin(sh.select($"doc_id".as("doc_b")))
      .where($"doc_a" < $"doc_b").distinct()
    val rows = Dedup.overlapFor(all, sh, "doc_id")
      .select($"n_inter", $"n_a", $"n_b").collect()
    rows.foreach { r =>
      val (ni, na, nb) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val jac = ni.toDouble / (na + nb - ni)
      val cAB = ni.toDouble / na
      val cBA = ni.toDouble / nb
      assert(cAB + 1e-12 >= jac && cBA + 1e-12 >= jac,
        s"containment below jaccard: ni=$ni na=$na nb=$nb")
      assert(ni <= math.min(na, nb), "intersection exceeds a set size")
    }
  }

  test("connected components match a union-find reference on random graphs") {
    (1 to 3).foreach { _ =>
      val n = 30
      val edges = (1 to 25).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val members = (0 until n).groupBy(find).values
      val want = members.flatMap { ms =>
        val label = ms.min.toLong; ms.map(m => m.toLong -> label)
      }.toMap
      val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      // spark result covers exactly the nodes that appear in an edge
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched)
      got.foreach { case (id, c) => assert(c == want(id), s"node $id") }
    }
  }

  test("star-contraction CC matches a union-find reference on random graphs") {
    (1 to 3).foreach { _ =>
      val n = 30
      val edges = (1 to 25).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val members = (0 until n).groupBy(find).values
      val want = members.flatMap { ms =>
        val label = ms.min.toLong; ms.map(m => m.toLong -> label)
      }.toMap
      val got = Dedup.connectedComponentsStar(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched)
      got.foreach { case (id, c) => assert(c == want(id), s"node $id") }
    }
  }

  test("star-contraction converges on graphs whose diameter exceeds the " +
      "label-propagation round cap; label propagation fails loudly there") {
    // a path 0-1-…-12 has diameter 12: label propagation with maxRounds=5
    // CANNOT finish and must throw instead of returning partial labels
    val path = (0L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    // driverCap = 0 forces the distributed loop: the r17 adaptive
    // dispatch would otherwise (correctly) hand this 12-edge list to
    // the driver union-find, which has no round cap to pin
    intercept[IllegalStateException] {
      Dedup.connectedComponents(path, "a", "b", maxRounds = 5,
        driverCap = 0)
    }
    // star contraction halves path length per round: well within 50
    val got = Dedup.connectedComponentsStar(path, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == (0L to 12L).toSet)
    assert(got.values.forall(_ == 0L), got.toString)
  }

  test("star-contraction CC on a high-degree hub (skew shape)") {
    // hub-and-spoke: node 50 connected to everything — the degree-skew
    // case large-star/small-star is built for
    val star = (0L until 50L).map(i => (50L, i)).toDF("a", "b")
    val got = Dedup.connectedComponentsStar(star, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == (0L to 50L).toSet)
    assert(got.values.forall(_ == 0L))
  }

  test("skew salting: salted two-phase aggregation equals direct aggregation") {
    // the PLANS.md skew mitigation, proven semantics-preserving: spray hot
    // keys across S salts, partially aggregate (key, salt), then reduce the
    // S partials per key. Counts and decimal sums re-aggregate losslessly.
    (1 to 3).foreach { _ =>
      val rows = (1 to 2000).map { _ =>
        val key = if (rnd.nextInt(100) < 80) "hot" else s"k${rnd.nextInt(20)}"
        (key, rnd.nextInt(1000) / 100.0)
      }
      val df = rows.toDF("key", "v")
      val direct = df.groupBy($"key")
        .agg(count(lit(1)).as("n"), QueryDef.dsum($"v").as("total"))
      val salted = df
        .withColumn("salt", pmod(crc32($"v".cast("string")), lit(8)))
        .groupBy($"key", $"salt")
        .agg(count(lit(1)).as("pn"),
          sum($"v".cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("pt"))
        .groupBy($"key")
        .agg(sum($"pn").as("n"), sum($"pt").cast("double").as("total"))
      val d = direct.orderBy("key").collect().map(_.toSeq)
      val sl = salted.orderBy("key").collect().map(_.toSeq)
      assert(d.toSeq == sl.toSeq)
    }
  }

  test("quality score stays in [0,1] for arbitrary strings") {
    val gens = Seq("", "   ", "a", "!!!!!!", "1234 5678",
      "the quick brown fox. over, the lazy; dog!",
      Seq.fill(300)("word").mkString(" "), "éüñ unicode text")
    val cols = TextAnalysis.qualityColumns($"text")
    val scores = gens.toDF("text")
      .select(cols.toMap.apply("quality_score").as("q")).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0), scores.toSeq.toString)
  }

  test("passage dedup finds exactly the injected shared chunk") {
    // docs A and B share one 8-word passage; every other chunk is unique
    val shared = (1 to 8).map(i => s"shared$i").mkString(" ")
    def uniq(tag: String, n: Int) =
      (1 to n * 8).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq("a", 2)} $shared"),       // 3 chunks, 1 duplicated
      (2L, s"$shared ${uniq("b", 3)}"),       // 4 chunks, 1 duplicated
      (3L, uniq("c", 2)),                     // 2 chunks, none duplicated
      (4L, "too short")                       // < 8 tokens → zero chunks
    ).toDF("doc_id", "text")
    val got = Dedup.passageDupStats(docs, "doc_id", "text")
      .select($"doc_id", $"n_chunks", $"n_dup_chunks", $"dup_frac")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 1L, math.rint(1.0 / 3.0 * 1e9) / 1e9),
      (2L, 4L, 1L, 0.25),
      (3L, 2L, 0L, 0.0),
      (4L, 0L, 0L, 0.0)), got.toString)
  }

  test("span coverage merges overlapping and adjacent duplicated windows") {
    val run = (1 to 8).map(i => s"s$i").mkString(" ") // an 8-token shared run
    def uniq(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"${uniq("a", 2)} $run ${uniq("z", 2)}"), // dup window [3,11) of 12
      (2L, s"$run ${uniq("b", 4)}"),                 // dup window [1,9) of 12
      (3L, s"$run $run"),              // adjacent [1,9)+[9,17) → one 16-run
      (4L, s"d1 $run"),                // with doc 5: [1,9)∪[2,10) → one 9-run
      (5L, s"d1 $run"),
      (6L, uniq("c", 10)),             // all windows unique
      (7L, "short")                    // < 8 tokens → no windows
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanCoverage(docs, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"n_dup_spans", $"n_dup_tokens",
        $"dup_coverage")
      .as[(Long, Int, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val twoThirds = math.rint(8.0 / 12.0 * 1e9) / 1e9
    assert(got == Seq(
      (1L, 12, 1L, 8L, twoThirds),
      (2L, 12, 1L, 8L, twoThirds),
      (3L, 16, 1L, 16L, 1.0),
      (4L, 9, 1L, 9L, 1.0),
      (5L, 9, 1L, 9L, 1.0),
      (6L, 10, 0L, 0L, 0.0),
      (7L, 1, 0L, 0L, 0.0)), got.toString)
  }

  test("linear probe recovers an exactly-linear relationship (zero residuals)") {
    // y = 7 + 3*x1 - 2*x2 exactly, over integer features: the closed-form
    // solve must reproduce it and every residual must round to 0
    (1 to 3).foreach { _ =>
      val rows = (1 to 200).map { _ =>
        val x1 = 1L + rnd.nextInt(500); val x2 = 1L + rnd.nextInt(50)
        (x1, x2, 7L + 3L * x1 - 2L * x2)
      }
      val f = rows.toDF("x1", "x2", "y")
      val scored = graft.ext.LinearProbe.fitAndScore(f)
      val resid = scored.select($"residual").as[Double].collect()
      assert(resid.forall(_ == 0.0), resid.filter(_ != 0.0).take(5).toSeq.toString)
    }
  }

  test("dsir scores separate target-like from raw-only documents") {
    import graft.ext.Selection
    // target pool speaks 'alpha beta'; the raw pool has one doc written in
    // the target dialect and one in pure raw dialect — the integer
    // cross-difference weight must rank the dialect doc strictly positive
    // and the raw-only doc strictly negative
    val docs = Seq(
      (1L, true, "alpha beta alpha beta alpha"),
      (2L, true, "beta alpha beta"),
      (3L, false, "alpha beta alpha"), // target dialect
      (4L, false, "gamma delta gamma delta gamma delta"), // raw-only
      (5L, false, "") // tokenless → score 0
    ).toDF("doc_id", "is_tgt", "text")
    val got = Selection.dsirScores(docs, "doc_id", "text", $"is_tgt")
      .select($"doc_id", $"dsir_score", $"target_like")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(3L, 4L, 5L), got.toString)
    assert(got(0)._2 > 0.0 && got(0)._3, got.toString)
    assert(got(1)._2 < 0.0 && !got(1)._3, got.toString)
    assert(got(2)._2 == 0.0 && !got(2)._3, got.toString)
  }

  test("q69 mixing keeps roughly the token budget (deterministic on fixture)") {
    // expected kept tokens = Σ_s rate_s · t_s ≈ B = floor(0.3 · total)
    // (modulo the min(1,·) caps and hash discretization); the salted-hash
    // draw is deterministic, so this asserts the MATH, not luck
    val out = SparkEntry.queries("q69_source_mixing")(spark, "/root/testdata/sf0.001")
    val row = out.agg(
      sum($"n_tokens".cast("long")).as("total"),
      sum(when($"keep", $"n_tokens".cast("long")).otherwise(0L)).as("kept"))
      .head()
    val (total, kept) = (row.getLong(0), row.getLong(1))
    val budget = math.floor(total * 0.3)
    assert(kept > budget * 0.8 && kept < budget * 1.2,
      s"kept $kept vs budget $budget (total $total)")
  }

  test("distributed BPE training matches an in-memory reference trainer") {
    // plain-Scala BPE: count adjacent pairs weighted by word freq, merge
    // the (freq DESC, lhs, rhs) winner left-to-right non-overlapping
    def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      b.result()
    }
    def refTrain(words: Seq[(String, Long)], n: Int)
        : (Seq[(String, String, Long)], Map[String, Vector[String]]) = {
      var ws = words.map { case (w, f) => (w, w.map(_.toString).toVector, f) }
      val out = Seq.newBuilder[(String, String, Long)]
      var step = 0
      var done = false
      while (step < n && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
          .withDefaultValue(0L)
        for ((_, syms, f) <- ws; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) += f
        if (counts.isEmpty) done = true
        else {
          val ((l, r), c) = counts.toSeq
            .sortBy { case ((l, r), c) => (-c, l, r) }.head
          out += ((l, r, c))
          ws = ws.map { case (w, syms, f) => (w, applyMerge(syms, l, r), f) }
          step += 1
        }
      }
      (out.result(), ws.map { case (w, syms, _) => w -> syms }.toMap)
    }
    (1 to 3).foreach { _ =>
      val words = (1 to 30)
        .map(_ => (1 to (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        .distinct.map(w => w -> (1L + rnd.nextInt(20)))
      val (wantMerges, wantSegs) = refTrain(words, 8)
      // BOTH execution paths must match the reference: the driver-side
      // fast path (default) and the distributed rounds (forced via
      // maxDriverTypes = 0)
      def segsOf(df: org.apache.spark.sql.DataFrame) = df
        .select($"token", graft.ext.Bpe.symbols($"enc"))
        .as[(String, Seq[String])].collect().toMap
        .view.mapValues(_.toVector).toMap
      val (gotMerges, gotSegDf) =
        graft.ext.Bpe.trainMerges(words.toDF("token", "freq"), 8)
      assert(gotMerges.map(m => (m.lhs, m.rhs, m.freq)) == wantMerges)
      assert(segsOf(gotSegDf) == wantSegs)
      val (gotMergesD, gotSegDfD) = graft.ext.Bpe.trainMerges(
        words.toDF("token", "freq"), 8, maxDriverTypes = 0L)
      assert(gotMergesD.map(m => (m.lhs, m.rhs, m.freq)) == wantMerges)
      assert(segsOf(gotSegDfD) == wantSegs)
    }
  }

  test("q94 bin decomposition equals the naive range predicate, random times") {
    // the scale-safe range join (equi-join on a window-width bin + exact
    // residual) must produce EXACTLY the naive BETWEEN pairs — including
    // boundary timestamps — for any event layout
    val binUs = 240000000L
    val halfUs = 120000000L
    (1 to 3).foreach { _ =>
      val probes = (1 to 120).map(i => (i.toLong, rnd.nextLong() % 3000000000L))
      val windows = (1 to 40).map(i => (1000L + i, rnd.nextLong() % 3000000000L))
      val naive = for {
        (pid, pus) <- probes
        (wid, wus) <- windows
        if math.abs(pus - wus) <= halfUs
      } yield (pid, wid)
      val binned = for {
        (pid, pus) <- probes
        (wid, wus) <- windows
        pBin = Math.floorDiv(pus, binUs)
        if pBin >= Math.floorDiv(wus - halfUs, binUs) &&
          pBin <= Math.floorDiv(wus + halfUs, binUs) // window's bin span
        if math.abs(pus - wus) <= halfUs // exact residual
      } yield (pid, wid)
      assert(binned.sorted == naive.sorted)
      // every window spans at most 2 bins (pairs unique by construction)
      windows.foreach { case (_, wus) =>
        assert(Math.floorDiv(wus + halfUs, binUs) -
          Math.floorDiv(wus - halfUs, binUs) <= 1)
      }
    }
  }

  test("q117 multi-probe pigeonhole: Hamming <= 7 always shares a probed band key") {
    // probe keys of band b = exact value plus all 1-bit flips; a pair is a
    // candidate iff some band has the b-side value within Hamming 1 of the
    // a-side value. 7 errors over 4 byte-bands leave <= 1 in some band.
    def bandVals(sig: Long): Seq[Long] =
      (0 until 4).map(b => (sig >> (b * 8)) & 255L)
    def candidate(a: Long, b: Long): Boolean =
      bandVals(a).zip(bandVals(b)).exists { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) <= 1
      }
    (1 to 2000).foreach { _ =>
      val a = rnd.nextLong() & 0xFFFFFFFFL
      // flip exactly k <= 7 distinct bits
      val k = 1 + rnd.nextInt(7)
      val bits = rnd.shuffle((0 until 32).toList).take(k)
      val b = bits.foldLeft(a)((s, i) => s ^ (1L << i))
      assert(java.lang.Long.bitCount(a ^ b) == k)
      assert(candidate(a, b), s"missed pair at hamming $k: $a vs $b")
    }
    // and the converse sanity: distance 8 spread as 2 per band is NOT caught
    val a = 0L
    val b = (0 until 4).foldLeft(0L)((s, band) =>
      s | (3L << (band * 8))) // two bits per band
    assert(java.lang.Long.bitCount(a ^ b) == 8 && !candidate(a, b))
  }

  test("audio codec round trip: decodeAudio(encode(samples)) reproduces " +
      "exact stats for random PCM, both endiannesses, edge values") {
    import javax.sound.sampled._
    def encode(samples: Array[Short], bigEndian: Boolean): Array[Byte] = {
      val raw = new Array[Byte](2 * samples.length)
      samples.zipWithIndex.foreach { case (s, i) =>
        if (bigEndian) {
          raw(2 * i) = ((s >> 8) & 0xFF).toByte
          raw(2 * i + 1) = (s & 0xFF).toByte
        } else {
          raw(2 * i) = (s & 0xFF).toByte
          raw(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        }
      }
      val fmt = new AudioFormat(16000f, 16, 1, true, bigEndian)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong),
        if (bigEndian) AudioFileFormat.Type.AIFF else AudioFileFormat.Type.WAVE,
        out)
      out.toByteArray
    }
    // seeded random PCM plus the edge values that expose sign/endian bugs
    val cases = (0 until 6).map { i =>
      val n = 1 + rnd.nextInt(200)
      val arr = Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
      if (i == 0) { arr(0) = Short.MinValue; arr(n - 1) = Short.MaxValue }
      (i.toLong, arr, i % 2 == 0)
    }
    val rows = cases.map { case (id, arr, be) => (id, encode(arr, be)) }
    val out = graft.ext.Multimodal.decodeAudio(
      rows.toDF("media_id", "payload"), "media_id", "payload")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    cases.foreach { case (id, arr, _) =>
      val r = out(id)
      val l = arr.map(_.toLong)
      assert(r.getAs[Boolean]("decodable"), s"case $id")
      assert(r.getAs[Long]("n_samples") == arr.length.toLong, s"case $id")
      assert(r.getAs[Long]("s_min") == l.min && r.getAs[Long]("s_max") == l.max
        && r.getAs[Long]("s_sum") == l.sum, s"case $id")
    }
  }

  test("JPEG flat-block banding holds for random band patterns: every " +
      "decoded thumbnail cell lands in its source band (q306/q311's " +
      "lossy-gate contract, probed beyond the analytic argument)") {
    // 20 random 4x4 grids of band-centered lumas (32*band + 16,
    // band in 0..6) through a REAL quality-0.9 JPEG round trip — the
    // worst case for DC quantization is adjacent blocks far apart,
    // which random grids hit constantly
    val payloads = (0 until 20).map { case caseId =>
      val bands = Array.fill(16)(rnd.nextInt(7))
      val img = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val g = 32 * bands((y / 8) * 4 + (x / 8)) + 16
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
      (caseId.toLong, out.toByteArray, bands)
    }
    val got = graft.ext.Multimodal.decodeImages(
        payloads.map(p => (p._1, p._2)).toDF("media_id", "payload"),
        "media_id", "payload")
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    payloads.foreach { case (id, _, bands) =>
      val r = got(id)
      assert(r.getAs[Boolean]("decodable"), s"case $id")
      val cells = r.getAs[scala.collection.Seq[Long]]("gray4x4")
      for (i <- 0 until 16) {
        assert(cells(i) / 32 == bands(i).toLong,
          s"case $id cell $i: band ${bands(i)} decoded ${cells(i)}")
      }
    }
  }

  test("snapshot LWW fold matches a reference replay on random CDC logs " +
      "(duplicate seqs tie-broken by src_batch, tombstones, random as-of)") {
    // the fold under test is snapshotAsOf's: max_by((op, fp), (seq,
    // src_batch)) per key, live rows only. The log is written directly as
    // batch partitions (the protocol around it is covered by StreamingSpec
    // and the soak; this pins the FOLD's semantics on shapes the fixtures
    // don't reach — duplicate seqs across batches, delete-then-readd
    // chains, keys that never live)
    (1 to 5).foreach { round =>
      val nKeys = 12
      val nBatches = 6
      val events = (0 until nBatches).flatMap { b =>
        (0 until 8).map { _ =>
          val k = rnd.nextInt(nKeys).toLong
          // seqs drawn from a SMALL range so cross-batch duplicates occur
          val seq = rnd.nextInt(10).toLong
          val op = if (rnd.nextInt(4) == 0) "D" else "U"
          val fp = if (op == "U") Some(k * 100 + seq * 7 + b) else None
          (k, op, fp, seq, b.toLong)
        }
        // in-batch uniqueness per key (the maintainer's post-collapse
        // invariant): keep the max-seq event per key, ties by fp order
        .groupBy(_._1).map { case (_, es) =>
          es.maxBy(e => (e._4, e._3.getOrElse(-1L))) }.toSeq
      }
      val statePath = java.nio.file.Files
        .createTempDirectory(s"graft_lwwprop$round").toString + "/state"
      events.groupBy(_._5).foreach { case (b, rows) =>
        rows.toDF("doc_id", "op", "fp", "seq", "src_batch")
          .coalesce(1).write.parquet(s"$statePath/fps/batch=$b")
      }
      def oracle(maxSeq: Long): Map[Long, Long] =
        events.filter(_._4 <= maxSeq)
          .groupBy(_._1).collect {
            case (k, es) =>
              val best = es.maxBy(e => (e._4, e._5))
              (k, best._2, best._3)
          }.collect { case (k, "U", Some(fp)) => k -> fp }.toMap
      def got(maxSeq: Long): Map[Long, Long] =
        graft.streaming.EventStream.snapshotAsOf(spark, statePath, maxSeq)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      Seq(0L, 3L, 7L, Long.MaxValue).foreach { v =>
        assert(got(v) == oracle(v), s"round $round asOf $v")
      }
    }
  }
}
