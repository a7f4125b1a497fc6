package graft

import graft.ext.{Dedup, TextAnalysis}

/** Semantics tests for the round-5 operators: substring scrub, MMR
  * invariants, proportional interleave balance, length-bucketed batching
  * arithmetic, and kNN-graph degree bounds.
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("scrub removes exactly the cross-doc duplicated span, keeps the rest") {
    val docs = Seq(
      (1L, "A b c d e f g h unique1 tail1"),
      (2L, "a b c d e f g h unique2 tail2"),
      (3L, "totally different words only here now")).toDF("doc_id", "text")
    val out = Dedup.scrubDupSpans(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // docs 1/2 share the 8-word prefix (case-normalized); spans at offsets
    // 2/3 differ, so the merged dup interval is exactly tokens [1, 9)
    assert(out(0).getAs[Long]("n_kept") == 2L)
    assert(out(0).getAs[Long]("n_removed") == 8L)
    assert(out(0).getAs[Long]("cleaned_h") ==
      TextAnalysis.hash60Java("unique1 tail1"))
    assert(out(1).getAs[Long]("n_kept") == 2L)
    assert(out(1).getAs[Long]("cleaned_h") ==
      TextAnalysis.hash60Java("unique2 tail2"))
    // doc 3 is untouched: cleaned text = whitespace-normalized lowercase
    assert(out(2).getAs[Long]("n_removed") == 0L)
    assert(out(2).getAs[Long]("cleaned_h") ==
      TextAnalysis.hash60Java("totally different words only here now"))
  }

  test("scrub of an all-duplicate doc leaves the empty fingerprint") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8")).toDF("doc_id", "text")
    val out = Dedup.scrubDupSpans(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Long]("n_kept") == 0L))
    assert(out.forall(_.getAs[Long]("cleaned_h") ==
      TextAnalysis.hash60Java("")))
  }

  test("MMR: rank-1 is max relevance and picked scores never increase") {
    val rows = SparkEntry.queries("q148_mmr_diverse")(spark, dir)
      .orderBy("rank").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 10)
    val rels = rows.map(_.getAs[Double]("rel"))
    val scores = rows.map(_.getAs[Double]("mmr_score"))
    // greedy MMR's picked-score sequence is non-increasing FROM RANK 2:
    // a candidate's max-sim penalty only grows as the selected set grows.
    // (rank 1 is exempt: it pays no penalty, while a negative sim can BOOST
    // rank 2 above 0.5*rel of the relevance argmax)
    val tail = scores.drop(1)
    assert(tail.zip(tail.tail).forall { case (a, b) => b <= a + 1e-9 })
    // rank 1 pays no penalty, so it is the relevance argmax
    assert(rels(0) >= rels.max - 1e-12)
  }

  test("interleave is proportional: each source spreads evenly over steps") {
    val rows = SparkEntry.queries("q146_interleave_order")(spark, dir)
      .orderBy("step").collect()
    assert(rows.length == 500)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rs) =>
      val n = rs.length
      val firstHalf = rs.count(_.getAs[Long]("step") <= 250)
      // a proportional interleave puts ~half of each source in each half
      assert(math.abs(firstHalf - n / 2.0) <= 3.0,
        s"source skewed: $firstHalf of $n in first half")
    }
  }

  test("length batching: caps are powers of two and padding arithmetic holds") {
    val rows = SparkEntry.queries("q147_length_batching")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cap = r.getAs[Long]("bin_cap")
      val nDocs = r.getAs[Long]("n_docs")
      val nBatches = r.getAs[Long]("n_batches")
      val tokens = r.getAs[Long]("n_tokens")
      val pad = r.getAs[Long]("pad_tokens")
      assert((cap & (cap - 1)) == 0L, s"cap $cap not a power of two")
      assert(nBatches == (nDocs + 31) / 32)
      assert(pad == nDocs * cap - tokens)
      assert(pad >= 0L)
    }
  }

  test("knn graph: at most 3 neighbors per src, mutual edges are symmetric") {
    val rows = SparkEntry.queries("q149_knn_graph")(spark, dir).collect()
    val bySrc = rows.groupBy(_.getAs[Long]("src"))
    assert(bySrc.values.forall(_.length <= 3))
    val edges = rows.map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    rows.foreach { r =>
      val mutual = r.getAs[Boolean]("mutual")
      val rev = (r.getAs[Long]("dst"), r.getAs[Long]("src"))
      assert(mutual == edges.contains(rev))
    }
  }

  test("chunk overlap: stride-64 starts, 128-cap, last chunk may be short") {
    val rows = SparkEntry.queries("q150_chunk_overlap")(spark, dir).collect()
    rows.foreach { r =>
      val start = r.getAs[Int]("start_tok")
      val n = r.getAs[Int]("n_chunk_tokens")
      assert((start - 1) % 64 == 0)
      assert(n >= 1 && n <= 128)
      assert(r.getAs[Int]("chunk_idx") == (start - 1) / 64)
    }
  }

  test("semantic clusters: members ≥ 2, cluster_id is the min member") {
    val rows = SparkEntry.queries("q151_semantic_clusters")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2L)
      assert(r.getAs[Long]("max_member") > r.getAs[Long]("cluster_id"))
    }
  }

  test("ccnet bands: per-source tercile sizes differ by at most one") {
    val rows = SparkEntry.queries("q152_ccnet_bands")(spark, dir).collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sizes = rs.groupBy(_.getAs[Int]("band")).view.mapValues(_.length)
      assert(sizes.keySet == Set(1, 2, 3))
      assert(sizes.values.max - sizes.values.min <= 1)
      // tail band is the drop band
      rs.foreach(r =>
        assert(r.getAs[Boolean]("keep") == (r.getAs[Int]("band") < 3)))
    }
  }

  test("pack manifest: per-sequence cells tile 512 slots without overlap") {
    val rows = SparkEntry.queries("q156_pack_manifest")(spark, dir).collect()
    rows.groupBy(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id")))
      .foreach { case (_, cells) =>
        val sorted = cells.sortBy(_.getAs[Long]("start_in_seq"))
        // contiguous tiling: each cell starts where the previous ended
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[Long]("end_in_seq") == b.getAs[Long]("start_in_seq"))
          case _ =>
        }
        assert(sorted.head.getAs[Long]("start_in_seq") == 0L ||
          sorted.length == 1) // a straddling doc's tail cell starts at 0
        cells.foreach { c =>
          val n = c.getAs[Long]("n_cell_tokens")
          assert(n >= 1L && n <= 512L)
        }
      }
    // exactly one head segment per document
    val heads = rows.filter(_.getAs[Boolean]("is_head"))
      .map(_.getAs[Long]("doc_id"))
    assert(heads.distinct.length == heads.length)
  }

  test("passage keepers: keeper is the lexicographic min instance") {
    val rows = SparkEntry.queries("q157_chunk_dedup")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_instances") >= 2L)
      assert(r.getAs[Long]("n_docs") >= 1L)
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_instances"))
    }
  }

  test("debounce: suppression only counts within-5s same-key repeats") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // literal frame: u1/click fires at 0s, 3s (dup), 10s (fresh);
    // u1/view at 4s is a different key; u2/click at 4s a different user
    val ev = Seq(
      (1L, "1970-01-01 00:00:00", 1L, "click"),
      (2L, "1970-01-01 00:00:03", 1L, "click"),
      (3L, "1970-01-01 00:00:10", 1L, "click"),
      (4L, "1970-01-01 00:00:04", 1L, "view"),
      (5L, "1970-01-01 00:00:04", 2L, "click"))
      .toDF("event_id", "ts_s", "user_id", "event_type")
      .select($"event_id", $"ts_s".cast("timestamp").as("ts"),
        $"user_id", $"event_type")
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_type")
      .orderBy($"us".asc, $"event_id".asc)
    val out = ev.select($"user_id", $"event_type", $"event_id",
        unix_micros($"ts").as("us"))
      .withColumn("prev_us", lag($"us", 1).over(byKey))
      .withColumn("suppressed",
        $"prev_us".isNotNull && ($"us" - $"prev_us") <= 5000000L)
      .orderBy($"event_id").collect()
    assert(out.map(_.getAs[Boolean]("suppressed")).toSeq ==
      Seq(false, true, false, false, false))
  }

  test("scrub conserves tokens: kept + removed = original, corpus-wide") {
    val out = SparkEntry.queries("q144_substring_scrub")(spark, dir).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") ==
        r.getAs[Int]("n_tokens").toLong)
      assert(r.getAs[Long]("n_removed") >= 0L)
    }
  }

  test("pack manifest conserves tokens: cells of a doc sum to its count") {
    import org.apache.spark.sql.functions._
    val cells = SparkEntry.queries("q156_pack_manifest")(spark, dir)
      .groupBy("doc_id").agg(sum("n_cell_tokens").as("cell_sum"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.ext.TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .where(col("n") >= 1)
    val bad = docs.join(cells, Seq("doc_id"), "left")
      .where(col("cell_sum").isNull || col("cell_sum") =!= col("n"))
    assert(bad.isEmpty)
  }

  test("packing frontier: longer sequences fill no worse, mix no less") {
    val rows = SparkEntry.queries("q159_packing_frontier")(spark, dir)
      .orderBy("seq_len").collect()
    assert(rows.map(_.getAs[Int]("seq_len")).toSeq == Seq(256, 512, 1024))
    val mixed = rows.map(_.getAs[Double]("mixed_share"))
    // more slots per window ⇒ at least as many multi-doc windows
    assert(mixed(0) <= mixed(1) + 1e-9 && mixed(1) <= mixed(2) + 1e-9)
  }
}
