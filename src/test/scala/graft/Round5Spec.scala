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
}
