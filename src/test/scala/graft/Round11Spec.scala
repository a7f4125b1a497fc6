package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the round-8 additions beyond the oracle gate:
  * memorization-depth bounds against the document substrate, the
  * diversity-index algebra, hubness-histogram conservation laws, and the
  * margin/accuracy consistency between q299 and q97.
  */
class Round11Spec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q296 memorization depth: bounds, split purity, and a planted " +
      "verbatim run is measured exactly") {
    val rows = SparkEntry.queries("q296_memorization_depth")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    // every audited doc is a test-split doc, kept even at depth 0
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        graft.ext.TextAnalysis.tokenCount($"text").as("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val nTok = docs(id)
      val run = r.getAs[Long]("max_run_tokens")
      val mw = r.getAs[Long]("max_run_windows")
      val nm = r.getAs[Long]("n_matched_windows")
      // a run of k overlapping 8-grams covers k+7 tokens, within the doc
      assert(run <= nTok, s"doc $id: run $run > $nTok tokens")
      assert(if (mw > 0) run == mw + 7 else run == 0, r)
      assert(mw <= nm, r)
      // a doc under 8 tokens has no windows at all
      if (nTok < 8) assert(nm == 0 && run == 0, r)
    }
    // planted contamination: one train doc and one test doc sharing a
    // verbatim 12-token run must yield max_run_windows = 5 (12−8+1) for
    // the test doc. Split membership is the salted doc_id hash, so pick
    // ids by probing the same hash the query uses.
    def split(id: Long): String = {
      val b = graft.ext.TextAnalysis.hash60Java(s"split:$id") % 100
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    }
    val trainId = (0L to 500L).find(split(_) == "train").get
    val testId = (0L to 500L).find(split(_) == "test").get
    val run12 = (1 to 12).map(i => s"planted$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft_memo").toString
    Seq(
      (trainId, s"aaa bbb $run12 ccc ddd eee fff ggg hhh"),
      (testId, s"xxx yyy zzz $run12 qqq www rrr ttt uuu"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val planted = SparkEntry.queries("q296_memorization_depth")(spark, tmp)
      .collect()
    assert(planted.length == 1 && planted.head.getAs[Long]("doc_id") == testId)
    assert(planted.head.getAs[Long]("max_run_windows") == 5L, planted.head)
    assert(planted.head.getAs[Long]("max_run_tokens") == 12L, planted.head)
  }

  test("q297 token diversity: index algebra holds on the fixture and on " +
      "a hand-computed corpus") {
    val rows = SparkEntry.queries("q297_token_diversity")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val v = r.getAs[Long]("n_types")
      val eff = r.getAs[Long]("eff_vocab_1e6")
      val gini = r.getAs[Long]("gini_simpson_1e9")
      val ttr = r.getAs[Long]("ttr_1e9")
      val top = r.getAs[Long]("top_share_1e9")
      // effective vocabulary is between 1 and the true type count
      assert(eff >= 1000000L && eff <= v * 1000000L, r)
      assert(gini >= 0L && gini < 1000000000L, r)
      assert(ttr >= 0L && ttr <= 1000000000L, r)
      // the top type alone bounds concentration: Σc² ≥ top² ⇒
      // eff ≤ (N/top)² · 1e6, and top share is at least 1/V
      assert(top * v >= 1000000000L - v, r)
      assert(n >= v, r)
    }
    // hand-computed: "a a a b" → N=4, V=2, Σc²=10, eff=1.6, gini=0.375,
    // ttr=0.5, top=0.75
    val tmp = java.nio.file.Files.createTempDirectory("graft_div").toString
    Seq((0L, "src0", "a a a b"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val one = SparkEntry.queries("q297_token_diversity")(spark, tmp).head()
    assert(one.getAs[Long]("n_tokens") == 4L)
    assert(one.getAs[Long]("n_types") == 2L)
    assert(one.getAs[Long]("eff_vocab_1e6") == 1600000L)
    assert(one.getAs[Long]("gini_simpson_1e9") == 375000000L)
    assert(one.getAs[Long]("ttr_1e9") == 500000000L)
    assert(one.getAs[Long]("top_share_1e9") == 750000000L)
  }

  test("q298 hubness: histogram conserves nodes and edges; cumulative " +
      "share is monotone to 1") {
    val rows = SparkEntry.queries("q298_knn_hubness")(spark, dir)
      .sort($"indeg").collect()
    assert(rows.nonEmpty)
    val nNodes = rows.map(_.getAs[Long]("n_nodes")).sum
    // Σ indeg·n_nodes = |edges| (every edge lands on exactly one dst)
    val edgeMass = rows.map(r =>
      r.getAs[Long]("indeg") * r.getAs[Long]("n_nodes")).sum
    val edges = SparkEntry.queries("q149_knn_graph")(spark, dir).count()
    assert(edgeMass == edges, s"$edgeMass != $edges")
    // shares sum to ~1 (integer-floor division loses < #rows units)
    val shareSum = rows.map(_.getAs[Long]("share_1e9")).sum
    assert(shareSum <= 1000000000L && shareSum > 1000000000L - rows.length)
    val cums = rows.map(_.getAs[Long]("cum_share_1e9"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(cums.last == nNodes * 1000000000L / nNodes) // floor(1) exactly
  }

  test("q299 centroid margin agrees with q97 accuracy: separated ⇔ " +
      "nearest-centroid-correct up to rounding ties") {
    val margin = SparkEntry.queries("q299_centroid_margin")(spark, dir)
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_separated"))).toMap
    val acc = SparkEntry.queries("q97_centroid_probe")(spark, dir)
      .collect().map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_correct"))).toMap
    assert(margin.keySet == acc.keySet && margin.nonEmpty)
    margin.foreach { case (label, (n, sep)) =>
      val (n2, correct) = acc(label)
      assert(n == n2, s"label $label: $n != $n2")
      // margin > 0 implies the own centroid ranks first, so separated ≤
      // correct; ties (margin == 0) are broken toward the smaller label
      // by q97, so the gap is exactly the tied vectors
      assert(sep <= correct, s"label $label: sep $sep > correct $correct")
    }
    val sepTotal = margin.values.map(_._2).sum
    assert(sepTotal > 0, "fixture must have separable labels")
  }

  test("bench compact record stays parseable under a 47-flag tripwire " +
      "storm (the BENCH_r10 parsed-null shape) and under zero flags") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def parse(s: String) = mapper.readTree(s)
    // the r10 shape: mostly host-attributed ambient flags plus a handful
    // of code-attributed ones, long query names, 14 canaries
    val canaries = Seq(0.711, 0.269, 0.197, 0.191, 0.185, 0.181, 0.321,
      0.205, 0.196, 0.178, 0.493, 1.044, 0.177, 0.173)
    val ioCanaries = canaries.map(_ * 0.5)
    val flagged = (1 to 43).map(i =>
      Bench.Flag(f"q${i + 200}%03d_some_rather_long_query_name_$i", 0.5,
        2.5, 1.044, 0.5, "unknown", "host")) ++ Seq(
      Bench.Flag("q298_jittery_same_plan", 0.3, 0.9, 0.177, 0.09, "same",
        "jit"),
      Bench.Flag("q303_variant_path", 2.43, 6.017, 0.177, 0.09, "changed",
        "code"),
      Bench.Flag("q305_recursive_spine", 1.203, 2.812, 0.177, 0.09,
        "changed", "code"),
      Bench.Flag("q309_audio_fingerprint_dedup", 1.57, 4.1, 0.177, 0.09,
        "unknown", "code"),
      Bench.Flag("q315_medallion_gate", 4.98, 11.317, 0.173, 0.09,
        "changed", "code"))
    val line = Bench.compactRecord(348.296, 0.711, 0.173, canaries,
      ioCanaries, flagged, "/root/testdata/sf0.1")
    assert(line.length <= 1500, s"len ${line.length}")
    val j = parse(line) // throws on malformed JSON
    assert(j.get("value").asDouble() == 348.296)
    assert(j.get("reg_host_n").asInt() == 43)
    assert(j.get("reg_jit_n").asInt() == 1)
    assert(j.get("reg_code_n").asInt() == 4)
    assert(j.get("regressions").size() == 4)
    assert(j.get("regressions").get("q315_medallion_gate")
      .get("attrib").asText() == "code")
    assert(j.get("regressions").get("q315_medallion_gate")
      .get("plan").asText() == "changed")
    assert(j.get("canaries").size() == 14)
    assert(j.get("io_canaries").size() == 14)
    assert(j.get("regressions").get("q303_variant_path")
      .get("io_canary").asDouble() == 0.09)
    // pathological: hundreds of code flags — detail must shrink until the
    // line fits, counts intact
    val storm = (1 to 300).map(i =>
      Bench.Flag(f"q${i}%03d_very_long_descriptive_query_name_variant_$i",
        0.1 + i * 0.001, 5.0 + i * 0.01, 0.18, 0.09, "changed", "code"))
    val l2 = Bench.compactRecord(999.0, 0.2, 0.2, canaries, ioCanaries,
      storm, "/root/testdata/sf0.1")
    assert(l2.length <= 1500, s"len ${l2.length}")
    val j2 = parse(l2)
    assert(j2.get("reg_code_n").asInt() == 300)
    assert(j2.get("regressions").size() < 300)
    // worst ratio first: q001 has now/prev = 5.01/0.101 (max) and must
    // survive truncation
    assert(j2.get("regressions").has(
      "q001_very_long_descriptive_query_name_variant_1"))
    // quiet run: empty regressions object, zero counts
    val l3 = Bench.compactRecord(200.0, 0.2, 0.21, Seq(0.2, 0.21),
      Seq(0.1, 0.1), Nil, "/root/testdata/sf0.1")
    val j3 = parse(l3)
    assert(j3.get("reg_host_n").asInt() == 0)
    assert(j3.get("reg_code_n").asInt() == 0)
    assert(j3.get("regressions").size() == 0)
  }

  test("plan fingerprint: stable across rebuilds, exprIds, and checkpoint " +
      "RDD ids; sensitive to operators, numeric literals, and columns") {
    def q(thresh: Int) = spark.read.parquet(s"$dir/lineitem.parquet")
      .where($"l_quantity" > thresh)
      .groupBy($"l_returnflag")
      .agg(sum($"l_extendedprice").as("s"))
    // identical code → identical hash (fresh plans get fresh exprIds; the
    // fingerprint must not see them)
    assert(Bench.planFingerprint(q(10)) == Bench.planFingerprint(q(10)))
    // a numeric literal change IS a code change
    assert(Bench.planFingerprint(q(10)) != Bench.planFingerprint(q(20)))
    // an operator change IS a code change
    val withSort = q(10).orderBy($"s")
    assert(Bench.planFingerprint(q(10)) !=
      Bench.planFingerprint(withSort))
    // a column swap IS a code change (attribute names are hashed)
    val other = spark.read.parquet(s"$dir/lineitem.parquet")
      .where($"l_quantity" > 10)
      .groupBy($"l_returnflag")
      .agg(sum($"l_tax").as("s"))
    assert(Bench.planFingerprint(q(10)) != Bench.planFingerprint(other))
    // localCheckpoint materializes to a LogicalRDD whose id varies per
    // call — the once-per-session substrate gates all return these, and
    // their fingerprints must still compare equal across sessions
    val c1 = spark.range(50).selectExpr("id", "id % 5 as k")
      .localCheckpoint()
    val c2 = spark.range(50).selectExpr("id", "id % 5 as k")
      .localCheckpoint()
    assert(Bench.planFingerprint(c1) == Bench.planFingerprint(c2))
  }
}
