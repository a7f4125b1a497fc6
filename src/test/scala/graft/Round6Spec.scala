package graft

import graft.queries.OpsQueries

/** Semantics tests for the round-6 operators: Gopher-rule boundaries on
  * literal fixtures, incremental-rollup ≡ monolithic-rollup equality,
  * salted-join ≡ plain-join equality, priority-sample estimator
  * invariants, rolling-distinct brute-force parity, set-operator
  * cardinality identities, and unpivot round-trip.
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("gopher rules: each rule pins its boundary on literal texts") {
    val pass50 = (1 to 50).map(i => s"the of word$i").mkString(" ")
    val docs = Seq(
      // 200 words, mean len ok, no symbols, all alphabetic, stopwords: PASS
      (1L, pass50),
      // 49 words -> r1 fails (below min length)
      (2L, "the of " + (1 to 47).map(i => s"w$i").mkString(" ")),
      // mean word length < 3 -> r2 fails
      (3L, "the of " + (1 to 60).map(_ => "a b").mkString(" ")),
      // heavy '#' load -> r3 fails
      (4L, "the of " + (1 to 60).map(i => s"w$i#").mkString(" ")),
      // >20% numeric-only words -> r4 fails
      (5L, "the of " + (1 to 30).map(i => s"word$i 123 456").mkString(" ")),
      // no stopwords at all -> r5 fails
      (6L, (1 to 60).map(i => s"word$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = OpsQueries.gopherFlags(docs, "text")
      .orderBy("doc_id")
      .select("r1", "r2", "r3", "r4", "r5").collect()
    assert(out(0).toSeq == Seq(true, true, true, true, true))
    assert(!out(1).getBoolean(0))
    assert(!out(2).getBoolean(1) && out(2).getBoolean(0))
    assert(!out(3).getBoolean(2))
    assert(!out(4).getBoolean(3))
    assert(!out(5).getBoolean(4))
  }

  test("q165 incremental merge equals the monolithic rollup") {
    import org.apache.spark.sql.functions._
    val inc = SparkEntry.queries("q165_incremental_agg")(spark, dir)
      .orderBy("event_type").collect()
    val mono = Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), QueryDef.dsum($"value").as("total"),
        max($"value").as("vmax"), min($"value").as("vmin"))
      .orderBy("event_type").collect()
    assert(inc.length == mono.length)
    inc.zip(mono).foreach { case (i, m) =>
      assert(i.getAs[String]("event_type") == m.getAs[String]("event_type"))
      assert(i.getAs[Long]("n") == m.getAs[Long]("n"))
      assert(i.getAs[Double]("total") == m.getAs[Double]("total"))
      assert(i.getAs[Double]("vmax") == m.getAs[Double]("vmax"))
      assert(i.getAs[Double]("vmin") == m.getAs[Double]("vmin"))
    }
  }

  test("q166 salted join result is identical to the plain broadcast join") {
    import org.apache.spark.sql.functions._
    val salted = SparkEntry.queries("q166_salted_join")(spark, dir)
      .orderBy("event_type").collect()
    val ev = Tables.events(spark, dir)
    val dim = ev.select($"event_type").distinct()
      .withColumn("weight", length($"event_type").cast("long") * 10L + 1L)
    val plain = ev.join(broadcast(dim), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(($"value" * $"weight".cast("double")) * lit(1e6))
          .cast("long")).cast("double") / lit(1e6)).as("weighted_sum"))
      .orderBy("event_type").collect()
    assert(salted.toSeq.map(_.toSeq) == plain.toSeq.map(_.toSeq))
  }

  test("q167 priority sample: ranks dense, est_w = max(w, tau) >= w") {
    val rows = SparkEntry.queries("q167_priority_sample")(spark, dir)
      .orderBy("rnk").collect()
    assert(rows.length == 100)
    assert(rows.map(_.getAs[Int]("rnk")).toSeq == (1 to 100))
    // est_w never below the item's own weight, and the threshold tau is
    // shared: every est_w is either w (w >= tau) or one common tau value
    val taus = rows.map(r =>
      r.getAs[Double]("est_w") - r.getAs[Long]("w").toDouble)
      .filter(_ != 0.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("est_w") >= r.getAs[Long]("w").toDouble)
    }
    val estOfNonW = rows.filter(r =>
      r.getAs[Double]("est_w") != r.getAs[Long]("w").toDouble)
      .map(_.getAs[Double]("est_w")).distinct
    assert(estOfNonW.length <= 1, estOfNonW.toSeq)
  }

  test("q168 rolling distinct matches a driver-side brute force") {
    val out = SparkEntry.queries("q168_rolling_distinct")(spark, dir)
      .orderBy("report_d").collect()
      .map(r => (r.getAs[java.sql.Date]("report_d").toLocalDate,
        r.getAs[Long]("wau"), r.getAs[Long]("dau")))
    val ud = Tables.events(spark, dir)
      .select($"user_id", org.apache.spark.sql.functions.to_date($"ts")
        .as("d"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("d").toLocalDate))
    val days = ud.map(_._2).distinct.sorted
    val expect = days.map { d =>
      val wau = ud.filter { case (_, ud2) =>
        !ud2.isAfter(d) && !ud2.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length.toLong
      val dau = ud.filter(_._2 == d).map(_._1).distinct.length.toLong
      (d, wau, dau)
    }
    assert(out.toSeq == expect.toSeq)
  }

  test("q169 set ops satisfy the inclusion-exclusion identities") {
    val m = SparkEntry.queries("q169_setops")(spark, dir).collect()
      .map(r => r.getAs[String]("op") -> r.getAs[Long]("n")).toMap
    val inter = m("intersect"); val ab = m("except_ab")
    val ba = m("except_ba"); val un = m("union")
    assert(un == inter + ab + ba)
    assert(un >= inter && ab >= 0 && ba >= 0)
  }

  test("q171 pagerank: 20 ranked rows, descending, never below the base") {
    val rows = SparkEntry.queries("q171_pagerank")(spark, dir)
      .orderBy("rank").collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 20))
    val prs = rows.map(_.getAs[Long]("pr"))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b })
    // damped base: every node keeps at least the teleport mass
    assert(prs.forall(_ >= 150000000L))
  }

  test("q172 forward as-of: latency within (0, 5min], null iff unmatched") {
    val rows = SparkEntry.queries("q172_asof_forward")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val matched = r.getAs[Boolean]("matched")
      if (matched) {
        val lat = r.getAs[Long]("latency_us")
        assert(lat >= 1L && lat <= 300000000L, lat)
      } else assert(r.isNullAt(r.fieldIndex("latency_us")))
    }
  }

  test("q173 window suite: cume_dist tops out at 1e9 once per user") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q173_window_suite")(spark, dir)
    val per = out.groupBy($"user_id")
      .agg(max($"cd9").as("mx"),
        countDistinct($"first_et").as("nf"),
        countDistinct($"last_et").as("nl"),
        sum(when($"cd9" === 1000000000L, 1L).otherwise(0L)).as("ntop"))
      .collect()
    per.foreach { r =>
      assert(r.getAs[Long]("mx") == 1000000000L)
      assert(r.getAs[Long]("nf") == 1L && r.getAs[Long]("nl") == 1L)
      assert(r.getAs[Long]("ntop") == 1L)
    }
  }

  test("q174 seasonal: full 5x7x24 spine, diff ties out") {
    val rows = SparkEntry.queries("q174_seasonal_baseline")(spark, dir)
      .collect()
    assert(rows.length == 5 * 7 * 24)
    rows.foreach { r =>
      assert(r.getAs[Long]("diff_fp") ==
        r.getAs[Long]("actual") * 1000000L - r.getAs[Long]("expected_fp"))
    }
  }

  test("q184 hamilton quotas sum exactly to the 1000-doc budget") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q184_hamilton_quota")(spark, dir)
    val tot = rows.agg(sum($"quota")).head.getLong(0)
    assert(tot == 1000L)
    // every quota within 1 of the exact proportional share
    val r = rows.select($"n_tokens", $"floor_share", $"quota").collect()
    r.foreach { x =>
      val q = x.getAs[Long]("quota"); val f = x.getAs[Long]("floor_share")
      assert(q == f || q == f + 1)
    }
  }

  test("q186 adoption: cumulative monotone, totals tie to distinct users") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q186_adoption_curve")(spark, dir)
    val perType = out.groupBy($"event_type")
      .agg(max($"cum_adopters").as("final"), sum($"n_new").as("tot"))
      .collect()
    val ev = Tables.events(spark, dir)
    perType.foreach { r =>
      assert(r.getAs[Long]("final") == r.getAs[Long]("tot"))
      val expect = ev.where($"event_type" === r.getAs[String]("event_type"))
        .select($"user_id").distinct().count()
      assert(r.getAs[Long]("final") == expect)
    }
  }

  test("q170 unpivot emits 3 metric rows per source, values match wide") {
    import org.apache.spark.sql.functions._
    val long = SparkEntry.queries("q170_unpivot")(spark, dir)
    val counts = long.groupBy($"source").count().collect()
    assert(counts.forall(_.getAs[Long]("count") == 3L))
    val back = long.groupBy($"source")
      .pivot($"metric", Seq("n_docs", "n_tokens", "n_bytes"))
      .agg(first($"value"))
    val nd = back.agg(sum($"n_docs")).head.getLong(0)
    val total = Tables.documents(spark, dir).count()
    assert(nd == total)
  }
}
