package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the round-7 operators: SymSpell blocking's exact
  * recall proven against a quadratic reference join, rank-AUC against the
  * brute-force pair count, the kNN triangle census against a driver-side
  * adjacency-set count over q149's edge list, and the closed-form OLS
  * slope against Spark's own covar_pop/var_pop.
  */
class Round7Spec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q197 symspell: identical to the quadratic levenshtein reference") {
    val got = SparkEntry.queries("q197_symspell")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq
    // reference: brute-force all-pairs join (fine at 150 names), same
    // ordering and limit — the blocked candidate set must lose nothing
    val names = Tables.customer(spark, dir)
      .groupBy($"c_name".as("tok")).agg(count(lit(1)).as("c"))
    val want = names.select($"tok".as("tok_a"), $"c".as("c_a"))
      .crossJoin(names.select($"tok".as("tok_b"), $"c".as("c_b")))
      .where($"tok_a" < $"tok_b" &&
        levenshtein($"tok_a", $"tok_b") === 1)
      .select($"tok_a", $"tok_b",
        when(length($"tok_a") === length($"tok_b"), lit("sub"))
          .otherwise(lit("indel")).as("edit_type"),
        ($"c_a" + $"c_b").as("c_total"))
      .orderBy($"c_total".desc, $"tok_a".asc, $"tok_b".asc)
      .limit(20)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q198 auc equals the brute-force scaled pair count") {
    val rows = SparkEntry.queries("q198_auc_rank")(spark, dir)
      .where($"signal" === "n_chars").collect()
    assert(rows.length == 1)
    val (np, nn, auc) =
      (rows(0).getLong(1), rows(0).getLong(2), rows(0).getDouble(3))
    val d = Tables.documents(spark, dir)
      .select(($"lang" === "en").cast("long").as("pos"),
        $"n_chars".cast("long").as("score"))
    val pos = d.where($"pos" === 1).select($"score".as("sp"))
    val neg = d.where($"pos" === 0).select($"score".as("sn"))
    val pair = pos.crossJoin(neg).agg(
      sum(when($"sp" > $"sn", 1L).otherwise(0L)).as("gt"),
      sum(when($"sp" === $"sn", 1L).otherwise(0L)).as("eq"),
      count(lit(1)).as("n")).collect()(0)
    val (gt, eq, n) =
      (pair.getLong(0), pair.getLong(1), pair.getLong(2))
    assert(n == np * nn)
    // same final operation: integer numerator, one double division
    assert(auc == (2L * gt + eq).toDouble / (2L * np * nn).toDouble)
  }

  test("q199 triangle census matches adjacency-set counting on q149 edges") {
    val row = SparkEntry.queries("q199_triangles")(spark, dir).collect()(0)
    val und = SparkEntry.queries("q149_knn_graph")(spark, dir)
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = und.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nTri = und.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).count(w => w > v)
    }.sum.toLong
    val nWedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(row.getLong(0) == adj.size.toLong)     // n_nodes
    assert(row.getLong(1) == und.size.toLong)     // n_edges
    assert(row.getLong(2) == nTri)                // n_tri
    assert(row.getLong(3) == nWedges)             // n_wedges
    assert(nTri > 0)
  }

  test("q201 grid join: identical to the quadratic distance reference") {
    val got = SparkEntry.queries("q201_grid_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val p = Tables.embeddings(spark, dir)
      .select($"vec_id",
        floor(element_at($"embedding", 1).cast("double") * 1e6)
          .cast("long").as("xi"),
        floor(element_at($"embedding", 2).cast("double") * 1e6)
          .cast("long").as("yi"))
    val want = p.select($"vec_id".as("a"), $"xi", $"yi")
      .crossJoin(p.select($"vec_id".as("b"), $"xi".as("xb"), $"yi".as("yb")))
      .where($"a" < $"b")
      .withColumn("dist2", ($"xi" - $"xb") * ($"xi" - $"xb") +
        ($"yi" - $"yb") * ($"yi" - $"yb"))
      .where($"dist2" <= 20000L * 20000L)
      .select($"a", $"b", $"dist2")
      .orderBy($"dist2".asc, $"a".asc, $"b".asc).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q202 cusum matches a driver-side integer replay") {
    val got = SparkEntry.queries("q202_cusum_shift")(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getDate(2).toString, r.getLong(3)))).toMap
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0),
        r.getTimestamp(1).toInstant.toString.take(10), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (tpe, rows) =>
      val series = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val n = series.size.toLong
      val t = series.map(_._2).sum
      var s = 0L
      val cusum = series.map { case (day, y) => s += n * y - t; (day, s.abs) }
      val mx = cusum.map(_._2).max
      val (cpDay, sAbs) = cusum.find(_._2 == mx).get
      assert(got(tpe) == ((n, cpDay, sAbs)), s"$tpe")
    }
  }

  test("q203 buckets partition each source and norm_value is monotone") {
    val rows = SparkEntry.queries("q203_quantile_norm")(spark, dir).collect()
    val bySource = rows.groupBy(_.getString(0))
    val total = Tables.documents(spark, dir).count()
    assert(bySource.values.map(_.map(_.getLong(2)).sum).sum == total)
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 20L), src)
    }
    val norm = rows.map(r => r.getLong(1) -> r.getDouble(4))
      .distinct.sortBy(_._1).map(_._2)
    assert(norm.zip(norm.tail).forall { case (a, b) => a <= b })
  }

  test("q204 lift matches a driver-side basket replay") {
    val got = SparkEntry.queries("q204_lift_rules")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val ut = Tables.events(spark, dir)
      .select($"user_id", $"event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val n = ut.map(_._1).distinct.size.toLong
    val ca = ut.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val cab = ut.groupBy(_._1).toSeq.flatMap { case (_, ts) =>
      val types = ts.map(_._2).sorted
      for { a <- types; b <- types if a < b } yield (a, b)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.keySet == cab.keySet && got.nonEmpty)
    cab.foreach { case ((a, b), c) =>
      val (gca, gcb, gcab, glift) = got((a, b))
      assert((gca, gcb, gcab) == ((ca(a), ca(b), c)), s"$a/$b")
      assert(glift == (n * c).toDouble / (ca(a) * ca(b)).toDouble, s"$a/$b")
    }
  }

  test("q205 hits matches a driver-side integer replay on q149 edges") {
    val got = SparkEntry.queries("q205_hits")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    val edges = SparkEntry.queries("q149_knn_graph")(spark, dir)
      .select($"src", $"dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var h = nodes.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 4) {
      val rawa = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => h(e._1)).sum
      }
      val am = rawa.values.max
      a = nodes.map(n => n -> rawa.getOrElse(n, 0L) / (am / 1000000L + 1L))
        .toMap
      val rawh = edges.groupBy(_._1).map { case (s0, es) =>
        s0 -> es.map(e => a(e._2)).sum
      }
      val hm = rawh.values.max
      h = nodes.map(n => n -> rawh.getOrElse(n, 0L) / (hm / 1000000L + 1L))
        .toMap
    }
    val want = nodes.map(n => (n, a(n), h(n)))
      .sortBy { case (n, av, _) => (-av, n) }.take(20)
      .zipWithIndex.map { case ((n, av, hv), i) => (i + 1, n, av, hv) }
    assert(got == want)
    assert(got.head._3 >= 900000L)
  }

  test("q206 knn classifier matches a driver-side vote replay") {
    val got = SparkEntry.queries("q206_knn_classifier")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val lab = Tables.embeddings(spark, dir).select($"vec_id", $"label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = SparkEntry.queries("q149_knn_graph")(spark, dir)
      .select($"src", $"dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = edges.groupBy(_._1).toSeq.map { case (src, es) =>
      val votes = es.map(e => lab(e._2)).groupBy(identity)
        .map { case (l, vs) => (l, vs.size) }
      val pred = votes.toSeq.sortBy { case (l, v) => (-v, l) }.head._1
      (lab(src), pred)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want)
    assert(got.values.sum == edges.map(_._1).distinct.size.toLong)
  }

  test("q207 weighted median: half the token mass sits at or below it") {
    val rows = SparkEntry.queries("q207_weighted_median")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val masses = Tables.documents(spark, dir)
      .select($"source", $"n_chars".cast("long").as("v"),
        size(graft.ext.TextAnalysis.tokens($"text")).cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.groupBy(_._1)
    assert(rows.map(_._1).toSet == masses.keySet && rows.nonEmpty)
    rows.foreach { case (src, med, tot) =>
      val ms = masses(src)
      assert(ms.map(_._3).sum == tot, src)
      val below = ms.filter(_._2 <= med).map(_._3).sum
      assert(2L * below >= tot, src)
      // minimality: the previous distinct length does not reach half
      val prev = ms.map(_._2).filter(_ < med)
      if (prev.nonEmpty) {
        val belowPrev = ms.filter(_._2 <= prev.max).map(_._3).sum
        assert(2L * belowPrev < tot, src)
      }
    }
  }

  test("q208 spearman agrees with corr() over float average ranks") {
    val got = SparkEntry.queries("q208_spearman")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val d = Tables.documents(spark, dir)
      .select($"source", $"n_chars".cast("long").as("x"),
        size(graft.ext.TextAnalysis.tokens($"text")).cast("long").as("y"))
    def avgRank(c: String) =
      rank().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"source").orderBy(col(c))).cast("double") +
        (count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"source", col(c))).cast("double") - 1.0) / 2.0
    val want = d.withColumn("u", avgRank("x")).withColumn("v", avgRank("y"))
      .groupBy($"source").agg(corr($"u", $"v").as("rho"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) <= 1e-9, s"$k: $v vs ${want(k)}")
    }
  }

  test("q209 sole-late matches a driver-side exists/not-exists replay") {
    val got = SparkEntry.queries("q209_sole_late_supplier")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val os = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey".as("ok"), $"l_suppkey".as("sk"))
      .agg(max(when(expr("l_shipdate > o_orderdate + INTERVAL 60 DAY"),
        1L).otherwise(0L)).as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byOrder = os.groupBy(_._1)
    val sole = os.filter { case (ok, sk, late) =>
      late == 1L &&
        byOrder(ok).exists(o => o._2 != sk) &&
        !byOrder(ok).exists(o => o._2 != sk && o._3 == 1L)
    }
    val names = Tables.supplier(spark, dir)
      .select($"s_suppkey", $"s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = sole.groupBy(_._2).toSeq
      .map { case (sk, rows) => (names(sk), rows.length.toLong) }
      .sortBy { case (n, c) => (-c, n) }.take(10)
    assert(got == want && got.nonEmpty)
  }

  test("q210 interpolation matches a driver-side replay, same IEEE order") {
    val got = SparkEntry.queries("q210_linear_interp")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    val evs = Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
        when($"event_type" === "error", lit(null).cast("double"))
          .otherwise($"value").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    var n = 0
    evs.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).toIndexedSeq
      for (i <- sorted.indices if sorted(i)._4.isEmpty) {
        n += 1
        val before = (i - 1 to 0 by -1).find(j => sorted(j)._4.nonEmpty)
        val after = (i + 1 until sorted.size).find(j => sorted(j)._4.nonEmpty)
        val (gf, gv) = got((sorted(i)._1, sorted(i)._2))
        assert(gf == (before.nonEmpty && after.nonEmpty))
        (before, after) match {
          case (Some(b), Some(a)) =>
            val (us0, v0) = (sorted(b)._3, sorted(b)._4.get)
            val (us1, v1) = (sorted(a)._3, sorted(a)._4.get)
            val us = sorted(i)._3
            val vi = v0 + (v1 - v0) *
              ((us - us0).toDouble / (us1 - us0).toDouble)
            assert(gv.contains(math.floor(vi * 1e9).toLong))
          case _ => assert(gv.isEmpty)
        }
      }
    }
    assert(n > 0 && got.size == n)
  }

  test("q211 sparse cosine pairs match a driver-side integer replay") {
    val got = SparkEntry.queries("q211_sparse_cosine_pairs")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val tf = Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        explode(graft.ext.TextAnalysis.tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok")
      .agg(count(lit(1)).as("tf"), max($"source").as("source"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val nDocs = tf.map(_._1).distinct.size.toLong
    val df = tf.groupBy(_._2).map { case (t, rs) => t -> rs.size.toLong }
    val srcOf = tf.map(r => r._1 -> r._4).toMap
    val w = tf.map { case (d, t, f, _) =>
      (d, t, f * math.min(nDocs * 1000L / df(t), 100000L))
    }
    val byDoc = w.groupBy(_._1)
      .map { case (d, rs) => d -> rs.map(r => r._2 -> r._3).toMap }
    val norms = byDoc.map { case (d, m) =>
      d -> m.values.map(x => x * x).sum
    }
    // candidates from EVERY shared token within the source block (no
    // prefix cut): accepted pairs over the full candidate space must
    // equal the query's prefix-indexed output — the prefix filter's
    // no-false-negatives theorem checked end to end against an unpruned
    // driver-side replay
    val cand = w.groupBy(_._2).values
      .flatMap { rs =>
        val ds = rs.map(_._1).toSeq.distinct
        for { a <- ds; b <- ds if a < b && srcOf(a) == srcOf(b) }
          yield (a, b)
      }.toSet
    val want = cand.toSeq.flatMap { case (a, b) =>
      val (ma, mb) = (byDoc(a), byDoc(b))
      val dot = ma.keysIterator
        .map(t => ma(t) * mb.getOrElse(t, 0L)).sum
      val d2 = BigInt(dot) * BigInt(dot)
      val nanb = BigInt(norms(a)) * BigInt(norms(b))
      if (25 * d2 >= 16 * nanb)
        Some((srcOf(a), a, b,
          math.floor(d2.toDouble / nanb.toDouble * 10000.0).toLong))
      else None
    }.sortBy { case (_, a, b, c) => (-c, a, b) }.take(20)
    assert(got == want && got.nonEmpty)
  }

  test("q212 tvd matches a driver-side integer histogram replay") {
    val got = SparkEntry.queries("q212_tvd_drift")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    val hrs = Tables.events(spark, dir)
      .select($"event_type", hour($"ts").as("h"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    val m = hrs.size.toLong
    val glob = hrs.groupBy(_._2).map { case (h, rs) => h -> rs.size.toLong }
    val want = hrs.groupBy(_._1).map { case (t, rs) =>
      val n = rs.size.toLong
      val c = rs.groupBy(_._2).map { case (h, xs) => h -> xs.size.toLong }
      val num = c.map { case (h, ch) => (ch * m - glob(h) * n).abs }.sum
      t -> (n, num.toDouble / (2L * n * m).toDouble)
    }
    assert(got == want)
  }

  test("q213 cohort ltv: exact decimal accumulation, monotone per cohort") {
    val rows = SparkEntry.queries("q213_cohort_ltv")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val byAge = rs.sortBy(_._2)
      byAge.zip(byAge.tail).foreach { case (a, b) =>
        assert(a._4 <= b._4, s"$cohort: ltv not monotone")
      }
      assert(byAge.map(_._3).distinct.size == 1, cohort)
    }
    // total value conservation: last cum per cohort * n_users sums to
    // the exact decimal total of purchase values
    val totalGot = rows.groupBy(_._1).map { case (_, rs) =>
      val last = rs.maxBy(_._2)
      BigDecimal(last._4) * last._3
    }.sum.toDouble
    val totalWant = Tables.events(spark, dir)
      .where($"event_type" === "purchase")
      .agg(sum($"value".cast(org.apache.spark.sql.types.DecimalType(18, 4))
        ).cast("double")).collect()(0).getDouble(0)
    assert(math.abs(totalGot - totalWant) <= 1e-6 * math.abs(totalWant))
  }

  test("q214 kcore: 8 rounds reach the true until-stable 3-core") {
    val got = SparkEntry.queries("q214_kcore")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var und = SparkEntry.queries("q149_knn_graph")(spark, dir)
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    var stable = false
    while (!stable) { // peel to FIXPOINT, not a fixed round count
      val deg = (und.toSeq.map(_._1) ++ und.toSeq.map(_._2))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val next = und.filter { case (u, v) => deg(u) >= 3 && deg(v) >= 3 }
      stable = next == und
      und = next
    }
    val lab = Tables.embeddings(spark, dir).select($"vec_id", $"label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nodes = (und.toSeq.map(_._1) ++ und.toSeq.map(_._2)).distinct
    val want = nodes.groupBy(lab).map { case (l, v) => l -> v.size.toLong }
    assert(got == want && got.values.sum > 0)
  }

  test("q215 mrr matches a driver-side fixed-point replay") {
    val got = SparkEntry.queries("q215_mrr_eval")(spark, dir)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val lab = Tables.embeddings(spark, dir).select($"vec_id", $"label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val edges = SparkEntry.queries("q149_knn_graph")(spark, dir)
      .select($"src", $"dst", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val firstHit = edges.filter(e => lab(e._1) == lab(e._2))
      .groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._3).min }
    val want = lab.toSeq.groupBy(_._2).map { case (l, vs) =>
      val rrs = vs.map(v => firstHit.get(v._1)
        .map(r => 1000000000L / r).getOrElse(0L))
      l -> (vs.size.toLong,
        vs.count(v => firstHit.contains(v._1)).toLong,
        rrs.sum / vs.size)
    }
    assert(got == want && got.nonEmpty)
  }

  test("q216 peak load matches a driver-side sweep") {
    val got = SparkEntry.queries("q216_peak_load")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val evs = Tables.events(spark, dir)
      .select($"event_type", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = evs.groupBy(_._1).map { case (t, rs) =>
      val us = rs.map(_._2).sorted
      val counts = us.map(u =>
        (u, us.count(x => x >= u && x <= u + 3600000000L).toLong))
      val mx = counts.map(_._2).max
      val (pu, pc) = counts.filter(_._2 == mx).minBy(_._1)
      t -> (pu, pc)
    }
    assert(got == want)
  }

  test("q217 streaks match a driver-side gaps-and-islands replay") {
    val got = SparkEntry.queries("q217_streaks")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val days = Tables.events(spark, dir)
      .select($"user_id", date_trunc("day", $"ts").cast("date").as("d"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
    val want = days.groupBy(_._1).map { case (u, rs) =>
      val ds = rs.map(_._2).sorted
      var streaks = List.empty[Long]
      var prev = Long.MinValue
      for (d <- ds) {
        if (d == prev + 1) streaks = (streaks.head + 1) :: streaks.tail
        else streaks = 1L :: streaks
        prev = d
      }
      u -> (ds.size.toLong, streaks.max, streaks.size.toLong)
    }
    assert(got == want && got.nonEmpty)
    assert(got.values.exists(_._2 > 1)) // at least one real streak
  }

  test("q218 fingerprint is order-independent and change-sensitive") {
    val rows = SparkEntry.queries("q218_table_fingerprint")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // xor replay on the driver from the same 60-bit row hashes
    val hs = Tables.orders(spark, dir)
      .select($"o_orderdate".cast("date").cast("string").as("day"),
        expr("CAST(conv(substring(md5(concat_ws('|', o_orderkey, " +
          "o_custkey, o_orderstatus, o_orderpriority)), 1, 15), 16, 10)" +
          " AS BIGINT)").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = hs.groupBy(_._1).map { case (d, v) =>
      d -> (v.size.toLong, v.map(_._2).foldLeft(0L)(_ ^ _))
    }
    assert(rows.map(r => r._1 -> (r._2, r._3)).toMap == want)
    // flipping any single row flips its day's fingerprint
    val (d0, n0, f0) = rows.head
    val flipped = want(d0)._2 ^ 12345L
    assert(flipped != f0 && n0 > 0)
  }

  test("q219 z-order locality beats id-order locality on this corpus") {
    val r = SparkEntry.queries("q219_zorder_locality")(spark, dir)
      .collect()(0)
    val (n, zf, idf) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n > 0)
    assert(zf > idf, s"z $zf should beat id $idf")
    assert(zf > 0.9, s"z locality should be near 1, got $zf")
  }

  test("q200 slope agrees with covar_pop/var_pop to 1e-9 relative") {
    val got = SparkEntry.queries("q200_ols_trend")(spark, dir)
      .select($"event_type", $"slope").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val daily = Tables.events(spark, dir)
      .groupBy($"event_type", date_trunc("day", $"ts").as("d"))
      .agg(count(lit(1)).as("y"))
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type")
    val want = daily
      .withColumn("x", datediff($"d", min($"d").over(wt)).cast("double"))
      .groupBy($"event_type")
      .agg((covar_pop($"x", $"y") / var_pop($"x")).as("slope"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"$k: $v vs ${want(k)}")
    }
  }
}
