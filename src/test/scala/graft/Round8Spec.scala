package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the round-8 operators: BFS conservation and seed
  * accounting, NDCG bounds + pinned discount literals, EWMA first-day
  * exactness, Benford digit/expectation conservation, ACF pair counts
  * against the spine arithmetic, and the q225 HLL registers replayed by an
  * independent driver-side Scala implementation.
  */
class Round8Spec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q220 bfs: counts conserve the corpus and seeds sit at dist 0") {
    val rows = SparkEntry.queries("q220_bfs_hops")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = Tables.embeddings(spark, dir).count()
    val seeds = Tables.embeddings(spark, dir)
      .where($"vec_id" < 10).count()
    assert(rows.values.sum == total)
    assert(rows(0) == seeds)
    assert(rows.keySet.subsetOf((-1 to 4).toSet))
    // hops reach beyond the seed set on the fixture graph
    assert(rows.getOrElse(1, 0L) > 0L)
  }

  test("q221 ndcg: bounded by the fixed-point scale; literals pinned") {
    // the discount literals are driver-computed once; pin them so an
    // accidental re-derivation (different log base, rounding) is loud
    assert(graft.queries.SimilarityQueries.NdcgW2 == 630929753L)
    assert(graft.queries.SimilarityQueries.NdcgIdcg == 2130929753L)
    val rows = SparkEntry.queries("q221_ndcg_eval")(spark, dir).collect()
    val total = Tables.embeddings(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(rows.forall { r =>
      val m = r.getLong(2); m >= 0L && m <= 1000000000L })
  }

  test("q222 ewma: first observed day per type equals its count exactly") {
    val out = SparkEntry.queries("q222_ewma_trend")(spark, dir)
    val first = out.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"day")))
      .where($"rn" === 1)
      .select($"n_events", $"ewma").collect()
    assert(first.nonEmpty)
    // no prior days contribute, so num/den = x·2^30 / 2^30 = x exactly
    first.foreach(r =>
      assert(r.getDouble(1) == r.getLong(0).toDouble))
  }

  test("q223 benford: digit counts and expectations conserve") {
    val rows = SparkEntry.queries("q223_benford")(spark, dir).collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to 9))
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, dir).count())
    val expSum = graft.queries.ProfilingQueries.BenfordExp1e9.sum
    // nine floors of probabilities summing to 1 lose < 1 ulp each
    assert(expSum <= 1000000000L && expSum >= 1000000000L - 9L)
  }

  test("q224 acf: pair counts follow the spine arithmetic; |r| bounded") {
    val rows = SparkEntry.queries("q224_acf")(spark, dir).collect()
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0))
    val spans = Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg((datediff(max(date_trunc("day", $"ts").cast("date")),
        min(date_trunc("day", $"ts").cast("date"))) + 1).as("len"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (tpe, lag, n) = (r.getString(0), r.getInt(1), r.getLong(2))
      assert(n == spans(tpe) - lag)
    }
  }

  test("q226 median: histogram selection equals the sort-based median") {
    val got = SparkEntry.queries("q226_exact_median")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val vals = Tables.documents(spark, dir)
      .select($"source", $"n_chars".cast("long")).as[(String, Long)]
      .collect().groupBy(_._1)
    vals.foreach { case (src, rows) =>
      val v = rows.map(_._2).sorted
      val n = v.length
      val want =
        if (n % 2 == 1) v(n / 2).toDouble
        else (v(n / 2 - 1) + v(n / 2)).toDouble / 2.0
      assert(got(src) == want, s"source $src")
    }
  }

  test("q227 hll union: merged registers dominate every per-source state") {
    val per = SparkEntry.queries("q225_hll_replay")(spark, dir)
      .collect().map(r => r.getLong(3)).toSeq
    val u = SparkEntry.queries("q227_hll_union")(spark, dir).collect()(0)
    val (nExact, est) = (u.getLong(1), u.getLong(3))
    // union estimate can never fall below any single source's estimate
    // (element-wise MAX only raises registers, which only lowers Z)
    assert(est >= per.max)
    assert(nExact <= Tables.documents(spark, dir)
      .select($"source").distinct().count() * per.length)
    assert(u.getLong(2) < 64L) // some register is occupied
  }

  test("q228 weighted jaccard: bounds, pair count, and one exact replay") {
    val rows = SparkEntry.queries("q228_weighted_jaccard")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nSrc = Tables.documents(spark, dir)
      .select($"source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2)
    assert(rows.forall(t => t._4 >= 0L && t._4 <= 1000000000L))
    // exact replay of the first pair driver-side
    val (sa, sb, im, wj) = rows.minBy(t => (t._1, t._2))
    val hist = Tables.documents(spark, dir)
      .select($"source", $"text").as[(String, String)].collect()
      .filter(d => d._1 == sa || d._1 == sb)
      .flatMap { case (src, text) =>
        val t = text.trim
        (if (t.isEmpty) Array.empty[String]
         else t.toLowerCase.split("\\s+")).map(src -> _)
      }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val toks = hist.keys.map(_._2).toSet
    val interMin = toks.toSeq.map { t =>
      math.min(hist.getOrElse(sa -> t, 0L), hist.getOrElse(sb -> t, 0L))
    }.sum
    val (ta, tb) = (hist.collect { case ((s, _), c) if s == sa => c }.sum,
      hist.collect { case ((s, _), c) if s == sb => c }.sum)
    assert(im == interMin)
    assert(wj == interMin * 1000000000L / (ta + tb - interMin))
  }

  test("q229 rfm: segments conserve customers and live in the cube") {
    val rows = SparkEntry.queries("q229_rfm")(spark, dir).collect()
    val nCust = Tables.orders(spark, dir)
      .select($"o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    assert(rows.forall { r =>
      val s = r.getInt(0)
      val (a, b, c) = (s / 100, s / 10 % 10, s % 10)
      Seq(a, b, c).forall(x => x >= 1 && x <= 5) })
  }

  test("q230 dbscan: clusters match an independent driver-side BFS") {
    val got = SparkEntry.queries("q230_grid_dbscan")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // independent reference: snap + threshold + flood fill in plain Scala
    val pts = Tables.embeddings(spark, dir)
      .select(element_at($"embedding", 1).cast("double"),
        element_at($"embedding", 2).cast("double"))
      .as[(Double, Double)].collect()
    def g(x: Double) = math.min(511L, math.max(0L,
      (math.floor(x * 1e6).toLong + 8388608L) / 32768L))
    val cellCounts = pts.map { case (x, y) => (g(x), g(y)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val t = (pts.length + 511) / 512
    val core = cellCounts.filter(_._2 >= t).keys.toSet
    var seen = Set.empty[(Long, Long)]
    val want = core.toSeq.sorted.flatMap { start =>
      if (seen(start)) None else {
        var comp = Set(start); var frontier = List(start); seen += start
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap { case (x, y) =>
            for { dx <- -1L to 1L; dy <- -1L to 1L
              p = (x + dx, y + dy)
              if core(p) && !seen(p) } yield { seen += p; comp += p; p }
          }
        }
        val id = comp.map { case (x, y) => x * 512 + y }.min
        Some((id, comp.size.toLong,
          comp.toSeq.map(cellCounts).sum))
      }
    }.toSet
    assert(got == want)
    assert(got.size > 1) // the fixture plane is genuinely multi-modal
  }

  test("q231 watermark audit: lateness replayed per type driver-side") {
    val got = SparkEntry.queries("q231_watermark_audit")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ev = Tables.events(spark, dir)
      .select($"event_type", $"event_id", unix_micros($"ts"))
      .as[(String, Long, Long)].collect()
    val want = ev.groupBy(_._1).map { case (tpe, rows) =>
      var hwm = Long.MinValue; var late = 0L; var maxLate = 0L
      rows.sortBy(_._2).foreach { case (_, _, us) =>
        hwm = math.max(hwm, us)
        val l = hwm - us
        if (l > 7200000000L) late += 1
        if (l > maxLate) maxLate = l
      }
      tpe -> (rows.length.toLong, late, maxLate / 1000000L)
    }
    assert(got == want)
  }

  test("q232 lift: capture monotone, final decile is the base rate") {
    val rows = SparkEntry.queries("q232_decile_lift")(spark, dir)
      .orderBy($"decile").collect()
    assert(rows.length == 10)
    val caps = rows.map(_.getLong(4))
    assert(caps.zip(caps.tail).forall { case (a, b) => a <= b })
    assert(caps.last == 1000000000L)
    assert(rows.last.getLong(5) == 1000000L) // lift over everything = 1
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, dir).count())
  }

  test("q233 assortativity: bounded correlation over symmetric pairs") {
    val r = SparkEntry.queries("q233_assortativity")(spark, dir)
      .collect()(0)
    assert(math.abs(r.getDouble(1)) <= 1.0)
    assert(r.getLong(0) % 2 == 0) // both orientations of each edge
  }

  test("q234 negatives: 4 per probe, none is a kNN positive, hash replay") {
    val rows = SparkEntry.queries("q234_negative_sampling")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val perProbe = rows.groupBy(_._1)
    assert(perProbe.size == 100 && perProbe.values.forall(_.length == 4))
    val edges = SparkEntry.queries("q149_knn_graph")(spark, dir)
      .select($"src", $"dst").as[(Long, Long)].collect().toSet
    assert(rows.forall { case (v, _, n) => !edges.contains(v -> n) })
    // hash replay for one probe: slots drawn in order, self/positives skipped
    val nv = Tables.embeddings(spark, dir).count()
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        .substring(0, 15), 16)
    val want = (1 to 8).map(i => h60(s"7:$i") % nv)
      .filter(n => n != 7L && !edges.contains(7L -> n)).take(4)
    assert(perProbe(7L).sortBy(_._2).map(_._3).toSeq == want)
  }

  test("q235 native hll agg: buffer equals the relational registers") {
    import graft.ext.TextAnalysis
    graft.functions.GraftFunctions.register(spark)
    val raw = Tables.documents(spark, dir)
      .select($"source", explode(TextAnalysis.tokens($"text")).as("token"))
    // native path: RAW tokens (duplicate-insensitive MAX fold)
    val native = raw
      .select($"source", TextAnalysis.hash60Fast(spark, $"token").as("h"))
      .groupBy($"source")
      .agg(call_function("hll_registers", $"h").as("regs"))
      .select($"source", posexplode($"regs").as(Seq("bucket", "m")))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    // relational path over DISTINCT tokens + zero-filled spine
    val rel = TextAnalysis.hllRegisters(spark, raw.distinct(),
      $"source", $"token")
      .collect()
      .map(r => (r.getString(0), r.getLong(1).toInt) -> r.getInt(2))
      .toMap // (source, bucket) -> m, sparse
    val sources = rel.keys.map(_._1).toSet
    val want = (for { s <- sources; b <- 0 until 64 }
      yield (s, b, rel.getOrElse((s, b), 0))).toSet
    assert(native == want)
  }

  test("q236 two-hop: counts match a driver-side adjacency-set replay") {
    val got = SparkEntry.queries("q236_two_hop")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = SparkEntry.queries("q149_knn_graph")(spark, dir)
      .select($"src", $"dst").as[(Long, Long)].collect()
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val all = Tables.embeddings(spark, dir)
      .select($"vec_id").as[Long].collect()
    all.foreach { v =>
      val direct = adj.getOrElse(v, Set.empty)
      val shell = direct.flatMap(m => adj.getOrElse(m, Set.empty)) -
        v -- direct
      assert(got(v) == shell.size.toLong, s"vec $v")
    }
  }

  test("q237 quartiles: interpolation matches a driver-side sort") {
    val got = SparkEntry.queries("q237_exact_quartiles")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val vals = Tables.documents(spark, dir)
      .select($"source", $"n_chars".cast("long")).as[(String, Long)]
      .collect().groupBy(_._1)
    vals.foreach { case (src, rows) =>
      val v = rows.map(_._2).sorted
      Seq(1, 2, 3).foreach { q =>
        val prod = q * (v.length - 1)
        val k = prod / 4
        val frac = (prod % 4).toDouble / 4.0
        val v2 = v(math.min(k + 1, v.length - 1))
        val want = v(k).toDouble + frac * (v2 - v(k)).toDouble
        assert(got((src, q / 4.0)) == want, s"$src p=$q/4")
      }
    }
  }

  test("q238 cms: never undercounts, exact when a row is collision-free") {
    val rows = SparkEntry.queries("q238_countmin")(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getBoolean(4)) // no_undercount
      assert(r.getLong(2) >= r.getLong(1) && r.getLong(3) >= 0L)
    }
    // driver-side CMS replay for the most frequent token
    val tc = Tables.documents(spark, dir)
      .select(explode(graft.ext.TextAnalysis.tokens($"text")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        .substring(0, 15), 16)
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    tc.foreach { case (tok, c) =>
      (0 to 3).foreach { r =>
        val b = h60(s"cms$r:$tok") % 1024
        cells((r, b)) = cells.getOrElse((r, b), 0L) + c
      }
    }
    val top = tc.sortBy(t => (-t._2, t._1)).head
    val est = (0 to 3).map(r => cells((r, h60(s"cms$r:${top._1}") % 1024))).min
    val got = rows.find(_.getString(0) == top._1).get
    assert(got.getLong(1) == top._2 && got.getLong(2) == est)
  }

  test("q239 tukey: tails consistent with the quartile fences") {
    val fences = SparkEntry.queries("q239_tukey_fences")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap
    val quart = SparkEntry.queries("q237_exact_quartiles")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val docs = Tables.documents(spark, dir)
      .select($"source", $"n_chars".cast("double")).as[(String, Double)]
      .collect().groupBy(_._1)
    fences.foreach { case (src, (n, lo, hi, flo, fhi)) =>
      val q1 = quart((src, 0.25)); val q3 = quart((src, 0.75))
      assert(flo == q1 - 1.5 * (q3 - q1) && fhi == q3 + 1.5 * (q3 - q1))
      val xs = docs(src).map(_._2)
      assert(n == xs.length)
      assert(lo == xs.count(_ < flo) && hi == xs.count(_ > fhi))
    }
  }

  test("q242 clustering coef: corner credits sum to 3x the global census") {
    val rows = SparkEntry.queries("q242_clustering_coef")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val global = SparkEntry.queries("q199_triangles")(spark, dir)
      .collect()(0).getAs[Long]("n_tri")
    assert(rows.map(_._2).sum == 3L * global)
    rows.foreach { case (deg, tri, coef) =>
      assert(coef >= 0L && coef <= 1000000000L)
      if (deg < 2) assert(tri == 0L && coef == 0L)
    }
  }

  test("q243 equi-depth: contiguous bins of near-equal count") {
    val rows = SparkEntry.queries("q243_equidepth_hist")(spark, dir)
      .orderBy($"bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.orders(spark, dir).count()
    assert(rows.length == 8)
    assert(rows.map(_._4).sum == total)
    assert(rows.map(_._4).max - rows.map(_._4).min <= 1L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 <= b._2) // hi of bin k ≤ lo of bin k+1
    }
  }

  test("q244 top brand: argmax agrees with a driver-side group max") {
    val got = SparkEntry.queries("q244_top_brand")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    val spend = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.part(spark, dir).select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"o_custkey", $"p_brand")
      .agg(QueryDef.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .as("spend"))
      .as[(Long, String, Double)].collect()
    spend.groupBy(_._1).foreach { case (cust, rows) =>
      val want = rows.minBy(t => (-t._3, t._2))
      assert(got(cust) == (want._2, want._3), s"cust $cust")
    }
  }

  test("q245 gaps: segment medians match a driver-side sort") {
    val got = SparkEntry.queries("q245_interorder_gap")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val gaps = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderdate".cast("date").as("o_orderdate"),
        $"o_orderkey")
      .join(Tables.customer(spark, dir)
        .select($"c_custkey".as("o_custkey"), $"c_mktsegment"),
        "o_custkey")
      .as[(Long, java.sql.Date, Long, String)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._2.toLocalDate.toEpochDay, r._3))
        sorted.sliding(2).toSeq.collect {
          case Seq(a, b) =>
            b._4 ->
              (b._2.toLocalDate.toEpochDay - a._2.toLocalDate.toEpochDay)
        }
      }
    gaps.groupBy(_._1).foreach { case (seg, rows) =>
      val v = rows.map(_._2).sorted
      val n = v.length
      val want =
        if (n % 2 == 1) v(n / 2).toDouble
        else (v(n / 2 - 1) + v(n / 2)).toDouble / 2.0
      assert(got(seg)._1 == n.toLong && got(seg)._2 == want, s"seg $seg")
    }
  }

  test("q249 cheapest path: costs dominate BFS reachability") {
    val cost = SparkEntry.queries("q249_cheapest_path")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hops = SparkEntry.queries("q220_bfs_hops")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // same reachable set: cost ≥ 0 iff hops reached it within the budget
    assert(cost.values.count(_ >= 0L) == hops.collect {
      case (d, n) if d >= 0 => n }.sum)
    // seeds are free; every reached non-seed path costs something
    (0L until 10L).foreach(v => assert(cost(v) == 0L))
    assert(cost.forall { case (v, c) => v < 10 || c != 0L })
  }

  test("q248 hof: fold equals the exploded-sum reference") {
    val got = SparkEntry.queries("q248_array_hof")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ref = Tables.embeddings(spark, dir)
      .select($"vec_id", explode($"embedding").as("x"))
      .groupBy($"vec_id")
      .agg(sum(expr("CAST(floor(abs(CAST(x AS DOUBLE)) * 1e6) AS BIGINT)"))
          .as("l1"),
        max(expr("CAST(floor(abs(CAST(x AS DOUBLE)) * 1e6) AS BIGINT)"))
          .as("mx"),
        sum(when($"x" > 0f, 1L).otherwise(0L)).as("np"),
        sum(when(abs($"x".cast("double")) > 0.5, 1L).otherwise(0L))
          .as("nl"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == ref)
  }

  test("q250 conductance: cut/vol identities hold against the edge list") {
    val rows = SparkEntry.queries("q250_conductance")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val edges = SparkEntry.queries("q149_knn_graph")(spark, dir)
      .select($"src", $"dst").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    // Σ vol = 2·|E|; every φ is in [0, 1e9]; cut ≤ vol
    assert(rows.map(_._1).sum == 2L * edges.length)
    rows.foreach { case (vol, cut, phi) =>
      assert(cut <= vol && phi >= 0L && phi <= 1000000000L)
    }
  }

  test("q251 crosslang: pair mass equals q36's verified pairs") {
    val rows = SparkEntry.queries("q251_crosslang_dups")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val dup = SparkEntry.queries("q36_minhash_lsh")(spark, dir).count()
    assert(rows.map(_._3).sum == dup)
    rows.foreach { case (lx, ly, n, cross) =>
      assert(lx <= ly && cross <= n)
      if (lx == ly) assert(cross == 0L) else assert(cross == n)
    }
  }

  test("q225 hll: registers match an independent driver-side replay") {
    val got = SparkEntry.queries("q225_hll_replay")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // independent reference: plain Scala over the collected corpus
    val docs = Tables.documents(spark, dir)
      .select($"source", $"text").as[(String, String)].collect()
    val toks = docs.flatMap { case (src, text) =>
      val t = text.trim
      (if (t.isEmpty) Array.empty[String]
       else t.toLowerCase.split("\\s+")).map(src -> _)
    }.distinct
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val want = toks.groupBy(_._1).map { case (src, ts) =>
      val regs = Array.fill(64)(0)
      ts.foreach { case (_, tok) =>
        val h = h60(tok)
        val bucket = (h >>> 54).toInt
        val w = h & ((1L << 54) - 1)
        val rho =
          if (w == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(bucket)) regs(bucket) = rho
      }
      val z = regs.map(m => 1L << (55 - m)).sum
      val num = 0.7213 / (1.0 + 1.079 / 64.0) * 4096.0 * 36028797018963968.0
      val est = math.floor(num / z.toDouble).toLong
      src -> (ts.length.toLong, regs.count(_ == 0).toLong, est)
    }
    assert(got == want)
  }
}
