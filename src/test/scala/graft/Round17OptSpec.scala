package graft

import org.apache.spark.sql.functions._

/** Round-17 OPTIMIZATION round pins: the adaptive CC engine dispatch
  * (driver union-find at or under the measured edge cap, distributed loop
  * above it) must be invisible in the results — only the engine changes.
  */
class Round17OptSpec extends SparkSpec {

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("adaptive connectedComponents: driver dispatch (default cap) and " +
      "forced-distributed (driverCap=0) agree on an adversarial graph") {
    import spark.implicits._
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),   // path
      (20L, 25L), (20L, 24L), (20L, 23L),               // star
      (30L, 31L), (31L, 32L), (32L, 30L), (32L, 33L),   // cycle + tail
      (40L, 41L), (41L, 40L),                           // dup/reversed
      (50L, 50L)                                        // self-loop
    ).toDF("a", "b")
    val driver = labelsOf(
      graft.ext.Dedup.connectedComponents(edges, "a", "b"))
    val dist = labelsOf(graft.ext.Dedup.connectedComponents(
      edges, "a", "b", driverCap = 0))
    assert(driver == dist)
    assert(driver(14L) == 10L && driver(50L) == 50L)
  }

  test("adaptive connectedComponentsStar: driver dispatch and " +
      "forced-distributed agree, including the self-loop-only node " +
      "exclusion star has always had") {
    import spark.implicits._
    // long path (the adversarial diameter star-contraction exists for),
    // plus a self-loop-only node that must NOT appear in either output
    val edges = ((0L until 30L).map(i => (i, i + 1L)) ++ Seq((99L, 99L)))
      .toDF("a", "b")
    val driver = labelsOf(
      graft.ext.Dedup.connectedComponentsStar(edges, "a", "b"))
    val dist = labelsOf(graft.ext.Dedup.connectedComponentsStar(
      edges, "a", "b", driverCap = 0))
    assert(driver == dist)
    assert(!driver.contains(99L) && driver(30L) == 0L)
  }

  test("adaptive CC: an over-cap edge list falls back to the " +
      "distributed loop (no silent truncation at the cap boundary)") {
    import spark.implicits._
    // 20 shallow 2-node components (label-prop's diameter contract holds)
    val edges = (0L until 40L by 2L).map(i => (i, i + 1L)).toDF("a", "b")
    // cap=5 < 20 edges: the distributed loop must label all 40 nodes
    val got = labelsOf(graft.ext.Dedup.connectedComponents(
      edges, "a", "b", driverCap = 5))
    assert(got.size == 40 &&
      got.forall { case (id, c) => c == id - (id % 2) })
    val gotStar = labelsOf(graft.ext.Dedup.connectedComponentsStar(
      edges, "a", "b", driverCap = 5))
    assert(gotStar == got)
  }

  test("q230 rewrite: the min+jump pointer-jumping fixpoint equals " +
      "connectedComponents min labels on an adversarial core graph " +
      "(long chain + isolated self-edge-only cell + star)") {
    import spark.implicits._
    // edge list in q230's (cell, nb) shape: every cell has its (0,0)
    // self-edge; neighborhood relation symmetric
    val sym = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),   // chain
      (20L, 21L), (20L, 22L), (20L, 23L)                  // star
    )
    val edges = (sym ++ sym.map(e => (e._2, e._1)) ++
      (Seq(1L, 2L, 3L, 4L, 5L, 6L, 20L, 21L, 22L, 23L, 40L)
        .map(c => (c, c))))                               // 40 isolated
      .toDF("cell", "nb").localCheckpoint()
    // the pre-r17 loop (min round + pointer jump to observed fixpoint)
    def minRound(l: org.apache.spark.sql.DataFrame) =
      edges.join(l.select($"cell".as("nb"), $"lab"), "nb")
        .groupBy($"cell").agg(min($"lab").as("lab"))
    var lab = edges.select($"cell").distinct()
      .select($"cell", $"cell".as("lab")).localCheckpoint()
    def labSum(l: org.apache.spark.sql.DataFrame) =
      l.agg(sum($"lab".cast(
        org.apache.spark.sql.types.DecimalType(38, 0)))).head().getDecimal(0)
    var lastSum = labSum(lab)
    var fixed = false
    var rounds = 0
    while (!fixed && rounds < 12) {
      val m = minRound(lab).localCheckpoint()
      lab = m.join(m.select($"cell".as("lab"), $"lab".as("root")), "lab")
        .select($"cell", $"root".as("lab")).localCheckpoint()
      val s2 = labSum(lab)
      fixed = s2.compareTo(lastSum) == 0
      lastSum = s2
      rounds += 1
    }
    val loop = labelsOf(lab)
    val cc = labelsOf(graft.ext.Dedup.connectedComponents(
      edges, "cell", "nb"))
    assert(cc == loop)
    assert(cc(40L) == 40L && cc(6L) == 1L && cc(23L) == 20L)
  }

  test("BoundedGraph.bfsVisited ≡ the distributed frontier loop " +
      "(q220's shape) on a graph with an unreachable island and a " +
      "node first reached on the last hop") {
    import spark.implicits._
    val sym = Seq((0L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),
      (14L, 15L), (1L, 12L), (50L, 51L))
    val und = (sym ++ sym.map(e => (e._2, e._1)))
      .toDF("src", "dst").distinct().localCheckpoint()
    val seeds = Seq(0L, 1L).toDF("vec_id")
    val hops = 4
    val kernel = graft.ext.BoundedGraph.bfsVisited(und, seeds, hops).get
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    var v = seeds.withColumn("dist", lit(0)).localCheckpoint()
    for (r <- 1 to hops) {
      val frontier = v.where($"dist" === r - 1).select($"vec_id".as("src"))
      val next = und.join(frontier, "src")
        .select($"dst".as("vec_id")).distinct()
        .join(v.select($"vec_id"), Seq("vec_id"), "left_anti")
        .withColumn("dist", lit(r))
      v = v.unionByName(next).localCheckpoint()
    }
    val loop = v.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(kernel == loop)
    assert(!kernel.contains(50L) && kernel(15L) == 4 && kernel(12L) == 1)
  }

  test("BoundedGraph.bfsVisitedPerSeed ≡ the labeled frontier loop " +
      "(q291's shape): per-seed reach sets stay independent") {
    import spark.implicits._
    val sym = Seq((0L, 11L), (11L, 12L), (1L, 13L), (13L, 12L))
    val und = (sym ++ sym.map(e => (e._2, e._1)))
      .toDF("src", "dst").distinct().localCheckpoint()
    val seeds = Seq(0L, 1L).toDF("vec_id")
    val hops = 2
    val kernel = graft.ext.BoundedGraph
      .bfsVisitedPerSeed(und, seeds, hops).get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    var v = seeds
      .select($"vec_id".as("seed"), $"vec_id", lit(0).as("dist"))
      .localCheckpoint()
    for (r <- 1 to hops) {
      val frontier = v.where($"dist" === r - 1)
        .select($"seed", $"vec_id".as("src"))
      val next = und.join(frontier, "src")
        .select($"seed", $"dst".as("vec_id")).distinct()
        .join(v.select($"seed", $"vec_id"),
          Seq("seed", "vec_id"), "left_anti")
        .withColumn("dist", lit(r))
      v = v.unionByName(next).localCheckpoint()
    }
    val loop = v.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(kernel == loop)
    // both seeds reach 12 at dist 2, independently
    assert(kernel.contains((0L, 12L, 2)) && kernel.contains((1L, 12L, 2)))
  }

  test("BoundedGraph.bellmanFord ≡ the full-relax distributed loop " +
      "(q249's shape): a longer path with smaller total weight wins " +
      "within the hop budget") {
    import spark.implicits._
    // 0→9 direct w=100; 0→5→6→9 total w=30; seed 0
    val dir = Seq((0L, 9L, 100L), (0L, 5L, 10L), (5L, 6L, 10L),
      (6L, 9L, 10L), (7L, 8L, 1L))
    val w = (dir ++ dir.map(e => (e._2, e._1, e._3)))
      .toDF("src", "dst", "w").distinct().localCheckpoint()
    val seeds = Seq(0L).toDF("vec_id")
    val rounds = 4
    val kernel = graft.ext.BoundedGraph.bellmanFord(w, seeds, rounds).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    var dd = seeds.withColumn("cost", lit(0L)).localCheckpoint()
    for (_ <- 1 to rounds) {
      val relax = w
        .join(dd.select($"vec_id".as("src"), $"cost"), "src")
        .select($"dst".as("vec_id"), ($"cost" + $"w").as("cost"))
      dd = dd.unionByName(relax)
        .groupBy($"vec_id").agg(min($"cost").as("cost"))
        .localCheckpoint()
    }
    val loop = dd.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kernel == loop)
    assert(kernel(9L) == 30L && !kernel.contains(7L))
  }

  test("BoundedGraph.hitsFixed ≡ the sparse distributed HITS loop " +
      "(q205's shape) on a digraph with source-only and sink-only nodes") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L))
      .toDF("src", "dst").localCheckpoint()
    val kernel = graft.ext.BoundedGraph.hitsFixed(edges, 4).get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the committed sparse loop
    val nodes2 = edges.select($"src".as("vec_id"))
      .union(edges.select($"dst".as("vec_id"))).distinct().localCheckpoint()
    var h = nodes2.withColumn("h", lit(1000000L))
    var a = nodes2.withColumn("a", lit(0L))
    for (_ <- 1 to 4) {
      val rawa = edges.join(h.withColumnRenamed("vec_id", "src"), "src")
        .groupBy($"dst").agg(sum($"h").as("ra")).localCheckpoint()
      val am = rawa.agg(max($"ra").as("m"))
      a = rawa.withColumnRenamed("dst", "vec_id")
        .crossJoin(broadcast(am))
        .select($"vec_id", expr("ra div (m div 1000000 + 1)").as("a"))
      val rawh = edges.join(a.withColumnRenamed("vec_id", "dst"), "dst")
        .groupBy($"src").agg(sum($"a").as("rh")).localCheckpoint()
      val hm = rawh.agg(max($"rh").as("m"))
      h = rawh.withColumnRenamed("src", "vec_id")
        .crossJoin(broadcast(hm))
        .select($"vec_id", expr("rh div (m div 1000000 + 1)").as("h"))
    }
    val loop = nodes2.join(a, Seq("vec_id"), "left")
      .join(h, Seq("vec_id"), "left").na.fill(0L, Seq("a", "h")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kernel == loop)
    assert(kernel.exists { case (id, av, _) => id == 4L && av == 0L } &&
      kernel.exists { case (id, _, hv) => id == 3L && hv == 0L })
  }

  test("BoundedGraph.pageRankFixed ≡ the sparse distributed PageRank " +
      "loop (q171's shape), including the teleport-only source node") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst").localCheckpoint()
    val outd = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val ewd = edges.join(outd, "src").localCheckpoint()
    val kernel = graft.ext.BoundedGraph
      .pageRankFixed(ewd, 5, 1000000000L, 150000000L).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val nodes2 = edges.select($"src".as("vec_id"))
      .union(edges.select($"dst".as("vec_id"))).distinct().localCheckpoint()
    var prS: Option[org.apache.spark.sql.DataFrame] = None
    var absentPr = 1000000000L
    for (_ <- 1 to 5) {
      val contrib = prS match {
        case None => ewd
          .select($"dst", expr(s"${absentPr}L div outdeg").as("c"))
        case Some(p) => ewd
          .join(p.withColumnRenamed("vec_id", "src"), Seq("src"), "left")
          .select($"dst",
            expr(s"coalesce(pr, ${absentPr}L) div outdeg").as("c"))
      }
      val sc = contrib.groupBy($"dst").agg(sum($"c").as("sc"))
        .localCheckpoint()
      prS = Some(sc.select($"dst".as("vec_id"),
        (lit(150000000L) + expr("(85 * sc) div 100")).as("pr")))
      absentPr = 150000000L
    }
    val loop = nodes2.join(prS.get, Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"pr", lit(150000000L)).as("pr"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kernel == loop)
    assert(kernel(4L) == 150000000L)
  }

  test("BoundedGraph.kcoreNodes ≡ the distributed peel (q214's shape): " +
      "a clique survives, a dangling tail and a triangle peel away") {
    import spark.implicits._
    // K4 clique {1,2,3,4} + tail 4-10-11 + triangle {20,21,22}
    val und = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 10L), (10L, 11L),
      (20L, 21L), (20L, 22L), (21L, 22L)))
      .toDF("u", "v").distinct().localCheckpoint()
    val kernel = graft.ext.BoundedGraph.kcoreNodes(und, 3).get
      .collect().map(_.getLong(0)).toSet
    var e = und
    var prev = e.count()
    var stable = false
    for (_ <- 1 to 20 if !stable) {
      val deg = e.select($"u".as("vtx"))
        .unionByName(e.select($"v".as("vtx")))
        .groupBy($"vtx").agg(count(lit(1)).as("d"))
      val keep = deg.where($"d" >= 3).select($"vtx")
      e = e.join(keep.select($"vtx".as("u")), Seq("u"), "left_semi")
        .join(keep.select($"vtx".as("v")), Seq("v"), "left_semi")
        .localCheckpoint()
      val cnt = e.count()
      stable = cnt == prev
      prev = cnt
    }
    val loop = e.select($"u").unionByName(e.select($"v".as("u")))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(kernel == loop)
    assert(kernel == Set(1L, 2L, 3L, 4L))
  }

  test("driver union-find refuses null node ids loudly (r16 ADVICE: no " +
      "opaque NPE), and the adaptive dispatch routes nulls to the " +
      "distributed engine instead") {
    import spark.implicits._
    val edges = Seq((Some(1L), Some(2L)), (None, Some(3L)))
      .toDF("a", "b")
    intercept[IllegalArgumentException] {
      graft.ext.Dedup.connectedComponentsBounded(edges, "a", "b", cap = 10)
    }
    // adaptive path: null detected in the probe → distributed loop, whose
    // labels (including the null-id row label-prop has always emitted for
    // a null endpoint) must be untouched by r17
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))
    }.toSet
    val got = rows(graft.ext.Dedup.connectedComponents(edges, "a", "b"))
    val dist = rows(graft.ext.Dedup.connectedComponents(
      edges, "a", "b", driverCap = 0))
    assert(got == dist)
  }
}
