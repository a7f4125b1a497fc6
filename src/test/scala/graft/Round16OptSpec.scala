package graft

import org.apache.spark.sql.functions._

/** Round-16 OPTIMIZATION round pins: every rewrite that changed an
  * operator's internals carries an equality test against the shape it
  * replaced (the optimization round's contract — results must be
  * bit-identical, only the plan may change).
  */
class Round16OptSpec extends SparkSpec {

  // ---- bounded driver-side connected components (q284's CC) ----------

  test("connectedComponentsBounded: labels identical to the distributed " +
      "min-label propagation on an adversarial multi-component graph") {
    import spark.implicits._
    // chain (path graph: worst diameter), a star, a triangle with a
    // dangling tail, self-contained singleton edge, duplicate +
    // reversed-order edges (the caller's canonicalization is not assumed)
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L),   // path
      (20L, 25L), (20L, 24L), (20L, 23L),               // star
      (30L, 31L), (31L, 32L), (32L, 30L), (32L, 33L),   // cycle + tail
      (40L, 41L), (41L, 40L),                           // dup/reversed
      (50L, 50L)                                        // self-loop
    ).toDF("a", "b")
    val dist = graft.ext.Dedup.connectedComponents(edges, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val bounded = graft.ext.Dedup
      .connectedComponentsBounded(edges, "a", "b", cap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bounded == dist)
    // min-label property: every component's label is its min node id
    assert(bounded(14L) == 10L && bounded(25L) == 20L &&
      bounded(33L) == 30L && bounded(41L) == 40L && bounded(50L) == 50L)
  }

  test("connectedComponentsBounded: refuses an over-cap edge list loudly") {
    import spark.implicits._
    val edges = (0L until 20L).map(i => (i, i + 1L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      graft.ext.Dedup.connectedComponentsBounded(edges, "a", "b", cap = 5)
    }
  }

  // ---- q209 window rewrite ≡ semi/anti-join stack ---------------------

  test("q209 rewrite: per-order window filter keeps the semi+anti " +
      "semantics on a fixture with every case (sole-late, multi-late, " +
      "single-supplier order, no-late order)") {
    import spark.implicits._
    // (ok, sk, late) rollup rows, one per (order, supplier)
    val os = Seq(
      (1L, 101L, 1L), (1L, 102L, 0L),              // sole late, multi-sup
      (2L, 101L, 1L), (2L, 103L, 1L),              // two late → excluded
      (3L, 104L, 1L),                              // single-sup → excluded
      (4L, 105L, 0L), (4L, 106L, 0L),              // nobody late
      (5L, 101L, 1L), (5L, 102L, 0L), (5L, 103L, 0L) // sole late, 3 sups
    ).toDF("ok", "sk", "late")
    // reference: the join formulation the rewrite replaced
    val late = os.where($"late" === 1L)
    val hasOther = late.join(
      os.select($"ok".as("ok2"), $"sk".as("sk2")),
      $"ok" === $"ok2" && $"sk" =!= $"sk2", "left_semi")
    val ref = hasOther.join(
      os.where($"late" === 1L).select($"ok".as("ok3"), $"sk".as("sk3")),
      $"ok" === $"ok3" && $"sk" =!= $"sk3", "left_anti")
      .select($"ok", $"sk").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // rewrite: window aggregates over the order key
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"ok")
    val got = os
      .withColumn("n_sups", count(lit(1)).over(w))
      .withColumn("n_late", sum($"late").over(w))
      .where($"late" === 1L && $"n_sups" >= 2L && $"n_late" === 1L)
      .select($"ok", $"sk").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got == ref)
    assert(got == Set((1L, 101L), (5L, 101L)))
  }

  // ---- q171 sparse PageRank ≡ dense PageRank --------------------------

  test("q171 rewrite: sparse rank iteration (left-join coalesce of the " +
      "teleport constant) matches the dense formulation, including a " +
      "source-only node whose constant rank keeps feeding its out-edges") {
    import spark.implicits._
    // 4→1 makes node 4 in-edge-free: after round 1 its rank is the
    // teleport constant and must still contribute 150000000 div outdeg
    // to node 1 every round — the case the sparse coalesce must carry
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst").localCheckpoint()
    val outd = edges.groupBy($"src").agg(count(lit(1)).as("outdeg"))
    val ewd = edges.join(outd, "src").localCheckpoint()
    val nodes = edges.select($"src".as("vec_id"))
      .union(edges.select($"dst".as("vec_id"))).distinct().localCheckpoint()
    // dense reference (the shape the rewrite replaced)
    var prD = nodes.withColumn("pr", lit(1000000000L))
    for (_ <- 1 to 5) {
      val contrib = ewd.join(prD.withColumnRenamed("vec_id", "src"), "src")
        .select($"dst", expr("pr div outdeg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("sc"))
      prD = nodes
        .join(contrib.withColumnRenamed("dst", "vec_id"), Seq("vec_id"),
          "left")
        .select($"vec_id",
          (lit(150000000L) +
            expr("(85 * coalesce(sc, CAST(0 AS BIGINT))) div 100"))
            .as("pr")).localCheckpoint()
    }
    val dense = prD.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // sparse (the committed shape)
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
    val sparse = nodes.join(prS.get, Seq("vec_id"), "left")
      .select($"vec_id", coalesce($"pr", lit(150000000L)).as("pr"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sparse == dense)
    assert(sparse(4L) == 150000000L) // teleport-only node
  }

  // ---- q205 sparse HITS ≡ dense HITS ----------------------------------

  test("q205 rewrite: sparse score iteration (inner joins, no per-step " +
      "node fill) matches the dense formulation on a digraph with " +
      "source-only and sink-only nodes") {
    import spark.implicits._
    // 1→2, 1→3, 2→3, 4→1: node 4 is a pure source (no in-edges → a=0),
    // node 3 a pure sink (no out-edges → h=0)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L))
      .toDF("src", "dst").localCheckpoint()
    val nodes = edges.select($"src".as("vec_id"))
      .union(edges.select($"dst".as("vec_id"))).distinct().localCheckpoint()
    // dense reference (the shape the rewrite replaced)
    var hD = nodes.withColumn("h", lit(1000000L))
    var aD = nodes.withColumn("a", lit(0L))
    for (_ <- 1 to 4) {
      val rawa = edges.join(hD.withColumnRenamed("vec_id", "src"), "src")
        .groupBy($"dst").agg(sum($"h").as("ra"))
      val am = rawa.agg(max($"ra").as("m"))
      aD = nodes
        .join(rawa.withColumnRenamed("dst", "vec_id"), Seq("vec_id"), "left")
        .crossJoin(broadcast(am))
        .select($"vec_id",
          expr("coalesce(ra, CAST(0 AS BIGINT)) div (m div 1000000 + 1)")
            .as("a")).localCheckpoint()
      val rawh = edges.join(aD.withColumnRenamed("vec_id", "dst"), "dst")
        .groupBy($"src").agg(sum($"a").as("rh"))
      val hm = rawh.agg(max($"rh").as("m"))
      hD = nodes
        .join(rawh.withColumnRenamed("src", "vec_id"), Seq("vec_id"), "left")
        .crossJoin(broadcast(hm))
        .select($"vec_id",
          expr("coalesce(rh, CAST(0 AS BIGINT)) div (m div 1000000 + 1)")
            .as("h")).localCheckpoint()
    }
    val dense = aD.join(hD, "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // sparse (the committed shape)
    var h = nodes.withColumn("h", lit(1000000L))
    var a = nodes.withColumn("a", lit(0L))
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
    val sparse = nodes.join(a, Seq("vec_id"), "left")
      .join(h, Seq("vec_id"), "left").na.fill(0L, Seq("a", "h")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sparse == dense)
    // the boundary nodes really exercise the sparse path
    assert(sparse.exists { case (id, av, hv) => id == 4L && av == 0L } &&
      sparse.exists { case (id, av, hv) => id == 3L && hv == 0L })
  }
}
