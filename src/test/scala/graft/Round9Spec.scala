package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantics tests for the round-6 hardening work: the bucketed q219
  * adjacency sweep must reproduce the global-sort sweep bit for bit, and
  * the q167 priority-sample estimator must satisfy the
  * Duffield–Lund–Thorup invariants (est_w = max(w, τ), deterministic
  * keep of every item heavier than τ) against an independent driver-side
  * replay.
  */
class Round9Spec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q219 bucketed sweep equals the global-sort sweep") {
    val got = SparkEntry.queries("q219_zorder_locality")(spark, dir)
      .collect()(0)
    // independent global-window replay (the plan shape q219 deliberately
    // avoids): same spread/snap arithmetic, one unpartitioned lead
    def spread16(c: String): String = {
      val s1 = s"(($c | ($c * 256)) & 16711935)"
      val s2 = s"(($s1 | ($s1 * 16)) & 252645135)"
      val s3 = s"(($s2 | ($s2 * 4)) & 858993459)"
      s"(($s3 | ($s3 * 2)) & 1431655765)"
    }
    val p = Tables.embeddings(spark, dir)
      .select($"vec_id",
        floor(element_at($"embedding", 1).cast("double") * 1e6)
          .cast("long").as("xi"),
        floor(element_at($"embedding", 2).cast("double") * 1e6)
          .cast("long").as("yi"))
      .withColumn("gx", expr("(xi + 10000000) div 65536"))
      .withColumn("gy", expr("(yi + 10000000) div 65536"))
      .withColumn("z",
        expr(s"(${spread16("gx")}) * 2 + (${spread16("gy")})"))
    def closeFracGlobal(ordCol: String) = {
      val w = Window.orderBy(col(ordCol))
      p.select($"gx", $"gy", col(ordCol))
        .withColumn("ngx", lead($"gx", 1).over(w))
        .withColumn("ngy", lead($"gy", 1).over(w))
        .where($"ngx".isNotNull)
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(greatest(abs($"ngx" - $"gx"), abs($"ngy" - $"gy"))
            <= 4L, 1L).otherwise(0L)).as("n_close"))
        .collect()(0)
    }
    val zg = closeFracGlobal("z")
    val ig = closeFracGlobal("vec_id")
    assert(got.getLong(0) == zg.getLong(0)) // n_pairs
    assert(got.getDouble(1) ==
      zg.getLong(1).toDouble / zg.getLong(0).toDouble) // z_close_frac
    assert(got.getDouble(2) ==
      ig.getLong(1).toDouble / ig.getLong(0).toDouble) // id_close_frac
  }

  test("q167 priority sample satisfies the DLT estimator invariants") {
    val rows = SparkEntry.queries("q167_priority_sample")(spark, dir)
      .collect()
      .map(r => (r.getAs[Number]("rnk").intValue, r.getAs[Long]("doc_id"),
        r.getAs[Number]("w").longValue, r.getAs[Double]("est_w")))
    assert(rows.length > 0 && rows.length <= 100)
    // independent driver-side replay of priorities and τ
    val Two60 = 1152921504606846976L
    val pri = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars".cast("long").as("w"),
        graft.ext.TextAnalysis.hash60($"doc_id".cast("string")).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getLong(1).toDouble / ((r.getLong(2) + 1L).toDouble / Two60.toDouble)))
      .sortBy(x => (-x._3, x._1))
    val tau = if (pri.length > 100) pri(100)._3 else 0.0
    val wantKeep = pri.take(math.min(100, pri.length))
      .map(x => x._1 -> x._2).toMap
    assert(rows.map(_._2).toSet == wantKeep.keySet)
    rows.foreach { case (_, docId, w, estW) =>
      assert(w == wantKeep(docId))
      // DLT invariant: est_w = max(w, τ) — never below the true weight,
      // and every item with w > τ is kept deterministically with est = w
      assert(estW == math.max(w.toDouble, tau))
    }
    // monotone: est_w is non-increasing when ordered by priority rank for
    // items below τ (they all share est_w = τ), and Σ est_w over the
    // sample is at least the true weight of the kept heavy items
    val heavy = rows.filter(_._3.toDouble > tau)
    heavy.foreach { case (_, _, w, estW) => assert(estW == w.toDouble) }
    assert(rows.map(_._4).sum >= heavy.map(_._3).sum.toDouble)
  }
}
