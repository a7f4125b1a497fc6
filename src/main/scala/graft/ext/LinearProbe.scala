package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed closed-form ordinary least squares for the 2-feature linear
  * probe (q71): y = b0 + b1·x1 + b2·x2.
  *
  * Scale design: training collapses to ONE partial-aggregated scan
  * producing nine moments; with integer features the moments are summed
  * as DECIMAL(38,0) — exact at any corpus size, no float
  * order-dependence. The 3×3 normal-equation solve is scalar Cramer
  * arithmetic over the broadcast 1-row moment frame (written as one fixed
  * operation tree so any engine replaying it gets bit-identical
  * coefficients), and scoring broadcasts three doubles onto a map stage.
  * Fitting never shuffles the corpus — the closed-form analog of the
  * k-means loop's "k rows by construction".
  */
object LinearProbe {

  /** Nine-moment frame (1 row): n, s1, s2, sy, s11, s12, s22, s1y, s2y —
    * all cast double AFTER exact aggregation. `x1`/`x2`/`y` must be
    * integral columns (long-safe per row; decimal-summed across rows).
    */
  def moments(f: DataFrame, x1: Column, x2: Column, y: Column): DataFrame =
    f.agg(
      count(lit(1)).cast("double").as("n"),
      sum(x1).cast("double").as("s1"),
      sum(x2).cast("double").as("s2"),
      sum(y).cast("double").as("sy"),
      sum((x1 * x1).cast("decimal(38,0)")).cast("double").as("s11"),
      sum((x1 * x2).cast("decimal(38,0)")).cast("double").as("s12"),
      sum((x2 * x2).cast("decimal(38,0)")).cast("double").as("s22"),
      sum((x1 * y).cast("decimal(38,0)")).cast("double").as("s1y"),
      sum((x2 * y).cast("decimal(38,0)")).cast("double").as("s2y"))

  /** Cramer solve of the symmetric 3×3 normal equations over a [[moments]]
    * frame → 1 row (b0, b1, b2). Minors written once and reused so the
    * operation tree is fixed (the oracle mirrors it verbatim).
    */
  def solve(m: DataFrame): DataFrame =
    m.select(
      (col("s11") * col("s22") - col("s12") * col("s12")).as("m00"),
      (col("s1") * col("s22") - col("s12") * col("s2")).as("m01"),
      (col("s1") * col("s12") - col("s11") * col("s2")).as("m02"),
      col("n"), col("s1"), col("s2"), col("sy"),
      col("s11"), col("s12"), col("s22"), col("s1y"), col("s2y"))
      .select(
        (col("n") * col("m00") - col("s1") * col("m01") +
          col("s2") * col("m02")).as("det"),
        (col("sy") * col("m00") -
          col("s1y") * (col("s1") * col("s22") - col("s2") * col("s12")) +
          col("s2y") * (col("s1") * col("s12") - col("s2") * col("s11")))
          .as("det0"),
        (col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
          col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
          col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2")))
          .as("det1"),
        (col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
          col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
          col("sy") * (col("s1") * col("s12") - col("s11") * col("s2")))
          .as("det2"))
      .select((col("det0") / col("det")).as("b0"),
        (col("det1") / col("det")).as("b1"),
        (col("det2") / col("det")).as("b2"))

  /** Fit on `f` (columns x1, x2, y) and score every row: appends
    * `pred` and `residual`, both rounded to 6 decimals (cross-engine ulp
    * discipline). One moment scan + one broadcast scoring map stage.
    */
  def fitAndScore(f: DataFrame): DataFrame = {
    val sol = solve(moments(f, col("x1"), col("x2"), col("y")))
    f.crossJoin(broadcast(sol))
      .withColumn("pred",
        round(col("b0") + col("b1") * col("x1") + col("b2") * col("x2"), 6))
      .withColumn("residual",
        round(col("y") - (col("b0") + col("b1") * col("x1") +
          col("b2") * col("x2")), 6))
      .drop("b0", "b1", "b2")
  }
}
