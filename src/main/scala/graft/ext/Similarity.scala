package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector similarity search over `array<float>` embedding columns.
  *
  * Scale design (100 TB): the brute-force path is the correctness baseline
  * and stays viable only when one side is small (broadcast the queries).
  * The LSH path (random-hyperplane signatures) buckets candidates so the
  * join is equi on the signature — a plain shuffle join on a short key —
  * then reranks exactly inside each bucket. Both paths share the exact
  * cosine kernel below.
  */
object Similarity {

  private val DEC = DecimalType(30, 18)

  /** Exact, order-stable dot product: per-element double products summed in
    * decimal (associative, exact) then cast once to double. Matches the
    * DuckDB twin expression bit-for-bit.
    */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(DEC)),
      lit(0).cast(DEC),
      (acc, x) => (acc + x).cast(DEC))
      .cast("double")

  /** Exact squared L2 norm (same decimal-sum construction). */
  def norm2Exact(a: Column): Column =
    aggregate(
      transform(a, x => (x.cast("double") * x.cast("double")).cast(DEC)),
      lit(0).cast(DEC),
      (acc, x) => (acc + x).cast(DEC))
      .cast("double")

  /** cosine = dot / (|a| |b|); null-safe zero when either norm is 0.
    * Rounded to 9 decimals: the decimal→double conversions differ by 1 ulp
    * across engines, and rounding BEFORE any rank/filter keeps ordering
    * and thresholds cross-engine stable.
    */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    round(
      when(n2a > 0.0 && n2b > 0.0, dot / (sqrt(n2a) * sqrt(n2b))).otherwise(0.0),
      9)

  /** Deterministic pseudo-random hyperplane sign for (plane, dim):
    * ±1 from the 60-bit md5 hash — reproducible in any engine.
    */
  def planeSign(plane: Int, dim: Column): Column = {
    val h = TextAnalysis.hash60(concat(lit(s"plane$plane:"), dim.cast("string")))
    when(pmod(h, lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))
  }

  /** Random-hyperplane LSH signature: one bit per plane = sign of the
    * projection of `vec` onto the ±1 hyperplane. Returns a compact bit
    * string like "1011..." usable as an equi-join bucket key.
    */
  def lshSignature(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          (x.cast("double") * planeSign(p, i)).cast(DEC)),
        lit(0).cast(DEC),
        (acc, x) => (acc + x).cast(DEC))
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Brute-force exact top-k cosine neighbors of `queries` within
    * `candidates` (both need columns id/embedding). The query side is
    * broadcast — at scale, candidates stream through one narrow stage.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(
      queries.select(col("id").as("query_id"), col("embedding").as("q_emb"),
        norm2Exact(col("embedding")).as("q_n2")))
    val c = candidates.select(col("id").as("cand_id"), col("embedding").as("c_emb"),
      norm2Exact(col("embedding")).as("c_n2"))
    val scored = q.join(c, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        cosine(dotExact(col("q_emb"), col("c_emb")), col("q_n2"), col("c_n2"))
          .as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
