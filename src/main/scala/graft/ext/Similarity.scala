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

  /** Fast approximate double dot for PREFILTERING only: plain double fold,
    * ~1e-14 relative error. Never emitted — exact decimal rescoring decides
    * the final value (two-phase pattern, see q41).
    */
  def dotFast(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

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

  /** Deterministic pseudo-random hyperplane sign for (plane, dim): ±1 from
    * the 60-bit md5 hash — computed ONCE driver-side (same value as the
    * per-row md5 the DuckDB oracle computes; see tests).
    */
  def planeSignJava(plane: Int, dim: Int): Double =
    if (TextAnalysis.hash60Java(s"plane$plane:$dim") % 2 == 0) 1.0 else -1.0

  /** Random-hyperplane LSH signature: one bit per plane = sign of the
    * projection of `vec` onto the ±1 hyperplane. The plane vectors are
    * literal arrays (no hashing in the per-row hot path). Returns a compact
    * bit string like "1011..." usable as an equi-join bucket key.
    *
    * `maxDim` bounds the sign tables; vectors longer than it would need a
    * larger table (explicit error beats silent truncation). `planeOffset`
    * selects a disjoint plane range — multi-table LSH (the OR-of-tables
    * recall amplification, q61) uses one offset per hash table.
    */
  def lshSignature(vec: Column, nPlanes: Int, maxDim: Int = 256,
      planeOffset: Int = 0): Column = {
    val bits = (0 until nPlanes).map { p =>
      val signs = array((0 until maxDim)
        .map(d => lit(planeSignJava(planeOffset + p, d))): _*)
      val proj = aggregate(
        zip_with(vec, slice(signs, lit(1), size(vec)), (x, s) =>
          (x.cast("double") * s).cast(DEC)),
        lit(0).cast(DEC),
        (acc, x) => (acc + x).cast(DEC))
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** Native-expression form of [[lshSignature]]
    * ([[graft.functions.LshBits]]): same bits, plain JVM loops instead of
    * interpreted per-element lambdas — the hot path for multi-table
    * signatures (q61's 24 planes).
    */
  def lshSignatureFast(spark: org.apache.spark.sql.SparkSession, vec: Column,
      nPlanes: Int, planeOffset: Int = 0): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function("lsh_bits", vec, lit(planeOffset), lit(nPlanes))
  }

  /** Brute-force exact top-k cosine neighbors of `queries` within
    * `candidates` (both need columns id/embedding). The query side is
    * broadcast — at scale, candidates stream through one narrow stage.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(candidates.sparkSession)
    // native dot (NOT this object's composed-expression dotExact): squared
    // norms once per side, one dot per pair — 1/3 the decimal work of the
    // fused kernel, same emitted values (identical IEEE ops)
    val dot = graft.functions.GraftFunctions.dotExact _
    val q = broadcast(queries.select(col("id").as("query_id"),
      col("embedding").as("q_emb"),
      dot(col("embedding"), col("embedding")).as("q_n2")))
    val c = candidates.select(col("id").as("cand_id"),
      col("embedding").as("c_emb"),
      dot(col("embedding"), col("embedding")).as("c_n2"))
    val scored = q.join(c, col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        cosine(dot(col("q_emb"), col("c_emb")), col("q_n2"), col("c_n2"))
          .as("cosine_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
