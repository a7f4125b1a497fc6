package graft

import graft.functions.{CosinePrefilter, DotFast, GraftFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The cosine-prefilter optimizer rule: plan shape, exact-result
  * preservation (including the zero-norm NaN edge), and idempotence /
  * hand-written-prefilter respect.
  */
class CosinePrefilterSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  // parquet-backed so the Filter survives optimization: over a literal
  // frame, ConvertToLocalRelation evaluates the whole predicate at
  // optimization time and leaves no Filter node to rewrite
  private lazy val pairsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("cosprefilter").toString
    Seq(
      (1L, Seq(1.0f, 0.0f), Seq(1.0f, 0.01f)),   // cos ~ 0.99995
      (2L, Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),    // cos = 0
      (3L, Seq(1.0f, 0.0f), Seq(0.0f, 0.0f)),    // zero norm -> exact 0.0
      (4L, Seq(0.6f, 0.8f), Seq(0.6f, 0.8f)))    // cos = 1
      .toDF("id", "a", "b")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def pairs: DataFrame = spark.read.parquet(pairsPath)

  private def countDotFast(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.map(e =>
        e.collect { case _: DotFast => 1 }.sum).sum
    }.sum

  test("rule injects a fast prefilter under an exact-cosine threshold filter") {
    val q = pairs.where(GraftFunctions.cosineSimExact($"a", $"b") >= 0.9)
    assert(countDotFast(q) >= 3) // dot(a,b), dot(a,a), dot(b,b)
    assert(q.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("results identical with and without the rule, zero-norm included") {
    val withRule = pairs
      .where(GraftFunctions.cosineSimExact($"a", $"b") >= 0.5)
      .select($"id").as[Long].collect().sorted.toSeq
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      saved.filterNot(_ == CosinePrefilter)
    try {
      val without = pairs
        .where(GraftFunctions.cosineSimExact($"a", $"b") >= 0.5)
        .select($"id").as[Long].collect().sorted.toSeq
      assert(withRule == without)
    } finally spark.experimental.extraOptimizations = saved
  }

  test("rule leaves hand-written dot_fast prefilters alone") {
    val manual = pairs.where(
      GraftFunctions.dotFast($"a", $"b") >= 0.4 &&
        GraftFunctions.cosineSimExact($"a", $"b") >= 0.5)
    // exactly the one hand-written DotFast — the rule did not add three more
    assert(countDotFast(manual) == 1)
  }

  test("rule reaches thresholds pushed into join conditions") {
    val l = pairs.select($"id".as("lid"), $"a")
    val r = pairs.select($"id".as("rid"), $"b")
    val joined = l.join(r,
      $"lid" === $"rid" && GraftFunctions.cosineSimExact($"a", $"b") >= 0.9)
    assert(countDotFast(joined) >= 3)
    assert(joined.select($"lid").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("negated thresholds: optimizer normalizes Not away, results exact") {
    // BooleanSimplification folds Not(c >= t) into c < t before this rule
    // runs, so negated predicates reach the rule as upper bounds, which it
    // deliberately leaves alone (the prefilter accelerates lower bounds) —
    // pin both the non-rewrite and the zero-norm row surviving negation
    val q = pairs.where(!(GraftFunctions.cosineSimExact($"a", $"b") >= 0.9))
    assert(countDotFast(q) == 0)
    // row 3 (zero norm, exact cosine 0.0) and row 2 (orthogonal) survive
    assert(q.select($"id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("rewrite under an explicit Not stays exact on zero norms: " +
      "Not(And(NULL, false)) = true") {
    // the optimizer never hands the rule a surviving Not (see above), but
    // the rewrite is defined for it — verify the three-valued-logic
    // reasoning directly at the expression level with a zero-norm pair
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, OneRowRelation}
    import org.apache.spark.sql.types._
    def litArr(xs: Seq[Float]) = Literal.create(xs, ArrayType(FloatType))
    val cos = graft.functions.CosineSimExact(
      litArr(Seq(1.0f, 0.0f)), litArr(Seq(0.0f, 0.0f))) // zero-norm side
    val cond = Not(GreaterThanOrEqual(cos, Literal(0.9)))
    val rewritten = CosinePrefilter(Filter(cond, OneRowRelation()))
      .asInstanceOf[Filter].condition
    assert(rewritten.exists(_.isInstanceOf[DotFast]), rewritten.sql)
    val row = org.apache.spark.sql.catalyst.InternalRow.empty
    assert(cond.eval(row) == true)       // Not(0.0 >= 0.9)
    assert(rewritten.eval(row) == true)  // Not(And(NULL, false))
  }

  test("no rewrite for thresholds at or below the margin") {
    val q = pairs.where(GraftFunctions.cosineSimExact($"a", $"b") >= 0.0)
    assert(countDotFast(q) == 0)
    // zero-norm row has exact cosine 0.0 and must be KEPT at t=0
    assert(q.select($"id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }
}
