package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Exact cosine similarity between two float-array embeddings as a native
  * Catalyst expression.
  *
  * Semantics are IDENTICAL to the composed-expression kernel
  * ([[graft.ext.Similarity.dotExact]] / `cosine`) and therefore to the
  * DuckDB oracle:
  *   per-element double product → rounded to DECIMAL scale 18 (HALF_UP,
  *   Spark's double→decimal cast mode) → exact sum → one cast to double;
  *   cosine = dot / (sqrt(n2a) * sqrt(n2b)), 0 when a norm is 0, rounded
  *   to 9 decimals.
  *
  * Why an Expression instead of the higher-order-function composition: the
  * zip_with/aggregate lambda path allocates per-element Decimal objects and
  * evaluates interpreted lambda calls per element; this eval walks the two
  * ArrayData buffers once per row in plain JVM code (~10-50x less overhead),
  * which matters when near-dup scoring runs over millions of candidate
  * pairs. The expression generates real code (doGenCode): children
  * evaluate inside the whole-stage span and the leaf compute is one
  * unboxed kernel call — no row materialization, no boxing.
  */
case class CosineSimExact(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim_exact expects array<float>, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private def exactSumOfRoundedProducts(
      a: ArrayData, b: ArrayData, useLeftTwice: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    // fast path: the same scale-18 HALF_UP terms in 128-bit registers
    // (see Fixed18); any out-of-domain product falls back to the
    // reference BigDecimal loop for the whole row
    val acc128 = new Array[Long](2)
    var i = 0
    var fast = true
    while (fast && i < n) {
      val x = a.getFloat(i).toDouble
      val y = if (useLeftTwice) x else b.getFloat(i).toDouble
      fast = Fixed18.addProduct(acc128, x * y)
      if (fast) i += 1
    }
    if (fast) return Fixed18.toDouble(acc128)
    var acc = JBigDecimal.ZERO
    i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = if (useLeftTwice) x else b.getFloat(i).toDouble
      val p = new JBigDecimal(x * y).setScale(18, RoundingMode.HALF_UP)
      acc = acc.add(p)
      i += 1
    }
    acc.doubleValue()
  }

  /** Unboxed kernel shared by interpreted eval and the generated code. */
  def kernel(a: ArrayData, b: ArrayData): Double = {
    val dot = exactSumOfRoundedProducts(a, b, useLeftTwice = false)
    val n2a = exactSumOfRoundedProducts(a, a, useLeftTwice = true)
    val n2b = exactSumOfRoundedProducts(b, b, useLeftTwice = true)
    val c =
      if (n2a > 0.0 && n2b > 0.0) dot / (math.sqrt(n2a) * math.sqrt(n2b))
      else 0.0
    // round half-up to 9 decimals, matching round(col, 9)
    new JBigDecimal(c).setScale(9, RoundingMode.HALF_UP).doubleValue()
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref =
      ctx.addReferenceObj("cosExact", this, classOf[CosineSimExact].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.kernel($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim_exact"
}

/** Exact dot product twin of [[CosineSimExact]] — same
  * sum-of-18-decimal-rounded double products, returned as double. Lets
  * callers reuse precomputed norms instead of recomputing them per pair.
  *
  * Accepts `array<float>` and `array<double>` on either side (a float
  * widened to double is exact, so mixed-type dots are well-defined) —
  * trained k-means centroids are double arrays dotted against float
  * embeddings.
  */
case class DotExact(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_exact expects array<float|double>, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  private lazy val leftIsDouble = left.dataType match {
    case ArrayType(DoubleType, _) => true; case _ => false
  }
  private lazy val rightIsDouble = right.dataType match {
    case ArrayType(DoubleType, _) => true; case _ => false
  }

  /** Unboxed kernel shared by interpreted eval and the generated code. */
  def kernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    // 128-bit fast path with whole-row BigDecimal fallback (see Fixed18)
    val acc128 = new Array[Long](2)
    var i = 0
    var fast = true
    while (fast && i < n) {
      val x = if (leftIsDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (rightIsDouble) b.getDouble(i) else b.getFloat(i).toDouble
      fast = Fixed18.addProduct(acc128, x * y)
      if (fast) i += 1
    }
    if (fast) return Fixed18.toDouble(acc128)
    var acc = JBigDecimal.ZERO
    i = 0
    while (i < n) {
      val x = if (leftIsDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (rightIsDouble) b.getDouble(i) else b.getFloat(i).toDouble
      val p = new JBigDecimal(x * y).setScale(18, RoundingMode.HALF_UP)
      acc = acc.add(p)
      i += 1
    }
    acc.doubleValue()
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotExact", this, classOf[DotExact].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.kernel($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_exact"
}

/** Fast approximate double dot (plain accumulation, ~1e-14 relative error)
  * for PREFILTERING with a margin; never emitted as a result value.
  */
case class DotFast(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Unboxed kernel shared by interpreted eval and the generated code. */
  def kernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotFast", this, classOf[DotFast].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.kernel($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_fast"
}

/** SparkSessionExtensions entry point: users opt in with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`; sessions built
  * that way get graft's native functions without calling
  * [[GraftFunctions.register]] manually.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim_exact"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimExact].getName, "cosine_sim_exact"),
      (exprs: Seq[Expression]) => CosineSimExact(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_exact"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotExact].getName, "dot_exact"),
      (exprs: Seq[Expression]) => DotExact(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_fast"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotFast].getName, "dot_fast"),
      (exprs: Seq[Expression]) => DotFast(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("sparse_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SparseDotLong].getName, "sparse_dot"),
      (exprs: Seq[Expression]) => SparseDotLong(
        exprs(0), exprs(1), exprs(2), exprs(3))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("sparse_cos_accept"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SparseCosAccept].getName, "sparse_cos_accept"),
      (exprs: Seq[Expression]) => SparseCosAccept(
        exprs(0), exprs(1), exprs(2), exprs(3), exprs(4), exprs(5))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("lsh_bits"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LshBits].getName, "lsh_bits"),
      (exprs: Seq[Expression]) => LshBits(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())))
    e.injectOptimizerRule(_ => CosinePrefilter)
  }
}

object GraftFunctions {
  // Once-per-session guard: under parallel test runs (GRAFT_TEST_PAR) many
  // suites share one SparkSession, and an unconditional
  // createOrReplaceTempFunction storm can swap a function out from under a
  // suite that is mid-analysis on another thread. The registered set is
  // static, so the first caller registers and every later call is a no-op.
  // Keyed on the session object itself (cloned sessions have their own
  // registry and register independently); WEAK keys so a stopped session
  // (per-suite sessions under parallel test runs) can be collected along
  // with its session state instead of being pinned for the JVM lifetime.
  private val registeredSessions: java.util.Set[
      org.apache.spark.sql.SparkSession] =
    java.util.Collections.newSetFromMap(
      java.util.Collections.synchronizedMap(
        new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
          java.lang.Boolean]()))

  /** Register graft's native expressions with a session's function
    * registry; afterwards they are callable from SQL and via
    * `call_function` (the Spark-4-clean way to build a Column for a custom
    * Expression without touching private Column internals).
    * Idempotent and thread-safe per session.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!registeredSessions.add(spark)) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim_exact",
      exprs => CosineSimExact(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_exact",
      exprs => DotExact(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_fast",
      exprs => DotFast(exprs(0), exprs(1)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sparse_dot",
      exprs => SparseDotLong(exprs(0), exprs(1), exprs(2), exprs(3)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sparse_cos_accept",
      exprs => SparseCosAccept(exprs(0), exprs(1), exprs(2), exprs(3),
        exprs(4), exprs(5)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_min_eq",
      exprs => SortedMinEq(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSig(exprs.head).toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash60",
      exprs => Hash60(exprs.head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_registers",
      exprs => HllRegAgg(exprs.head).toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters",
      exprs => HeavyHitters(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()).toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k",
      exprs => TopKAgg(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression(),
      "scala_udf")
    // Spark's own runtime-filter machinery (InjectRuntimeFilter) wraps the
    // key in XxHash64 on both the build and probe sides; exposing the same
    // pair lets queries state the bloom-prefiltered join pattern explicitly
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs.head)))
        .toAggregateExpression(),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0),
        new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(exprs(1)))),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_bits",
      exprs => LshBits(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()),
      "scala_udf")
    if (!spark.experimental.extraOptimizations.contains(CosinePrefilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CosinePrefilter
  }

  /** Column-level entry points (require [[register]] on the session). */
  def cosineSimExact(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cosine_sim_exact", a, b)

  def dotExact(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_exact", a, b)

  def dotFast(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dot_fast", a, b)
}
