package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Random-hyperplane LSH bit string as a native expression: bit p = sign
  * of the decimal-exact projection of the vector onto ±1 hyperplane
  * `planeOffset + p`. Semantics are IDENTICAL to the composed
  * zip_with/aggregate form ([[graft.ext.Similarity.lshSignature]]) and its
  * DuckDB oracle twin: per-element double product → DECIMAL(30,18)
  * HALF_UP → exact sum → `>= 0`.
  *
  * Why native: the composed form evaluates an interpreted lambda and
  * allocates a Decimal per (plane × element) — 24 planes × 64 dims is
  * ~1.5k interpreted closures per row. This eval walks the array buffer
  * in plain JVM loops with the sign table resolved once per executor.
  * The sign table derives from the same driver-side md5 scheme
  * ([[graft.ext.Similarity.planeSignJava]]), so the bits stay replayable
  * in the oracle.
  */
case class LshBits(child: Expression, planeOffset: Int, nPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bits expects array<float|double>, got ${t.catalogString}")
    }

  private lazy val isDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true; case _ => false
  }

  @transient private lazy val signs: Array[Array[Double]] =
    Array.tabulate(nPlanes, LshBits.MaxDim) { (p, d) =>
      graft.ext.Similarity.planeSignJava(planeOffset + p, d)
    }

  override def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshBits", this, classOf[LshBits].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernel($c)")
  }

  /** Unboxed kernel shared by interpreted eval and the generated code. */
  def kernel(a: ArrayData): UTF8String = {
    val n = a.numElements()
    // explicit error beats silent truncation — matches the composed
    // lshSignature's refusal to drop dimensions past the sign-table width
    if (n > LshBits.MaxDim) throw new IllegalArgumentException(
      s"lsh_bits: vector has $n dims, sign table covers ${LshBits.MaxDim}")
    val sb = new java.lang.StringBuilder(nPlanes)
    var p = 0
    while (p < nPlanes) {
      val row = signs(p)
      // fast sign decision: plain double sum with a sound error margin.
      // |decimalSum − doubleSum| ≤ n²·maxAbs·1.2e-16 (naive-summation
      // bound + the ≤1e-16-relative shortest-repr/scale-18 per-term
      // deltas); with n ≤ 256 that is < 7.9e-12·maxAbs + 1.3e-16, so a
      // margin of 1e-9·max(1, maxAbs) decides the sign with >100×
      // headroom. Only a knife-edge projection (p ≈ 1e-9 of the vector
      // scale — vanishingly rare) pays the decimal loop below.
      var fsum = 0.0
      var maxAbs = 0.0
      var d = 0
      while (d < n) {
        val x = if (isDouble) a.getDouble(d) else a.getFloat(d).toDouble
        val t = x * row(d)
        fsum += t
        val at = math.abs(t)
        if (at > maxAbs) maxAbs = at
        d += 1
      }
      val margin = 1e-9 * math.max(1.0, maxAbs)
      // non-finite sums (NaN/Inf input garbage) take the decimal loop so
      // its NumberFormatException behavior is preserved exactly
      if (math.abs(fsum) > margin && !java.lang.Double.isInfinite(fsum) &&
        !java.lang.Double.isNaN(fsum)) {
        sb.append(if (fsum >= 0) '1' else '0')
      } else {
        var acc = JBigDecimal.ZERO
        d = 0
        while (d < n) {
          val x = if (isDouble) a.getDouble(d) else a.getFloat(d).toDouble
          // valueOf = Double.toString shortest-representation semantics,
          // the SAME route Spark's double→decimal Cast takes in the
          // composed form — `new JBigDecimal(double)` (exact binary
          // expansion) can differ in the ~1e-17 digit and flip a
          // knife-edge sign
          acc = acc.add(JBigDecimal.valueOf(x * row(d))
            .setScale(18, RoundingMode.HALF_UP))
          d += 1
        }
        sb.append(if (acc.signum() >= 0) '1' else '0')
      }
      p += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lsh_bits"
}

object LshBits {
  /** Sign-table width; matches [[graft.ext.Similarity.lshSignature]]'s
    * `maxDim` default. */
  val MaxDim = 256
}
