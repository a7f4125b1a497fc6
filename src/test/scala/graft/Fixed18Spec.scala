package graft

import graft.functions.Fixed18
import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import scala.util.Random

/** Bit-equivalence of the 128-bit fixed-point kernel path with the
  * reference per-product BigDecimal HALF_UP construction it replaces —
  * the exact-kernel contract every similarity/ANN/k-means oracle relies
  * on. No SparkSession needed: this pins the scalar engine itself.
  */
class Fixed18Spec extends org.scalatest.funsuite.AnyFunSuite {

  private def ref(ps: Seq[Double]): Double =
    ps.foldLeft(JBigDecimal.ZERO)((acc, p) =>
      acc.add(new JBigDecimal(p).setScale(18, RoundingMode.HALF_UP)))
      .doubleValue()

  private def fast(ps: Seq[Double]): Option[Double] = {
    val acc = new Array[Long](2)
    if (ps.forall(Fixed18.addProduct(acc, _))) Some(Fixed18.toDouble(acc))
    else None
  }

  test("special values match BigDecimal HALF_UP at scale 18") {
    val specials = Seq(0.0, -0.0,
      math.pow(2, -19), -math.pow(2, -19), // ×10^18 lands exactly on .5
      math.pow(2, -60), math.pow(2, -200), // deep fractional expansions
      1.0, -1.0, 0.1, -0.1, 1.0 / 3.0, 1e-30, -1e-30,
      1e14, -1e14, 1e15, // at the fast-path bound
      4.9e-324, -4.9e-324, // min subnormal double → rounds to 0
      (1.4e-45f).toDouble * (1.4e-45f).toDouble) // min float squared
    specials.foreach { p =>
      assert(fast(Seq(p)).contains(ref(Seq(p))), s"p=$p")
    }
  }

  test("out-of-domain products refuse the fast path, accumulator untouched") {
    val acc = new Array[Long](2)
    assert(!Fixed18.addProduct(acc, 1.0000001e15))
    assert(!Fixed18.addProduct(acc, -2e15))
    assert(!Fixed18.addProduct(acc, Double.NaN))
    assert(!Fixed18.addProduct(acc, Double.PositiveInfinity))
    assert(acc.toSeq == Seq(0L, 0L))
  }

  test("random float-product sums match the BigDecimal reference exactly") {
    val rnd = new Random(42)
    (1 to 500).foreach { _ =>
      val n = 1 + rnd.nextInt(128)
      val ps = Seq.fill(n) {
        val scale = math.pow(10, rnd.nextInt(30) - 15).toFloat
        val x = (rnd.nextFloat() * 2 - 1) * scale
        val y = rnd.nextFloat() * 2 - 1
        x.toDouble * y.toDouble // exact float product, like the kernels
      }.filter(p => math.abs(p) <= Fixed18.MaxAbs)
      assert(fast(ps).contains(ref(ps)), ps.take(5).toString)
    }
  }

  test("signed cancellation across the 64-bit accumulator boundary") {
    // sums that cross ±2^63 in scaled units (|v| > 9.2 forces the 128-bit
    // limb) and then cancel back to small values
    val big = Seq.fill(2000)(123.456) ++ Seq.fill(2000)(-123.456) ++
      Seq(1.0 / 3.0)
    assert(fast(big).contains(ref(big)))
    val drift = (1 to 4000).map(i => if (i % 2 == 0) 1e12 else -999999999999.5)
    assert(fast(drift).contains(ref(drift)))
  }
}
