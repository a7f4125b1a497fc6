package graft.functions

import java.math.{BigDecimal => JBigDecimal, BigInteger}

/** 128-bit fixed-point engine behind the exact decimal vector kernels
  * ([[DotExact]], [[CosineSimExact]]).
  *
  * The kernels' contract is: per-element double product `p`, rounded
  * HALF_UP to decimal scale 18, summed exactly, one final cast to double
  * (bit-identical to the DuckDB oracle's
  * `SUM(CAST(x*y AS DECIMAL(30,18)))`). The naive implementation pays a
  * `java.math.BigDecimal` construction per element (~µs: binary→decimal
  * expansion allocates), which dominates every near-dup / ANN / k-means
  * kernel. This object computes the SAME value in integer registers:
  *
  *   p = ±M · 2^e (the IEEE-754 decomposition, M ≤ 2^53)
  *   round_half_up(p · 10^18) = ±round(M · 5^18 · 2^(e+18))
  *
  * `M · 5^18 < 2^95` fits a 128-bit product (one `Math.multiplyHigh`);
  * the power-of-two shift with half-up rounding is `(V + 2^(k-1)) >> k` on
  * the magnitude — floor(x + 1/2) rounds ties up in magnitude exactly as
  * BigDecimal's HALF_UP (away from zero) does. Scaled terms accumulate in
  * a two's-complement 128-bit (hi, lo) pair; only the final sum touches
  * BigDecimal once for the scale-18 → double conversion.
  *
  * Fast-path domain: |p| ≤ 1e15 (then |term| < 2^110 and thousands of
  * dims cannot overflow the 128-bit accumulator). Real embedding products
  * are O(1); a kernel that sees a larger/NaN product falls back to the
  * reference BigDecimal loop for the whole row, preserving semantics on
  * adversarial inputs (including the NaN NumberFormatException).
  */
object Fixed18 {

  private val Pow5_18 = 3814697265625L // 5^18 ≈ 2^41.8

  /** Upper bound of the fast path's per-product magnitude. */
  val MaxAbs: Double = 1e15

  /** Adds round_half_up(p · 10^18) into the 128-bit accumulator
    * `acc = [hi, lo]` (two's complement). Returns false — with `acc`
    * untouched — when `p` is outside the fast-path domain (caller must
    * fall back for the whole row).
    */
  def addProduct(acc: Array[Long], p: Double): Boolean = {
    // NaN fails the comparison too → fallback reproduces the reference
    // path's behavior on NaN
    if (!(math.abs(p) <= MaxAbs)) return false
    if (p == 0.0) return true
    val bits = java.lang.Double.doubleToRawLongBits(p)
    val rawExp = ((bits >>> 52) & 0x7ff).toInt
    val frac = bits & ((1L << 52) - 1)
    // p = m2 · 2^e2 exactly
    val m2 = if (rawExp == 0) frac else frac | (1L << 52)
    val e2 = (if (rawExp == 0) 1 else rawExp) - 1075
    // magnitude · 10^18 = (m2 · 5^18) · 2^(e2+18)
    var hi = Math.multiplyHigh(m2, Pow5_18)
    var lo = m2 * Pow5_18
    val s = e2 + 18
    if (s >= 0) {
      // |p| ≤ 1e15 bounds s ≤ 15 (M ≥ 2^52 ⇒ e2 ≤ −3), so the exact
      // left shift stays < 2^111 — no rounding, no overflow
      if (s > 0) { hi = (hi << s) | (lo >>> (64 - s)); lo = lo << s }
    } else {
      val k = -s
      // m2·5^18 < 2^95 ≤ 2^(k-1) for k ≥ 96: rounds to zero
      if (k >= 96) return true
      // half-up: add 2^(k-1), then floor-shift right by k
      val rhi = if (k - 1 >= 64) 1L << (k - 65) else 0L
      val rlo = if (k - 1 >= 64) 0L else 1L << (k - 1)
      val nlo = lo + rlo
      hi = hi + rhi + (((lo & rlo) | ((lo | rlo) & ~nlo)) >>> 63)
      lo = nlo
      if (k >= 64) { lo = hi >>> (k - 64); hi = 0L }
      else if (k > 0) { lo = (lo >>> k) | (hi << (64 - k)); hi = hi >>> k }
    }
    if (p < 0) { // negate the magnitude (two's complement)
      hi = ~hi; lo = ~lo
      lo += 1; if (lo == 0L) hi += 1
    }
    val alo = acc(1) + lo
    acc(0) += hi + (((acc(1) & lo) | ((acc(1) | lo) & ~alo)) >>> 63)
    acc(1) = alo
    true
  }

  /** The accumulated scale-18 decimal as a double — the kernel's single
    * binary→decimal conversion.
    */
  def toDouble(acc: Array[Long]): Double = {
    val hi = acc(0); val lo = acc(1)
    if (hi == (lo >> 63)) // fits in one long
      JBigDecimal.valueOf(lo, 18).doubleValue()
    else {
      val bytes = new Array[Byte](16)
      var i = 0
      while (i < 8) {
        bytes(i) = (hi >>> (56 - 8 * i)).toByte
        bytes(i + 8) = (lo >>> (56 - 8 * i)).toByte
        i += 1
      }
      new JBigDecimal(new BigInteger(bytes), 18).doubleValue()
    }
  }
}
