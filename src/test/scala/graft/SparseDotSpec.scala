package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.Row

/** Unit tests for the sparse-vector merge kernels
  * ([[graft.functions.SparseDotLong]] / [[graft.functions.SparseCosAccept]]):
  * exact merge semantics on both key encodings, threshold edges of the
  * fused τ=0.8 accept, and a randomized cross-check against a driver-side
  * map-based dot.
  */
class SparseDotSpec extends SparkSpec {

  private def one(sql: String): Row = {
    GraftFunctions.register(spark)
    spark.sql(s"SELECT $sql AS v").head()
  }

  test("sparse_dot merges sorted long-key arrays exactly") {
    val r = one("sparse_dot(array(1L,3L,5L), array(2L,3L,4L), " +
      "array(3L,4L,5L), array(10L,20L,30L))")
    assert(r.getLong(0) == 3L * 10L + 4L * 30L)
  }

  test("sparse_dot merges sorted string-key arrays exactly") {
    val r = one("sparse_dot(array('ant','bee','cow'), array(2L,3L,4L), " +
      "array('bee','cow','dog'), array(5L,7L,11L))")
    assert(r.getLong(0) == 3L * 5L + 4L * 7L)
  }

  test("sparse_dot: disjoint and empty vectors give 0; null gives null") {
    assert(one("sparse_dot(array(1L), array(2L), array(9L), array(3L))")
      .getLong(0) == 0L)
    assert(one("sparse_dot(CAST(array() AS ARRAY<BIGINT>), " +
      "CAST(array() AS ARRAY<BIGINT>), array(9L), array(3L))")
      .getLong(0) == 0L)
    assert(one("sparse_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L), " +
      "array(9L), array(3L))").isNullAt(0))
  }

  test("sparse_cos_accept: exact threshold edge accepts, one-below rejects") {
    // dot=4, na=nb=5: 25·16 = 400 = 16·25 → exactly τ, must accept with
    // cos2_1e4 = floor(16/25 · 1e4) = 6400
    val acc = one("sparse_cos_accept(array(1L), array(1L), array(1L), " +
      "array(4L), 5L, 5L)")
    assert(acc.getLong(0) == 6400L)
    // dot=3 on the same norms: 225 < 400 → reject (NULL)
    val rej = one("sparse_cos_accept(array(1L), array(1L), array(1L), " +
      "array(3L), 5L, 5L)")
    assert(rej.isNullAt(0))
  }

  test("sparse_cos_accept: huge-domain edge goes through the exact path") {
    // dot = 8e16, na = nb = 1e17: 25·dot² = 1.6e35 = 16·na·nb exactly —
    // the double fast-reject must NOT fire (margin), and the BigInteger
    // compare accepts the boundary; cos² = 0.64 → 6400
    val r = one("sparse_cos_accept(array(1L), array(1L), array(1L), " +
      "array(80000000000000000L), 100000000000000000L, 100000000000000000L)")
    assert(r.getLong(0) == 6400L)
    // one less than the boundary dot must reject despite doubles being
    // unable to see the difference — the exact path decides
    val r2 = one("sparse_cos_accept(array(1L), array(1L), array(1L), " +
      "array(79999999999999999L), 100000000000000000L, 100000000000000000L)")
    assert(r2.isNullAt(0))
  }

  test("sparse_dot matches a map-based driver dot on random vectors") {
    val rnd = new scala.util.Random(42)
    GraftFunctions.register(spark)
    (1 to 25).foreach { _ =>
      def vec(): Seq[(Long, Long)] = {
        val keys = (0 until rnd.nextInt(12))
          .map(_ => rnd.nextInt(30).toLong).distinct.sorted
        keys.map(k => k -> (rnd.nextInt(1000).toLong + 1L))
      }
      val a = vec(); val b = vec()
      val am = a.toMap
      val want = b.map { case (k, w) => am.getOrElse(k, 0L) * w }.sum
      def lit(xs: Seq[Long]) =
        if (xs.isEmpty) "CAST(array() AS ARRAY<BIGINT>)"
        else xs.map(x => s"${x}L").mkString("array(", ",", ")")
      val got = spark.sql("SELECT sparse_dot(" +
        s"${lit(a.map(_._1))}, ${lit(a.map(_._2))}, " +
        s"${lit(b.map(_._1))}, ${lit(b.map(_._2))}) AS v").head().getLong(0)
      assert(got == want, s"a=$a b=$b")
    }
  }
}
