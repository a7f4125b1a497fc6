package graft

import graft.functions.{GraftFunctions, TopKAgg}
import org.apache.spark.sql.functions._

/** The native bounded-heap grouped top-k must be EXACT and layout-
  * independent: unlike the MG/HLL sketches, a strict total order
  * (key DESC, id ASC with unique ids) makes partial-merge identical to
  * global top-k for every partition layout and merge order, so the spec
  * compares bit-for-bit against a sort-based reference — not a bound.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  // deterministic data with deliberate key ties (key = i % 17) so the
  // id tiebreak is exercised, spread over several groups
  private val rows: Seq[(String, Long, Long)] =
    (0 until 500).map(i => (s"g${i % 7}", (i % 17).toLong, i.toLong))

  private def reference(k: Int): Map[String, Seq[(Long, Long)]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).sortBy { case (kk, ii) => (-kk, ii) }
        .take(k)
    }

  private def viaAgg(k: Int, partitions: Int,
      reversed: Boolean): Map[String, Seq[(Long, Long)]] = {
    GraftFunctions.register(spark)
    val data = if (reversed) rows.reverse else rows
    data.toDF("g", "key", "id").repartition(partitions)
      .groupBy($"g")
      .agg(call_function("top_k", $"key", $"id", lit(k)).as("tk"))
      .collect()
      .map { r =>
        r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getLong(0), e.getLong(1)))
      }.toMap
  }

  test("exact top-k across layouts, k values, and input orders") {
    for (k <- Seq(1, 3, 5, 20, 100); parts <- Seq(1, 7, 64);
        rev <- Seq(false, true)) {
      val got = viaAgg(k, parts, rev)
      val want = reference(k)
      assert(got.keySet == want.keySet)
      want.foreach { case (g, exp) =>
        assert(got(g) == exp, s"k=$k parts=$parts rev=$rev group=$g")
      }
    }
  }

  test("nulls in key or id are skipped; k larger than group is the group") {
    GraftFunctions.register(spark)
    val df = Seq[(String, Option[Long], Option[Long])](
      ("a", Some(5L), Some(1L)), ("a", None, Some(2L)),
      ("a", Some(9L), None), ("a", Some(3L), Some(4L)))
      .toDF("g", "key", "id")
    val out = df.groupBy($"g")
      .agg(call_function("top_k", $"key", $"id", lit(10)).as("tk"))
      .head().getSeq[org.apache.spark.sql.Row](1)
      .map(e => (e.getLong(0), e.getLong(1)))
    assert(out == Seq((5L, 1L), (3L, 4L)))
  }

  test("serialize/deserialize roundtrip preserves the heap") {
    val lit0 = org.apache.spark.sql.catalyst.expressions.Literal.create(
      0L, org.apache.spark.sql.types.LongType)
    val agg = TopKAgg(lit0, lit0, 4)
    val buf = agg.createAggregationBuffer()
    Seq((5L, 1L), (9L, 2L), (5L, 0L), (1L, 7L), (9L, 9L), (2L, 3L))
      .foreach { case (kk, ii) => buf.offer(kk, ii) }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sortedDesc.toSeq == buf.sortedDesc.toSeq)
    assert(buf.sortedDesc.toSeq == Seq((9L, 2L), (9L, 9L), (5L, 0L), (5L, 1L)))
  }
}
