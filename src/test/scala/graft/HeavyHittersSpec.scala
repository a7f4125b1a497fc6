package graft

import graft.functions.{GraftFunctions, HeavyHitters}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** The Misra-Gries guarantee (est ≤ true, true − est ≤ N/(m+1), presence
  * whenever true > N/(m+1)) must hold for EVERY partition layout — the
  * summary contents may differ between layouts, the bound may not.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // deterministic skewed stream: word w_i appears (41-i)^2 times (i=1..40)
  private val stream: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill((41 - i) * (41 - i))(s"w$i"))
  private val exact: Map[String, Long] =
    stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  private val n = stream.size.toLong

  private def summarize(partitions: Int, capacity: Int): Map[String, Long] = {
    GraftFunctions.register(spark)
    val df = stream.toDF("token").repartition(partitions)
    val row = df.agg(
      call_function("heavy_hitters", $"token", lit(capacity)).as("sk")).head()
    row.getMap[String, Long](0).toMap
  }

  test("MG bound holds across partition layouts and capacities") {
    for (parts <- Seq(1, 3, 7, 16); m <- Seq(4, 8, 16)) {
      val sk = summarize(parts, m)
      val maxErr = n / (m + 1)
      assert(sk.size <= m, s"parts=$parts m=$m size=${sk.size}")
      exact.foreach { case (w, t) =>
        val est = sk.getOrElse(w, 0L)
        assert(est <= t, s"overcount parts=$parts m=$m $w: $est > $t")
        assert(t - est <= maxErr,
          s"undercount parts=$parts m=$m $w: $t - $est > $maxErr")
        if (t > maxErr)
          assert(sk.contains(w), s"missing hitter parts=$parts m=$m $w ($t > $maxErr)")
      }
      // no phantom items either: everything in the summary really occurred
      sk.keys.foreach(w => assert(exact.contains(w), s"phantom $w"))
    }
  }

  test("serialize/deserialize roundtrip preserves the buffer") {
    val agg = HeavyHitters(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        "x", org.apache.spark.sql.types.StringType), 8)
    val buf = mutable.HashMap("alpha" -> 5L, "βeta" -> 3L, "" -> 1L)
    assert(agg.deserialize(agg.serialize(buf)) == buf)
  }

  test("native aggregates are reachable from the SQL front door") {
    GraftFunctions.register(spark)
    stream.toDF("token").createOrReplaceTempView("hh_words")
    val row = spark.sql(
      "SELECT heavy_hitters(token, 8) AS sk, count(1) AS n FROM hh_words").head()
    val sk = row.getMap[String, Long](0).toMap
    assert(sk.nonEmpty && sk.size <= 8)
    assert(row.getLong(1) == n)
    // bloom pair: build in SQL, probe in SQL, no false negatives
    val bf = spark.sql(
      "SELECT bloom_agg(token) AS bf FROM hh_words").head().getAs[Array[Byte]](0)
    spark.sql("SELECT token FROM hh_words").createOrReplaceTempView("hh_probe")
    val missed = spark.table("hh_probe")
      .where(!org.apache.spark.sql.functions.call_function("might_contain",
        org.apache.spark.sql.functions.lit(bf),
        org.apache.spark.sql.functions.col("token")))
      .count()
    assert(missed == 0, s"bloom false negatives: $missed")
  }

  test("non-string child is an analysis error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq(1L, 2L).toDF("v")
        .agg(call_function("heavy_hitters", $"v", lit(4))).collect()
    }
    assert(e.getMessage.contains("heavy_hitters") ||
      e.getMessage.contains("STRING"), e.getMessage)
  }
}
