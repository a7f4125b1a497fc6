package graft

import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._
import scala.util.Random

/** The native Hash60 expression must be bit-identical to the composed
  * conv(substring(md5)) form AND the driver-side Java twin, across ASCII,
  * unicode (incl. CJK, the zh documents), empty, and long strings.
  */
class Hash60Spec extends SparkSpec {
  import spark.implicits._

  test("native, composed, and driver-side hash60 agree on varied inputs") {
    val rnd = new Random(7)
    val cases = Seq("", " ", "a", "hello world", "éüñ", "日本語のテキスト",
      "mixed 日本 text 123", "\t\n", "x" * 5000) ++
      (1 to 200).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString)
    val df = cases.toDF("s")
    val got = df.select(
        TextAnalysis.hash60Fast(spark, $"s").as("fast"),
        TextAnalysis.hash60($"s").as("composed"))
      .as[(Long, Long)].collect()
    got.zip(cases).foreach { case ((fast, composed), s) =>
      assert(fast == composed, s"mismatch for '${s.take(30)}'")
      assert(fast == TextAnalysis.hash60Java(s), s"java twin for '${s.take(30)}'")
    }
  }

  test("native lsh_bits matches the composed lshSignature bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    // both the offset-0 table and a shifted table (q61's layout)
    Seq((12, 0), (8, 8), (8, 16)).foreach { case (n, off) =>
      val cmp = e.select(
          graft.ext.Similarity.lshSignature($"embedding", n, planeOffset = off)
            .as("composed"),
          graft.ext.Similarity.lshSignatureFast(spark, $"embedding", n, off)
            .as("native"))
        .where($"composed" =!= $"native")
      assert(cmp.count() == 0, s"planes=$n offset=$off diverged")
    }
    // zero vector: every projection is exactly 0 -> all-ones both ways
    val z = Seq(Array.fill(8)(0.0f)).toDF("embedding")
    val zb = z.select(
      graft.ext.Similarity.lshSignature($"embedding", 4).as("c"),
      graft.ext.Similarity.lshSignatureFast(spark, $"embedding", 4).as("f"))
      .as[(String, String)].head()
    assert(zb == (("1111", "1111")))
  }

  test("lsh_bits rejects vectors wider than the sign table (no silent truncation)") {
    val wide = Seq(Array.fill(graft.functions.LshBits.MaxDim + 1)(1.0f))
      .toDF("embedding")
    val ex = intercept[Exception] {
      wide.select(graft.ext.Similarity
        .lshSignatureFast(spark, $"embedding", 4)).collect()
    }
    // the root cause surfaces wrapped in Spark's execution exception chain
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("sign table")),
      ex.toString)
  }
}
