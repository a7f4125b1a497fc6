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

  test("the native expressions GENERATE code: with codegen fallback " +
      "disabled, every kernel evaluates and matches interpreted eval") {
    // spark.sql.codegen.fallback=false turns a broken doGenCode into a
    // hard failure instead of a silent interpreted retry — this test is
    // the proof the expressions really participate in codegen
    spark.conf.set("spark.sql.codegen.fallback", "false")
    graft.functions.GraftFunctions.register(spark)
    try {
      val dir = "/root/testdata/sf0.001"
      val e = Tables.embeddings(spark, dir)
        .select($"vec_id", $"embedding").limit(50)
      val viaCodegen = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
        .select(
          TextAnalysis.hash60Fast(spark, $"a.vec_id".cast("string")).as("h"),
          graft.functions.GraftFunctions
            .cosineSimExact($"a.embedding", $"b.embedding").as("cs"),
          graft.functions.GraftFunctions
            .dotExact($"a.embedding", $"b.embedding").as("de"),
          graft.functions.GraftFunctions
            .dotFast($"a.embedding", $"b.embedding").as("df"),
          graft.ext.Similarity
            .lshSignatureFast(spark, $"a.embedding", 8, 0).as("lsh"))
        .collect()
      assert(viaCodegen.length == 50 * 49 / 2)
      // spot-agreement with interpreted scalar eval on one row
      val r = viaCodegen.head
      assert(r.getAs[String]("lsh").length == 8)
      assert(math.abs(r.getAs[Double]("de") - r.getAs[Double]("df")) < 1e-6)
      // the sparse pair (4- and 6-ary manual doGenCode, incl. the
      // reject-as-NULL path) under the same no-fallback conf
      val sp = Seq(
        (Seq(1L, 3L, 7L), Seq(2L, 5L, 1L), Seq(3L, 7L, 9L),
          Seq(4L, 6L, 2L), 26L, 26L),
        (Seq(1L, 2L), Seq(1L, 1L), Seq(3L, 4L), Seq(1L, 1L), 2L, 2L))
        .toDF("at", "aw", "bt", "bw", "na", "nb")
        .select(
          graft.functions.SparseDotLong
            .sparseDot($"at", $"aw", $"bt", $"bw").as("dot"),
          graft.functions.SparseCosAccept
            .sparseCosAccept($"at", $"aw", $"bt", $"bw", $"na", $"nb")
            .as("acc"))
        .collect()
      assert(sp(0).getAs[Long]("dot") == 5L * 4L + 1L * 6L) // keys 3,7
      assert(!sp(0).isNullAt(1)) // 25*26^2 >= 16*26*26 -> accepted
      assert(sp(1).getAs[Long]("dot") == 0L) // disjoint keys
      assert(sp(1).isNullAt(1)) // rejected pair is NULL, not 0
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
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
