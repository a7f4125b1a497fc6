package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** The TypedImperativeAggregate minhash path must produce signatures
  * IDENTICAL to the 32-column codegen'd min-agg path.
  */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  test("aggregate and column paths produce identical signatures") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different sentence about spark engines right here"),
      (4L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val hs = Dedup.hashedShingleRows(docs, "doc_id", "text")
    val a = Dedup.minhashSignatures(hs, "doc_id").orderBy("doc_id").collect()
    val b = Dedup.minhashSignaturesAgg(hs, "doc_id").orderBy("doc_id").collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra.toSeq == rb.toSeq, s"doc ${ra.get(0)}")
    }
  }

  test("null-only groups yield a NULL signature, matching the column path") {
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq((1L, None), (1L, None), (2L, Some(42L)), (2L, None))
      .toDF("doc_id", "h")
    val agg = rows.groupBy($"doc_id")
      .agg(call_function("minhash_sig", $"h").as("sig"))
      .orderBy("doc_id").collect()
    assert(agg(0).isNullAt(1), "all-null group must produce a null signature")
    assert(!agg(1).isNullAt(1))
    // column path: min over an all-null group is null per column
    val colPath = Dedup.minhashSignatures(rows, "doc_id")
      .orderBy("doc_id").collect()
    assert(colPath(0).isNullAt(1) && agg(0).isNullAt(1))
    assert(!colPath(1).isNullAt(1))
  }

  test("non-long child is an analysis error, not a runtime class cast") {
    graft.functions.GraftFunctions.register(spark)
    val bad = Seq((1L, "not a long")).toDF("doc_id", "h")
    val e = intercept[Exception] {
      bad.groupBy($"doc_id")
        .agg(call_function("minhash_sig", $"h").as("sig")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"), e.getMessage)
  }

  test("partial-merge equivalence: many partitions, same signatures") {
    val docs = (1L to 50L)
      .map(i => (i, (1 to 30).map(j => s"w${(i * 7 + j) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val hs = Dedup.hashedShingleRows(docs, "doc_id", "text")
    val one = Dedup.minhashSignaturesAgg(hs.coalesce(1), "doc_id")
      .orderBy("doc_id").collect()
    val many = Dedup.minhashSignaturesAgg(hs.repartition(7), "doc_id")
      .orderBy("doc_id").collect()
    one.zip(many).foreach { case (ra, rb) => assert(ra.toSeq == rb.toSeq) }
  }
}
