package graft

import graft.queries.TrainingDataQueries
import org.apache.spark.sql.functions._

/** Unit tests for the second training-data batch: BPE-ish tokenization,
  * truncated-fixed-point means, and simhash keeper selection.
  */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("BPE pattern splits letter runs, digit runs, and single glyphs") {
    val toks = Seq("Hello, world42!  x").toDF("text")
      .select(regexp_extract_all(lower($"text"),
        lit(TrainingDataQueries.BpePattern), lit(0)).as("t"))
      .as[Seq[String]].head()
    assert(toks == Seq("hello", ",", "world", "42", "!", "x"))
  }

  test("tavg matches plain avg to 1e-9 and is exactly reproducible") {
    val vals = Seq(0.1, 0.25, -0.5, 0.333333333, 1.0)
    val df = vals.toDF("v")
    val t = df.agg(QueryDef.tavg($"v").as("m")).as[Double].head()
    val plain = vals.sum / vals.size
    assert(math.abs(t - plain) < 1e-8, s"t=$t plain=$plain")
    val t2 = df.agg(QueryDef.tavg($"v").as("m")).as[Double].head()
    assert(t == t2)
  }

  test("simhash keeper: one keeper per signature group, smallest id wins") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (5L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma delta"),
      (9L, "totally different words entirely here now"))
      .toDF("doc_id", "text")
    val sigs = graft.ext.Dedup.simhash(docs, "doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"simhash")
    val out = sigs.withColumn("keeper", min($"doc_id").over(w))
      .select($"doc_id", $"keeper", ($"doc_id" =!= $"keeper").as("dropped"))
      .collect()
    val dupGroup = out.filter(r => Seq(1L, 5L, 3L).contains(r.getLong(0)))
    assert(dupGroup.forall(_.getLong(1) == 1L))
    assert(dupGroup.count(!_.getBoolean(2)) == 1)
    assert(out.find(_.getLong(0) == 9L).get.getBoolean(2) == false)
  }

  test("LSH band cap drops oversized buckets; other bands still pair") {
    val bands = Seq(
      // degenerate bucket of 5 (e.g. the all-empty-docs signature)
      (1L, 0, "deg"), (2L, 0, "deg"), (3L, 0, "deg"), (4L, 0, "deg"), (5L, 0, "deg"),
      // healthy buckets
      (1L, 1, "ok"), (2L, 1, "ok"),
      (4L, 2, "x"), (5L, 2, "x"))
      .toDF("doc_id", "band_id", "band_key")
    val capped = graft.ext.Dedup.candidatePairs(bands, "doc_id", maxBandBucket = 4)
      .as[(Long, Long)].collect().toSet
    // the degenerate bucket contributes nothing; pairs that also share a
    // healthy band survive
    assert(capped == Set((1L, 2L), (4L, 5L)))
    // default cap is far above any test bucket: full candidate set
    val all = graft.ext.Dedup.candidatePairs(bands, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(all.size == 10) // C(5,2) from the big bucket covers the others
  }

  test("connected components: chains, triangles, isolated pairs") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L))
      .toDF("a", "b")
    val cc = graft.ext.Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L).forall(cc(_) == 20L))
    assert(cc.size == 9)
  }

  test("connected components: long path needs multiple rounds") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = graft.ext.Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert((1L to 12L).forall(cc(_) == 1L))
  }

  test("BPE merges: left-to-right non-overlapping application (aaaa -> aa aa)") {
    val words = Seq(("aaaa", 1L)).toDF("token", "freq")
    val (merges, seg) = graft.ext.Bpe.trainMerges(words, 1)
    assert(merges == Seq(graft.ext.Bpe.Merge(1, "a", "a", 3L)))
    // true BPE merge order: positions 0-1 then 2-3, NOT the middle pair
    assert(seg.select($"enc").as[String].head() == " aa  aa ")
  }

  test("BPE merges: classic Sennrich corpus picks (e,s) then (es,t)") {
    // low×5 lower×2 newest×6 widest×3: round 1 is a 9-9 tie between
    // (e,s) and (s,t); the lexicographic tiebreak picks (e,s)
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("token", "freq")
    val (merges, seg) = graft.ext.Bpe.trainMerges(words, 2)
    assert(merges.map(m => (m.step, m.lhs, m.rhs, m.freq)) ==
      Seq((1, "e", "s", 9L), (2, "es", "t", 9L)))
    val segs = seg.select($"token", trim($"enc")).as[(String, String)]
      .collect().toMap
    assert(segs("newest") == "n  e  w  est")
    assert(segs("widest") == "w  i  d  est")
    assert(segs("low") == "l  o  w")
  }

  test("kmeans codebook: cells partition the corpus, means are exact") {
    val dir = "/root/testdata/sf0.001"
    val raw = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val n = raw.count()
    val book = graft.ext.KMeans.trainCodebook(raw, k = 8, iters = 2)
      .select($"cid", $"ce", $"n_vectors")
      .as[(Long, Seq[Double], Long)].collect()
    // every centroid id came from the deterministic init set
    assert(book.forall(_._1 < 8))
    // the final assignment cells partition all vectors
    assert(book.map(_._3).sum == n)
    // full dimensionality survived the explode/reassemble round trip
    assert(book.forall(_._2.size == 64))
    // training is exactly reproducible (floor fixed-point, no float drift)
    val again = graft.ext.KMeans.trainCodebook(raw, k = 8, iters = 2)
      .select($"cid", $"ce", $"n_vectors")
      .as[(Long, Seq[Double], Long)].collect()
    assert(book.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("kmeans codebook: identical vectors collapse to their own mean") {
    val v = Array(1.0f, 0.0f, 0.5f)
    val u = Array(0.0f, 1.0f, -0.5f)
    val emb = Seq((0L, v), (1L, u), (2L, v), (3L, v), (4L, u))
      .toDF("vec_id", "embedding")
    val book = graft.ext.KMeans.trainCodebook(emb, k = 2, iters = 2)
      .select($"cid", $"ce", $"n_vectors")
      .as[(Long, Seq[Double], Long)].collect().sortBy(_._1)
    // cid 0 gathers the v-copies, cid 1 the u-copies; means = the vectors
    assert(book.map(t => t._1 -> t._3).toMap == Map(0L -> 3L, 1L -> 2L))
    assert(book(0)._2.zip(v).forall { case (m, x) => math.abs(m - x) < 1e-9 })
    assert(book(1)._2.zip(u).forall { case (m, x) => math.abs(m - x) < 1e-9 })
  }

  test("IVF: a centroid's own nearest cell is itself") {
    // when queries ARE centroids, rank-1 assignment must be the identity
    val dir = "/root/testdata/sf0.001"
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir).select($"vec_id", $"embedding")
    val cents = e.where($"vec_id" < 8)
      .select($"vec_id".as("cid"), $"embedding".as("ce"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"vec_id")
      .orderBy($"c_sim".desc, $"cid".asc)
    val best = e.where($"vec_id" < 8).join(broadcast(cents))
      .select($"vec_id", $"cid",
        round(GraftFunctions.cosineSimExact($"embedding", $"ce"), 9).as("c_sim"))
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"vec_id", $"cid").as[(Long, Long)].collect()
    assert(best.forall { case (v, c) => v == c })
  }
}
