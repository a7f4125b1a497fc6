package graft

import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.pipeline.{SilverTransforms, TimelineFlatten}
import org.apache.spark.sql.functions._

/** Unit tests on tiny literal frames: boundary values for the zone
  * bucketing (59/60/99/100/129/130), malformed geo strings, fuzzy column
  * resolution, shingle edge cases, dedup invariants (SURVEY.md §5.2).
  */
class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("hr zone thresholds at boundaries") {
    val zones = Seq(59.0, 60.0, 99.0, 100.0, 129.0, 130.0).toDF("bpm")
      .select(new SilverTransforms(null).hrZone($"bpm").as("z"))
      .as[String].collect()
    assert(zones.toSeq == Seq(
      "Resting", "Normal", "Normal", "Elevated", "Elevated", "High"))
  }

  test("hr zone null -> Unknown") {
    val z = Seq[Option[Double]](None).toDF("bpm")
      .select(new SilverTransforms(null).hrZone($"bpm")).as[String].head()
    assert(z == "Unknown")
  }

  test("geo parsing: valid, spaced, malformed, missing part") {
    val rows = Seq(
      "35.6586° , 139.7454°",
      "35.65°,139.74°",
      "garbage location",
      "12.5").toDF("loc")
      .select(TimelineFlatten.latOf($"loc").as("lat"),
        TimelineFlatten.lngOf($"loc").as("lng"))
      .collect()
    assert(rows(0).getDouble(0) == 35.6586 && rows(0).getDouble(1) == 139.7454)
    assert(rows(1).getDouble(0) == 35.65 && rows(1).getDouble(1) == 139.74)
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
    assert(rows(3).getDouble(0) == 12.5 && rows(3).isNullAt(1))
  }

  test("fuzzy heart-rate column resolution") {
    val t = new SilverTransforms(null)
    assert(t.resolveHrColumns(Seq("timestamp", "beats_per_minute", "x"))
      == ("timestamp", "beats_per_minute"))
    assert(t.resolveHrColumns(Seq("log_time", "bpm")) == ("log_time", "bpm"))
    assert(t.resolveHrColumns(Seq("Timestamp", "HeartRate"))
      == ("Timestamp", "HeartRate"))
    intercept[IllegalArgumentException] {
      t.resolveHrColumns(Seq("a", "b"))
    }
  }

  test("shingles: short docs yield empty, 3+ words roll") {
    val out = Seq("one two", "one two three four", "")
      .toDF("text")
      .select(TextAnalysis.shingles($"text").as("s"))
      .as[Seq[String]].collect()
    assert(out(0).isEmpty)
    assert(out(1) == Seq("one two three", "two three four"))
    assert(out(2).isEmpty)
  }

  test("token count: blank and multi-space") {
    val out = Seq("", "  ", "a  b\tc").toDF("text")
      .select(TextAnalysis.tokenCount($"text")).as[Int].collect()
    assert(out.toSeq == Seq(0, 0, 3))
  }

  test("exact dedup groups duplicates under one fingerprint") {
    val docs = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "different doc"))
      .toDF("doc_id", "text")
    val groups = docs
      .select($"doc_id",
        md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("fp"))
      .groupBy($"fp").agg(count(lit(1)).as("n"), min($"doc_id").as("keeper"))
      .collect()
    assert(groups.length == 2)
    assert(groups.find(_.getAs[Long]("n") == 2).get.getAs[Long]("keeper") == 1L)
  }

  test("minhash LSH finds exact duplicates and ranks jaccard=1") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "a completely different sentence about spark engines here"),
      (4L, "short one"))
      .toDF("doc_id", "text")
    val sh = Dedup.hashedShingleRows(docs, "doc_id", "text")
    val cands = Dedup.candidatePairs(
      Dedup.bandRows(Dedup.minhashSignatures(sh, "doc_id"), "doc_id"), "doc_id")
    val j = Dedup.jaccardFor(cands, sh, "doc_id").collect()
    assert(j.exists(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L && r.getAs[Double]("jaccard") == 1.0))
    // doc 3 shares no shingles: never paired with 1/2
    assert(!j.exists(r => r.getAs[Long]("doc_b") == 3L))
  }

  test("simhash: identical docs equal, disjoint docs differ") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(sh(0)._2 == sh(1)._2)
    assert(sh(0)._2 != sh(2)._2)
  }

  test("cosine kernel: orthogonal, identical, zero vectors") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 2f), Array(1f, 2f)),
      (Array(0f, 0f), Array(1f, 1f)))
      .toDF("a", "b")
      .select(Similarity.cosine(
        Similarity.dotExact($"a", $"b"),
        Similarity.norm2Exact($"a"),
        Similarity.norm2Exact($"b")).as("c"))
      .as[Double].collect()
    assert(df(0) == 0.0)
    assert(df(1) == 1.0)
    assert(df(2) == 0.0) // zero-norm guard
  }

  test("brute-force topk is ordered and k-bounded") {
    val vecs = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(4)(d => math.sin(i * 4 + d).toFloat)))
      .toDF("id", "embedding")
    val top = Similarity.bruteForceTopK(vecs.where($"id" < 2), vecs, 5)
    val rows = top.collect()
    assert(rows.length == 10) // 2 queries x 5
    val perQ = rows.groupBy(_.getAs[Long]("query_id"))
    perQ.values.foreach { rs =>
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine_sim"))
      assert(sims.toSeq == sims.sortBy(-_).toSeq)
    }
  }

  test("native cosine_sim_exact matches the composed decimal kernel bit-for-bit") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f))
    }.toDF("id", "embedding")
    val a = vecs.select($"id".as("ia"), $"embedding".as("ea"))
    val b = vecs.select($"id".as("ib"), $"embedding".as("eb"))
    val both = a.join(b, $"ia" < $"ib")
      .select(
        graft.functions.GraftFunctions.cosineSimExact($"ea", $"eb").as("native"),
        Similarity.cosine(
          Similarity.dotExact($"ea", $"eb"),
          Similarity.norm2Exact($"ea"),
          Similarity.norm2Exact($"eb")).as("composed"))
    assert(both.where($"native" =!= $"composed").isEmpty)
  }

  test("cosine_sim_exact callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT cosine_sim_exact(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c")
      .as[Double].head()
    assert(out == 1.0)
  }

  test("GraftExtensions injects the function set without error") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(exts)
    // full end-to-end injection needs a fresh session (extensions bind at
    // build time); the registry route is covered by the SQL-call test above
  }

  test("lsh signature is deterministic and fixed-width") {
    val vecs = Seq((1L, Array(1f, -2f, 3f)), (2L, Array(1f, -2f, 3f)))
      .toDF("id", "embedding")
      .select(Similarity.lshSignature($"embedding", 8).as("sig"))
      .as[String].collect()
    assert(vecs(0) == vecs(1))
    assert(vecs(0).length == 8 && vecs(0).forall(c => c == '0' || c == '1'))
  }

  test("pii redaction replaces emails, urls, phones with typed placeholders") {
    val redacted = Seq(
      "mail me at jane.doe+x@sub.example.co.uk today",
      "docs at https://a.example.org/path_1/x-y thanks",
      "call +44-123-4567 now",
      "no pii here at all").toDF("text")
      .select(TextAnalysis.redactPii($"text").as("r")).as[String].collect()
    assert(redacted(0) == "mail me at <EMAIL> today", redacted(0))
    assert(redacted(1) == "docs at <URL> thanks", redacted(1))
    assert(redacted(2) == "call <PHONE> now", redacted(2))
    assert(redacted(3) == "no pii here at all")
  }

  test("overlapFor: full containment of the shorter doc in the longer") {
    // doc 1 = 6 tokens -> 4 shingles, all present in doc 2 (a superset)
    val docs = Seq(
      (1L, "aa bb cc dd ee ff"),
      (2L, "aa bb cc dd ee ff gg hh")).toDF("doc_id", "text")
    val sh = Dedup.hashedShingleRows(docs, "doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val row = Dedup.overlapFor(pairs, sh, "doc_id")
      .select($"n_inter", $"n_a", $"n_b").head()
    assert(row.getLong(0) == 4 && row.getLong(1) == 4 && row.getLong(2) == 6,
      row.toString)
    // containment of A in B is total while Jaccard is only 4/6
    val j = Dedup.jaccardFor(pairs, sh, "doc_id")
      .select($"jaccard").as[Double].head()
    assert(math.abs(j - 4.0 / 6.0) < 1e-12)
  }

  test("TimelineFlatten: a VariantType bronze and a legacy raw-text bronze " +
      "flatten to identical rows (shape variance included)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{parse_json, col}
    val doc =
      """{ "semanticSegments": [
        |  { "startTime": "2026-02-19T09:00:00", "endTime": "2026-02-19T10:30:00",
        |    "visit": { "probability": 0.93,
        |      "topCandidate": { "placeId": "P1",
        |        "placeLocation": { "latLng": "35.6586° , 139.7454°" } } } },
        |  { "startTime": "2026-02-19T12:00:00", "endTime": "2026-02-19T12:10:00",
        |    "visit": { "probability": 0.5,
        |      "topCandidate": { "placeId": "P2",
        |        "placeLocation": "1.5, 2.5" } } },
        |  { "startTime": "2026-02-19T11:00:00", "endTime": "2026-02-19T11:45:00",
        |    "activity": { "distanceMeters": 12.5,
        |      "topCandidate": { "type": "WALKING" },
        |      "startLocation": { "latLng": "3.5, 4.5" },
        |      "endLocation":   { "latLng": "5.5, 6.5" } } },
        |  { "startTime": "2026-02-19T13:00:00", "endTime": "2026-02-19T13:05:00" }
        |] }""".stripMargin
    val legacy = Seq((1L, "f.json", doc))
      .toDF("load_id", "_source_file", "raw_data")
    val variant = legacy.withColumn("raw_data", parse_json(col("raw_data")))
    assert(variant.schema("raw_data").dataType ==
      org.apache.spark.sql.types.VariantType)
    val a = graft.pipeline.TimelineFlatten.flatten(legacy)
    val b = graft.pipeline.TimelineFlatten.flatten(variant)
    assert(a.count() == 3 && b.count() == 3) // neither-visit-nor-activity dropped
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // the bare-string placeLocation variant parsed through the same path
    assert(b.where(col("place_id") === "P2")
      .select(col("visit_latitude")).as[Double].head() == 1.5)
    // alternate startLocation/endLocation naming coalesced
    assert(b.where(col("segment_type") === "ACTIVITY")
      .select(col("end_longitude")).as[Double].head() == 6.5)
  }

  test("variant path reads: absent keys and null fields come back NULL " +
      "through to_json -> parse_json -> variant_get (q303's null path)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // props with no k, empty object, and a present k — the first two must
    // survive the round trip as NULLs, not errors or zeros
    val d = Seq((1L, """{"x": 9}"""), (2L, "{}"), (3L, """{"k": 7}"""))
      .toDF("user_id", "props")
    val k = get_json_object($"props", "$.k").cast("long")
    val doc = to_json(struct(lit("t").as("t"),
      struct($"user_id".as("uid"), k.as("k")).as("u"),
      array(k, k * 2).as("vals")))
    val out = d.select($"user_id", parse_json(doc).as("v"))
      .select($"user_id",
        expr("variant_get(v, '$.u.k', 'long')").as("k"),
        expr("variant_get(v, '$.vals[1]', 'long')").as("k2"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
         if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out(1L) == ((None, None)))
    assert(out(2L) == ((None, None)))
    assert(out(3L) == ((Some(7L), Some(14L))))
  }

  test("pq adc: identical subspace codes give identical pq_sim (q85 shape)") {
    val out = graft.SparkEntry.queries("q85_pq_ann")(
      spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length == 50, s"expected 5 queries x 10: ${rows.length}")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to 10))
      rs.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    }
  }
}
