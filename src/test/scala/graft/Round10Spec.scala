package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the round-6 additions beyond the oracle gate:
  * graph identities for modularity, the Fellegi–Sunter weight algebra,
  * CUPED's mean-preservation property, and golden-record election
  * consistency against the source documents.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("q273 modularity: handshake and intra-edge identities hold") {
    val rows = SparkEntry.queries("q273_modularity")(spark, dir).collect()
    assert(rows.nonEmpty)
    val m = rows.head.getAs[Long]("m")
    assert(rows.forall(_.getAs[Long]("m") == m))
    // handshake: label degree volumes sum to 2m (each edge has 2 ends)
    assert(rows.map(_.getAs[Long]("d_sum")).sum == 2 * m)
    // an intra edge contributes 2 to its label's volume: 2·e_in ≤ d_sum
    rows.foreach { r =>
      assert(2 * r.getAs[Long]("e_in") <= r.getAs[Long]("d_sum"), r)
    }
    // total intra mass cannot exceed the edge count
    assert(rows.map(_.getAs[Long]("e_in")).sum <= m)
    // per-label modularity contribution is bounded by the intra share
    rows.foreach { r =>
      assert(r.getAs[Long]("q_1e6") <= 1000000L, r)
    }
  }

  test("q277 fs weights: every pattern row is the exact literal dot product") {
    import graft.queries.DedupQueries._
    val rows = SparkEntry.queries("q277_fs_linkage")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w =
        (if (r.getAs[Int]("a_src") == 1) FsSrcA else FsSrcD) +
          (if (r.getAs[Int]("a_lang") == 1) FsLangA else FsLangD) +
          (if (r.getAs[Int]("a_len") == 1) FsLenA else FsLenD) +
          (if (r.getAs[Int]("a_sim") == 1) FsSimA else FsSimD)
      assert(r.getAs[Long]("weight_milli") == w, r)
      val cls = r.getAs[String]("fs_class")
      val expected =
        if (w >= FsMatchMilli) "match"
        else if (w >= 0L) "possible" else "non_match"
      assert(cls == expected, r)
    }
    // agreement weights exceed their disagreement counterparts (m > u)
    assert(FsSrcA > FsSrcD && FsLangA > FsLangD &&
      FsLenA > FsLenD && FsSimA > FsSimD)
  }

  test("q278 cuped: arm totals partition the population; adjustment is mean-preserving") {
    val rows = SparkEntry.queries("q278_cuped")(spark, dir).collect()
    assert(rows.length == 2)
    val nUsers = rows.map(_.getAs[Long]("n_users")).sum
    val sumX = rows.map(_.getAs[Long]("sum_x")).sum
    val sumY = rows.map(_.getAs[Long]("sum_y")).sum
    val users = Tables.events(spark, dir)
      .select($"user_id").distinct().count()
    assert(nUsers == users)
    val (px, py) = Tables.events(spark, dir)
      .select(($"ts" < "2024-01-16").cast("long").as("pre"))
      .agg(sum($"pre"), sum(lit(1L) - $"pre"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(sumX == px && sumY == py)
    // CUPED preserves the weighted overall mean: Σ n_a·ȳ_adj_a = Σy
    // up to IEEE round-off (x̄ = Σx/N reconstructs Σx inexactly)
    val adjTotal = rows.map(r =>
      r.getAs[Long]("n_users").toDouble * r.getAs[Double]("mean_y_adj")).sum
    assert(math.abs(adjTotal - sumY.toDouble) < 1e-6 * sumY.toDouble, adjTotal)
  }

  test("q281 loo slope equals an actual refit with the source dropped") {
    import graft.ext.TextAnalysis
    val rows = SparkEntry.queries("q281_loo_source_value")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.size > 1)
    // brute-force refit for two sources: filter the corpus, recompute the
    // normal-equation slope — must be BIT-equal (same integer sums, same
    // single division) to the subtract-from-total closed form
    rows.keys.toSeq.sorted.take(2).foreach { src =>
      val toks = TextAnalysis.tokens($"text")
      val d = Tables.documents(spark, dir)
        .where($"source" =!= src)
        .select(size(toks).cast("long").as("x"),
          size(filter(toks, t => t.isin(TextAnalysis.stopwords: _*)))
            .cast("long").as("y"))
      val m = d.agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum($"x" * $"x").as("sxx"),
        sum($"x" * $"y").as("sxy")).collect()(0)
      val (n, sx, sy, sxx, sxy) = (m.getLong(0), m.getLong(1),
        m.getLong(2), m.getLong(3), m.getLong(4))
      val refit = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      assert(rows(src).getAs[Double]("slope_loo") == refit, src)
    }
  }

  test("q279 golden record: canonical member really is the longest doc") {
    val rows = SparkEntry.queries("q279_golden_record")(spark, dir).collect()
    assert(rows.nonEmpty)
    val chars = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") > 1L, r)
      // the elected survivor's own length equals the entity max
      assert(chars(r.getAs[Long]("canonical_doc_id")) ==
        r.getAs[Long]("max_chars"), r)
    }
  }
}
