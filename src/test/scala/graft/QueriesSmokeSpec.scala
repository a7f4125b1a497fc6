package graft

/** Smoke: every SparkEntry query runs on sf0.001 and the flagship entry
  * returns rows (the driver's t1 gate). Correctness vs DuckDB is the
  * driver's Verify gate (tools/selfcheck.py locally).
  */
class QueriesSmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registerAll exposes every table (and native functions) to spark.sql") {
    Tables.registerAll(spark, dir)
    val n = spark.sql(
      """SELECT count(*) AS n FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin)
      .head().getLong(0)
    assert(n > 0)
    val sim = spark.sql(
      """SELECT cosine_sim_exact(a.embedding, b.embedding) AS s
        |FROM embeddings a JOIN embeddings b ON a.vec_id = b.vec_id
        |LIMIT 1""".stripMargin).head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-9)
    assert(spark.sql("SELECT max(ts) FROM events").head().get(0) != null)
  }

  test("every query has an oracle or a documented reason") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      df.count() // executes the plan
    }
  }
}
