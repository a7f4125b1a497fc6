package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries so scan
  * pushdown (PushedFilters/ReadSchema), join strategy (broadcast vs SMJ),
  * and whole-stage codegen coverage can be audited. Findings + the 100 TB
  * design notes live in PLANS.md.
  *
  * Usage: sbt "runMain graft.PlanAudit [queryName ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q01_group_agg", "q02_filter_project", "q03_join_agg",
        "q06_topk", "q21_cost_report", "q36_minhash_lsh", "q40_cosine_topk")
    // SPARK_GRAFT_EXPLAIN_MODE: formatted (default) | simple (shows the
    // `*(n)` whole-stage-codegen span markers) | codegen (generated code)
    val mode = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_MODE", "formatted")
    // substrate bench lines (q00x_sub_*) resolve through Substrates.builds
    // so the optimization round can commit before/after plans for them too
    val subs = Substrates.builds.toMap
    names.foreach { n =>
      println(s"\n${"=" * 70}\n== $n\n${"=" * 70}")
      SparkEntry.queries.get(n).orElse(subs.get(n)) match {
        case Some(fn) => fn(spark, dir).explain(mode)
        case None     => println(s"(unknown query: $n)")
      }
    }
    spark.stop()
  }
}
