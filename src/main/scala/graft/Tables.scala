package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Path-based table registry over the driver fixture directory
  * (`/root/testdata/sf*`). Mirrors the reference's ADMIN.FILE_DETAILS-driven
  * catalog idea (`/root/reference/sql/admin_file_details.sql:1-10`) reduced to
  * its Spark essence: table name -> parquet path -> DataFrame.
  *
  * Every reader is a plain `spark.read.parquet` so Catalyst gets full column
  * pruning + filter pushdown into the scan; at 100 TB the same call works over
  * a partitioned directory tree, no code change.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read as long nanos under the legacy conf
    * and rebuild with exact integer arithmetic: ts div 1000, never double
    * division, epoch-nanos exceed 2^53) and as TIMESTAMP(MICROS) without
    * UTC adjustment (inferred as TIMESTAMP_NTZ). Normalize BOTH lineages
    * to a session-TZ TimestampType column; the session runs in UTC, so the
    * NTZ->LTZ cast is micro-exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every fixture table as a temp view so the whole engine
    * surface is reachable from plain `spark.sql(...)` (plus graft's native
    * functions via [[graft.functions.GraftFunctions.register]]). The
    * events view gets the nanos-rebuild applied, so SQL users see a real
    * timestamp column.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    all.filterNot(_ == "events")
      .foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
    graft.functions.GraftFunctions.register(spark)
  }
}
