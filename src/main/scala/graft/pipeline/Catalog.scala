package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Path-based medallion warehouse: `schema.table` → `<root>/<schema>/<table>`
  * parquet directories. Replaces the reference's Snowflake schemas
  * (`sql/reset_schemas.sql:9-12`) with a storage layout that scales to a
  * distributed filesystem unchanged.
  *
  * Batch idempotency (the reference's DELETE WHERE load_id + re-insert,
  * `transformations/utils.py:36-43`) maps to `load_id`-partitioned writes
  * with dynamic partition overwrite: rewriting a batch replaces exactly its
  * partition directories, atomically per partition — no transactional store
  * needed (SURVEY.md §7.4 risk 4).
  */
final class Catalog(val spark: SparkSession, val root: String) {

  spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

  def path(schema: String, table: String): String = s"$root/$schema/$table"

  /** All filesystem control-plane calls go through the Hadoop FileSystem
    * API (same seam [[Ingestion.listFiles]] uses), so the catalog runs
    * unchanged against HDFS/S3A at 100 TB — `java.nio` would silently pin
    * it to a local disk.
    */
  private def fs(p: String): FileSystem =
    new HPath(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(schema: String, table: String): Boolean = {
    val p = path(schema, table)
    fs(p).exists(new HPath(p))
  }

  def read(schema: String, table: String): DataFrame =
    spark.read.parquet(path(schema, table))

  /** Append rows (ledgers, Bronze landings). */
  def append(df: DataFrame, schema: String, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path(schema, table))

  /** Append partitioned by load_id so per-batch rewrite prunes to one
    * partition and batch-scoped reads (`WHERE load_id = ?`) prune files.
    */
  def appendBatched(df: DataFrame, schema: String, table: String): Unit =
    df.write.mode(SaveMode.Append).partitionBy("load_id")
      .parquet(path(schema, table))

  /** Idempotent batch rewrite: dynamic overwrite of just the partitions
    * present in `df` (the reference's delete+insert, S11).
    */
  def overwriteBatch(df: DataFrame, schema: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy("load_id")
      .parquet(path(schema, table))

  /** Full rebuild (CTAS, S12/S13). */
  def overwrite(df: DataFrame, schema: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(schema, table))

  /** Bucketed managed table (Hive-layout parquet in the session warehouse):
    * co-locates both sides of a recurring join on the bucket key so the
    * join plans WITHOUT an Exchange — at 100 TB this converts every
    * fact-fact join on the key into a local zip of bucket files. Requires
    * saveAsTable (bucket metadata lives in the session catalog).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .option("path", s"$root/bucketed/$table")
      .saveAsTable(table)

  def readTable(table: String): DataFrame = spark.table(table)

  /** Small-file compaction: rewrite a table into ~`targetBytes` files.
    * Append-per-batch ingestion (this catalog's write pattern) accumulates
    * one file set per load; at 100 TB the resulting small-file population
    * dominates scan planning and NameNode/listing pressure, so periodic
    * compaction is part of the operating model. Partitioned tables keep
    * their `load_id` layout (coalesce happens within partitions via the
    * dynamic overwrite); plain tables rewrite to `ceil(bytes/target)`
    * files. Returns the resulting file count.
    */
  def compact(schema: String, table: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val p = path(schema, table)
    val df = spark.read.parquet(p)
    val hfs = fs(p)
    val partitioned = df.columns.contains("load_id") &&
      hfs.listStatus(new HPath(p))
        .exists(_.getPath.getName.startsWith("load_id="))
    val bytes = {
      val it = hfs.listFiles(new HPath(p), true)
      var b = 0L
      while (it.hasNext) b += it.next().getLen
      b
    }
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    // eager localCheckpoint ONCE up front: it fully materializes the input
    // before the path is overwritten AND means the (possibly expensive)
    // source plan is evaluated a single time — the load-count probe and the
    // staged repartition below both read the materialized blocks. Unlike
    // cache(), a lost block fails loudly instead of recomputing from the
    // path being overwritten (production-scale analog: write to a staging
    // path and atomically rename).
    val src = df.localCheckpoint()
    if (partitioned) {
      // repartition must follow the table's partitionBy(load_id) layout: a
      // round-robin repartition(nFiles) would give every write task rows of
      // ~every load_id, emitting up to nFiles × #partitions files. Hashing
      // on (load_id, salt) keeps each output file inside one partition
      // directory, with `salt` splitting any single load that exceeds the
      // per-file byte budget.
      import org.apache.spark.sql.functions._
      val nLoads = math.max(1L, src.select("load_id").distinct().count())
      val perLoadFiles =
        math.max(1, math.ceil(bytes.toDouble / nLoads / targetBytes).toInt)
      // salt only over hashable column types: xxhash64 rejects map-typed
      // input, so a map column anywhere in the schema would otherwise break
      // compaction for the whole table
      import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
      def hasMap(t: DataType): Boolean = t match {
        case _: MapType      => true
        case a: ArrayType    => hasMap(a.elementType)
        case s: StructType   => s.fields.exists(f => hasMap(f.dataType))
        case _               => false
      }
      val saltCols = src.schema.fields.toIndexedSeq
        .filterNot(f => hasMap(f.dataType)).map(f => col(f.name))
      val salt =
        if (saltCols.isEmpty) lit(0L)
        else pmod(xxhash64(saltCols: _*), lit(perLoadFiles))
      val staged = src.repartition(nFiles, col("load_id"), salt)
      overwriteBatch(staged, schema, table)
    } else {
      overwrite(src.repartition(nFiles), schema, table)
    }
    val it = hfs.listFiles(new HPath(p), true)
    var n = 0L
    while (it.hasNext)
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  /** Schema reset utility (S14): drop a whole schema directory. */
  def dropSchema(schema: String): Unit = {
    val p = new HPath(s"$root/$schema")
    val hfs = fs(p.toString)
    if (hfs.exists(p)) { hfs.delete(p, true); () }
  }
}
