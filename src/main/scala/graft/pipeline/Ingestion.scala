package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Config-driven Bronze ingestion (reference S1-S7,
  * `/root/reference/scripts/ingestion_logic.py`):
  * glob listing, tolerant schema'd CSV / whole-document JSON reads, audit
  * columns, a load ledger with RUNNING→SUCCESS/FAILURE transitions, and
  * idempotent skip of already-SUCCESS files.
  *
  * Differences from the reference are deliberate Spark-first choices:
  * schemas come from [[Schemas.bronze]] instead of DESC TABLE introspection,
  * and per-file loads append into `load_id`-partitioned parquet instead of
  * COPY INTO. Control flow (listing, ledger) is driver-side over tiny data;
  * all row movement is executor-side.
  */
final class Ingestion(catalog: Catalog) {
  import catalog.spark
  import spark.implicits._

  private val ADMIN = "admin"

  /** S3: glob files matching the config pattern (reference LIST+regex,
    * ingestion_logic.py:101-113). Hadoop glob works on any supported FS.
    */
  def listFiles(sourcePath: String, pattern: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val glob = new org.apache.hadoop.fs.Path(s"$sourcePath/$pattern")
    val st = fs.globStatus(glob)
    if (st == null) Seq.empty
    else st.toSeq.filter(_.isFile).map(_.getPath.toString).sorted
  }

  /** S6: files already loaded with SUCCESS for this table are skipped. */
  def alreadyLoaded(targetTable: String): Set[String] =
    if (!catalog.exists(ADMIN, "ingestion_logs")) Set.empty
    else catalog.read(ADMIN, "ingestion_logs")
      .where($"status" === "SUCCESS" && $"target_table" === targetTable)
      .select($"file_name").distinct().as[String].collect().toSet

  private def nextLoadId(): Long =
    if (!catalog.exists(ADMIN, "ingestion_logs")) 1L
    else catalog.read(ADMIN, "ingestion_logs")
      .agg(max($"load_id")).as[Option[Long]].head().getOrElse(0L) + 1L

  private def log(entry: Schemas.IngestionLog): Unit =
    catalog.append(Seq(entry).toDF(), ADMIN, "ingestion_logs")

  /** Reconcile orphaned RUNNING claims before a new run: the batched
    * up-front claim (see [[ingest]]) means a driver crash mid-run leaves
    * a RUNNING row for every never-attempted file in the config — and
    * because [[alreadyLoaded]] only honors SUCCESS, those files retry
    * under FRESH load_ids, permanently stranding the crashed run's
    * claimed rows as RUNNING. A ledger consumer computing "in-flight
    * loads" would count ghosts forever. So each ingest starts by marking
    * every RUNNING load_id that never reached a terminal row (SUCCESS /
    * FAILURE / ABANDONED) as ABANDONED — append-only like every ledger
    * transition, one driver-side pass over control-plane-sized ids.
    * Single-driver assumption (the same one the id-range claim
    * documents): a concurrent ingest's live claims would be
    * indistinguishable from a crash's orphans.
    */
  def reconcileOrphans(): Seq[Long] = {
    if (!catalog.exists(ADMIN, "ingestion_logs")) Seq.empty
    else {
      val ledger = catalog.read(ADMIN, "ingestion_logs")
      val orphans = ledger.where($"status" === "RUNNING")
        .join(ledger.where($"status".isin("SUCCESS", "FAILURE", "ABANDONED"))
          .select($"load_id"), Seq("load_id"), "left_anti")
        .select($"load_id", $"file_name", $"target_table", $"started_at")
        .collect()
      if (orphans.nonEmpty) {
        val t = new Timestamp(System.currentTimeMillis())
        catalog.append(orphans.toSeq.map { r =>
          Schemas.IngestionLog(r.getLong(0), r.getString(1), r.getString(2),
            "ABANDONED", 0L, "orphaned RUNNING claim from a crashed run", t)
        }.toDF(), ADMIN, "ingestion_logs")
      }
      orphans.map(_.getLong(0)).toSeq.sorted
    }
  }

  /** S4/S5: load one file into Bronze with audit columns; returns rows
    * loaded. CSV options mirror the reference's tolerant format
    * (file_format_csv.sql:1-7): header, quotes, NULL_IF('NULL','null',''),
    * PERMISSIVE on malformed rows.
    */
  def loadFile(detail: Schemas.FileDetail, file: String, loadId: Long): Long = {
    val raw = detail.format.toUpperCase match {
      case "CSV" =>
        val schema = Schemas.bronze.getOrElse(detail.target_table,
          throw new IllegalArgumentException(
            s"no bronze schema for ${detail.target_table}"))
        spark.read.schema(schema)
          .option("header", "true")
          .option("quote", "\"")
          .option("escape", "\"")
          .option("nullValue", "")
          .option("mode", "PERMISSIVE")
          .csv(file)
          // NULL_IF ('NULL','null',''): normalize string columns post-read
          .select(schema.fields.toIndexedSeq.map { f =>
            if (f.dataType == org.apache.spark.sql.types.StringType)
              when(upper(col(f.name)) === "NULL", lit(null)).otherwise(col(f.name))
                .as(f.name)
            else col(f.name)
          }: _*)
      case "JSON" =>
        // whole-document-per-file VARIANT landing (ingestion_logic.py:78-80,
        // reset_schemas.sql:127-133): the document lands as a REAL Spark 4
        // VariantType column (parse_json at load time), so Bronze stores
        // the encoded variant binary — path reads downstream
        // (TimelineFlatten's variant_get) skip re-parsing the 16 MB text
        // per consumer, and parquet's variant annotation keeps the column
        // self-describing for other engines.
        spark.read.option("wholetext", "true").text(file)
          .select(parse_json($"value").as("raw_data"))
      case other =>
        throw new IllegalArgumentException(s"unsupported format $other")
    }
    val withAudit = raw
      .withColumn("_ingestion_time", current_timestamp())
      .withColumn("_source_file", lit(file))
      .withColumn("load_id", lit(loadId))
    catalog.appendBatched(withAudit, detail.target_schema, detail.target_table)
    // durability-verifying row count: read back exactly the partition this
    // load wrote. Going through the table root (read + WHERE load_id) would
    // prune to the same files but pays an O(#loads) root listing per load —
    // a metadata storm at production cadence. A zero-row load writes no
    // partition directory at all, which counts as 0, not an error.
    val partPath = new org.apache.hadoop.fs.Path(
      s"${catalog.path(detail.target_schema, detail.target_table)}/load_id=$loadId")
    val fs = partPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(partPath)) 0L
    else spark.read.parquet(partPath.toString).count()
  }

  /** Ingest every pending file for one config row; one load_id per file
    * (reference: per-file ledger row + COPY, ingestion_logic.py:124-201).
    * Returns (file, load_id, rows) for loaded files.
    */
  def ingest(detail: Schemas.FileDetail): Seq[(String, Long, Long)] = {
    reconcileOrphans()
    val done = alreadyLoaded(detail.target_table)
    val pending = listFiles(detail.source_path, detail.file_pattern)
      .filterNot(done.contains)
    // allocate the whole id range up front: one ledger max-scan per CONFIG
    // instead of per FILE — the per-file scan grows with ledger size and at
    // production load cadence is a pure metadata storm.
    val baseId = nextLoadId()
    val t0 = new Timestamp(System.currentTimeMillis())
    // claim the ENTIRE allocated range with one batched RUNNING append
    // BEFORE any file loads: a concurrent ingest computing nextLoadId
    // mid-run sees every claimed id, so the collision window is this one
    // append — not "until the last file finishes loading" (which a lazy
    // per-file RUNNING write would leave open)
    if (pending.nonEmpty)
      catalog.append(pending.zipWithIndex.map { case (file, idx) =>
        Schemas.IngestionLog(baseId + idx, file, detail.target_table,
          "RUNNING", 0L, "", t0)
      }.toDF(), ADMIN, "ingestion_logs")
    pending.zipWithIndex.map { case (file, idx) =>
      val loadId = baseId + idx
      // the batched claim stamps every RUNNING row with the CLAIM time;
      // the terminal row carries the file's own attempt start, so
      // per-file timing survives the up-front range claim
      val tf = new Timestamp(System.currentTimeMillis())
      try {
        val rows = loadFile(detail, file, loadId)
        log(Schemas.IngestionLog(loadId, file, detail.target_table,
          "SUCCESS", rows, "", tf))
        (file, loadId, rows)
      } catch {
        case e: Exception =>
          log(Schemas.IngestionLog(loadId, file, detail.target_table,
            "FAILURE", 0L, String.valueOf(e.getMessage), tf))
          (file, loadId, -1L)
      }
    }
  }

  /** S1: run the whole config (the dynamic-ingestion DAG,
    * dynamic_ingestion_dag.py:18-26).
    */
  def ingestAll(config: Seq[Schemas.FileDetail]): Map[String, Seq[(String, Long, Long)]] =
    config.map(d => d.target_table -> ingest(d)).toMap
}
