package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The seven Silver dataset processors (reference
  * `/root/reference/scripts/transformations/` python modules),
  * batch-incremental via
  * the transformation ledger: each run discovers pending load_ids
  * (Bronze ∖ SUCCESS — the reference's set difference, transactions.py:19-23,
  * here a left-anti join), transforms only those batches, and writes
  * idempotently (load_id-partitioned dynamic overwrite).
  */
final class SilverTransforms(catalog: Catalog) {
  import catalog.spark
  import spark.implicits._

  private val ADMIN = "admin"
  private val BRONZE = "bronze"
  private val SILVER = "silver"

  /** J5: pending = bronze distinct load_ids anti-joined against SUCCESS. */
  def pendingLoadIds(dataset: String, reprocess: Boolean = false): Seq[Long] = {
    if (!catalog.exists(BRONZE, dataset)) return Seq.empty
    val bronzeIds = catalog.read(BRONZE, dataset).select($"load_id").distinct()
    val ids =
      if (reprocess || !catalog.exists(ADMIN, "transformation_logs")) bronzeIds
      else {
        val done = catalog.read(ADMIN, "transformation_logs")
          .where($"dataset_name" === dataset && $"status" === "SUCCESS")
          .select($"load_id").distinct()
        bronzeIds.join(done, Seq("load_id"), "left_anti")
      }
    ids.as[Long].collect().toSeq.sorted
  }

  private def nextTransformationId(): Long =
    if (!catalog.exists(ADMIN, "transformation_logs")) 1L
    else catalog.read(ADMIN, "transformation_logs")
      .agg(max($"transformation_id")).as[Option[Long]].head().getOrElse(0L) + 1L

  private def log(dataset: String, loadId: Long, status: String,
      rows: Long, err: String = ""): Unit =
    catalog.append(
      Seq(Schemas.TransformationLog(nextTransformationId(), dataset, loadId,
        status, rows, err, new Timestamp(System.currentTimeMillis()))).toDF(),
      ADMIN, "transformation_logs")

  private def bronzeBatch(dataset: String, loadId: Long): DataFrame =
    catalog.read(BRONZE, dataset).where($"load_id" === loadId)

  /** Run one processor for one batch with ledger bracketing; returns rows
    * written (reference save_idempotent + ledger, utils.py:36-101).
    */
  private def runBatch(dataset: String, target: String, loadId: Long)(
      transform: DataFrame => DataFrame): Long = {
    try {
      val out = transform(bronzeBatch(dataset, loadId))
      catalog.overwriteBatch(out, SILVER, target)
      val rows = catalog.read(SILVER, target).where($"load_id" === loadId).count()
      log(dataset, loadId, "SUCCESS", rows)
      rows
    } catch {
      case e: Exception =>
        log(dataset, loadId, "FAILURE", 0L, String.valueOf(e.getMessage))
        throw e
    }
  }

  // ── transactions (transformations/transactions.py): default missing
  //    type, strip [$,] from amounts, TRY date; plus the daily spend rollup.
  def processTransactions(loadId: Long): Long =
    runBatch("transactions", "transactions", loadId) { df =>
      df
        .withColumn("type",
          when($"type".isNull || trim($"type") === "", "uncategorized")
            .otherwise($"type"))
        .withColumn("amount",
          expr("try_cast(regexp_replace(amount, '[$,]', '') as double)"))
        .withColumn("date", expr("try_cast(date as date)"))
    }

  def buildDailySpend(loadId: Long): Long = {
    val silver = catalog.read(SILVER, "transactions").where($"load_id" === loadId)
    val daily = silver
      .where($"date".isNotNull)
      .groupBy($"date", $"type", $"load_id")
      .agg(sum($"amount").as("total_amount"), count(lit(1)).as("n_transactions"))
    catalog.overwriteBatch(daily, SILVER, "daily_spend")
    daily.count()
  }

  // ── fitbit_heart_rate (fitbit_heart_rate.py): fuzzy column resolution,
  //    minute floor + agg, zone bucketing, hourly re-agg with zone-minute
  //    conditional counts.
  def hrZone(bpm: Column): Column =
    when(bpm.isNull, "Unknown")
      .when(bpm < 60, "Resting")
      .when(bpm < 100, "Normal")
      .when(bpm < 130, "Elevated")
      .otherwise("High")

  /** Reference fuzzy resolution (fitbit_heart_rate.py:51-55): time column
    * is `timestamp` or any column containing "time"; value column matches
    * value|rate|bpm|beats.
    */
  def resolveHrColumns(columns: Seq[String]): (String, String) = {
    val lower = columns.map(c => c -> c.toLowerCase)
    val audit = Set("_ingestion_time", "_source_file", "load_id")
    val cands = lower.filterNot(c => audit.contains(c._2))
    val timeCol = cands.find(_._2 == "timestamp")
      .orElse(cands.find(_._2.contains("time"))).map(_._1)
      .getOrElse(throw new IllegalArgumentException("no time column"))
    val valueCol = cands
      .find(c => c._2.matches(".*(value|rate|bpm|beats).*") && c._1 != timeCol)
      .map(_._1)
      .getOrElse(throw new IllegalArgumentException("no value column"))
    (timeCol, valueCol)
  }

  def processHeartRate(loadId: Long): Long =
    runBatch("fitbit_heart_rate", "heart_rate_minute", loadId) { df =>
      val (timeCol, valueCol) = resolveHrColumns(df.columns.toSeq)
      val m = df
        .select(
          expr(s"try_to_timestamp(`$timeCol`)").as("ts"),
          col(valueCol).cast("double").as("bpm"),
          $"load_id")
        .where($"ts".isNotNull)
        .groupBy(date_trunc("minute", $"ts").as("log_timestamp"), $"load_id")
        .agg(avg($"bpm").as("hr_mean"), min($"bpm").as("hr_min"),
          max($"bpm").as("hr_max"), count(lit(1)).as("n_readings"))
      m.withColumn("hr_zone", hrZone($"hr_mean"))
        .withColumn("date", to_date($"log_timestamp"))
        .withColumn("hour", hour($"log_timestamp"))
    }

  def buildHeartRateHourly(loadId: Long): Long = {
    val m = catalog.read(SILVER, "heart_rate_minute").where($"load_id" === loadId)
    val hourly = m.groupBy($"date", $"hour", $"load_id")
      .agg(
        avg($"hr_mean").as("hr_mean"),
        min($"hr_min").as("hr_min"),
        max($"hr_max").as("hr_max"),
        sum(when($"hr_zone" === "Resting", 1L).otherwise(0L)).as("minutes_in_resting"),
        sum(when($"hr_zone" === "Normal", 1L).otherwise(0L)).as("minutes_in_normal"),
        sum(when($"hr_zone" === "Elevated", 1L).otherwise(0L)).as("minutes_in_elevated"),
        sum(when($"hr_zone" === "High", 1L).otherwise(0L)).as("minutes_in_high"))
    catalog.overwriteBatch(hourly, SILVER, "heart_rate_hourly")
    hourly.count()
  }

  // ── fitbit_steps (fitbit_steps.py): hourly sums densified to all 24
  //    hours per date with 0-fill; load_id back-filled per date (J6).
  def processSteps(loadId: Long): Long =
    runBatch("fitbit_steps", "steps_hourly", loadId) { df =>
      val t = df
        .select(expr("try_to_timestamp(`timestamp`)").as("ts"),
          $"steps", $"load_id")
        .where($"ts".isNotNull)
      val hourly = t
        .groupBy(to_date($"ts").as("date"), hour($"ts").as("hour"))
        .agg(sum($"steps").as("steps"), max($"load_id").as("load_id"))
      val scaffold = t.select(to_date($"ts").as("date")).distinct()
        .select($"date", explode(sequence(lit(0), lit(23))).as("hour"))
      val dateLoad = hourly.groupBy($"date").agg(max($"load_id").as("date_load_id"))
      scaffold
        .join(hourly, Seq("date", "hour"), "left")
        .join(dateLoad, Seq("date"), "left")
        .select($"date", $"hour",
          coalesce($"steps", lit(0L)).as("steps"),
          coalesce($"load_id", $"date_load_id").as("load_id"))
    }

  // ── fitbit_sleep_score (sleep dedup key sleep_log_entry_id,
  //    sp_travel_tax_report.sql:57): latest batch wins.
  def processSleep(loadId: Long): Long =
    runBatch("fitbit_sleep_score", "sleep_scores", loadId) { df =>
      df.select(
        $"sleep_log_entry_id",
        expr("try_to_timestamp(`timestamp`)").as("wake_up_time"),
        to_date(expr("try_to_timestamp(`timestamp`)")).as("wake_up_date"),
        $"overall_score", $"composition_score", $"revitalization_score",
        $"duration_score", $"deep_sleep_in_minutes", $"resting_heart_rate",
        $"restlessness", $"_source_file", $"load_id")
    }

  // ── manual_logs: canonical `country` naming (SURVEY.md §1.4 drift fix),
  //    typed date.
  def processManualLogs(loadId: Long): Long =
    runBatch("manual_logs", "manual_logs", loadId) { df =>
      df.withColumn("log_date", expr("try_cast(date as date)"))
    }

  // ── flight_logs: typed date, HH:MM duration → hours
  //    (sp_travel_tax_report.sql:32-33: HOUR + MINUTE/60).
  def processFlightLogs(loadId: Long): Long =
    runBatch("flight_logs", "flight_logs", loadId) { df =>
      df
        .withColumn("flight_date", expr("try_cast(date as date)"))
        .withColumn("duration_hours",
          expr("try_cast(split_part(duration, ':', 1) as double)") +
            expr("try_cast(split_part(duration, ':', 2) as double)") / 60.0)
    }

  // ── google_timeline: VARIANT flatten (TimelineFlatten).
  def processTimeline(loadId: Long): Long =
    runBatch("google_timeline", "timeline_segments", loadId)(TimelineFlatten.flatten)

  /** Run every processor for all pending batches (the transformation DAG,
    * transformation_logic.py:12-56). `only` mirrors the DAG's
    * `transformation` run-parameter (restrict to one dataset,
    * transformation_logic.py:30-38). Returns dataset → rows per batch.
    */
  def runAll(reprocess: Boolean = false,
      only: Option[String] = None): Map[String, Seq[(Long, Long)]] = {
    def run(ds: String, f: Long => Long): (String, Seq[(Long, Long)]) =
      if (only.exists(_ != ds)) ds -> Seq.empty
      else ds -> pendingLoadIds(ds, reprocess).map { id =>
        id -> (try f(id) catch { case _: Exception => -1L })
      }
    Map(
      run("transactions", id => {
        val n = processTransactions(id); buildDailySpend(id); n
      }),
      run("fitbit_heart_rate", id => {
        val n = processHeartRate(id); buildHeartRateHourly(id); n
      }),
      run("fitbit_steps", processSteps),
      run("fitbit_sleep_score", processSleep),
      run("manual_logs", processManualLogs),
      run("flight_logs", processFlightLogs),
      run("google_timeline", processTimeline))
  }
}
