package graft.pipeline

import org.apache.spark.sql.types._

/** Canonical, explicit schemas for every dataset the reference pipeline
  * handles. The reference infers Bronze schemas from DDL introspection and
  * Silver schemas from pandas dtypes (`/root/reference/scripts/
  * ingestion_logic.py:39-45`, `transformations/utils.py:4-10`); here the
  * registry is explicit so CSV reads are schema'd up front and Silver types
  * are canonical (SURVEY.md §1.4 — including naming the itinerary column
  * `country` once, resolving the reference's COUNTY/COUNTRY drift).
  */
object Schemas {

  /** Audit columns appended to every Bronze row
    * (`ingestion_logic.py:163-171`). */
  val auditFields: Seq[StructField] = Seq(
    StructField("_ingestion_time", TimestampType),
    StructField("_source_file", StringType),
    StructField("load_id", LongType))

  // ── Bronze (landed raw; data columns all-string where the source is CSV
  //    text, mirroring reset_schemas.sql's tolerant VARCHAR landing zone)

  val transactions: StructType = StructType(Seq(
    StructField("country", StringType),
    StructField("date", StringType),
    StructField("name", StringType),
    StructField("type", StringType),
    StructField("amount", StringType),
    StructField("comments", StringType)))

  val manualLogs: StructType = StructType(Seq(
    StructField("day", IntegerType),
    StructField("date", StringType),
    StructField("flag", DoubleType),
    StructField("country", StringType),
    StructField("city", StringType),
    StructField("description", StringType),
    StructField("comments", StringType),
    StructField("food", StringType),
    StructField("travel", StringType),
    StructField("hotel", StringType)))

  val flightLogs: StructType = StructType(Seq(
    "date", "flight_number", "from", "to", "dep_time", "arr_time",
    "duration", "airline", "aircraft", "registration", "seat_number",
    "seat_type", "flight_class", "flight_reason", "note", "dep_id",
    "arr_id", "airline_id", "aircraft_id").map(StructField(_, StringType)))

  val fitbitHeartRate: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("beats_per_minute", DoubleType),
    StructField("data_source", StringType)))

  val fitbitSteps: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("steps", LongType),
    StructField("data_source", StringType)))

  val fitbitSleepScore: StructType = StructType(Seq(
    StructField("sleep_log_entry_id", LongType),
    StructField("timestamp", StringType),
    StructField("overall_score", LongType),
    StructField("composition_score", DoubleType),
    StructField("revitalization_score", LongType),
    StructField("duration_score", DoubleType),
    StructField("deep_sleep_in_minutes", LongType),
    StructField("resting_heart_rate", LongType),
    StructField("restlessness", DoubleType)))

  /** Google Timeline documents (reset_schemas.sql:127-133, 345-427) have
    * shape variance a static StructType cannot express (placeLocation is an
    * object OR a bare string; start/startLocation alternates; probability
    * fallbacks) — exactly why the reference lands them in a VARIANT column.
    * We mirror that with Spark 4 VariantType: see
    * [[graft.pipeline.TimelineFlatten]] (parse_json + variant_get +
    * coalesce across candidate paths).
    *
    * Silver output schema of the flatten (canonical, typed):
    */
  val timelineSegments: StructType = StructType(Seq(
    StructField("segment_type", StringType), // VISIT | ACTIVITY
    StructField("start_time", TimestampType),
    StructField("end_time", TimestampType),
    StructField("place_id", StringType),
    StructField("visit_latitude", DoubleType),
    StructField("visit_longitude", DoubleType),
    StructField("activity_type", StringType),
    StructField("start_latitude", DoubleType),
    StructField("start_longitude", DoubleType),
    StructField("end_latitude", DoubleType),
    StructField("end_longitude", DoubleType),
    StructField("distance_meters", DoubleType),
    StructField("confidence", DoubleType)))

  // ── Admin (config + ledgers; sql/admin_*.sql)

  case class FileDetail(
      file_id: Long,
      container: String,
      stage: String,
      source_path: String,
      file_pattern: String,
      target_schema: String,
      target_table: String,
      format: String)

  case class IngestionLog(
      load_id: Long,
      file_name: String,
      target_table: String,
      status: String, // RUNNING | SUCCESS | FAILURE | ABANDONED
      rows_loaded: Long,
      error_message: String,
      started_at: java.sql.Timestamp)

  case class TransformationLog(
      transformation_id: Long,
      dataset_name: String,
      load_id: Long,
      status: String,
      rows_processed: Long,
      error_message: String,
      started_at: java.sql.Timestamp)

  /** Bronze schema registry keyed by dataset name. */
  val bronze: Map[String, StructType] = Map(
    "transactions" -> transactions,
    "manual_logs" -> manualLogs,
    "flight_logs" -> flightLogs,
    "fitbit_heart_rate" -> fitbitHeartRate,
    "fitbit_steps" -> fitbitSteps,
    "fitbit_sleep_score" -> fitbitSleepScore)
}
