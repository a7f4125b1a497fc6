package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Google Timeline flatten (reference Snowpark SP PROCESS_GOOGLE_TIMELINE,
  * `/root/reference/sql/reset_schemas.sql:298-459`): one VARIANT document →
  * N typed segment rows.
  *
  * The reference's own "FIXED LOGIC" comment (reset_schemas.sql:338-354)
  * pushes the flatten into the engine to avoid materializing 16 MB
  * documents; here that is the default execution model — parse_json +
  * lateral explode run distributed, and nested-schema pruning keeps unread
  * JSON branches unread.
  *
  * Shape variance handled via variant paths + coalesce
  * (reset_schemas.sql:396-427):
  * - placeLocation object `{latLng: "…"}` OR bare string
  * - activity start/end alternately named startLocation/endLocation
  * - activity probability falling back to topCandidate.probability
  * - segments with neither visit nor activity are dropped
  */
object TimelineFlatten {

  /** Parse "35.6586° , 139.7454°" → (lat, lng); null on malformed
    * (reference UDF parse_lat_long_string, reset_schemas.sql:309-319).
    * Pure codegen expressions — no UDF.
    */
  private def numOrNull(c: Column): Column = {
    // strip everything but numeric characters (drops the degree sign in any
    // encoding), then regex-guard the cast: ANSI-safe null on malformed input
    val t = regexp_replace(c, "[^0-9.+-]", "")
    when(t.rlike("^[+-]?[0-9]+(\\.[0-9]+)?$"), t.cast("double"))
  }
  def latOf(c: Column): Column = numOrNull(split_part(c, lit(","), lit(1)))
  def lngOf(c: Column): Column = numOrNull(split_part(c, lit(","), lit(2)))

  /** Flatten Bronze rows (`raw_data` string + audit cols) to the
    * [[Schemas.timelineSegments]] Silver schema (+ audit cols).
    */
  def flatten(bronze: DataFrame): DataFrame = {
    val spark = bronze.sparkSession
    import spark.implicits._

    // Bronze lands raw_data as a true VariantType column (Ingestion's JSON
    // case); a pre-variant Bronze table (raw text) still flattens — parse
    // here only when the column isn't already variant.
    val rawIsVariant = bronze.schema("raw_data").dataType ==
      org.apache.spark.sql.types.VariantType
    val doc = if (rawIsVariant) $"raw_data" else parse_json($"raw_data")
    val segs = bronze
      .withColumn("_doc", doc)
      .select($"load_id", $"_source_file",
        explode(expr(
          "cast(variant_get(_doc, '$.semanticSegments') as array<variant>)"))
          .as("seg"))

    def vs(path: String): Column =
      expr(s"try_variant_get(seg, '$$.$path', 'string')")
    def vd(path: String): Column =
      expr(s"try_variant_get(seg, '$$.$path', 'double')")

    val visitLoc = coalesce(
      vs("visit.topCandidate.placeLocation.latLng"), // object variant
      vs("visit.topCandidate.placeLocation")) // bare-string variant
    val startLoc = coalesce(
      vs("activity.start.latLng"), vs("activity.startLocation.latLng"))
    val endLoc = coalesce(
      vs("activity.end.latLng"), vs("activity.endLocation.latLng"))
    val isVisit = expr("variant_get(seg, '$.visit')").isNotNull
    val isActivity = expr("variant_get(seg, '$.activity')").isNotNull

    segs
      .withColumn("segment_type",
        when(isVisit, "VISIT").when(isActivity, "ACTIVITY"))
      .where($"segment_type".isNotNull) // neither → dropped
      .select(
        $"segment_type",
        expr("try_to_timestamp(try_variant_get(seg, '$.startTime', 'string'))")
          .as("start_time"),
        expr("try_to_timestamp(try_variant_get(seg, '$.endTime', 'string'))")
          .as("end_time"),
        vs("visit.topCandidate.placeId").as("place_id"),
        when($"segment_type" === "VISIT", latOf(visitLoc)).as("visit_latitude"),
        when($"segment_type" === "VISIT", lngOf(visitLoc)).as("visit_longitude"),
        vs("activity.topCandidate.type").as("activity_type"),
        when($"segment_type" === "ACTIVITY", latOf(startLoc)).as("start_latitude"),
        when($"segment_type" === "ACTIVITY", lngOf(startLoc)).as("start_longitude"),
        when($"segment_type" === "ACTIVITY", latOf(endLoc)).as("end_latitude"),
        when($"segment_type" === "ACTIVITY", lngOf(endLoc)).as("end_longitude"),
        vd("activity.distanceMeters").as("distance_meters"),
        when($"segment_type" === "VISIT", vd("visit.probability"))
          .otherwise(coalesce(vd("activity.probability"),
            vd("activity.topCandidate.probability"))).as("confidence"),
        $"_source_file", $"load_id")
  }
}
