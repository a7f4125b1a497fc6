package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold-layer report builders (reference SQL stored procedures + the two
  * procs that are called but missing from the snapshot, SURVEY.md §2.10).
  * Each is a pure DataFrame function over Silver inputs; materialization is
  * the caller's `catalog.overwrite` (CTAS semantics, S12/S13).
  */
object Gold {

  /** SP_FULL_TRAVEL_COST (`/root/reference/sql/sp_full_travel_costs.sql`):
    * latest-file-batch spending (W1) + latest-per-date logs (W2) →
    * category pivot (A5) + ordered comment listagg (A6) → left join (J1) →
    * running total / guarded daily average (W3/W4), date-ordered (W5).
    */
  def fullTravelCost(spending: DataFrame, manualLogs: DataFrame): DataFrame = {
    val spark = spending.sparkSession
    import spark.implicits._

    // LOGIC 1 (sp_full_travel_costs.sql:14-17): all rows of newest load per file
    val latestSpend = spending
      .withColumn("max_load",
        max($"load_id").over(Window.partitionBy($"_source_file")))
      .where($"load_id" === $"max_load")
    // LOGIC 2 (:21-24): one row per date, latest load wins
    val latestLogs = manualLogs
      .withColumn("rn", row_number().over(
        Window.partitionBy($"date").orderBy($"load_id".desc)))
      .where($"rn" === 1)

    // 3 (:27-44): pivot + LISTAGG (Snowflake LISTAGG skips nulls → filter)
    def cat(name: String) =
      sum(when(upper(trim($"type")) === name, $"amount").otherwise(0.0))
    val pivot = latestSpend
      .withColumn("join_date", expr("try_cast(date as date)"))
      .where($"join_date".isNotNull)
      .groupBy($"join_date")
      .agg(
        cat("HOTEL").as("hotel_cost"), cat("FOOD").as("food_cost"),
        cat("ACTIVITY").as("activity_cost"), cat("TRAVEL").as("travel_cost"),
        cat("MISC").as("misc_cost"),
        array_join(array_sort(collect_list($"comments")), "; ").as("cost_comment"))

    // 4 (:48-77): left join, coalesce to 0, daily total
    val joined = latestLogs
      .withColumn("order_date", expr("try_cast(date as date)"))
      .join(pivot, $"order_date" === $"join_date", "left")
      .select(
        $"day", $"date", $"order_date", $"city", $"country", $"description",
        $"comments".as("log_comment"), $"food".as("food_desc"),
        $"travel".as("travel_desc"), $"hotel".as("hotel_desc"),
        coalesce($"hotel_cost", lit(0.0)).as("hotel"),
        coalesce($"food_cost", lit(0.0)).as("food"),
        coalesce($"activity_cost", lit(0.0)).as("activity"),
        coalesce($"travel_cost", lit(0.0)).as("travel"),
        coalesce($"misc_cost", lit(0.0)).as("misc"),
        $"cost_comment")
      .withColumn("total",
        $"hotel" + $"food" + $"activity" + $"travel" + $"misc")

    // 5 (:81-110): running windows over the (single-digit-MB) report rows
    val w = Window.orderBy($"order_date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("running_total", sum($"total").over(w))
      .withColumn("daily_avg",
        when($"day" > 0, $"running_total" / $"day").otherwise(0.0))
      .select($"day", $"date", $"city", $"country", $"description",
        $"hotel", $"food", $"activity", $"travel", $"misc", $"total",
        $"running_total", $"daily_avg", $"cost_comment",
        $"log_comment".as("comments"), $"food_desc", $"travel_desc",
        $"hotel_desc", $"order_date")
      .orderBy($"order_date")
  }

  /** SP_TRAVEL_TAX_REPORT (`sp_travel_tax_report.sql:27-118`): deduped
    * flight/sleep/HR rollups, full-outer date-shifted join (J2), left HR
    * join (J3), recovery-status CASE (F6).
    */
  def travelTaxReport(flightLogs: DataFrame, sleepScores: DataFrame,
      hrHourly: DataFrame): DataFrame = {
    val spark = flightLogs.sparkSession
    import spark.implicits._

    // STEP A (:29-37)
    val cleanFlights = flightLogs
      .withColumn("rn", row_number().over(
        Window.partitionBy($"date", $"flight_number").orderBy($"load_id".desc)))
      .where($"rn" === 1)
      .select($"flight_date", $"to".as("arrival_airport"), $"duration_hours")
    // STEP B (:40-47)
    val dailyFlights = cleanFlights
      .groupBy($"flight_date")
      .agg(
        sum($"duration_hours").as("total_flight_hours"),
        count(lit(1)).as("flight_count"),
        array_join(array_sort(array_distinct(
          collect_list($"arrival_airport"))), ", ").as("destinations"))
    // STEP C (:51-59)
    val cleanSleep = sleepScores
      .withColumn("rn", row_number().over(
        Window.partitionBy($"sleep_log_entry_id").orderBy($"load_id".desc)))
      .where($"rn" === 1)
      .select($"wake_up_date", $"overall_score", $"deep_sleep_in_minutes",
        $"resting_heart_rate")
    // STEP D (:62-81)
    val hrDedup = hrHourly
      .withColumn("rn", row_number().over(
        Window.partitionBy($"date", $"hour").orderBy($"load_id".desc)))
      .where($"rn" === 1)
    val dailyHr = hrDedup
      .groupBy($"date".as("hr_date"))
      .agg(min($"hr_min").as("daily_min_hr"), max($"hr_max").as("daily_max_hr"),
        avg($"hr_mean").as("daily_avg_hr"))

    dailyFlights.as("f")
      .join(cleanSleep.as("s"),
        $"f.flight_date" === date_sub($"s.wake_up_date", 1), "full_outer")
      .join(dailyHr.as("h"), $"s.wake_up_date" === $"h.hr_date", "left")
      .select(
        coalesce($"f.flight_date", date_sub($"s.wake_up_date", 1))
          .as("report_date"),
        coalesce($"f.total_flight_hours" > 0, lit(false)).as("is_travel_day"),
        coalesce($"f.total_flight_hours", lit(0.0)).as("total_flight_hours"),
        coalesce($"f.flight_count", lit(0L)).as("flight_count"),
        coalesce($"f.destinations", lit("No Travel")).as("destination_city"),
        $"s.overall_score".as("next_day_sleep_score"),
        $"s.deep_sleep_in_minutes".as("next_day_deep_sleep_min"),
        $"s.resting_heart_rate".as("next_day_resting_hr"),
        ($"h.daily_max_hr" - $"h.daily_min_hr").as("next_day_hr_variability"),
        when($"f.total_flight_hours" > 4 && $"s.overall_score" < 70, "High Strain")
          .when($"s.overall_score" > 85, "Well Recovered")
          .otherwise("Normal").as("recovery_status"))
  }

  /** SP_TRANSPORT_MODE_ANALYSIS reconstruction (SURVEY.md §2.10; dashboard
    * contract `travel_and_movement_map.py:220-224`): ACTIVITY segments by
    * mode — total distance km, duration hours, counts, confidence.
    */
  def transportModeAnalysis(timelineSegments: DataFrame): DataFrame = {
    val spark = timelineSegments.sparkSession
    import spark.implicits._
    timelineSegments
      .where($"segment_type" === "ACTIVITY" && $"activity_type".isNotNull)
      .groupBy($"activity_type")
      .agg(
        (sum($"distance_meters") / 1000.0).as("total_distance_km"),
        (sum(unix_timestamp($"end_time") - unix_timestamp($"start_time")) / 3600.0)
          .as("total_duration_hours"),
        count(lit(1)).as("segment_count"),
        avg($"confidence").as("avg_confidence"))
      .orderBy($"total_distance_km".desc)
  }

  /** SP_GET_DAILY_TRAVEL_SUMMARY reconstruction (§2.10; field contract from
    * `streamlit/daily_travel_summary.py:32-102`): one nested JSON document
    * for a date — scalar metrics + per-section row arrays.
    */
  def dailySummary(date: String, dailySpend: DataFrame, stepsHourly: DataFrame,
      sleepScores: DataFrame, manualLogs: DataFrame, flightLogs: DataFrame,
      timelineSegments: DataFrame): String = {
    val spark = dailySpend.sparkSession
    import spark.implicits._
    val d = to_date(lit(date))

    val spent = dailySpend.where($"date" === d)
      .agg(coalesce(sum($"total_amount"), lit(0.0))).as[Double].head()
    val steps = stepsHourly.where($"date" === d)
      .agg(coalesce(sum($"steps"), lit(0L))).as[Long].head()
    val spendRows = dailySpend.where($"date" === d)
      .select($"type", $"total_amount").orderBy($"type").toJSON.collect()
    val sleepRows = sleepScores.where($"wake_up_date" === d)
      .select($"overall_score", $"deep_sleep_in_minutes", $"resting_heart_rate")
      .orderBy($"overall_score").toJSON.collect()
    val logRows = manualLogs.where($"log_date" === d)
      .select($"country", $"city", $"description", $"comments")
      .toJSON.collect()
    val flightRows = flightLogs.where($"flight_date" === d)
      .select($"flight_number", $"from", $"to", $"duration_hours")
      .orderBy($"flight_number").toJSON.collect()
    val segRows = timelineSegments
      .where(to_date($"start_time") === d)
      .select($"start_time", $"end_time", $"segment_type", $"activity_type",
        $"distance_meters",
        $"visit_latitude".as("visit_lat"), $"visit_longitude".as("visit_lon"),
        $"start_latitude".as("start_lat"), $"start_longitude".as("start_lon"),
        $"end_latitude".as("end_lat"), $"end_longitude".as("end_lon"))
      .orderBy($"start_time").toJSON.collect()

    s"""{"DATE":"$date","TOTAL_SPENT":$spent,"TOTAL_STEPS":$steps,
       |"SPENDING_ITEMS":${spendRows.mkString("[", ",", "]")},
       |"SLEEP_DATA":${sleepRows.mkString("[", ",", "]")},
       |"MANUAL_LOGS":${logRows.mkString("[", ",", "]")},
       |"FLIGHTS":${flightRows.mkString("[", ",", "]")},
       |"TIMELINE_SEGMENTS":${segRows.mkString("[", ",", "]")}}""".stripMargin
  }
}
