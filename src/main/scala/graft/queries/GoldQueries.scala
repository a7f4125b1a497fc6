package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Gold-layer composite pipelines: the reference's two SQL stored procedures
  * (`/root/reference/sql/sp_full_travel_costs.sql`,
  * `sp_travel_tax_report.sql`) and the two declared-but-missing procs
  * (SURVEY.md §2.10), re-shaped onto the fixture tables. These chain
  * dedup-window → pivot → listagg → join → running-total exactly like the
  * originals' CTE pipelines.
  */
object GoldQueries {

  def defs: Seq[QueryDef] = Seq(

    // ── SP_FULL_TRAVEL_COST analog (sp_full_travel_costs.sql:8-110):
    //    W2 dedup → A5 sum-case pivot → A6 listagg → J1 left join →
    //    W3 running total → W4 guarded running average → W5 order.
    //    All CTEs pre-aggregate to ~1 row/day before joining/windowing, so
    //    the unpartitioned running-total window sees only |dates| rows.
    QueryDef(
      "q21_cost_report",
      (s, dir) => {
        import s.implicits._
        val o = Tables.orders(s, dir)
        // itinerary: latest (highest-key) order per day — W2 dedup
        val wDay = Window.partitionBy($"order_date")
          .orderBy($"o_totalprice".desc, $"o_orderkey".desc)
        val itinerary = o
          .select(to_date($"o_orderdate").as("order_date"), $"o_orderkey",
            $"o_totalprice")
          .withColumn("rn", row_number().over(wDay))
          .where($"rn" === 1)
          .select($"order_date", $"o_orderkey".as("top_orderkey"))
        // daily spend pivot by priority class + ordered status listagg
        def cat(p: String) =
          sum(when($"o_orderpriority" === p, $"o_totalprice".cast(DecimalType(18, 4)))
            .otherwise(lit(0).cast(DecimalType(18, 4))))
        val spend = o
          .groupBy(to_date($"o_orderdate").as("order_date"))
          .agg(
            cat("1-URGENT").as("urgent_d"),
            cat("2-HIGH").as("high_d"),
            cat("3-MEDIUM").as("medium_d"),
            sum($"o_totalprice".cast(DecimalType(18, 4))).as("day_total_d"),
            array_join(array_sort(array_distinct(collect_list($"o_orderstatus"))), "; ")
              .as("statuses"))
        val joined = itinerary.join(spend, Seq("order_date"), "left")
        val wRun = Window.orderBy($"order_date")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined
          .withColumn("rt", sum($"day_total_d").over(wRun))
          .withColumn("day_no", row_number().over(Window.orderBy($"order_date")))
          .select(
            $"order_date", $"top_orderkey", $"statuses",
            $"urgent_d".cast("double").as("urgent_total"),
            $"high_d".cast("double").as("high_total"),
            $"medium_d".cast("double").as("medium_total"),
            $"day_total_d".cast("double").as("day_total"),
            $"rt".cast("double").as("running_total"),
            when($"day_no" > 0, $"rt".cast("double") / $"day_no")
              .otherwise(0.0).as("running_avg"))
          .orderBy($"order_date")
      },
      Some("""WITH itinerary AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_date,
        |         o_orderkey AS top_orderkey
        |  FROM orders
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY CAST(o_orderdate AS DATE)
        |    ORDER BY o_totalprice DESC, o_orderkey DESC) = 1),
        |spend AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_date,
        |    SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |        THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS urgent_d,
        |    SUM(CASE WHEN o_orderpriority = '2-HIGH'
        |        THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS high_d,
        |    SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
        |        THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS medium_d,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS day_total_d,
        |    string_agg(DISTINCT o_orderstatus, '; ' ORDER BY o_orderstatus) AS statuses
        |  FROM orders GROUP BY 1)
        |SELECT i.order_date, i.top_orderkey, s.statuses,
        |  CAST(s.urgent_d AS DOUBLE) AS urgent_total,
        |  CAST(s.high_d AS DOUBLE) AS high_total,
        |  CAST(s.medium_d AS DOUBLE) AS medium_total,
        |  CAST(s.day_total_d AS DOUBLE) AS day_total,
        |  CAST(SUM(s.day_total_d) OVER w AS DOUBLE) AS running_total,
        |  CASE WHEN ROW_NUMBER() OVER (ORDER BY i.order_date) > 0
        |       THEN CAST(SUM(s.day_total_d) OVER w AS DOUBLE)
        |            / ROW_NUMBER() OVER (ORDER BY i.order_date)
        |       ELSE 0.0 END AS running_avg
        |FROM itinerary i LEFT JOIN spend s ON i.order_date = s.order_date
        |WINDOW w AS (ORDER BY i.order_date
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY i.order_date""".stripMargin)),

    // ── SP_TRAVEL_TAX_REPORT analog (sp_travel_tax_report.sql:8-118):
    //    three deduped daily rollups, A7 listagg-distinct, J2 full-outer
    //    date-shifted join, J3 left join, F5 coalesce defaults, F6 CASE
    //    status chain. "Flights"=purchases, "sleep"=signups, "HR"=errors.
    QueryDef(
      "q22_tax_report",
      (s, dir) => {
        import s.implicits._
        val e = Tables.events(s, dir)
        val flights = e.where($"event_type" === "purchase")
          .groupBy(to_date($"ts").as("flight_date"))
          .agg(
            dsum($"value").as("flight_hours"),
            count(lit(1)).as("n_flights"),
            array_join(array_sort(array_distinct(collect_list($"user_id".cast("string")))), ", ")
              .as("travellers"))
        val sleep = e.where($"event_type" === "signup")
          .groupBy(to_date($"ts").as("wake_date"))
          .agg(davg($"value").as("sleep_score"), count(lit(1)).as("n_sleeps"))
        val hr = e.where($"event_type" === "error")
          .groupBy(to_date($"ts").as("hr_date"))
          .agg(davg($"value").as("avg_hr"))
        flights
          .join(sleep, $"flight_date" === date_sub($"wake_date", 1), "full_outer")
          .join(hr, $"wake_date" === $"hr_date", "left")
          .select(
            coalesce($"flight_date", date_sub($"wake_date", 1)).as("day"),
            coalesce($"flight_hours", lit(0.0)).as("flight_hours"),
            coalesce($"n_flights", lit(0L)).as("n_flights"),
            coalesce($"travellers", lit("No Travel")).as("travellers"),
            ($"flight_hours".isNotNull).as("is_travel_day"),
            coalesce($"sleep_score", lit(0.0)).as("sleep_score"),
            coalesce($"avg_hr", lit(0.0)).as("avg_hr"),
            when($"flight_hours" > 400.0 && $"sleep_score" < 100.0, "High Strain")
              .when($"sleep_score" > 120.0, "Well Recovered")
              .otherwise("Normal").as("recovery_status"))
      },
      Some(s"""WITH flights AS (
        |  SELECT CAST(ts AS DATE) AS flight_date,
        |    ${dsumSql("value")} AS flight_hours, COUNT(*) AS n_flights,
        |    string_agg(DISTINCT CAST(user_id AS VARCHAR), ', '
        |      ORDER BY CAST(user_id AS VARCHAR)) AS travellers
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |sleep AS (
        |  SELECT CAST(ts AS DATE) AS wake_date,
        |    ${davgSql("value")} AS sleep_score, COUNT(*) AS n_sleeps
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |hr AS (
        |  SELECT CAST(ts AS DATE) AS hr_date, ${davgSql("value")} AS avg_hr
        |  FROM events WHERE event_type = 'error' GROUP BY 1)
        |SELECT COALESCE(f.flight_date, s.wake_date - 1) AS day,
        |  COALESCE(f.flight_hours, 0.0) AS flight_hours,
        |  COALESCE(f.n_flights, 0) AS n_flights,
        |  COALESCE(f.travellers, 'No Travel') AS travellers,
        |  f.flight_hours IS NOT NULL AS is_travel_day,
        |  COALESCE(s.sleep_score, 0.0) AS sleep_score,
        |  COALESCE(h.avg_hr, 0.0) AS avg_hr,
        |  CASE WHEN f.flight_hours > 400.0 AND s.sleep_score < 100.0 THEN 'High Strain'
        |       WHEN s.sleep_score > 120.0 THEN 'Well Recovered'
        |       ELSE 'Normal' END AS recovery_status
        |FROM flights f
        |FULL OUTER JOIN sleep s ON f.flight_date = s.wake_date - 1
        |LEFT JOIN hr h ON s.wake_date = h.hr_date""".stripMargin)),

    // ── SP_TRANSPORT_MODE_ANALYSIS reconstruction (SURVEY.md §2.10;
    //    dashboard contract travel_and_movement_map.py:220-224): per-mode
    //    distance/duration rollup + share of total via a single-row broadcast.
    QueryDef(
      "q23_transport_mode",
      (s, dir) => {
        import s.implicits._
        val e = Tables.events(s, dir)
        val byMode = e.groupBy($"event_type")
          .agg(
            dsum($"value").as("total_value"),
            count(lit(1)).as("n_events"),
            davg($"value").as("avg_value"))
        val total = byMode.agg(
          sum($"total_value".cast(DecimalType(18, 4))).as("grand_d"))
        byMode.crossJoin(broadcast(total))
          .select($"event_type", $"total_value", $"n_events", $"avg_value",
            ($"total_value" / $"grand_d".cast("double")).as("share"))
      },
      Some(s"""WITH by_mode AS (
        |  SELECT event_type, ${dsumSql("value")} AS total_value,
        |    COUNT(*) AS n_events, ${davgSql("value")} AS avg_value
        |  FROM events GROUP BY 1),
        |total AS (SELECT SUM(CAST(total_value AS DECIMAL(18,4))) AS grand_d
        |          FROM by_mode)
        |SELECT event_type, total_value, n_events, avg_value,
        |  total_value / CAST(grand_d AS DOUBLE) AS share
        |FROM by_mode CROSS JOIN total""".stripMargin)),

    // ── SP_GET_DAILY_TRAVEL_SUMMARY reconstruction (SURVEY.md §2.10, A13;
    //    daily_travel_summary.py:23-87): one date's scalars + per-section
    //    rollups, row-shaped (section/key/metrics) instead of one JSON blob —
    //    same content, comparable schema. JSON assembly lives in
    //    graft.gold.DailySummary.
    QueryDef(
      "q24_daily_summary",
      (s, dir) => {
        import s.implicits._
        val day = Tables.events(s, dir).where(to_date($"ts") === "2024-01-15")
        val sections = day.groupBy($"event_type".as("section"))
          .agg(dsum($"value").as("total_value"), count(lit(1)).as("n_rows"),
            max($"value").as("max_value"))
        val scalars = day.agg(
          dsum($"value").as("total_value"), count(lit(1)).as("n_rows"),
          max($"value").as("max_value"))
          .select(lit("ALL").as("section"), $"total_value", $"n_rows",
            $"max_value")
        sections.unionByName(scalars)
      },
      Some(s"""WITH day AS (SELECT * FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15')
        |SELECT event_type AS section, ${dsumSql("value")} AS total_value,
        |  COUNT(*) AS n_rows, MAX(value) AS max_value
        |FROM day GROUP BY 1
        |UNION ALL
        |SELECT 'ALL' AS section, ${dsumSql("value")} AS total_value,
        |  COUNT(*) AS n_rows, MAX(value) AS max_value
        |FROM day""".stripMargin))
  )
}
