package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity operators, part 2 (SURVEY.md §2.2-2.7 continued). */
object RefQueries2 {

  def defs: Seq[QueryDef] = Seq(

    // ── J2 full-outer date-shifted join (sql/sp_travel_tax_report.sql:110-112:
    //    flights vs next-morning sleep). Here: purchase days vs next-day errors.
    //    Both sides pre-aggregated to one row/day before the join → tiny.
    QueryDef(
      "q11_full_outer_date_shift",
      (s, dir) => {
        import s.implicits._
        val e = Tables.events(s, dir)
        val p = e.where($"event_type" === "purchase")
          .groupBy(to_date($"ts").as("p_date"))
          .agg(dsum($"value").as("purchase_total"))
        val err = e.where($"event_type" === "error")
          .groupBy(to_date($"ts").as("e_date"))
          .agg(count(lit(1)).as("n_errors"))
        p.join(err, $"p_date" === date_sub($"e_date", 1), "full_outer")
          .select(
            coalesce($"p_date", date_sub($"e_date", 1)).as("day"),
            coalesce($"purchase_total", lit(0.0)).as("purchase_total"),
            coalesce($"n_errors", lit(0L)).as("next_day_errors"))
      },
      Some(s"""WITH p AS (
        |  SELECT CAST(ts AS DATE) AS p_date, ${dsumSql("value")} AS purchase_total
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |e AS (
        |  SELECT CAST(ts AS DATE) AS e_date, COUNT(*) AS n_errors
        |  FROM events WHERE event_type = 'error' GROUP BY 1)
        |SELECT COALESCE(p_date, e_date - 1) AS day,
        |  COALESCE(purchase_total, 0.0) AS purchase_total,
        |  COALESCE(n_errors, 0) AS next_day_errors
        |FROM p FULL OUTER JOIN e ON p_date = e_date - 1""".stripMargin)),

    // ── J5 left-anti ledger difference (transformations/transactions.py:19-23).
    QueryDef(
      "q12_left_anti",
      (s, dir) => {
        import s.implicits._
        Tables.customer(s, dir)
          .join(
            Tables.orders(s, dir).where($"o_orderpriority" === "1-URGENT"),
            $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name", $"c_acctbal")
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin)),

    // ── F7 zone bucketing + A4 conditional counts
    //    (transformations/fitbit_heart_rate.py:4-9,76-78): threshold chain as
    //    codegen'd when(); zone-minute counts as sum(when) — one pass, no UDF.
    QueryDef(
      "q13_zone_counts",
      (s, dir) => {
        import s.implicits._
        val zone = when($"value".isNull, "Unknown")
          .when($"value" < 60, "Resting")
          .when($"value" < 100, "Normal")
          .when($"value" < 130, "Elevated")
          .otherwise("High")
        Tables.events(s, dir)
          .select($"event_type", zone.as("zone"))
          .groupBy($"event_type")
          .agg(
            sum(when($"zone" === "Resting", 1L).otherwise(0L)).as("n_resting"),
            sum(when($"zone" === "Normal", 1L).otherwise(0L)).as("n_normal"),
            sum(when($"zone" === "Elevated", 1L).otherwise(0L)).as("n_elevated"),
            sum(when($"zone" === "High", 1L).otherwise(0L)).as("n_high"),
            count(lit(1)).as("n_total"))
      },
      Some("""WITH z AS (
        |  SELECT event_type,
        |    CASE WHEN value IS NULL THEN 'Unknown'
        |         WHEN value < 60 THEN 'Resting'
        |         WHEN value < 100 THEN 'Normal'
        |         WHEN value < 130 THEN 'Elevated'
        |         ELSE 'High' END AS zone
        |  FROM events)
        |SELECT event_type,
        |  CAST(SUM(CASE WHEN zone = 'Resting' THEN 1 ELSE 0 END) AS BIGINT) AS n_resting,
        |  CAST(SUM(CASE WHEN zone = 'Normal' THEN 1 ELSE 0 END) AS BIGINT) AS n_normal,
        |  CAST(SUM(CASE WHEN zone = 'Elevated' THEN 1 ELSE 0 END) AS BIGINT) AS n_elevated,
        |  CAST(SUM(CASE WHEN zone = 'High' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  COUNT(*) AS n_total
        |FROM z GROUP BY event_type""".stripMargin)),

    // ── A3 two-level rollup (fitbit_heart_rate.py:59-79): minute aggs →
    //    hourly mean-of-means/min-of-mins/max-of-maxes. The second groupBy
    //    re-shuffles strictly fewer rows (pre-aggregated) — the scale-safe shape.
    QueryDef(
      "q14_two_level_rollup",
      (s, dir) => {
        import s.implicits._
        val minute = Tables.events(s, dir)
          .groupBy($"user_id", date_trunc("minute", $"ts").as("minute_ts"))
          .agg(
            davg($"value").as("v_mean"),
            min($"value").as("v_min"),
            max($"value").as("v_max"),
            count(lit(1)).as("n"))
        minute
          .groupBy($"user_id", date_trunc("hour", $"minute_ts").as("hour_ts"))
          .agg(
            davg($"v_mean", 8).as("hourly_mean"),
            min($"v_min").as("hourly_min"),
            max($"v_max").as("hourly_max"),
            sum($"n").as("n_readings"))
      },
      Some(s"""WITH minute AS (
        |  SELECT user_id, date_trunc('minute', ts) AS minute_ts,
        |    ${davgSql("value")} AS v_mean, MIN(value) AS v_min,
        |    MAX(value) AS v_max, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, date_trunc('hour', minute_ts) AS hour_ts,
        |  ${davgSql("v_mean", 8)} AS hourly_mean,
        |  MIN(v_min) AS hourly_min, MAX(v_max) AS hourly_max,
        |  CAST(SUM(n) AS BIGINT) AS n_readings
        |FROM minute GROUP BY 1, 2""".stripMargin)),

    // ── F2/F3 date part extraction + arithmetic
    //    (sp_travel_tax_report.sql:33,85; fitbit_steps.py:45-46).
    QueryDef(
      "q15_date_extract",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select(
            $"o_orderkey",
            year($"o_orderdate").as("order_year"),
            month($"o_orderdate").as("order_month_num"),
            dayofmonth($"o_orderdate").as("order_day"),
            date_sub(to_date($"o_orderdate"), 1).as("prev_day"),
            datediff(to_date(lit("2002-01-01")), to_date($"o_orderdate"))
              .as("days_to_ref"))
      },
      Some("""SELECT o_orderkey,
        |CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
        |CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month_num,
        |CAST(EXTRACT(day FROM o_orderdate) AS INT) AS order_day,
        |CAST(o_orderdate AS DATE) - 1 AS prev_day,
        |CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_ref
        |FROM orders""".stripMargin)),

    // ── F4/P6 string cleanup: regex strip + numeric cast
    //    (transformations/transactions.py:48-49), UPPER(TRIM()) normalization
    //    (sp_full_travel_costs.sql:32), substring (travel_and_movement_map.py:127).
    QueryDef(
      "q16_string_clean",
      (s, dir) => {
        import s.implicits._
        Tables.customer(s, dir)
          .select(
            $"c_custkey",
            regexp_replace($"c_name", "[^0-9]", "").cast("long").as("name_id"),
            upper(trim($"c_mktsegment")).as("segment_norm"),
            substring($"c_name", 1, 8).as("name_prefix"),
            length($"c_name").as("name_len"))
      },
      Some("""SELECT c_custkey,
        |CAST(regexp_replace(c_name, '[^0-9]', '', 'g') AS BIGINT) AS name_id,
        |UPPER(TRIM(c_mktsegment)) AS segment_norm,
        |substr(c_name, 1, 8) AS name_prefix,
        |CAST(length(c_name) AS INT) AS name_len
        |FROM customer""".stripMargin)),

    // ── A10 distinct projection (transactions.py:14).
    QueryDef(
      "q17_distinct",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select($"o_orderstatus", $"o_orderpriority").distinct()
      },
      Some("SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders")),

    // ── S9 existence / semi-join probe (transformations/utils.py:48-55).
    QueryDef(
      "q18_semi_join",
      (s, dir) => {
        import s.implicits._
        Tables.supplier(s, dir)
          .join(
            Tables.lineitem(s, dir).where($"l_quantity" > 45.0),
            $"s_suppkey" === $"l_suppkey", "left_semi")
          .select($"s_suppkey", $"s_name", $"s_acctbal")
      },
      Some("""SELECT s_suppkey, s_name, s_acctbal FROM supplier s
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45.0)""".stripMargin)),

    // ── W1 latest-batch-per-partition filter (sp_full_travel_costs.sql:14-17):
    //    keeps ALL rows of each key's max group. Implemented as partial-agg
    //    max + join-back instead of max().over(partition): the agg collapses
    //    map-side to one row per key, and when the per-key maxes measure
    //    small at runtime AQE broadcasts them so the fact rows are filtered
    //    IN PLACE — no fact shuffle, no sort, the shape that survives 100 TB
    //    (WindowExec would shuffle and sort every fact row by key). No hard
    //    broadcast() hint: the maxes side is proportional to distinct keys,
    //    and a hint never falls back by size — size-based planning decides.
    QueryDef(
      "q19_latest_batch",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
        val maxes = li.groupBy($"l_suppkey")
          .agg(max($"l_shipdate").as("max_ship"))
        li.join(maxes, Seq("l_suppkey"))
          .where($"l_shipdate" === $"max_ship")
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_shipdate",
            $"l_quantity")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, l_quantity
        |FROM lineitem
        |QUALIFY l_shipdate = MAX(l_shipdate) OVER (PARTITION BY l_suppkey)""".stripMargin)),

    // ── Union + distinct (set semantics; composes S-layer appends with A10).
    QueryDef(
      "q20_union_distinct",
      (s, dir) => {
        import s.implicits._
        val urgent = Tables.orders(s, dir)
          .where($"o_orderpriority" === "1-URGENT")
          .select($"o_custkey".as("custkey"))
        val rich = Tables.customer(s, dir)
          .where($"c_acctbal" > 9000.0)
          .select($"c_custkey".as("custkey"))
        urgent.union(rich).distinct()
      },
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000.0""".stripMargin))
  )
}
