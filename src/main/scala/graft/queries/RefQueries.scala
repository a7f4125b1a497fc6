package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reference-parity operator inventory (SURVEY.md §2) expressed over the
  * driver fixture tables. Each query exercises one operator family from the
  * reference (`/root/reference/`), cited per query, re-expressed as a
  * declarative Spark plan so Catalyst supplies pushdown/pruning/broadcast.
  *
  * Scale notes are inline: every groupBy keys on bounded-cardinality columns
  * or pre-aggregated data; dimension joins are broadcast; the one globally
  * ordered window (running total, W3) operates post-aggregation on ~one row
  * per day — a deliberate, documented serial point (SURVEY.md §7.4).
  */
object RefQueries {

  def defs: Seq[QueryDef] = Seq(

    // ── A1/A2 group-by multi-agg (transformations/transactions.py:52,
    //    fitbit_steps.py:49). Partial+final hash agg; 6 groups total.
    QueryDef(
      "q01_group_agg",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dsum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("sum_disc_price"),
            davg($"l_quantity").as("avg_qty"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        |${dsumSql("l_quantity")} AS sum_qty,
        |${dsumSql("l_extendedprice")} AS sum_base_price,
        |${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
        |${davgSql("l_quantity")} AS avg_qty,
        |COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ── P1-P4 projection + predicates (streamlit/travel_and_movement_map.py:89-111).
    //    Filter + 3-column projection reach the parquet scan (PushedFilters).
    QueryDef(
      "q02_filter_project",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .where($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1999-01-01").cast("timestamp") &&
            $"l_returnflag" === "R")
          .select($"l_orderkey", $"l_linenumber",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
        |l_extendedprice * (1.0 - l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '1999-01-01' AND l_returnflag = 'R'""".stripMargin)),

    // ── J1 left equi-join + agg (sql/sp_full_travel_costs.sql:73-74).
    //    nation/customer are dims → broadcast; fact-side shuffle only for agg.
    QueryDef(
      "q03_join_agg",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
          .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(dsum($"o_totalprice").as("total_sales"), count(lit(1)).as("n_orders"))
      },
      Some(s"""SELECT n_name, ${dsumSql("o_totalprice")} AS total_sales,
        |COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)),

    // ── W2 dedup latest-row-per-key (sql/sp_full_travel_costs.sql:21-24,
    //    sp_travel_tax_report.sql:35,57,69). row_number over (key, desc order);
    //    deterministic tie-break on o_orderkey.
    QueryDef(
      "q04_dedup_latest",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .where($"rn" === 1)
          .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM orders
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate DESC, o_orderkey DESC) = 1""".stripMargin)),

    // ── W3/W4 running total + guarded running average
    //    (sql/sp_full_travel_costs.sql:94-101). The unpartitioned window runs
    //    over ~1 row/day AFTER aggregation — the serial point is tiny by
    //    construction (SURVEY.md §7.4 risk 1).
    QueryDef(
      "q05_running_total",
      (s, dir) => {
        import s.implicits._
        val daily = Tables.orders(s, dir)
          .groupBy(to_date($"o_orderdate").as("order_date"))
          .agg(sum($"o_totalprice".cast(DecimalType(18, 4))).as("d"))
        val w = Window.orderBy($"order_date")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("rt", sum($"d").over(w))
          .withColumn("rd", row_number().over(Window.orderBy($"order_date")))
          .select($"order_date",
            $"d".cast("double").as("daily_total"),
            $"rt".cast("double").as("running_total"),
            ($"rt".cast("double") / $"rd").as("running_avg"))
      },
      Some("""WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_date,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS d
        |  FROM orders GROUP BY 1)
        |SELECT order_date, CAST(d AS DOUBLE) AS daily_total,
        |  CAST(SUM(d) OVER w AS DOUBLE) AS running_total,
        |  CAST(SUM(d) OVER w AS DOUBLE)
        |    / ROW_NUMBER() OVER (ORDER BY order_date) AS running_avg
        |FROM daily
        |WINDOW w AS (ORDER BY order_date
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    // ── W6 top-k (streamlit/travel_and_movement_map.py:210 nlargest(5)).
    //    orderBy+limit → TakeOrderedAndProject: per-partition heap, no full sort.
    QueryDef(
      "q06_topk",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
          .limit(10)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // ── A5 manual sum-case pivot (sql/sp_full_travel_costs.sql:32-36) —
    //    5 fixed categories, one pass, no pivot shuffle.
    QueryDef(
      "q07_pivot_sumcase",
      (s, dir) => {
        import s.implicits._
        def cat(p: String) =
          dsum(when($"o_orderpriority" === p, $"o_totalprice").otherwise(0.0))
        Tables.orders(s, dir)
          .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("order_month"))
          .agg(
            cat("1-URGENT").as("urgent_total"),
            cat("2-HIGH").as("high_total"),
            cat("3-MEDIUM").as("medium_total"),
            cat("4-NOT SPECIFIED").as("notspec_total"),
            cat("5-LOW").as("low_total"))
      },
      Some(s"""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |${dsumSql("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END")} AS urgent_total,
        |${dsumSql("CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice ELSE 0.0 END")} AS high_total,
        |${dsumSql("CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice ELSE 0.0 END")} AS medium_total,
        |${dsumSql("CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice ELSE 0.0 END")} AS notspec_total,
        |${dsumSql("CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice ELSE 0.0 END")} AS low_total
        |FROM orders GROUP BY 1""".stripMargin)),

    // ── A6/A7 LISTAGG ordered + DISTINCT (sp_full_travel_costs.sql:39,
    //    sp_travel_tax_report.sql:44) → array_join∘array_sort∘array_distinct∘collect_list.
    QueryDef(
      "q08_listagg",
      (s, dir) => {
        import s.implicits._
        Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(
            array_join(array_sort(array_distinct(collect_list($"c_mktsegment"))), ", ")
              .as("segments"),
            countDistinct($"c_mktsegment").as("n_segments"))
      },
      Some("""SELECT n_name,
        |string_agg(DISTINCT c_mktsegment, ', ' ORDER BY c_mktsegment) AS segments,
        |COUNT(DISTINCT c_mktsegment) AS n_segments
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)),

    // ── J4 dense-hour scaffold left join + 0-fill
    //    (transformations/fitbit_steps.py:52-58): dates × explode(sequence(0,23)).
    QueryDef(
      "q09_scaffold_hours",
      (s, dir) => {
        import s.implicits._
        val e = Tables.events(s, dir)
          .select(to_date($"ts").as("event_date"), hour($"ts").as("event_hour"),
            $"value")
        val hourly = e.groupBy($"event_date", $"event_hour")
          .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
        val scaffold = e.select($"event_date").distinct()
          .select($"event_date",
            explode(sequence(lit(0), lit(23))).as("event_hour"))
        scaffold.join(hourly, Seq("event_date", "event_hour"), "left")
          .na.fill(0, Seq("n_events")).na.fill(0.0, Seq("total_value"))
      },
      Some(s"""WITH hourly AS (
        |  SELECT CAST(ts AS DATE) AS event_date,
        |         CAST(EXTRACT(hour FROM ts) AS INT) AS event_hour,
        |         COUNT(*) AS n_events, ${dsumSql("value")} AS total_value
        |  FROM events GROUP BY 1, 2),
        |dates AS (SELECT DISTINCT CAST(ts AS DATE) AS event_date FROM events),
        |scaffold AS (SELECT event_date, CAST(r.range AS INT) AS event_hour
        |             FROM dates CROSS JOIN range(24) r)
        |SELECT s.event_date, s.event_hour,
        |  COALESCE(h.n_events, 0) AS n_events,
        |  COALESCE(h.total_value, 0.0) AS total_value
        |FROM scaffold s LEFT JOIN hourly h
        |  ON s.event_date = h.event_date AND s.event_hour = h.event_hour""".stripMargin)),

    // ── F9 JSON path access (sql/reset_schemas.sql:345-427; events.props
    //    stands in for the VARIANT column) + A1 rollup over extracted key.
    QueryDef(
      "q10_json_extract",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .select($"event_type",
            get_json_object($"props", "$.k").cast("int").as("k"))
          .where($"k".isNotNull)
          .groupBy($"event_type")
          .agg(sum($"k").as("sum_k"), max($"k").as("max_k"), count(lit(1)).as("n"))
      },
      Some("""SELECT event_type,
        |CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
        |COUNT(*) AS n
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL
        |GROUP BY event_type""".stripMargin))
  )
}
