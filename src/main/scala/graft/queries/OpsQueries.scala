package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.TextAnalysis
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operational / scale-pattern operators rounding out the engine surface:
  * rule-based corpus filtering (the Gopher-rules complement of q31's scored
  * quality), incremental materialized-view maintenance, explicit skew-salted
  * joins, weighted priority sampling, rolling multi-day distinct windows,
  * relational set operators, and wide→long reshaping (unpivot/melt).
  *
  * Every threshold in the rule filter is an integer cross-multiplication
  * (mean ≥ 3 ⟺ sum ≥ 3·count), so no float knife edge ever enters a
  * keep/drop decision — the determinism discipline the scored signals
  * (q31/q113) established, applied to hard rules.
  */
object OpsQueries {

  /** Stopword literal shared by the Spark and oracle sides of q164. */
  private val Stop = TextAnalysis.stopwords

  /** Per-document Gopher-rule flags r1–r5 for [[defs q164]], exposed so
    * fixture tests can pin each rule's boundary on literal texts. Every
    * threshold is an integer cross-multiplication — no float compares.
    */
  def gopherFlags(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val ws = TextAnalysis.tokens(text)
    val stopArr = array(Stop.map(lit): _*)
    df.withColumn("n_words", size(ws).cast("long"))
      .withColumn("sum_wlen",
        aggregate(ws, lit(0L), (acc, x) => acc + length(x).cast("long")))
      .withColumn("n_alpha",
        size(filter(ws, x => x.rlike("[a-z]"))).cast("long"))
      .withColumn("n_stop",
        size(filter(ws, x => array_contains(stopArr, x))).cast("long"))
      .withColumn("n_hash",
        (length(text) - length(regexp_replace(text, "#", ""))).cast("long"))
      .withColumn("n_ell",
        ((length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3)
          .cast("long"))
      .withColumn("r1", col("n_words") >= 50L && col("n_words") <= 100000L)
      .withColumn("r2", lit(3L) * col("n_words") <= col("sum_wlen") &&
        col("sum_wlen") <= lit(10L) * col("n_words"))
      .withColumn("r3",
        lit(10L) * (col("n_hash") + col("n_ell")) <= col("n_words"))
      .withColumn("r4", lit(5L) * col("n_alpha") >= lit(4L) * col("n_words"))
      .withColumn("r5", col("n_stop") >= 2L)
  }

  def defs: Seq[QueryDef] = Seq(

    // ── Gopher-style rule filter — the hard-rule document gate from the
    //    Gopher/MassiveText cleaning recipe (word-count bounds, mean word
    //    length 3–10, symbol-to-word ratio, ≥80% alphabetic words, ≥2
    //    stopwords), reported as per-source pass rates per rule plus the
    //    all-rules survivor count. One narrow projection (all rules ride
    //    the same token array) → one 20-row agg; every predicate is an
    //    integer cross-multiplication, so the keep decision is bit-stable
    //    at any scale and in both engines.
    QueryDef(
      "q164_gopher_rules",
      (s, dir) => {
        import s.implicits._
        gopherFlags(Tables.documents(s, dir).select($"source", $"text"),
            "text")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"r1", 1L).otherwise(0L)).as("p_len"),
            sum(when($"r2", 1L).otherwise(0L)).as("p_wlen"),
            sum(when($"r3", 1L).otherwise(0L)).as("p_sym"),
            sum(when($"r4", 1L).otherwise(0L)).as("p_alpha"),
            sum(when($"r5", 1L).otherwise(0L)).as("p_stop"),
            sum(when($"r1" && $"r2" && $"r3" && $"r4" && $"r5", 1L)
              .otherwise(0L)).as("p_all"))
      },
      Some(s"""WITH d AS (
        |  SELECT source,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |      ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws,
        |    text
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(COALESCE(list_aggregate(
        |      list_transform(ws, x -> length(x)), 'sum'), 0) AS BIGINT)
        |      AS sum_wlen,
        |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
        |      AS BIGINT) AS n_alpha,
        |    CAST(len(list_filter(ws, x -> list_contains(
        |      [${Stop.map(w => s"'$w'").mkString(", ")}], x))) AS BIGINT)
        |      AS n_stop,
        |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
        |      AS n_hash,
        |    CAST((length(text) - length(replace(text, '...', ''))) // 3
        |      AS BIGINT) AS n_ell
        |  FROM d),
        |r AS (
        |  SELECT source,
        |    (n_words >= 50 AND n_words <= 100000) AS r1,
        |    (3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words) AS r2,
        |    (10 * (n_hash + n_ell) <= n_words) AS r3,
        |    (5 * n_alpha >= 4 * n_words) AS r4,
        |    (n_stop >= 2) AS r5
        |  FROM m)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS p_len,
        |  CAST(SUM(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) AS p_wlen,
        |  CAST(SUM(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT) AS p_sym,
        |  CAST(SUM(CASE WHEN r4 THEN 1 ELSE 0 END) AS BIGINT) AS p_alpha,
        |  CAST(SUM(CASE WHEN r5 THEN 1 ELSE 0 END) AS BIGINT) AS p_stop,
        |  CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 THEN 1 ELSE 0
        |    END) AS BIGINT) AS p_all
        |FROM r GROUP BY source""".stripMargin)),

    // ── Incremental materialized-view maintenance — the daily-rollup
    //    refresh that touches ONLY the newest day: state = the per-type
    //    rollup over all days before the latest, delta = the latest day's
    //    rows, merged = algebraic combine (sums add, counts add, max/min
    //    compose, avg re-derives from merged sums). The gate proves merged
    //    ≡ full recompute (the oracle computes the monolithic rollup). At
    //    100 TB the state side is a stored table of #types rows and each
    //    refresh scans one day's partition — the incremental-pipeline
    //    contract, stated as a query.
    QueryDef(
      "q165_incremental_agg",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.types.DecimalType
        val ev = Tables.events(s, dir)
          .select($"event_type", to_date($"ts").as("d"), $"value")
        val maxd = ev.agg(max($"d").as("maxd"))
        val tagged = ev.crossJoin(broadcast(maxd))
        // partials stay in exact decimal so the two-level sum is exactly
        // the monolithic sum (decimal addition is associative)
        def rollup(df: org.apache.spark.sql.DataFrame) =
          df.groupBy($"event_type")
            .agg(count(lit(1)).as("n"),
              sum($"value".cast(DecimalType(18, 4))).as("total_dec"),
              max($"value").as("vmax"), min($"value").as("vmin"))
        val state = rollup(tagged.where($"d" < $"maxd"))
        val delta = rollup(tagged.where($"d" === $"maxd"))
        state.unionByName(delta)
          .groupBy($"event_type")
          .agg(sum($"n").as("n"),
            sum($"total_dec").cast("double").as("total"),
            max($"vmax").as("vmax"), min($"vmin").as("vmin"))
          .withColumn("avg_v", $"total" / $"n".cast("double"))
      },
      Some(s"""SELECT event_type, COUNT(*) AS n,
        |  ${graft.QueryDef.dsumSql("value")} AS total,
        |  MAX(value) AS vmax, MIN(value) AS vmin,
        |  ${graft.QueryDef.dsumSql("value")}
        |    / CAST(COUNT(*) AS DOUBLE) AS avg_v
        |FROM events GROUP BY event_type""".stripMargin)),

    // ── Skew-salted join — the hot-key mitigation pattern made explicit:
    //    the fact side derives salt = hash(row) mod 8, the (tiny) dim side
    //    explodes all 8 salts, and the join runs on (key, salt) — forced to
    //    SortMergeJoin so the salt genuinely spreads each hot key's rows
    //    across 8 shuffle partitions instead of one (with broadcast the
    //    salt would be decorative). The gate proves the salted plan is
    //    RESULT-IDENTICAL to the plain join the oracle runs; PlanShapeSpec
    //    pins SMJ + salt in the join keys. At 100 TB this is the escape
    //    hatch when one key holds 10% of a shuffle and AQE's skew split
    //    can't apply (e.g. the key feeds a downstream keyed agg).
    QueryDef(
      "q166_salted_join",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
        val dim = ev.select($"event_type").distinct()
          .withColumn("weight",
            (length($"event_type").cast("long") * 10L + 1L))
        val salted = ev.withColumn("salt",
          pmod(TextAnalysis.hash60Fast(s, $"event_id".cast("string")),
            lit(8L)).cast("int"))
        val dimSalted = dim
          .withColumn("salt", explode(array((0 until 8).map(lit): _*)))
        // floor-1e6 fixed point: value*weight is float-derived, so a
        // decimal cast could tie HALF_UP vs HALF_EVEN — floor has no ties
        salted.join(dimSalted.hint("merge"), Seq("event_type", "salt"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_events"),
            (sum(floor(($"value" * $"weight".cast("double")) * lit(1e6))
              .cast("long")).cast("double") / lit(1e6)).as("weighted_sum"))
      },
      Some("""WITH dim AS (
        |  SELECT DISTINCT event_type,
        |    CAST(length(event_type) AS BIGINT) * 10 + 1 AS weight
        |  FROM events)
        |SELECT e.event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(floor((e.value * CAST(dim.weight AS DOUBLE)) * 1e6)
        |    AS BIGINT)) AS DOUBLE) / 1e6 AS weighted_sum
        |FROM events e JOIN dim ON e.event_type = dim.event_type
        |GROUP BY e.event_type""".stripMargin)),

    // ── Priority sampling (Duffield–Lund–Thorup) — a weighted sample of
    //    k=100 documents with UNBIASED subset-sum estimators, fully
    //    deterministic: u = (hash60(doc_id)+1)/2^60 ∈ (0,1], priority
    //    p = w/u, keep the top-k by p, and every kept item's estimated
    //    weight is max(w, τ) where τ is the (k+1)-th priority. Two pinned
    //    IEEE divisions per row (identical in both engines), top-101 via
    //    TakeOrderedAndProject (per-partition heaps — no global sort), and
    //    the rank window runs over exactly 101 rows at any corpus size.
    //    Σ est_w over the sample is an unbiased estimate of Σ w over the
    //    corpus — the sampling primitive for budget-bounded audits that
    //    must overrepresent heavy documents.
    QueryDef(
      "q167_priority_sample",
      (s, dir) => {
        import s.implicits._
        val Two60 = 1152921504606846976L // 2^60
        val p = Tables.documents(s, dir)
          .select($"doc_id", $"n_chars".as("w"),
            ($"n_chars".cast("double") /
              ((TextAnalysis.hash60($"doc_id".cast("string")) + lit(1L))
                .cast("double") / lit(Two60).cast("double")))
              .as("priority"))
        val top = p.orderBy($"priority".desc, $"doc_id".asc).limit(101)
          .withColumn("rnk",
            row_number().over(Window.orderBy($"priority".desc, $"doc_id".asc)))
        val tau = top.agg(
          max(when($"rnk" === 101, $"priority")).as("tau"))
        top.where($"rnk" <= 100)
          .crossJoin(broadcast(tau))
          .select($"rnk", $"doc_id", $"w",
            greatest($"w".cast("double"), coalesce($"tau", lit(0.0)))
              .as("est_w"))
      },
      Some("""WITH h AS (
        |  SELECT doc_id, n_chars AS w,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS hv
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, w,
        |    CAST(w AS DOUBLE) / (CAST(hv + 1 AS DOUBLE)
        |      / CAST(1152921504606846976 AS DOUBLE)) AS priority
        |  FROM h),
        |r AS (
        |  SELECT doc_id, w, priority,
        |    ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id ASC) AS rnk
        |  FROM p QUALIFY rnk <= 101),
        |tau AS (SELECT MAX(CASE WHEN rnk = 101 THEN priority END) AS tau
        |  FROM r)
        |SELECT CAST(rnk AS INT) AS rnk, doc_id, w,
        |  GREATEST(CAST(w AS DOUBLE), COALESCE(tau.tau, 0.0)) AS est_w
        |FROM r CROSS JOIN tau WHERE rnk <= 100""".stripMargin)),

    // ── Rolling 7-day distinct users (WAU) per day — the sliding-window
    //    distinct that RANGE window frames cannot express (COUNT DISTINCT
    //    is not frame-mergeable): distinct (user, day) pairs fan out to
    //    the ≤7 report days they support (bounded explode), then one keyed
    //    agg per (report_day, user) collapses multi-day activity, then a
    //    day-keyed count. DAU rides the same pass as a min-offset flag.
    //    Corpus-scale work is the (user, day) distinct; the 7× fan-out is
    //    on the POST-distinct rows — at 100 TB that is users×days, not
    //    events.
    QueryDef(
      "q168_rolling_distinct",
      (s, dir) => {
        import s.implicits._
        val ud = Tables.events(s, dir)
          .select($"user_id", to_date($"ts").as("d")).distinct()
        val spine = ud.select($"d").distinct()
        val fan = ud
          .select($"user_id", $"d",
            explode(sequence(lit(0), lit(6))).as("k"))
          .select($"user_id", date_add($"d", $"k").as("report_d"), $"k")
          .join(broadcast(spine.withColumnRenamed("d", "report_d")),
            Seq("report_d"))
        fan.groupBy($"report_d", $"user_id").agg(min($"k").as("mink"))
          .groupBy($"report_d")
          .agg(count(lit(1)).as("wau"),
            sum(when($"mink" === 0, 1L).otherwise(0L)).as("dau"))
      },
      Some("""WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |days AS (SELECT DISTINCT d FROM ud)
        |SELECT days.d AS report_d,
        |  COUNT(DISTINCT ud.user_id) AS wau,
        |  CAST(COUNT(DISTINCT CASE WHEN ud.d = days.d THEN ud.user_id END)
        |    AS BIGINT) AS dau
        |FROM days JOIN ud
        |  ON ud.d <= days.d AND ud.d >= days.d - 6
        |GROUP BY days.d""".stripMargin)),

    // ── Relational set operators — INTERSECT / EXCEPT (both directions) /
    //    UNION DISTINCT over two content-hash sets (first-half vs
    //    second-half sources), gating Spark's set-operator surface
    //    end-to-end: cross-source duplicate content is exactly the
    //    intersection. Each operator is one keyed distinct-shuffle on the
    //    60-bit hash; counts stay in-plan (no driver collect).
    QueryDef(
      "q169_setops",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        def fps(pred: org.apache.spark.sql.Column) = docs.where(pred)
          .select(TextAnalysis.hash60Fast(s, $"text").as("fp")).distinct()
        val a = fps(regexp_extract($"source", "(\\d+)", 1).cast("int") < 10)
        val b = fps(regexp_extract($"source", "(\\d+)", 1).cast("int") >= 10)
        def tag(df: org.apache.spark.sql.DataFrame, op: String) =
          df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), $"n")
        tag(a.intersect(b), "intersect")
          .unionByName(tag(a.except(b), "except_ab"))
          .unionByName(tag(b.except(a), "except_ba"))
          .unionByName(tag(a.union(b).distinct(), "union"))
      },
      Some("""WITH d AS (
        |  SELECT CAST(regexp_extract(source, '(\d+)', 1) AS INT) AS sn,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp
        |  FROM documents),
        |a AS (SELECT DISTINCT fp FROM d WHERE sn < 10),
        |b AS (SELECT DISTINCT fp FROM d WHERE sn >= 10)
        |SELECT 'intersect' AS op, COUNT(*) AS n
        |  FROM (SELECT fp FROM a INTERSECT SELECT fp FROM b)
        |UNION ALL SELECT 'except_ab', COUNT(*)
        |  FROM (SELECT fp FROM a EXCEPT SELECT fp FROM b)
        |UNION ALL SELECT 'except_ba', COUNT(*)
        |  FROM (SELECT fp FROM b EXCEPT SELECT fp FROM a)
        |UNION ALL SELECT 'union', COUNT(*)
        |  FROM (SELECT fp FROM a UNION SELECT fp FROM b)""".stripMargin)),

    // ── Unpivot / melt — wide→long reshaping via Spark's native unpivot
    //    (Expand under the hood: each input row emits one row per measure
    //    MAP-SIDE, no shuffle beyond the source agg). The wide side is the
    //    per-source stats table; the long side is the (source, metric,
    //    value) triple the dashboard/export layer wants. The oracle is the
    //    dialect-neutral UNION ALL form.
    QueryDef(
      "q170_unpivot",
      (s, dir) => {
        import s.implicits._
        val wide = Tables.documents(s, dir)
          .select($"source", TextAnalysis.tokenCount($"text").cast("long")
            .as("t"), $"n_chars")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"t").as("n_tokens"),
            sum($"n_chars").as("n_bytes"))
        wide.unpivot(
          Array($"source"),
          Array($"n_docs", $"n_tokens", $"n_bytes"),
          "metric", "value")
      },
      Some("""WITH w AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(lower(trim(text)), '\s+')) END)
        |      AS BIGINT) AS n_tokens,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_bytes
        |  FROM documents GROUP BY source)
        |SELECT source, 'n_docs' AS metric, n_docs AS value FROM w
        |UNION ALL SELECT source, 'n_tokens', n_tokens FROM w
        |UNION ALL SELECT source, 'n_bytes', n_bytes FROM w""".stripMargin)),

    // ── Forward as-of join with tolerance — for every `error` event, the
    //    first `click` by the SAME user strictly after it and within 5
    //    minutes (the "recovery latency" shape; the mirror of q27's
    //    backward as-of). Expressed as ONE conditional min over an exact-
    //    micros RANGE frame — no self-join, no fan-out: the window shuffle
    //    is keyed on user_id and the frame is time-bounded, so state per
    //    key is the 5-minute horizon at any scale (and the same plan runs
    //    incrementally as a watermarked stream-stream interval join).
    QueryDef(
      "q172_asof_forward",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select($"event_id", $"user_id", $"event_type",
            unix_micros($"ts").as("us"))
        val w = Window.partitionBy($"user_id").orderBy($"us")
          .rangeBetween(1L, 300000000L)
        ev.withColumn("next_click_us",
            min(when($"event_type" === "click", $"us")).over(w))
          .where($"event_type" === "error")
          .select($"event_id", $"user_id", $"us".as("err_us"),
            $"next_click_us",
            ($"next_click_us" - $"us").as("latency_us"),
            $"next_click_us".isNotNull.as("matched"))
      },
      Some("""WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events)
        |SELECT event_id, user_id, us AS err_us, next_click_us,
        |  next_click_us - us AS latency_us,
        |  next_click_us IS NOT NULL AS matched
        |FROM (
        |  SELECT *, MIN(CASE WHEN event_type = 'click' THEN us END) OVER (
        |    PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 1 FOLLOWING AND 300000000 FOLLOWING)
        |    AS next_click_us
        |  FROM e)
        |WHERE event_type = 'error'""".stripMargin)),

    // ── Window-function suite — first_value / last_value / nth_value over
    //    the full-partition frame, cume_dist and dense_rank, gated in one
    //    query: the remaining analytic-window surface stated explicitly.
    //    The order key (us, event_id) is tie-free, so cume_dist is one
    //    exact integer division per row (floored to 1e-9 fixed point);
    //    dense_rank runs over the categorical key where ties are REQUIRED
    //    and deterministic. One user-keyed window shuffle total.
    QueryDef(
      "q173_window_suite",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select($"event_id", $"user_id", $"event_type",
            unix_micros($"ts").as("us"))
        val ord = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        val full = ord.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        ev.select($"event_id", $"user_id",
          first($"event_type").over(full).as("first_et"),
          last($"event_type").over(full).as("last_et"),
          nth_value($"event_type", 2).over(full).as("second_et"),
          floor(cume_dist().over(ord) * lit(1e9)).cast("long").as("cd9"),
          dense_rank().over(
            Window.partitionBy($"user_id").orderBy($"event_type"))
            .cast("long").as("type_rank"))
      },
      Some("""WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |  FROM events)
        |SELECT event_id, user_id,
        |  first_value(event_type) OVER f AS first_et,
        |  last_value(event_type) OVER f AS last_et,
        |  nth_value(event_type, 2) OVER f AS second_et,
        |  CAST(floor(cume_dist() OVER
        |    (PARTITION BY user_id ORDER BY us, event_id) * 1e9) AS BIGINT)
        |    AS cd9,
        |  CAST(dense_rank() OVER
        |    (PARTITION BY user_id ORDER BY event_type) AS BIGINT)
        |    AS type_rank
        |FROM e
        |WINDOW f AS (PARTITION BY user_id ORDER BY us, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""
        .stripMargin)),

    // ── Seasonal baseline vs actual — expected hourly event counts per
    //    (type, day-of-week, hour) learned from the first 21 days, scored
    //    against the final 7 days on a gap-filled (type × day × hour)
    //    spine, in 1e-6 fixed point (expected = total·1e6 div n_days —
    //    integer, so partial-agg order is irrelevant). Day-of-week is
    //    days-since-epoch mod 7 (pure integer arithmetic — immune to the
    //    Sunday=0-vs-1 dialect drift). The model state is ≤ types×7×24
    //    rows (broadcast at any scale); the corpus contributes one
    //    filtered keyed agg per side — q108's spike detector generalized
    //    to a weekly-seasonal baseline.
    QueryDef(
      "q174_seasonal_baseline",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select($"event_type", to_date($"ts").as("d"),
            hour($"ts").cast("long").as("h"))
          .withColumn("dow",
            pmod(datediff($"d", lit("1970-01-01").cast("date")), lit(7)))
        val bounds = ev.agg(min($"d").as("mind"), max($"d").as("maxd"))
        val tagged = ev.crossJoin(broadcast(bounds))
        val train = tagged.where(datediff($"d", $"mind") < 21)
        val ndays = train.select($"dow", $"d").distinct()
          .groupBy($"dow").agg(count(lit(1)).as("n_days"))
        val expect = train.groupBy($"event_type", $"dow", $"h")
          .agg(count(lit(1)).as("c_train"))
          .join(broadcast(ndays), "dow")
          .select($"event_type", $"dow", $"h",
            expr("(c_train * 1000000) div n_days").as("expected_fp"))
        val testDays = tagged.where(datediff($"maxd", $"d") < 7)
          .select($"d", $"dow").distinct()
        val types = ev.select($"event_type").distinct()
        val spine = testDays
          .crossJoin(types)
          .withColumn("h", explode(sequence(lit(0L), lit(23L))))
        val actual = tagged.where(datediff($"maxd", $"d") < 7)
          .groupBy($"event_type", $"d", $"h")
          .agg(count(lit(1)).as("actual"))
        spine
          .join(actual, Seq("event_type", "d", "h"), "left")
          .na.fill(0L, Seq("actual"))
          .join(broadcast(expect), Seq("event_type", "dow", "h"), "left")
          .na.fill(0L, Seq("expected_fp"))
          .select($"event_type", $"d", $"h", $"actual", $"expected_fp",
            ($"actual" * 1000000L - $"expected_fp").as("diff_fp"))
      },
      Some("""WITH e AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, hour(ts) AS h,
        |    ((CAST(ts AS DATE) - DATE '1970-01-01') % 7 + 7) % 7 AS dow
        |  FROM events),
        |b AS (SELECT MIN(d) AS mind, MAX(d) AS maxd FROM e),
        |train AS (SELECT e.* FROM e CROSS JOIN b WHERE e.d - b.mind < 21),
        |nd AS (SELECT dow, COUNT(*) AS n_days
        |  FROM (SELECT DISTINCT dow, d FROM train) GROUP BY dow),
        |ex AS (
        |  SELECT event_type, t.dow, h,
        |    (COUNT(*) * 1000000) // MAX(nd.n_days) AS expected_fp
        |  FROM train t JOIN nd ON t.dow = nd.dow
        |  GROUP BY event_type, t.dow, h),
        |test AS (SELECT e.* FROM e CROSS JOIN b WHERE b.maxd - e.d < 7),
        |td AS (SELECT DISTINCT d, dow FROM test),
        |ty AS (SELECT DISTINCT event_type FROM e),
        |spine AS (
        |  SELECT ty.event_type, td.d, td.dow, hh.h
        |  FROM td CROSS JOIN ty
        |    CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS h) hh),
        |act AS (
        |  SELECT event_type, d, h, COUNT(*) AS actual
        |  FROM test GROUP BY 1, 2, 3)
        |SELECT s.event_type, s.d, s.h,
        |  CAST(COALESCE(a.actual, 0) AS BIGINT) AS actual,
        |  CAST(COALESCE(ex.expected_fp, 0) AS BIGINT) AS expected_fp,
        |  CAST(COALESCE(a.actual, 0) * 1000000 - COALESCE(ex.expected_fp, 0)
        |    AS BIGINT) AS diff_fp
        |FROM spine s
        |  LEFT JOIN act a ON s.event_type = a.event_type AND s.d = a.d
        |    AND s.h = a.h
        |  LEFT JOIN ex ON s.event_type = ex.event_type AND s.dow = ex.dow
        |    AND s.h = ex.h""".stripMargin)),

    // ── Local-supply revenue (the TPC-H Q5 shape) — the 6-table star
    //    join: region → nation → customer → orders → lineitem → supplier,
    //    with the customer-and-supplier-share-a-nation equality that makes
    //    Q5 the classic join-order workout. Spark plan: every dimension
    //    side broadcasts (region/nation always; customer under AQE), the
    //    fact table is scanned once with the date filter pushed down, and
    //    the only shuffle is the final per-nation agg. Revenue uses the
    //    exact decimal sum, so join order cannot move a bit.
    QueryDef(
      "q175_local_supply",
      (s, dir) => {
        import s.implicits._
        import graft.QueryDef.dsum
        val region = Tables.region(s, dir).where($"r_name" === "ASIA")
        val nation = Tables.nation(s, dir)
        val cust = Tables.customer(s, dir)
        val sup = Tables.supplier(s, dir)
        val ord = Tables.orders(s, dir)
          .where(year($"o_orderdate") === 1996)
        val li = Tables.lineitem(s, dir)
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .join(sup, $"l_suppkey" === $"s_suppkey" &&
            $"c_nationkey" === $"s_nationkey")
          .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)
            .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT n_name,
        |  ${graft.QueryDef.dsumSql("l_extendedprice * (1.0 - l_discount)", 6)}
        |    AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |    AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
        |GROUP BY n_name""".stripMargin)),

    // ── Sentence statistics — the sentence-segmentation profile (counts,
    //    not NLP): sentences = non-blank spans between [.!?]+ runs, token
    //    mass per sentence in 1e-6 fixed point. One narrow projection
    //    (the split rides the same scan as every other text signal) → one
    //    20-row agg; the regex stays in the Java/RE2 common subset.
    QueryDef(
      "q176_sentence_stats",
      (s, dir) => {
        import s.implicits._
        val sents = filter(split($"text", "[.!?]+"),
          x => length(trim(x)) > 0)
        val d = Tables.documents(s, dir)
          .select($"source",
            size(sents).cast("long").as("n_sent"),
            TextAnalysis.tokenCount($"text").cast("long").as("n_tok"))
        d.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_sent").as("total_sentences"),
            max($"n_sent").as("max_sentences"),
            expr("(sum(n_tok) * 1000000) div greatest(sum(n_sent), 1)")
              .as("tokens_per_sentence_fp"))
      },
      Some("""WITH d AS (
        |  SELECT source,
        |    CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
        |      x -> length(trim(x)) > 0)) AS BIGINT) AS n_sent,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(lower(trim(text)), '\s+')) END
        |      AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_sent) AS BIGINT) AS total_sentences,
        |  CAST(MAX(n_sent) AS BIGINT) AS max_sentences,
        |  CAST((SUM(n_tok) * 1000000) // greatest(SUM(n_sent), 1) AS BIGINT)
        |    AS tokens_per_sentence_fp
        |FROM d GROUP BY source""".stripMargin)),

    // ── SQL subquery surface — correlated EXISTS / NOT EXISTS and a
    //    scalar subquery, fed verbatim through the spark.sql front door
    //    (q89's posture): Catalyst must decorrelate the EXISTS into a
    //    semi/anti join and plan the scalar subquery as a broadcast
    //    one-row cross — the rewrite surface this gate pins end to end.
    //    The threshold is MAX/2 (exact IEEE halving), never AVG, so no
    //    float accumulation enters the predicate.
    QueryDef(
      "q177_sql_subqueries",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT c.c_mktsegment,
            COUNT(*) AS n_cust,
            CAST(SUM(CASE WHEN EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice >
                  (SELECT MAX(o2.o_totalprice) / 2 FROM orders o2))
              THEN 1 ELSE 0 END) AS BIGINT) AS n_big_spenders,
            CAST(SUM(CASE WHEN NOT EXISTS (
              SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
              THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive
          FROM customer c
          GROUP BY c.c_mktsegment""")
      },
      Some("""SELECT c.c_mktsegment,
        |  COUNT(*) AS n_cust,
        |  CAST(SUM(CASE WHEN EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_totalprice >
        |        (SELECT MAX(o2.o_totalprice) / 2 FROM orders o2))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_big_spenders,
        |  CAST(SUM(CASE WHEN NOT EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive
        |FROM customer c
        |GROUP BY c.c_mktsegment""".stripMargin)),

    // ── Array-function profile — array_distinct / array_intersect-style
    //    set algebra over the token arrays, aggregated per source. The
    //    stopword-overlap twin is written as filter(distinct) in BOTH
    //    dialects so element order (which the engines are free to differ
    //    on) never reaches the output — only set SIZES do.
    QueryDef(
      "q178_array_ops",
      (s, dir) => {
        import s.implicits._
        val ws = TextAnalysis.tokens($"text")
        val stopArr = array(Stop.map(lit): _*)
        val d = Tables.documents(s, dir).select(
          $"source",
          size(array_distinct(ws)).cast("long").as("n_distinct"),
          size(filter(array_distinct(ws), x => array_contains(stopArr, x)))
            .cast("long").as("n_stop_types"))
        d.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_distinct").as("distinct_sum"),
            max($"n_distinct").as("distinct_max"),
            sum($"n_stop_types").as("stop_type_sum"))
      },
      Some(s"""WITH d AS (
        |  SELECT source,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |      ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
        |  FROM documents),
        |m AS (
        |  SELECT source,
        |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
        |    CAST(len(list_filter(list_distinct(ws), x -> list_contains(
        |      [${Stop.map(w => s"'$w'").mkString(", ")}], x))) AS BIGINT)
        |      AS n_stop_types
        |  FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_distinct) AS BIGINT) AS distinct_sum,
        |  CAST(MAX(n_distinct) AS BIGINT) AS distinct_max,
        |  CAST(SUM(n_stop_types) AS BIGINT) AS stop_type_sum
        |FROM m GROUP BY source""".stripMargin)),

    // ── Top supplier(s) (the TPC-H Q15 shape) — revenue per supplier over
    //    a quarter, keeping every supplier that achieves the GLOBAL
    //    maximum: the "having = max of an aggregate" pattern, planned as
    //    one keyed agg + a 1-row broadcast cross + an equality filter.
    //    Both engines derive revenue from the same exact decimal sum, so
    //    the double equality against the max is bit-safe (identical
    //    values, identical cast).
    QueryDef(
      "q179_top_supplier",
      (s, dir) => {
        import s.implicits._
        import graft.QueryDef.dsum
        val rev = Tables.lineitem(s, dir)
          .where($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1996-04-01")
          .groupBy($"l_suppkey")
          .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6)
            .as("total_revenue"))
        val mx = rev.agg(max($"total_revenue").as("max_revenue"))
        rev.crossJoin(broadcast(mx))
          .where($"total_revenue" === $"max_revenue")
          .join(Tables.supplier(s, dir), $"l_suppkey" === $"s_suppkey")
          .select($"s_suppkey", $"s_name", $"total_revenue")
      },
      Some(s"""WITH rev AS (
        |  SELECT l_suppkey,
        |    ${graft.QueryDef.dsumSql("l_extendedprice * (1.0 - l_discount)", 6)}
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)"""
        .stripMargin)),

    // ── Promo revenue share (the TPC-H Q14 shape) — the conditional-
    //    share-of-total pattern: promo revenue / total revenue per month,
    //    both sums exact decimal, the share ONE pinned IEEE division in
    //    1e-9 floor fixed point. A single fact scan with the part
    //    dimension broadcast — the filter-free conditional aggregation
    //    that sum-case pivots (q07) generalize to ratios.
    QueryDef(
      "q180_promo_share",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
          .where(year($"l_shipdate") === 1996)
        val pt = Tables.part(s, dir).select($"p_partkey", $"p_type")
        li.join(broadcast(pt), $"l_partkey" === $"p_partkey")
          .groupBy(month($"l_shipdate").as("m"))
          .agg(
            sum(when($"p_type" === "PROMO",
              ($"l_extendedprice" * (lit(1.0) - $"l_discount"))
                .cast("decimal(18,6)")).otherwise(lit(0).cast("decimal(18,6)")))
              .cast("double").as("promo_revenue"),
            sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
              .cast("decimal(18,6)")).cast("double").as("total_revenue"))
          .withColumn("promo_share_fp",
            expr("cast(floor(promo_revenue / total_revenue * 1e9) as bigint)"))
      },
      Some("""SELECT CAST(month(l_shipdate) AS INT) AS m,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
        |    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue,
        |  CAST(floor(
        |    CAST(SUM(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,6))) AS DOUBLE) * 1e9) AS BIGINT)
        |    AS promo_share_fp
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE year(l_shipdate) = 1996
        |GROUP BY month(l_shipdate)""".stripMargin)),

    // ── Idle rich customers (the TPC-H Q22 shape) — customers whose
    //    balance exceeds the positive-balance average but who placed no
    //    RECENT order: the decimal-exact aggregate threshold (davg — the sum
    //    and the division are the same two IEEE ops in both engines)
    //    broadcasts into a filter, and the no-orders test is a LEFT ANTI
    //    join (keys only — at scale the anti join is the cheapest
    //    existence check there is). Grouped per nation.
    QueryDef(
      "q181_idle_rich",
      (s, dir) => {
        import s.implicits._
        import graft.QueryDef.{davg, dsum}
        val cust = Tables.customer(s, dir)
        val thr = cust.where($"c_acctbal" > 0.0)
          .agg(davg($"c_acctbal").as("avg_bal"))
        cust.crossJoin(broadcast(thr))
          .where($"c_acctbal" > $"avg_bal")
          .join(Tables.orders(s, dir)
            .where($"o_orderdate" >= "2000-01-01").select($"o_custkey"),
            $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n_cust"),
            dsum($"c_acctbal").as("total_bal"))
      },
      Some(s"""WITH thr AS (
        |  SELECT ${graft.QueryDef.davgSql("c_acctbal")} AS avg_bal
        |  FROM customer WHERE c_acctbal > 0.0)
        |SELECT c_nationkey, COUNT(*) AS n_cust,
        |  ${graft.QueryDef.dsumSql("c_acctbal")} AS total_bal
        |FROM customer CROSS JOIN thr
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey""".stripMargin)),

    // ── Weekly churn / new-user accounting — per Monday-week: active
    //    users, users who do NOT return next week (churn), users absent
    //    the previous week (new). The whole statement is set algebra over
    //    the distinct (user, week) activity table: churn = LEFT ANTI on
    //    (user, week+7), new = LEFT ANTI on (user, week−7) — keyed
    //    existence checks, no windows over the event stream, and the only
    //    corpus-scale shuffle is the initial distinct. Weeks missing a
    //    successor (the last one) are excluded from the report, where
    //    churn is undefined.
    QueryDef(
      "q182_weekly_churn",
      (s, dir) => {
        import s.implicits._
        val uw = Tables.events(s, dir)
          .select($"user_id",
            date_trunc("week", $"ts").cast("date").as("wk"))
          .distinct().localCheckpoint()
        val churn = uw.join(
          uw.select($"user_id", date_sub($"wk", 7).as("wk")),
          Seq("user_id", "wk"), "left_anti")
          .groupBy($"wk").agg(count(lit(1)).as("n_churned"))
        val fresh = uw.join(
          uw.select($"user_id", date_add($"wk", 7).as("wk")),
          Seq("user_id", "wk"), "left_anti")
          .groupBy($"wk").agg(count(lit(1)).as("n_new"))
        val active = uw.groupBy($"wk").agg(count(lit(1)).as("n_active"))
        val maxwk = uw.agg(max($"wk").as("maxwk"))
        active
          .join(churn, Seq("wk"), "left")
          .join(fresh, Seq("wk"), "left")
          .na.fill(0L, Seq("n_churned", "n_new"))
          .crossJoin(broadcast(maxwk))
          .where($"wk" < $"maxwk")
          .select($"wk", $"n_active", $"n_churned", $"n_new")
      },
      Some("""WITH uw AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE)
        |    AS wk
        |  FROM events),
        |act AS (SELECT wk, COUNT(*) AS n_active FROM uw GROUP BY wk),
        |ch AS (
        |  SELECT a.wk, COUNT(*) AS n_churned FROM uw a
        |  WHERE NOT EXISTS (SELECT 1 FROM uw b
        |    WHERE b.user_id = a.user_id AND b.wk = a.wk + 7)
        |  GROUP BY a.wk),
        |nw AS (
        |  SELECT a.wk, COUNT(*) AS n_new FROM uw a
        |  WHERE NOT EXISTS (SELECT 1 FROM uw b
        |    WHERE b.user_id = a.user_id AND b.wk = a.wk - 7)
        |  GROUP BY a.wk)
        |SELECT act.wk, n_active,
        |  CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned,
        |  CAST(COALESCE(nw.n_new, 0) AS BIGINT) AS n_new
        |FROM act LEFT JOIN ch ON act.wk = ch.wk
        |  LEFT JOIN nw ON act.wk = nw.wk
        |WHERE act.wk < (SELECT MAX(wk) FROM uw)""".stripMargin)),

    // ── Pareto frontier (2-D skyline) — per source, the documents no
    //    other document dominates on (length, vocabulary richness): the
    //    data-selection frontier ("longest doc at every richness level").
    //    The naive skyline is O(n²) pairwise dominance; this plan is the
    //    LINEAR one: collapse ties to per-length maxima, then one keyed
    //    running-max window ordered by length desc — a point is on the
    //    frontier iff it beats every strictly-longer point's richness.
    //    All integers; the window is per-source, never global.
    QueryDef(
      "q183_skyline",
      (s, dir) => {
        import s.implicits._
        val d = Tables.documents(s, dir).select(
          $"source", $"n_chars",
          size(array_distinct(TextAnalysis.tokens($"text"))).cast("long")
            .as("n_distinct"))
        val byLen = d.groupBy($"source", $"n_chars")
          .agg(max($"n_distinct").as("n_distinct"))
        val w = Window.partitionBy($"source").orderBy($"n_chars".desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        byLen
          .withColumn("prevmax", max($"n_distinct").over(w))
          .where($"n_distinct" > coalesce($"prevmax", lit(-1L)))
          .select($"source", $"n_chars", $"n_distinct")
      },
      Some("""WITH d AS (
        |  SELECT source, n_chars,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(list_distinct(
        |        string_split_regex(lower(trim(text)), '\s+'))) END AS BIGINT)
        |      AS n_distinct
        |  FROM documents),
        |bylen AS (
        |  SELECT source, n_chars, MAX(n_distinct) AS n_distinct
        |  FROM d GROUP BY source, n_chars),
        |rm AS (
        |  SELECT source, n_chars, n_distinct,
        |    MAX(n_distinct) OVER (PARTITION BY source ORDER BY n_chars DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
        |  FROM bylen)
        |SELECT source, n_chars, CAST(n_distinct AS BIGINT) AS n_distinct
        |FROM rm WHERE n_distinct > COALESCE(prevmax, -1)""".stripMargin)),

    // ── Largest-remainder (Hamilton) quota apportionment — split a fixed
    //    1000-document sampling budget across sources EXACTLY
    //    proportionally to token mass: floor shares first, then the
    //    leftover seats go to the largest remainders (rank window over
    //    #sources rows). Everything is integer arithmetic on exact token
    //    counts — remainders are compared as n·B mod T (no division
    //    results are ever compared), so there is no float anywhere. The
    //    exact-quota allocator behind q99's rank-capped sampler and
    //    q146's interleave: corpus-scale work is one token-count agg;
    //    apportionment happens on the 20-row source table.
    QueryDef(
      "q184_hamilton_quota",
      (s, dir) => {
        import s.implicits._
        val B = 1000L
        // materialize the 20-row source table once: tot/base/used all
        // consume it, and without the checkpoint each consumer would
        // re-run the corpus-scale token-count agg
        val src = Tables.documents(s, dir)
          .select($"source",
            TextAnalysis.tokenCount($"text").cast("long").as("t"))
          .groupBy($"source").agg(sum($"t").as("n_tokens"))
          .localCheckpoint()
        val tot = src.agg(sum($"n_tokens").as("total"))
        val base = src.crossJoin(broadcast(tot))
          .select($"source", $"n_tokens",
            expr(s"(n_tokens * $B) div total").as("floor_share"),
            expr(s"(n_tokens * $B) % total").as("rem"))
        val used = base.agg(sum($"floor_share").as("used"))
        val ranked = base.crossJoin(broadcast(used))
          .withColumn("rrank",
            row_number().over(Window.orderBy($"rem".desc, $"source".asc))
              .cast("long"))
        ranked.select($"source", $"n_tokens", $"floor_share",
            (($"rrank" <= lit(B) - $"used").cast("long")).as("bonus"))
          .withColumn("quota", $"floor_share" + $"bonus")
      },
      Some(s"""WITH src AS (
        |  SELECT source,
        |    CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END)
        |      AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT SUM(n_tokens) AS total FROM src),
        |base AS (
        |  SELECT source, n_tokens,
        |    (n_tokens * 1000) // total AS floor_share,
        |    (n_tokens * 1000) % total AS rem
        |  FROM src CROSS JOIN tot),
        |used AS (SELECT SUM(floor_share) AS used FROM base),
        |r AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC)
        |    AS BIGINT) AS rrank
        |  FROM base CROSS JOIN used)
        |SELECT source, n_tokens,
        |  CAST(floor_share AS BIGINT) AS floor_share,
        |  CAST(CASE WHEN rrank <= 1000 - used THEN 1 ELSE 0 END AS BIGINT)
        |    AS bonus,
        |  CAST(floor_share + CASE WHEN rrank <= 1000 - used THEN 1 ELSE 0
        |    END AS BIGINT) AS quota
        |FROM r""".stripMargin)),

    // ── Wordlist safety filter — the blocklist curation stage: per
    //    document, occurrences of flagged terms (token-exact, not
    //    substring — "class" never trips "ass"); per source, the document
    //    flag rate and total hits, plus the overall clean share. One scan,
    //    one 20-row agg; the blocklist broadcasts as a literal array at
    //    any corpus size (real deployments swap in a broadcast variable
    //    or a bloom filter — q116's pattern — with no plan change).
    QueryDef(
      "q185_blocklist_filter",
      (s, dir) => {
        import s.implicits._
        val blocked = Seq("dup", "hash", "spill7", "leak9")
        val blockArr = array(blocked.map(lit): _*)
        val d = Tables.documents(s, dir).select(
          $"source",
          size(filter(TextAnalysis.tokens($"text"),
            x => array_contains(blockArr, x))).cast("long").as("n_hits"))
        d.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"n_hits" > 0L, 1L).otherwise(0L)).as("n_flagged"),
            sum($"n_hits").as("total_hits"))
      },
      Some(s"""WITH d AS (
        |  SELECT source,
        |    CAST(len(list_filter(
        |      CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |        ELSE string_split_regex(lower(trim(text)), '\\s+') END,
        |      x -> list_contains(['dup', 'hash', 'spill7', 'leak9'],
        |        x))) AS BIGINT) AS n_hits
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_flagged,
        |  CAST(SUM(n_hits) AS BIGINT) AS total_hits
        |FROM d GROUP BY source""".stripMargin)),

    // ── Feature-adoption curves — per (event_type, day): users adopting
    //    that event type for the FIRST time, and the running total of
    //    adopters (the product-analytics adoption curve next to q182's
    //    churn view). First-adoption is a keyed min-agg over (user, type)
    //    — the q79 novelty shape on users; the cumulative window is
    //    per-type over the ≤#days daily rollup, never over events.
    QueryDef(
      "q186_adoption_curve",
      (s, dir) => {
        import s.implicits._
        val firstSeen = Tables.events(s, dir)
          .select($"user_id", $"event_type", to_date($"ts").as("d"))
          .groupBy($"user_id", $"event_type").agg(min($"d").as("first_d"))
        val daily = firstSeen.groupBy($"event_type", $"first_d".as("d"))
          .agg(count(lit(1)).as("n_new"))
        daily.withColumn("cum_adopters",
          sum($"n_new").over(Window.partitionBy($"event_type").orderBy($"d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      },
      Some("""WITH fs AS (
        |  SELECT user_id, event_type, MIN(CAST(ts AS DATE)) AS first_d
        |  FROM events GROUP BY user_id, event_type),
        |daily AS (
        |  SELECT event_type, first_d AS d, COUNT(*) AS n_new
        |  FROM fs GROUP BY event_type, first_d)
        |SELECT event_type, d, n_new,
        |  CAST(SUM(n_new) OVER (PARTITION BY event_type ORDER BY d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_adopters
        |FROM daily""".stripMargin)),

    // ── CDC merge (SCD1 upsert-apply) — the warehouse MERGE stated as a
    //    query: the dimension state is built from history (last value per
    //    user before the cutover), then a change batch (events after the
    //    cutover) applies last-writer-wins upserts, with a final `error`
    //    event acting as a tombstone DELETE. The merged dimension must
    //    equal the monolithic recompute the oracle runs. Scale shape:
    //    both sides are keyed latest-per-user window-group-limits; the
    //    merge is a full-outer keyed join; nothing is ever ordered
    //    globally. The cutover is a data property (max day − 7), so
    //    reruns agree.
    QueryDef(
      "q187_cdc_merge",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select($"user_id", $"event_type", $"value",
            unix_micros($"ts").as("us"), $"event_id", to_date($"ts").as("d"))
        val cut = ev.agg(date_sub(max($"d"), 7).as("cutd"))
        val tagged = ev.crossJoin(broadcast(cut)).localCheckpoint()
        def latest(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("rn", row_number().over(
            Window.partitionBy($"user_id")
              .orderBy($"us".desc, $"event_id".desc)))
          .where($"rn" === 1)
          .select($"user_id", $"event_type".as("last_type"),
            $"value".as("last_value"), $"us".as("last_us"))
        val state = latest(tagged.where($"d" <= $"cutd"))
        val delta = latest(tagged.where($"d" > $"cutd"))
        state.select($"user_id", $"last_type", $"last_value", $"last_us")
          .join(delta.select($"user_id",
            $"last_type".as("n_type"), $"last_value".as("n_value"),
            $"last_us".as("n_us")), Seq("user_id"), "full_outer")
          .where(coalesce($"n_type", $"last_type") =!= "error")
          .select($"user_id",
            coalesce($"n_type", $"last_type").as("cur_type"),
            coalesce($"n_value", $"last_value").as("cur_value"),
            coalesce($"n_us", $"last_us").as("cur_us"))
      },
      Some("""WITH e AS (
        |  SELECT user_id, event_type, value, epoch_us(ts) AS us, event_id,
        |    CAST(ts AS DATE) AS d
        |  FROM events),
        |cut AS (SELECT MAX(d) - 7 AS cutd FROM e),
        |latest AS (
        |  SELECT user_id, event_type AS cur_type, value AS cur_value,
        |    us AS cur_us
        |  FROM (SELECT e.*, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY us DESC, event_id DESC) AS rn
        |    FROM e)
        |  WHERE rn = 1)
        |SELECT user_id, cur_type, cur_value, cur_us
        |FROM latest WHERE cur_type <> 'error'""".stripMargin)),

    // ── Inter-event gap profile — the number that SIZES SESSION GAPS and
    //    state-eviction watermarks: per user, the gap between consecutive
    //    events, reported as a power-of-two histogram of gap minutes
    //    (integer bit length — no libm). Where the mass of this histogram
    //    ends is where q26's 30-minute session gap and the streaming
    //    state timeouts come from. One keyed LAG window + a ≤#buckets
    //    agg; the q138 log2 trick pointed at temporal structure.
    QueryDef(
      "q188_gap_profile",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        val gaps = ev
          .withColumn("prev", lag($"us", 1).over(w))
          .where($"prev".isNotNull)
          .withColumn("gap_min", expr("(us - prev) div 60000000"))
        gaps
          .withColumn("bucket",
            when($"gap_min" === 0L, 0L)
              .otherwise(length(bin($"gap_min")).cast("long")))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_gaps"),
            max($"gap_min").as("max_gap_min"))
      },
      Some("""WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |l AS (
        |  SELECT us, LAG(us, 1) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS prev
        |  FROM e),
        |b AS (
        |  SELECT CAST((us - prev) // 60000000 AS BIGINT) AS gap_min
        |  FROM l WHERE prev IS NOT NULL)
        |SELECT CASE WHEN gap_min = 0 THEN 0
        |    ELSE CAST(length(bin(gap_min)) AS BIGINT) END AS bucket,
        |  COUNT(*) AS n_gaps,
        |  CAST(MAX(gap_min) AS BIGINT) AS max_gap_min
        |FROM b GROUP BY 1""".stripMargin)),

    // ── Exact two-sample Kolmogorov–Smirnov distance — are two sources'
    //    length distributions the same? D = max |F1 − F2| over the merged
    //    support, computed ENTIRELY in integers: the ECDF difference
    //    |c1·n2 − c2·n1| is compared cross-multiplied, and only the final
    //    D is rendered as one fixed-point division. The support is
    //    value-bounded (distinct lengths), the cumulative counts are one
    //    ordered window over it — the distribution-drift test next to
    //    q107's chi-square, with zero float accumulation.
    QueryDef(
      "q189_ks_distance",
      (s, dir) => {
        import s.implicits._
        val d = Tables.documents(s, dir)
          .where($"source".isin("src0", "src1"))
          .select($"source", $"n_chars")
        val counts = d.groupBy($"n_chars")
          .agg(sum(when($"source" === "src0", 1L).otherwise(0L)).as("c0"),
            sum(when($"source" === "src1", 1L).otherwise(0L)).as("c1"))
        val w = Window.orderBy($"n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = d.groupBy()
          .agg(sum(when($"source" === "src0", 1L).otherwise(0L)).as("n0"),
            sum(when($"source" === "src1", 1L).otherwise(0L)).as("n1"))
        counts
          .withColumn("f0", sum($"c0").over(w))
          .withColumn("f1", sum($"c1").over(w))
          .crossJoin(broadcast(tot))
          .select(abs($"f0" * $"n1" - $"f1" * $"n0").as("num"),
            ($"n0" * $"n1").as("den"))
          .groupBy()
          .agg(max($"num").as("ks_num"), max($"den").as("ks_den"))
          .withColumn("ks_fp",
            expr("(ks_num * 1000000000) div ks_den"))
      },
      Some("""WITH d AS (
        |  SELECT source, n_chars FROM documents
        |  WHERE source IN ('src0', 'src1')),
        |c AS (
        |  SELECT n_chars,
        |    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c0,
        |    SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS c1
        |  FROM d GROUP BY n_chars),
        |t AS (
        |  SELECT SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS n0,
        |    SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS n1
        |  FROM d),
        |f AS (
        |  SELECT
        |    SUM(c0) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f0,
        |    SUM(c1) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1
        |  FROM c)
        |SELECT CAST(MAX(abs(f0 * n1 - f1 * n0)) AS BIGINT) AS ks_num,
        |  CAST(MAX(n0 * n1) AS BIGINT) AS ks_den,
        |  CAST((MAX(abs(f0 * n1 - f1 * n0)) * 1000000000) // MAX(n0 * n1)
        |    AS BIGINT) AS ks_fp
        |FROM f CROSS JOIN t""".stripMargin)),

    // ── Gini concentration of token mass across sources — the
    //    data-balance number for the dataset card: Gini over the 20-row
    //    source token totals via the sorted-shares formula
    //    G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx), all in integers until ONE
    //    final fixed-point division. Corpus-scale work is one token agg;
    //    the sort is 20 rows.
    QueryDef(
      "q190_gini_tokens",
      (s, dir) => {
        import s.implicits._
        val src = Tables.documents(s, dir)
          .select($"source",
            TextAnalysis.tokenCount($"text").cast("long").as("t"))
          .groupBy($"source").agg(sum($"t").as("x"))
          .localCheckpoint()
        val ranked = src.withColumn("i",
          row_number().over(Window.orderBy($"x".asc, $"source".asc))
            .cast("long"))
        ranked.groupBy()
          .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
            sum($"i" * $"x").as("six"))
          .select($"n", $"sx",
            expr("((2 * six - (n + 1) * sx) * 1000000000) div (n * sx)")
              .as("gini_fp"))
      },
      Some("""WITH src AS (
        |  SELECT source,
        |    CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(lower(trim(text)), '\s+')) END)
        |      AS BIGINT) AS x
        |  FROM documents GROUP BY source),
        |r AS (
        |  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x ASC, source ASC)
        |    AS BIGINT) AS i
        |  FROM src)
        |SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |  CAST(((2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x)) * 1000000000)
        |    // (COUNT(*) * SUM(x)) AS BIGINT) AS gini_fp
        |FROM r""".stripMargin)),

    // ── Sliding (hopping) window aggregation — 2-hour windows every hour,
    //    so each event lands in exactly two windows: Spark's
    //    window(ts, '2 hours', '1 hour') plans a map-side 2× Expand (like
    //    unpivot — no extra shuffle), then one keyed agg. The oracle
    //    derives the same two memberships per row by truncation-and-shift.
    //    The tumbling q43 generalized to overlap; the smoothing shape
    //    dashboards want.
    QueryDef(
      "q192_sliding_window",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy(window($"ts", "2 hours", "1 hour"), $"event_type")
          .agg(count(lit(1)).as("n_events"))
          .select($"window.start".as("w_start"), $"event_type", $"n_events")
      },
      Some("""WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h FROM events),
        |m AS (
        |  SELECT event_type, h + (x * INTERVAL 1 HOUR) AS w_start
        |  FROM e CROSS JOIN (SELECT unnest([0, -1]) AS x))
        |SELECT w_start, event_type, COUNT(*) AS n_events
        |FROM m GROUP BY w_start, event_type""".stripMargin)),

    // ── Null-safe join (<=>) — equality that treats NULL as a joinable
    //    key value: the dimension-with-unknown-bucket pattern (an
    //    "unclassified" dim row matches facts whose key is NULL, instead
    //    of silently dropping them). Key is NULLIF(event_type, 'error');
    //    oracle twin is IS NOT DISTINCT FROM. The join stays a hash join —
    //    null-safe equality is still an equi-key to Spark.
    QueryDef(
      "q193_nullsafe_join",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .withColumn("k", nullif($"event_type", lit("error")))
        val dim = ev.select($"k").distinct()
          .withColumn("category",
            when($"k".isNull, "unclassified")
              .otherwise(concat(lit("cat_"), $"k")))
        ev.join(dim, ev("k") <=> dim("k"))
          .groupBy($"category")
          .agg(count(lit(1)).as("n_events"),
            countDistinct($"user_id").as("n_users"))
      },
      Some("""WITH e AS (
        |  SELECT *, NULLIF(event_type, 'error') AS k FROM events),
        |dim AS (
        |  SELECT k, CASE WHEN k IS NULL THEN 'unclassified'
        |    ELSE 'cat_' || k END AS category
        |  FROM (SELECT DISTINCT k FROM e))
        |SELECT category, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM e JOIN dim ON e.k IS NOT DISTINCT FROM dim.k
        |GROUP BY category""".stripMargin)),

    // ── LOCF gap-fill (last observation carried forward) — IGNORE NULLS
    //    window semantics: sensor readings that failed (here: `error`
    //    events null out their value) inherit the user's most recent good
    //    reading. One keyed window, last_value(..., ignoreNulls) over the
    //    running frame; the per-user report counts filled vs unfillable
    //    (no prior good reading) rows. The time-series repair primitive.
    QueryDef(
      "q194_locf_fill",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"),
            when($"event_type" === "error", lit(null).cast("double"))
              .otherwise($"value").as("v"))
        val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val filled = ev.withColumn("v_filled",
          last($"v", ignoreNulls = true).over(w))
        filled.groupBy($"user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(when($"v".isNull && $"v_filled".isNotNull, 1L).otherwise(0L))
              .as("n_filled"),
            sum(when($"v_filled".isNull, 1L).otherwise(0L))
              .as("n_unfillable"),
            graft.QueryDef.tavg($"v_filled").as("mean_filled"))
      },
      Some(s"""WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |  FROM events),
        |f AS (
        |  SELECT user_id, v,
        |    LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |  FROM e)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN v IS NULL AND v_filled IS NOT NULL THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_filled,
        |  CAST(SUM(CASE WHEN v_filled IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unfillable,
        |  ${graft.QueryDef.tavgSql("v_filled")} AS mean_filled
        |FROM f GROUP BY user_id""".stripMargin)),

    // ── Session-concurrency curve — how many sessions are OPEN at each
    //    hour: the interval-stabbing count done as a SWEEP LINE, never an
    //    interval × timeline join. Sessions (q26's 30-minute-gap
    //    definition) emit +1 at their start hour and −1 one hour past
    //    their end hour; the concurrency curve is the running sum of
    //    deltas over the gap-filled hour spine (a BOUNDED window: ≤ #hours
    //    rows at any corpus size). The capacity-planning number for
    //    stateful-stream sizing (how many session states coexist).
    QueryDef(
      "q195_concurrency_curve",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val sessions = Tables.events(s, dir)
          .select($"user_id", $"event_id", $"ts")
          .withColumn("prev_ts", lag($"ts", 1).over(w))
          .withColumn("new_session",
            when($"prev_ts".isNull ||
              unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800, 1L)
              .otherwise(0L))
          .withColumn("session_no",
            sum($"new_session").over(w.rowsBetween(
              Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"session_no")
          .agg(date_trunc("hour", min($"ts")).as("h_start"),
            date_trunc("hour", max($"ts")).as("h_end"))
        val deltas = sessions
          .select($"h_start".as("h"), lit(1L).as("delta"))
          .unionByName(sessions.select(
            ($"h_end" + expr("INTERVAL 1 HOUR")).as("h"),
            lit(-1L).as("delta")))
          .groupBy($"h").agg(sum($"delta").as("d"))
        val bounds = deltas.agg(min($"h").as("h0"), max($"h").as("h1"))
        val spine = bounds.select(
          explode(sequence($"h0", $"h1", expr("INTERVAL 1 HOUR"))).as("h"))
        spine.join(deltas, Seq("h"), "left").na.fill(0L, Seq("d"))
          .withColumn("n_open",
            sum($"d").over(Window.orderBy($"h")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select($"h", $"n_open")
      },
      Some("""WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts,
        |    SUM(CASE WHEN prev_ts IS NULL
        |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_no
        |  FROM e),
        |sess AS (
        |  SELECT user_id, session_no,
        |    date_trunc('hour', MIN(ts)) AS h_start,
        |    date_trunc('hour', MAX(ts)) AS h_end
        |  FROM f GROUP BY 1, 2),
        |deltas AS (
        |  SELECT h, CAST(SUM(d) AS BIGINT) AS d FROM (
        |    SELECT h_start AS h, 1 AS d FROM sess
        |    UNION ALL
        |    SELECT h_end + INTERVAL 1 HOUR, -1 FROM sess)
        |  GROUP BY h),
        |b AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM deltas),
        |spine AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM b)
        |SELECT spine.h,
        |  CAST(SUM(COALESCE(deltas.d, 0)) OVER (ORDER BY spine.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_open
        |FROM spine LEFT JOIN deltas ON spine.h = deltas.h""".stripMargin)),

    // ── Character-banded typo mining — same-length vocabulary pairs at
    //    HAMMING distance ≤ 2 (substitution typos), with q59's banded
    //    pigeonhole applied at the CHARACTER level: each token splits
    //    into 3 positional bands, and ≤ 2 edits cannot touch all 3, so
    //    candidates sharing any (length, band_id, band_text) have EXACT
    //    recall — the quadratic verify only ever runs inside band
    //    buckets, never vocab × vocab. The verify itself is a per-
    //    position mismatch count (pure integer), and output is the
    //    top-20 pairs by combined frequency via TakeOrdered.
    QueryDef(
      "q196_typo_mining",
      (s, dir) => {
        import s.implicits._
        val vocab = Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens($"text")).as("tok"))
          .where(length($"tok").between(3, 10) && $"tok".rlike("^[a-z]+$"))
          .groupBy($"tok").agg(count(lit(1)).as("c"))
          .withColumn("l", length($"tok"))
          .localCheckpoint()
        val bands = vocab.select($"tok", $"c", $"l",
          explode(array(
            struct(lit(0).as("band_id"),
              expr("substring(tok, 1, l div 3)").as("band_text")),
            struct(lit(1).as("band_id"),
              expr("substring(tok, l div 3 + 1, l div 3)").as("band_text")),
            struct(lit(2).as("band_id"),
              expr("substring(tok, 2 * (l div 3) + 1)").as("band_text"))))
            .as("b"))
          .select($"tok", $"c", $"l", $"b.band_id", $"b.band_text")
        val cand = bands.select($"l", $"band_id", $"band_text",
            $"tok".as("tok_a"), $"c".as("c_a"))
          .join(bands.select($"l", $"band_id", $"band_text",
            $"tok".as("tok_b"), $"c".as("c_b")),
            Seq("l", "band_id", "band_text"))
          .where($"tok_a" < $"tok_b")
          .select($"l", $"tok_a", $"tok_b", $"c_a", $"c_b").distinct()
        cand
          .withColumn("hamming",
            expr("size(filter(sequence(1, l), i -> " +
              "substring(tok_a, i, 1) != substring(tok_b, i, 1)))"))
          .where($"hamming" >= 1 && $"hamming" <= 2)
          .select($"tok_a", $"tok_b", $"hamming".cast("long").as("hamming"),
            ($"c_a" + $"c_b").as("c_total"))
          .orderBy($"c_total".desc, $"tok_a".asc, $"tok_b".asc)
          .limit(20)
      },
      Some("""WITH v AS (
        |  SELECT tok, COUNT(*) AS c, length(tok) AS l
        |  FROM (SELECT unnest(CASE WHEN length(trim(text)) = 0
        |      THEN CAST([] AS VARCHAR[])
        |      ELSE string_split_regex(lower(trim(text)), '\s+') END) AS tok
        |    FROM documents)
        |  WHERE length(tok) BETWEEN 3 AND 10
        |    AND regexp_matches(tok, '^[a-z]+$')
        |  GROUP BY tok),
        |bands AS (
        |  SELECT tok, c, l, 0 AS band_id, substr(tok, 1, l // 3)
        |    AS band_text FROM v
        |  UNION ALL
        |  SELECT tok, c, l, 1, substr(tok, l // 3 + 1, l // 3) FROM v
        |  UNION ALL
        |  SELECT tok, c, l, 2, substr(tok, 2 * (l // 3) + 1) FROM v),
        |cand AS (
        |  SELECT DISTINCT a.l, a.tok AS tok_a, b.tok AS tok_b,
        |    a.c AS c_a, b.c AS c_b
        |  FROM bands a JOIN bands b
        |    ON a.l = b.l AND a.band_id = b.band_id
        |      AND a.band_text = b.band_text AND a.tok < b.tok),
        |ver AS (
        |  SELECT tok_a, tok_b,
        |    CAST(len(list_filter(generate_series(1, l),
        |      i -> substr(tok_a, i, 1) <> substr(tok_b, i, 1))) AS BIGINT)
        |      AS hamming,
        |    c_a + c_b AS c_total
        |  FROM cand)
        |SELECT tok_a, tok_b, hamming, CAST(c_total AS BIGINT) AS c_total
        |FROM ver WHERE hamming BETWEEN 1 AND 2
        |ORDER BY c_total DESC, tok_a ASC, tok_b ASC LIMIT 20"""
        .stripMargin)),

    // ── Exponentially time-decayed popularity, EXACT in fixed point —
    //    the recency weighting a freshness-aware mixer or trending
    //    dashboard needs, with none of the cross-engine pow() risk: a
    //    1-day half-life makes the weight of a lag-L event exactly
    //    2^(-L), so the decayed count Σ2^(-L) scaled by 2^20 is the
    //    exact BIGINT Σ shiftleft(1, 20-L) — sum-mergeable (per-shard
    //    partials add; a streaming maintainer keeps per-(type, day)
    //    COUNT partials and derives the score on read — each day-bucket
    //    is a single power of two, so aging is exact per bucket, where
    //    shiftright on the summed dec_w would floor mixed low bits and
    //    drift from the batch recompute), order-independent, clipped to
    //    zero past lag 20 where the true weight underflows the scale anyway
    //    (2^-21 < 1/2^20; the 2^20 scale also keeps dec_w × 1e6 far
    //    from BIGINT overflow at any corpus size). dec_score_1e6 reads
    //    as "today-equivalent events × 1e6". One scan, one keyed agg,
    //    a 1-row broadcast max.
    QueryDef(
      "q262_decayed_counts",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.events(s, dir)
          .select($"event_type",
            unix_date($"ts".cast("date")).cast("long").as("d"))
        val mx = ev.agg(max($"d").as("maxd"))
        ev.crossJoin(broadcast(mx))
          .select($"event_type", ($"maxd" - $"d").as("lag"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when($"lag" <= 20L,
              expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - lag AS INT))"))
              .otherwise(0L)).as("dec_w"))
          .withColumn("dec_score_1e6",
            expr("dec_w * 1000000 div shiftleft(CAST(1 AS BIGINT), 20)"))
      },
      Some("""WITH e AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |mx AS (SELECT MAX(d) AS maxd FROM e),
        |w AS (
        |  SELECT event_type,
        |    CASE WHEN maxd - d <= 20
        |      THEN 1::BIGINT << CAST(20 - (maxd - d) AS INT)
        |      ELSE 0 END AS wgt
        |  FROM e, mx)
        |SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(wgt) AS BIGINT) AS dec_w,
        |  CAST(SUM(wgt) AS BIGINT) * 1000000 // (1::BIGINT << 20)
        |    AS dec_score_1e6
        |FROM w GROUP BY event_type""".stripMargin)),

    // ── Seasonal-naive forecast error (MASE): per event type, the mean
    //    absolute error of the lag-7 ("same weekday last week") forecast
    //    scaled by the lag-1 naive baseline — the scale-free forecast
    //    quality number (< 1e6 fixed point ⇒ weekly seasonality beats
    //    plain persistence). Daily counts are EXACT integers, so both
    //    error sums are integer sums of |Δcount| and the ratio is one
    //    fixed-point division with cross-multiplied means (no float
    //    anywhere). Lags are ROW lags over each type's observed-day
    //    series (gap days are absent rows, stated in the name ordering
    //    both engines replay). Scale: one keyed rollup to #types×#days,
    //    windows over the bounded daily spine only.
    QueryDef(
      "q276_mase",
      (s, dir) => {
        import s.implicits._
        val daily = Tables.events(s, dir)
          .select($"event_type",
            unix_date($"ts".cast("date")).cast("long").as("d"))
          .groupBy($"event_type", $"d").agg(count(lit(1)).as("y"))
        val w = Window.partitionBy($"event_type").orderBy($"d".asc)
        daily
          .withColumn("y1", lag($"y", 1).over(w))
          .withColumn("y7", lag($"y", 7).over(w))
          .groupBy($"event_type")
          .agg(
            sum(when($"y7".isNotNull, abs($"y" - $"y7"))).as("e7"),
            count($"y7").as("n7"),
            sum(when($"y1".isNotNull, abs($"y" - $"y1"))).as("e1"),
            count($"y1").as("n1"))
          .where($"n7" > 0L && $"n1" > 0L && $"e1" > 0L)
          .withColumn("mase_1e6",
            expr("e7 * n1 * 1000000 div (n7 * e1)"))
      },
      Some("""WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, y,
        |    LAG(y, 1) OVER (PARTITION BY event_type ORDER BY d ASC) AS y1,
        |    LAG(y, 7) OVER (PARTITION BY event_type ORDER BY d ASC) AS y7
        |  FROM daily),
        |m AS (
        |  SELECT event_type,
        |    CAST(SUM(CASE WHEN y7 IS NOT NULL
        |      THEN abs(y - y7) END) AS BIGINT) AS e7,
        |    CAST(COUNT(y7) AS BIGINT) AS n7,
        |    CAST(SUM(CASE WHEN y1 IS NOT NULL
        |      THEN abs(y - y1) END) AS BIGINT) AS e1,
        |    CAST(COUNT(y1) AS BIGINT) AS n1
        |  FROM lagged GROUP BY 1)
        |SELECT event_type, e7, n7, e1, n1,
        |  e7 * n1 * 1000000 // (n7 * e1) AS mase_1e6
        |FROM m WHERE n7 > 0 AND n1 > 0 AND e1 > 0""".stripMargin)),

    // ── Additive seasonal decomposition (classical, weekly period) —
    //    the time-series triptych's third panel next to q263's robust
    //    trend and q276's forecast error: trend = CENTERED 7-day moving
    //    average of the daily counts, detrended = y − trend, seasonal
    //    index = per-weekday mean of the detrended series. Everything
    //    until the final per-dow mean is EXACT fixed point: daily
    //    counts are integers, the centered MA over exactly 7 rows is
    //    (Σy·1e6 div 7) — integer — and det_1e6 is an integer
    //    difference; the per-dow mean is the ONE IEEE division, written
    //    identically in both engines (integer `div` is avoided on the
    //    possibly-NEGATIVE detrended sums, where Spark truncates toward
    //    zero but DuckDB floors — the cross-engine trap this query
    //    steps around explicitly). Incomplete window edges (first/last
    //    3 days) are excluded by the exact 7-row count guard, not by
    //    NULL arithmetic. Scale: windows run per type over the daily
    //    spine (#days rows), never over raw events.
    QueryDef(
      "q285_seasonal_decompose",
      (s, dir) => {
        import s.implicits._
        val daily = Tables.events(s, dir)
          .select($"event_type",
            unix_date($"ts".cast("date")).cast("long").as("d"))
          .groupBy($"event_type", $"d").agg(count(lit(1)).as("y"))
        val w7 = Window.partitionBy($"event_type").orderBy($"d".asc)
          .rowsBetween(-3, 3)
        val det = daily
          .withColumn("n_win", count(lit(1)).over(w7))
          .withColumn("sum7", sum($"y").over(w7))
          .where($"n_win" === 7L)
          .select($"event_type", $"d", $"y",
            expr("sum7 * 1000000 div 7").as("ma_1e6"))
          .withColumn("det_1e6", $"y" * lit(1000000L) - $"ma_1e6")
          .withColumn("dow_iso", expr("(d + 3) % 7 + 1"))
        det.groupBy($"event_type", $"dow_iso")
          .agg(count(lit(1)).as("n_days"),
            sum($"det_1e6").as("sum_det_1e6"))
          .withColumn("seasonal",
            $"sum_det_1e6".cast("double") / lit(1e6) /
              $"n_days".cast("double"))
      },
      Some("""WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT event_type, d, y,
        |    COUNT(*) OVER w AS n_win,
        |    CAST(SUM(y) OVER w AS BIGINT) AS sum7
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY d ASC
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT event_type, d, y,
        |    y * 1000000 - sum7 * 1000000 // 7 AS det_1e6,
        |    (d + 3) % 7 + 1 AS dow_iso
        |  FROM win WHERE n_win = 7)
        |SELECT event_type, CAST(dow_iso AS BIGINT) AS dow_iso,
        |  CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(det_1e6) AS BIGINT) AS sum_det_1e6,
        |  CAST(SUM(det_1e6) AS DOUBLE) / 1e6
        |    / CAST(COUNT(*) AS DOUBLE) AS seasonal
        |FROM det GROUP BY 1, 2""".stripMargin)),

    // ── Activity BITMAPS — the roaring-bitmap posture in one BIGINT:
    //    each user's month of activity is a 31-bit word (bit d = active
    //    on day d), built by ONE bit_or aggregation. bit_or is
    //    associative, commutative, AND idempotent — the bitmap joins
    //    the MAX-merge family (HLL registers, KMV sketches): shards
    //    combine with another bit_or, replays cannot corrupt state, and
    //    every downstream retention stat (active-day counts, weekday
    //    coverage, longest streak posture) reads off #users 8-byte
    //    words WITHOUT touching events again. The gate reports the
    //    active-day histogram and weekend/weekday coverage from the
    //    bitmaps alone — popcounts of masked words, exact integers.
    //    Scale: one shuffle on user_id to 1-row-per-user state; the
    //    histogram is a ≤31-row rollup.
    QueryDef(
      "q286_activity_bitmap",
      (s, dir) => {
        import s.implicits._
        // Jan 2024 fixture window: day-of-month 1..31 → bits 0..30.
        // weekend mask: Jan 2024 Saturdays/Sundays = 6,7,13,14,20,21,27,28
        val weekendMask = Seq(6, 7, 13, 14, 20, 21, 27, 28)
          .map(d => 1L << (d - 1)).sum
        val bm = Tables.events(s, dir)
          .select($"user_id",
            expr("shiftleft(CAST(1 AS BIGINT)," +
              " CAST(day(CAST(ts AS DATE)) - 1 AS INT))").as("bit"))
          .groupBy($"user_id")
          .agg(bit_or($"bit").as("bitmap"))
        bm.select($"user_id",
            bit_count($"bitmap").cast("long").as("active_days"),
            bit_count($"bitmap".bitwiseAND(lit(weekendMask))).cast("long")
              .as("weekend_days"))
          .groupBy($"active_days")
          .agg(count(lit(1)).as("n_users"),
            sum($"weekend_days").as("weekend_day_sum"))
      },
      Some {
        val weekendMask = Seq(6, 7, 13, 14, 20, 21, 27, 28)
          .map(d => 1L << (d - 1)).sum
        s"""WITH bm AS (
        |  SELECT user_id,
        |    bit_or(1::BIGINT << (day(CAST(ts AS DATE)) - 1)) AS bitmap
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT user_id,
        |    CAST(bit_count(bitmap) AS BIGINT) AS active_days,
        |    CAST(bit_count(bitmap & $weekendMask) AS BIGINT)
        |      AS weekend_days
        |  FROM bm)
        |SELECT active_days, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(weekend_days) AS BIGINT) AS weekend_day_sum
        |FROM d GROUP BY 1""".stripMargin
      }),

    // ── Longest consecutive-day activity streak per user — the islands
    //    method (gaps-and-islands without self-joins): within each user,
    //    rank distinct active days; day − rank is CONSTANT exactly along
    //    a consecutive run, so one keyed (user, day−rank) rollup finds
    //    every island and a max per user finds the longest. All windows
    //    and aggs are keyed by user_id — the classic interview puzzle
    //    stated in its scale-correct form (the naive LEFT JOIN
    //    day-chaining is O(days²) per user and serial). Output is the
    //    streak histogram: how many users peaked at k consecutive days.
    QueryDef(
      "q293_longest_streak",
      (s, dir) => {
        import s.implicits._
        val days = Tables.events(s, dir)
          .select($"user_id",
            unix_date($"ts".cast("date")).cast("long").as("d"))
          .distinct()
        val w = Window.partitionBy($"user_id").orderBy($"d".asc)
        val streaks = days
          .withColumn("grp", $"d" - row_number().over(w))
          .groupBy($"user_id", $"grp")
          .agg(count(lit(1)).as("len"))
          .groupBy($"user_id")
          .agg(max($"len").as("longest"))
        streaks.groupBy($"longest")
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH days AS (
        |  SELECT DISTINCT user_id,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        |  FROM events),
        |grp AS (
        |  SELECT user_id,
        |    d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d ASC)
        |      AS grp
        |  FROM days),
        |runs AS (
        |  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM grp GROUP BY 1, 2),
        |longest AS (
        |  SELECT user_id, MAX(len) AS longest FROM runs GROUP BY 1)
        |SELECT longest, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM longest GROUP BY 1""".stripMargin))
      ,

    // ── Overdispersion index (variance-to-mean ratio) of daily event
    //    counts per type — the Poisson sanity check behind every rate
    //    alert: D ≈ 1 means the q244/q166 rate-spike thresholds are
    //    calibrated; D ≫ 1 (bursty) means they under-alarm and the
    //    monitors should widen. Moments are exact BIGINT sums over the
    //    per-(type, day) integer rollup (n·Σy² − (Σy)² — magnitudes
    //    bounded by the DAILY axis, not by events), and D is the one
    //    identically-written IEEE division. One keyed rollup, ≤ #types
    //    output rows.
    QueryDef(
      "q295_dispersion",
      (s, dir) => {
        import s.implicits._
        val daily = Tables.events(s, dir)
          .select($"event_type",
            unix_date($"ts".cast("date")).cast("long").as("d"))
          .groupBy($"event_type", $"d").agg(count(lit(1)).as("y"))
        daily.groupBy($"event_type")
          .agg(count(lit(1)).as("n_days"), sum($"y").as("sy"),
            sum($"y" * $"y").as("syy"))
          .where($"n_days" > 1L && $"sy" > 0L)
          .withColumn("mean_y",
            $"sy".cast("double") / $"n_days".cast("double"))
          .withColumn("dispersion",
            (($"n_days" * $"syy" - $"sy" * $"sy").cast("double") /
              ($"n_days" - 1L).cast("double")) / $"sy".cast("double"))
      },
      Some("""WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days, sy, syy,
        |  CAST(sy AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_y,
        |  (CAST(n_days * syy - sy * sy AS DOUBLE)
        |    / CAST(n_days - 1 AS DOUBLE)) / CAST(sy AS DOUBLE)
        |    AS dispersion
        |FROM m WHERE n_days > 1 AND sy > 0""".stripMargin))
  )

}
