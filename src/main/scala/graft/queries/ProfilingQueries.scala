package graft.queries

import graft.{QueryDef, Tables}
import graft.ext.TextAnalysis
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-profiling and sampling operators rounding out the curation
  * surface: proportional stratified sampling (the quota cousin of q78's
  * fixed per-source cap) and equi-width histogram profiling (the binned
  * complement of q29's percentiles and q68's sketches).
  */
object ProfilingQueries {

  /** Histogram bin width in characters; bins above [[HistCap]] collapse
    * into the overflow bin so the output stays bounded whatever the tail.
    */
  val HistWidth = 50
  val HistCap   = 11

  /** Misra-Gries summary capacity for q98 (error ≤ N/(m+1)). */
  val HhCapacity = 2048

  def defs: Seq[QueryDef] = Seq(

    // ── Approximate functional-dependency audit (g3 measure) — the
    //    schema-discovery profiler: for each candidate A→B, the MINIMUM
    //    number of rows to delete for the dependency to hold exactly is
    //    n − Σ_a max_b count(a,b) (Kivinen–Mannila g3). Everything is a
    //    pair of keyed aggs per candidate — count per (A,B), then
    //    max/sum per A — so each audit costs one shuffle on A and
    //    reports exact integers: total rows, distinct keys, violating
    //    rows/keys, and g3 in 1e6 fixed point. Four candidates across
    //    four tables ride one plan via unionByName; a real profiler
    //    would fan the same shape across every column pair. Scale: no
    //    windows, no distinct-on-fact, partial aggs do the heavy
    //    lifting map-side.
    QueryDef(
      "q275_fd_audit",
      (s, dir) => {
        import s.implicits._
        def g3(df: org.apache.spark.sql.DataFrame, tbl: String,
            lhs: String, rhs: String) = {
          val cnt = df.select(col(lhs).as("a"), col(rhs).as("b"))
            .groupBy($"a", $"b").agg(count(lit(1)).as("c"))
          cnt.groupBy($"a")
            .agg(sum($"c").as("tot"), max($"c").as("mx"),
              count(lit(1)).as("n_rhs"))
            .agg(sum($"tot").as("n_rows"),
              count(lit(1)).as("n_keys"),
              sum($"tot" - $"mx").as("violations"),
              sum(when($"n_rhs" > 1, 1L).otherwise(0L))
                .as("violating_keys"))
            .select(lit(tbl).as("tbl"), lit(lhs).as("lhs"),
              lit(rhs).as("rhs"), $"n_rows", $"n_keys", $"violations",
              $"violating_keys")
            .withColumn("g3_1e6", expr("violations * 1000000 div n_rows"))
        }
        g3(Tables.part(s, dir), "part", "p_brand", "p_type")
          .unionByName(g3(Tables.orders(s, dir), "orders",
            "o_custkey", "o_orderpriority"))
          .unionByName(g3(Tables.documents(s, dir), "documents",
            "source", "lang"))
          .unionByName(g3(Tables.lineitem(s, dir), "lineitem",
            "l_partkey", "l_suppkey"))
      },
      Some {
        def g3(tbl: String, lhs: String, rhs: String) =
          s"""SELECT '$tbl' AS tbl, '$lhs' AS lhs, '$rhs' AS rhs,
          |  CAST(SUM(tot) AS BIGINT) AS n_rows,
          |  CAST(COUNT(*) AS BIGINT) AS n_keys,
          |  CAST(SUM(tot - mx) AS BIGINT) AS violations,
          |  CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS violating_keys
          |FROM (
          |  SELECT a, SUM(c) AS tot, MAX(c) AS mx, COUNT(*) AS n_rhs
          |  FROM (SELECT $lhs AS a, $rhs AS b, COUNT(*) AS c
          |        FROM $tbl GROUP BY 1, 2)
          |  GROUP BY a)""".stripMargin
        s"""SELECT tbl, lhs, rhs, n_rows, n_keys, violations,
        |  violating_keys,
        |  violations * 1000000 // n_rows AS g3_1e6
        |FROM (
        |${g3("part", "p_brand", "p_type")}
        |UNION ALL
        |${g3("orders", "o_custkey", "o_orderpriority")}
        |UNION ALL
        |${g3("documents", "source", "lang")}
        |UNION ALL
        |${g3("lineitem", "l_partkey", "l_suppkey")})""".stripMargin
      }),

    // ── Frequent-items (heavy-hitters) profiling via the native
    //    Misra-Gries TypedImperativeAggregate ([[graft.functions
    //    .HeavyHitters]]): a capacity-bounded summary whose partials are
    //    ≤ 2048 entries per map task — the cheap streaming-friendly
    //    alternative to q48's full word-count shuffle. MG summaries are
    //    merge-order-dependent INSIDE the error window, so the gate follows
    //    the q68 sketch posture: the hash-compared columns are the exact
    //    top-20 (deterministic) plus a boolean that holds iff the sketch
    //    obeys its proven bound (est ≤ true, true − est ≤ N/(m+1), and
    //    presence whenever true > N/(m+1)); the oracle emits literal TRUE,
    //    so any sketch drift fails the gate. The exact side reuses the q48
    //    shape (partial-agg word count + TakeOrderedAndProject top-20); the
    //    sketch and the two corpus totals ride the SAME exploded scan, and
    //    the 1-row summary is broadcast onto the 20-row exact side.
    QueryDef(
      "q98_heavy_hitters",
      (s, dir) => {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        val words = Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens($"text")).as("token"))
        val sketch = words.agg(
          call_function("heavy_hitters", $"token", lit(HhCapacity)).as("sk"),
          count(lit(1)).as("n_total"))
        val top = words.groupBy($"token").agg(count(lit(1)).as("freq"))
          .orderBy($"freq".desc, $"token".asc).limit(20)
        val est = element_at($"sk", $"token")
        val maxErr = expr(s"n_total div ${HhCapacity + 1}")
        top.crossJoin(broadcast(sketch))
          .select($"token", $"freq",
            ($"freq" <= maxErr ||
              (est.isNotNull && est <= $"freq" && $"freq" - est <= maxErr))
              .as("sketch_ok"))
      },
      Some("""WITH t AS (
        |  SELECT CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |              ELSE string_split_regex(lower(trim(text)), '\s+') END AS toks
        |  FROM documents),
        |tok AS (SELECT unnest(toks) AS token FROM t)
        |SELECT token, COUNT(*) AS freq, TRUE AS sketch_ok
        |FROM tok GROUP BY 1
        |ORDER BY freq DESC, token ASC LIMIT 20""".stripMargin)),

    // ── Proportional stratified sampling: keep floor(10%) of every source
    //    stratum, chosen by salted 60-bit hash order (q63/q78's
    //    run-independent uniformity: the keep decision is a property of the
    //    document, not the run). Exact per-stratum quotas need a rank, so
    //    this costs one window shuffle on source; quotas themselves are a
    //    20-row broadcast. At 100 TB with a fat stratum, the swap is a
    //    hash-threshold filter (keep h < quota/n · 2^60 — approximate but
    //    rankless) or a two-pass exact threshold from the hash CDF; the
    //    exact-rank form here is the spec both would be checked against.
    QueryDef(
      "q99_stratified_sample",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
          .select($"doc_id", $"source",
            TextAnalysis.hash60Fast(s,
              concat(lit("strat:"), $"doc_id".cast("string"))).as("h"))
        val quotas = docs.groupBy($"source")
          .agg(expr("count(1) div 10").as("quota"))
        val byHash = Window.partitionBy($"source")
          .orderBy($"h".asc, $"doc_id".asc)
        docs
          .withColumn("sample_rank", row_number().over(byHash).cast("long"))
          .join(broadcast(quotas), "source")
          .where($"sample_rank" <= $"quota")
          .select($"source", $"doc_id", $"sample_rank", $"quota")
      },
      Some("""WITH h AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM documents),
        |q AS (SELECT source, COUNT(*) // 10 AS quota FROM h GROUP BY 1),
        |r AS (SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC)
        |      AS sample_rank
        |  FROM h)
        |SELECT r.source, r.doc_id, r.sample_rank, q.quota
        |FROM r JOIN q USING (source)
        |WHERE r.sample_rank <= q.quota""".stripMargin)),

    // ── Equi-width histogram of document length per source: bin =
    //    min(n_chars div 50, 11) — fixed bin edges, so the histogram of two
    //    corpus shards merges by adding counts (the reason equi-width beats
    //    equi-depth for distributed profiling dashboards). One keyed agg
    //    with map-side partials plus a 20-row broadcast join for the
    //    per-source fractions; the scan reads exactly two columns.
    QueryDef(
      "q101_histogram",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
          .select($"source",
            least(expr(s"n_chars div $HistWidth"), lit(HistCap.toLong))
              .cast("int").as("bin"))
        val hist = docs.groupBy($"source", $"bin")
          .agg(count(lit(1)).as("n_docs"))
        val totals = hist.groupBy($"source")
          .agg(sum($"n_docs").as("n_total"))
        hist.join(broadcast(totals), "source")
          .select($"source", $"bin",
            ($"bin" * HistWidth).cast("int").as("bin_lo"),
            when($"bin" < HistCap, ($"bin" + 1) * HistWidth)
              .otherwise(null).cast("int").as("bin_hi"),
            $"n_docs",
            round($"n_docs".cast("double") / $"n_total".cast("double"), 9)
              .as("frac"))
      },
      Some(s"""WITH b AS (
        |  SELECT source,
        |    CAST(LEAST(n_chars // $HistWidth, $HistCap) AS INT) AS bin
        |  FROM documents),
        |hist AS (SELECT source, bin, COUNT(*) AS n_docs FROM b GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_total
        |  FROM hist GROUP BY 1)
        |SELECT h.source, h.bin,
        |  CAST(h.bin * $HistWidth AS INT) AS bin_lo,
        |  CAST(CASE WHEN h.bin < $HistCap THEN (h.bin + 1) * $HistWidth END AS INT)
        |    AS bin_hi,
        |  h.n_docs,
        |  ROUND(CAST(h.n_docs AS DOUBLE) / CAST(t.n_total AS DOUBLE), 9) AS frac
        |FROM hist h JOIN tot t USING (source)""".stripMargin)),

    // ── Equi-depth length deciles per source: NTILE(10) over (n_chars,
    //    doc_id) — the adaptive-bin complement of q101's fixed-width
    //    histogram (equi-width merges across shards; equi-depth adapts to
    //    the distribution). One keyed window per source partition, then a
    //    bounded 200-row agg. At 100 TB with a fat stratum, the swap is
    //    approx_percentile edges (q68's sketch posture) instead of the
    //    per-stratum sort; this exact-rank form is the spec either is
    //    checked against.
    QueryDef(
      "q105_length_deciles",
      (s, dir) => {
        import s.implicits._
        val byLen = Window.partitionBy($"source")
          .orderBy($"n_chars".asc, $"doc_id".asc)
        Tables.documents(s, dir)
          .select($"source", $"doc_id", $"n_chars")
          .withColumn("decile", ntile(10).over(byLen))
          .groupBy($"source", $"decile")
          .agg(count(lit(1)).as("n_docs"),
            min($"n_chars").as("min_chars"),
            max($"n_chars").as("max_chars"))
      },
      Some("""WITH d AS (
        |  SELECT source, doc_id, n_chars,
        |    NTILE(10) OVER (PARTITION BY source ORDER BY n_chars ASC, doc_id ASC)
        |      AS decile
        |  FROM documents)
        |SELECT source, CAST(decile AS INT) AS decile, COUNT(*) AS n_docs,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM d GROUP BY 1, 2""".stripMargin)),

    // ── Simpson concentration / diversity per source: the probability two
    //    random tokens coincide, Σ nᵢ(nᵢ−1) / (N(N−1)) — a log-free
    //    diversity measure (complementing q67's type-token ratio) whose
    //    numerator and denominator are EXACT integer sums, so the only
    //    float op is one final division each (pinned, rounded 1e-9).
    //    Shape: the word-count shuffle (map-side partials) re-aggregated
    //    per source — frequencies never leave integer space; also emits
    //    the top-token share (max nᵢ / N, the boilerplate-domination
    //    signal) from the same pass.
    QueryDef(
      "q106_simpson",
      (s, dir) => {
        import s.implicits._
        val counts = Tables.documents(s, dir)
          .select($"source", explode(TextAnalysis.tokens($"text")).as("token"))
          .groupBy($"source", $"token").agg(count(lit(1)).as("n"))
        counts.groupBy($"source")
          .agg(sum($"n").as("n_tokens"),
            count(lit(1)).as("n_types"),
            sum($"n" * ($"n" - 1L)).as("coincide"),
            max($"n").as("top_n"))
          .select($"source", $"n_tokens", $"n_types",
            round(lit(1.0) - $"coincide".cast("double") /
              ($"n_tokens" * ($"n_tokens" - 1L)).cast("double"), 9)
              .as("simpson_diversity"),
            round($"top_n".cast("double") / $"n_tokens".cast("double"), 9)
              .as("top_token_share"))
      },
      Some("""WITH t AS (
        |  SELECT source,
        |    unnest(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |           ELSE string_split_regex(lower(trim(text)), '\s+') END) AS token
        |  FROM documents),
        |c AS (SELECT source, token, COUNT(*) AS n FROM t GROUP BY 1, 2),
        |s AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |    COUNT(*) AS n_types,
        |    CAST(SUM(n * (n - 1)) AS BIGINT) AS coincide,
        |    CAST(MAX(n) AS BIGINT) AS top_n
        |  FROM c GROUP BY 1)
        |SELECT source, n_tokens, n_types,
        |  ROUND(CAST(1.0 AS DOUBLE) - CAST(coincide AS DOUBLE) /
        |    CAST(n_tokens * (n_tokens - 1) AS DOUBLE), 9) AS simpson_diversity,
        |  ROUND(CAST(top_n AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9)
        |    AS top_token_share
        |FROM s""".stripMargin)),

    // ── Chi-square vocabulary drift per source: how far each source's
    //    word distribution sits from the corpus expectation, over the
    //    top-200 corpus words as the (bounded, broadcastable) feature set
    //    — the log-free statistical cousin of q75's DSIR weights and the
    //    standard "which shard changed?" data-quality monitor. Zero cells
    //    count (a source MISSING a stopword is strong evidence), via the
    //    20×200 source-feature grid left-joined onto observed counts — the
    //    grid is bounded by construction, never corpus-shaped. All counts
    //    stay exact integers; expected = ci·t_s/g is one correctly-rounded
    //    division, and the per-source sum of (o−e)²/e runs in floor-1e9
    //    fixed point (the tavg posture: decimal casts of doubles can tie
    //    HALF_UP vs HALF_EVEN across engines, floor cannot).
    QueryDef(
      "q107_chi2_drift",
      (s, dir) => {
        import s.implicits._
        val oc = Tables.documents(s, dir)
          .select($"source", explode(TextAnalysis.tokens($"text")).as("token"))
          .groupBy($"source", $"token").agg(count(lit(1)).as("n"))
        val feats = oc.groupBy($"token").agg(sum($"n").as("ci"))
          .orderBy($"ci".desc, $"token".asc).limit(200)
        val ofc = oc.join(broadcast(feats), "token")
          .select($"source", $"token", $"n")
        val ts = ofc.groupBy($"source").agg(sum($"n").as("t_s"))
        val g = feats.agg(sum($"ci").as("g"))
        val e = ($"ci" * $"t_s").cast("double") / $"g".cast("double")
        val o = coalesce($"n", lit(0L)).cast("double")
        val term = (o - e) * (o - e) / e
        ts.crossJoin(broadcast(feats))
          .join(ofc, Seq("source", "token"), "left")
          .crossJoin(broadcast(g))
          .groupBy($"source")
          .agg(min($"t_s").as("n_feat_tokens"),
            (sum(floor(term * lit(1e9)).cast("long")).cast("double") / lit(1e9))
              .as("chi2"))
      },
      Some("""WITH t AS (
        |  SELECT source,
        |    unnest(CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |           ELSE string_split_regex(lower(trim(text)), '\s+') END) AS token
        |  FROM documents),
        |oc AS (SELECT source, token, COUNT(*) AS n FROM t GROUP BY 1, 2),
        |feats AS (SELECT token, CAST(SUM(n) AS BIGINT) AS ci FROM oc
        |  GROUP BY 1 ORDER BY ci DESC, token ASC LIMIT 200),
        |ofc AS (SELECT o.source, o.token, o.n FROM oc o JOIN feats USING (token)),
        |ts AS (SELECT source, CAST(SUM(n) AS BIGINT) AS t_s FROM ofc GROUP BY 1),
        |g AS (SELECT CAST(SUM(ci) AS BIGINT) AS g FROM feats),
        |terms AS (
        |  SELECT ts.source, ts.t_s,
        |    CAST(COALESCE(ofc.n, 0) AS DOUBLE) AS o,
        |    CAST(feats.ci * ts.t_s AS DOUBLE) / CAST(g.g AS DOUBLE) AS e
        |  FROM ts CROSS JOIN feats
        |  LEFT JOIN ofc ON ofc.source = ts.source AND ofc.token = feats.token
        |  CROSS JOIN g)
        |SELECT source, MIN(t_s) AS n_feat_tokens,
        |  CAST(SUM(CAST(floor(((o - e) * (o - e) / e) * 1e9) AS BIGINT)) AS DOUBLE)
        |    / 1e9 AS chi2
        |FROM terms GROUP BY source""".stripMargin)),

    // ── Benford first-digit audit of order totals — the fraud/data-entry
    //    anomaly screen: natural multi-scale amounts follow
    //    P(d) = log10(1 + 1/d). The leading digit comes from integer
    //    string arithmetic (floor to cents, BIGINT → string, first char),
    //    never from float formatting, which the two engines render
    //    differently. The irrational expected frequencies enter BOTH
    //    plans as the same 1e9-scaled integer literals (computed once
    //    driver-side), and the observed fractions are integer fixed
    //    point — the compare never touches a log. One scan, one 9-row
    //    agg; the digit-total window runs over 9 post-agg rows.
    QueryDef(
      "q223_benford",
      (s, dir) => {
        import s.implicits._
        val expCase = BenfordExp1e9.zipWithIndex
          .map { case (e, i) => s"WHEN ${i + 1} THEN ${e}L" }
          .mkString("CASE digit ", " ", " ELSE 0L END")
        Tables.orders(s, dir)
          .select(expr(
            "CAST(substring(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)" +
              " AS STRING), 1, 1) AS INT)").as("digit"))
          .groupBy($"digit").agg(count(lit(1)).as("n_orders"))
          .withColumn("obs_1e9",
            expr("n_orders * 1000000000 div sum(n_orders) over ()"))
          .withColumn("exp_1e9", expr(expCase))
          .withColumn("dev_1e9", abs($"obs_1e9" - $"exp_1e9"))
      },
      Some {
        val expCase = BenfordExp1e9.zipWithIndex
          .map { case (e, i) => s"WHEN ${i + 1} THEN $e" }
          .mkString("CASE digit ", " ", " ELSE 0 END")
        s"""WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders),
        |c AS (SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY 1),
        |o AS (
        |  SELECT digit, n_orders,
        |    n_orders * 1000000000 // CAST(SUM(n_orders) OVER () AS BIGINT)
        |      AS obs_1e9
        |  FROM c)
        |SELECT digit, n_orders, obs_1e9,
        |  CAST($expCase AS BIGINT) AS exp_1e9,
        |  abs(obs_1e9 - CAST($expCase AS BIGINT)) AS dev_1e9
        |FROM o""".stripMargin
      }),

    // ── EXACT distributed median without a global sort — the selection
    //    pattern that replaces `ORDER BY + offset` at 100 TB: build the
    //    per-source VALUE histogram (one keyed agg — the domain of
    //    n_chars is bounded, ≪ corpus), cumulative-count along the
    //    value axis (window over distinct values only), and the lower/
    //    upper middle ranks are the first values whose cumulative count
    //    crosses (n+1)÷2 and n÷2+1. Even-count interpolation is one
    //    IEEE (v1+v2)/2 — exactly DuckDB's median()/quantile_cont(0.5)
    //    semantics, which the oracle calls directly: the gate proves
    //    histogram selection ≡ sort-based median. For unbounded/float
    //    domains the first pass coarsens to range buckets and a second
    //    pass recurses within the selected bucket — same shape, still
    //    never a global sort.
    QueryDef(
      "q226_exact_median",
      (s, dir) => {
        import s.implicits._
        val counts = Tables.documents(s, dir)
          .groupBy($"source", $"n_chars".cast("long").as("v"))
          .agg(count(lit(1)).as("c"))
        val tot = counts.groupBy($"source").agg(sum($"c").as("n"))
        val cum = counts
          .withColumn("cum", sum($"c").over(
            Window.partitionBy($"source").orderBy($"v")))
          .join(tot, "source")
        val v1 = cum.where($"cum" >= expr("(n + 1) div 2"))
          .groupBy($"source").agg(min($"v").as("v1"))
        val v2 = cum.where($"cum" >= expr("n div 2 + 1"))
          .groupBy($"source").agg(min($"v").as("v2"))
        tot.join(v1, "source").join(v2, "source")
          .select($"source", $"n".as("n_docs"),
            (($"v1" + $"v2").cast("double") / 2.0).as("median_chars"))
      },
      Some("""SELECT source, COUNT(*) AS n_docs,
        |  median(n_chars) AS median_chars
        |FROM documents GROUP BY source""".stripMargin)),

    // ── Exact interpolated quartiles by the same histogram-crossing
    //    selection as q226, generalized to p = 1/4, 1/2, 3/4: position
    //    p·(n−1) splits into integer rank k = (p·4ths of n−1) div 4 and
    //    an EXACT binary fraction rem/4 (quarters and halves are exact
    //    doubles, which is why p90 is deliberately absent — 0.9·(n−1)
    //    rounds), the two bracketing values come from two cumulative
    //    crossings, and v1 + frac·(v2−v1) is DuckDB's own quantile_cont
    //    interpolation bit for bit. Still no global sort anywhere — the
    //    window runs over distinct values per source.
    QueryDef(
      "q237_exact_quartiles",
      (s, dir) => {
        import s.implicits._
        val counts = Tables.documents(s, dir)
          .groupBy($"source", $"n_chars".cast("long").as("v"))
          .agg(count(lit(1)).as("c"))
        val cum = counts
          .withColumn("cum", sum($"c").over(
            Window.partitionBy($"source").orderBy($"v")))
          .localCheckpoint()
        val tot = counts.groupBy($"source").agg(sum($"c").as("n"))
        val wanted = tot
          .select($"source", $"n",
            explode(expr("array(1, 2, 3)")).as("quarter"))
          .select($"source", $"quarter",
            expr("(quarter * (n - 1)) div 4 + 1").as("r1"),
            expr("least((quarter * (n - 1)) div 4 + 2, n)").as("r2"),
            (expr("(quarter * (n - 1)) % 4").cast("double") / 4.0)
              .as("frac"))
        val v1 = wanted.join(cum, "source").where($"cum" >= $"r1")
          .groupBy($"source", $"quarter").agg(min($"v").as("v1"))
        val v2 = wanted.join(cum, "source").where($"cum" >= $"r2")
          .groupBy($"source", $"quarter").agg(min($"v").as("v2"))
        wanted.join(v1, Seq("source", "quarter"))
          .join(v2, Seq("source", "quarter"))
          .select($"source", ($"quarter".cast("double") / 4.0).as("p"),
            ($"v1".cast("double") +
              $"frac" * ($"v2" - $"v1").cast("double")).as("q_chars"))
      },
      Some("""SELECT source, CAST(0.25 AS DOUBLE) AS p,
        |  quantile_cont(n_chars, 0.25) AS q_chars
        |FROM documents GROUP BY source
        |UNION ALL
        |SELECT source, CAST(0.5 AS DOUBLE) AS p,
        |  quantile_cont(n_chars, 0.5) AS q_chars
        |FROM documents GROUP BY source
        |UNION ALL
        |SELECT source, CAST(0.75 AS DOUBLE) AS p,
        |  quantile_cont(n_chars, 0.75) AS q_chars
        |FROM documents GROUP BY source""".stripMargin)),

    // ── Count-min sketch replayed exactly — the third classic sketch
    //    beside q98's Misra-Gries and q225's HLL, and like them gated by
    //    hash compare, not tolerance: 4 rows × 1024 counters, counter =
    //    SUM of token counts whose row-hash lands there. Sums commute,
    //    so the sketch is merge-order-independent (the q218/q225
    //    argument) and its 4096-cell state is the mergeable per-shard
    //    partial at 100 TB. The point query est = MIN over rows can
    //    only OVERCOUNT (collisions add) — the deterministic half of
    //    the CMS guarantee, emitted per probed token; the probabilistic
    //    ε-bound is reported as the observed overcount, not asserted.
    //    Probes are the exact top-20 tokens (q48's TakeOrdered shape).
    QueryDef(
      "q238_countmin",
      (s, dir) => {
        import s.implicits._
        val tc = Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens($"text")).as("token"))
          .groupBy($"token").agg(count(lit(1)).as("c"))
          .localCheckpoint()
        def bucket(row: org.apache.spark.sql.Column,
            tok: org.apache.spark.sql.Column) =
          TextAnalysis.hash60Fast(s, concat_ws("",
            lit("cms"), row.cast("string"), lit(":"), tok)) % 1024
        val cells = tc
          .select($"token", $"c", explode(expr("array(0, 1, 2, 3)"))
            .as("r"))
          .select($"r", bucket($"r", $"token").as("b"), $"c")
          .groupBy($"r", $"b").agg(sum($"c").as("cell"))
        val top = tc.orderBy($"c".desc, $"token".asc).limit(20)
        top
          .select($"token", $"c", explode(expr("array(0, 1, 2, 3)"))
            .as("r"))
          .select($"token", $"c", $"r", bucket($"r", $"token").as("b"))
          .join(cells, Seq("r", "b"))
          .groupBy($"token")
          .agg(min($"c").as("true_n"), min($"cell").as("est_n"))
          .select($"token", $"true_n", $"est_n",
            ($"est_n" - $"true_n").as("overcount"),
            ($"est_n" >= $"true_n").as("no_undercount"))
      },
      Some("""WITH t AS (
        |  SELECT unnest(CASE WHEN length(trim(text)) = 0
        |      THEN CAST([] AS VARCHAR[])
        |      ELSE string_split_regex(lower(trim(text)), '\s+') END)
        |    AS token
        |  FROM documents),
        |tc AS MATERIALIZED (
        |  SELECT token, COUNT(*) AS c FROM t GROUP BY 1),
        |rows AS (SELECT unnest(generate_series(0, 3)) AS r),
        |cells AS MATERIALIZED (
        |  SELECT r,
        |    ('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || ':'
        |      || token), 1, 15))::BIGINT % 1024 AS b,
        |    CAST(SUM(c) AS BIGINT) AS cell
        |  FROM tc, rows GROUP BY 1, 2),
        |top AS (SELECT token, c FROM tc
        |  ORDER BY c DESC, token ASC LIMIT 20),
        |probe AS (
        |  SELECT token, c, r,
        |    ('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || ':'
        |      || token), 1, 15))::BIGINT % 1024 AS b
        |  FROM top, rows),
        |est AS (
        |  SELECT p.token, MIN(p.c) AS true_n, MIN(cl.cell) AS est_n
        |  FROM probe p JOIN cells cl ON cl.r = p.r AND cl.b = p.b
        |  GROUP BY 1)
        |SELECT token, CAST(true_n AS BIGINT) AS true_n,
        |  CAST(est_n AS BIGINT) AS est_n,
        |  CAST(est_n - true_n AS BIGINT) AS overcount,
        |  est_n >= true_n AS no_undercount
        |FROM est""".stripMargin)),

    // ── Tukey-fence outlier audit — the boxplot rule composed from
    //    q237's exact quartiles: fences at Q1 − 1.5·IQR / Q3 + 1.5·IQR
    //    (quarter-valued doubles, so the fence arithmetic is the same
    //    IEEE tree in both engines), one broadcast join back onto the
    //    corpus, and a per-source count of each tail. The distribution
    //    screen that decides whether a length filter needs a manual
    //    threshold or the data's own spread suffices.
    QueryDef(
      "q239_tukey_fences",
      (s, dir) => {
        import s.implicits._
        val counts = Tables.documents(s, dir)
          .groupBy($"source", $"n_chars".cast("long").as("v"))
          .agg(count(lit(1)).as("c"))
        val cum = counts
          .withColumn("cum", sum($"c").over(
            Window.partitionBy($"source").orderBy($"v")))
          .localCheckpoint()
        val tot = counts.groupBy($"source").agg(sum($"c").as("n"))
        val wanted = tot
          .select($"source", $"n",
            explode(expr("array(1, 3)")).as("quarter"))
          .select($"source", $"quarter",
            expr("(quarter * (n - 1)) div 4 + 1").as("r1"),
            expr("least((quarter * (n - 1)) div 4 + 2, n)").as("r2"),
            (expr("(quarter * (n - 1)) % 4").cast("double") / 4.0)
              .as("frac"))
        val v1 = wanted.join(cum, "source").where($"cum" >= $"r1")
          .groupBy($"source", $"quarter").agg(min($"v").as("v1"))
        val v2 = wanted.join(cum, "source").where($"cum" >= $"r2")
          .groupBy($"source", $"quarter").agg(min($"v").as("v2"))
        val q = wanted.join(v1, Seq("source", "quarter"))
          .join(v2, Seq("source", "quarter"))
          .select($"source", $"quarter",
            ($"v1".cast("double") +
              $"frac" * ($"v2" - $"v1").cast("double")).as("qv"))
        val fences = q.groupBy($"source")
          .agg(min(when($"quarter" === 1, $"qv")).as("q1"),
            min(when($"quarter" === 3, $"qv")).as("q3"))
          .select($"source",
            ($"q1" - lit(1.5) * ($"q3" - $"q1")).as("lo"),
            ($"q3" + lit(1.5) * ($"q3" - $"q1")).as("hi"))
        Tables.documents(s, dir)
          .select($"source", $"n_chars".cast("double").as("x"))
          .join(broadcast(fences), "source")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"x" < $"lo", 1L).otherwise(0L)).as("n_low"),
            sum(when($"x" > $"hi", 1L).otherwise(0L)).as("n_high"),
            min($"lo").as("fence_lo"), min($"hi").as("fence_hi"))
      },
      Some("""WITH q AS (
        |  SELECT source,
        |    quantile_cont(n_chars, 0.25) AS q1,
        |    quantile_cont(n_chars, 0.75) AS q3
        |  FROM documents GROUP BY source),
        |f AS (
        |  SELECT source, q1 - 1.5 * (q3 - q1) AS lo,
        |    q3 + 1.5 * (q3 - q1) AS hi
        |  FROM q)
        |SELECT d.source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN CAST(d.n_chars AS DOUBLE) < f.lo
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN CAST(d.n_chars AS DOUBLE) > f.hi
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        |  MIN(f.lo) AS fence_lo, MIN(f.hi) AS fence_hi
        |FROM documents d JOIN f ON d.source = f.source
        |GROUP BY d.source""".stripMargin)),

    // ── Equi-DEPTH histogram of order totals — the bin structure a
    //    cardinality estimator keeps (where q101 keeps equi-WIDTH):
    //    8 bins of equal row count via NTILE over the totally ordered
    //    (cents, orderkey) axis — the tie-break key makes bin edges
    //    deterministic even where a popular value straddles a boundary.
    //    Output is 8 rows of [lo, hi, n]. The global rank is the q203
    //    posture: at 100 TB the edges come from approx_percentile and
    //    the bins from one broadcast-join pass.
    QueryDef(
      "q243_equidepth_hist",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .select($"o_orderkey",
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
          .withColumn("bin", ntile(8).over(
            Window.orderBy($"cents".asc, $"o_orderkey".asc)))
          .groupBy($"bin")
          .agg(min($"cents").as("lo"), max($"cents").as("hi"),
            count(lit(1)).as("n_orders"))
      },
      Some("""WITH c AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |b AS (
        |  SELECT cents,
        |    CAST(NTILE(8) OVER (ORDER BY cents ASC, o_orderkey ASC)
        |      AS INT) AS bin
        |  FROM c)
        |SELECT bin, MIN(cents) AS lo, MAX(cents) AS hi,
        |  COUNT(*) AS n_orders
        |FROM b GROUP BY bin""".stripMargin)),

    // ── SKETCH-edged equi-depth histogram — the gated 100 TB path for the
    //    global-NTILE family (q105/q152/q229/q232/q243, whose comments all
    //    name this swap): bin edges come from ONE mergeable
    //    Greenwald-Khanna sketch pass (approx_percentile at 7 octile
    //    fractions, fixed-size partials that partial-agg map-side), and
    //    binning is ONE broadcast of the 7 edges onto the scan — no global
    //    sort anywhere in the sketch path. Gated q68-style because sketch
    //    values aren't bit-replayable across engines: the hash-compared
    //    columns are the EXACT ntile bins (bin/lo/hi/count — the
    //    verification harness, identical in both engines), and the sketch
    //    path collapses to in-window booleans evaluated in-engine:
    //    `edge_rank_ok` asserts each sketch edge's true rank window
    //    overlaps its target octile within GK's guarantee (rank error
    //    ≤ n/10000, asserted with 10x headroom), and `sketch_n_ok`
    //    asserts each sketch bin's population is within the provable
    //    2·rank-error + edge-tie-mass + 1 envelope of the exact ntile
    //    count. The oracle emits literal TRUE — a drifting sketch fails
    //    the hash gate loudly. All arithmetic is integer cross-multiplied
    //    (8000·rank vs n·(1000·b ± 8)); no float enters any boolean.
    QueryDef(
      "q253_sketch_equidepth",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.Column
        val c = Tables.orders(s, dir)
          .select($"o_orderkey",
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
        // sketch pass 1: the 7 octile edges from one GK aggregate
        val edges = c.agg(percentile_approx($"cents",
            array((1 to 7).map(k => lit(k / 8.0)): _*), lit(10000))
            .as("es"))
          .select((1 to 7).map(k => element_at($"es", k).as(s"e$k")): _*)
        // sketch pass 2 (the "binning" broadcast join): exact ranks and
        // tie masses of each edge in ONE scan — lt/le per edge are
        // codegen'd conditional sums, also the per-bin populations
        // (bin b = le_b − le_{b−1})
        val rankCols = Seq(count(lit(1)).as("n")) ++ (1 to 7).flatMap { k =>
          Seq(sum(when($"cents" < col(s"e$k"), 1L).otherwise(0L))
              .as(s"lt_$k"),
            sum(when($"cents" <= col(s"e$k"), 1L).otherwise(0L))
              .as(s"le_$k"))
        }
        val ranks = c.crossJoin(broadcast(edges))
          .agg(rankCols.head, rankCols.tail: _*)
        // exact ntile harness (q243's plan): deterministic via the
        // (cents, orderkey) total order; hash-compared across engines
        val exact = c
          .withColumn("bin", ntile(8).over(
            Window.orderBy($"cents".asc, $"o_orderkey".asc)))
          .groupBy($"bin")
          .agg(min($"cents").as("lo"), max($"cents").as("hi"),
            count(lit(1)).as("n_orders"))
        def perBin(f: Int => Column): Column =
          (1 to 8).foldLeft(lit(null).cast("long")) { (acc, b) =>
            when($"bin" === b, f(b)).otherwise(acc)
          }
        def leC(k: Int): Column =
          if (k == 0) lit(0L) else if (k == 8) $"n" else col(s"le_$k")
        def eqC(k: Int): Column =
          if (k == 0 || k == 8) lit(0L)
          else col(s"le_$k") - col(s"lt_$k")
        val nSk = perBin(b => leC(b) - leC(b - 1))
        // provable envelope: |sketch bin − n/8| ≤ 2·εn + adjacent edge
        // ties, |exact bin − n/8| ≤ 1; ε = 1e-4 with 10x headroom
        val tol = perBin(b => lit(2L) * expr("n div 1000") +
          eqC(b - 1) + eqC(b) + lit(1L))
        val ltB = perBin(b => if (b == 8) lit(0L) else col(s"lt_$b"))
        val leB = perBin(b => if (b == 8) lit(0L) else col(s"le_$b"))
        val bL = $"bin".cast("long")
        val edgeOk = when($"bin" === 8, lit(true)).otherwise(
          ltB * 8000L <= $"n" * (bL * 1000L + 8L) &&
            leB * 8000L >= $"n" * (bL * 1000L - 8L))
        exact.crossJoin(broadcast(ranks))
          .select($"bin", $"lo", $"hi", $"n_orders",
            (abs(nSk - $"n_orders") <= tol).as("sketch_n_ok"),
            edgeOk.as("edge_rank_ok"))
      },
      Some("""WITH c AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |b AS (
        |  SELECT cents,
        |    CAST(NTILE(8) OVER (ORDER BY cents ASC, o_orderkey ASC)
        |      AS INT) AS bin
        |  FROM c)
        |SELECT bin, MIN(cents) AS lo, MAX(cents) AS hi,
        |  COUNT(*) AS n_orders, TRUE AS sketch_n_ok, TRUE AS edge_rank_ok
        |FROM b GROUP BY bin""".stripMargin)),

    // ── Grouped top-k WITHOUT the window sort — the native bounded-heap
    //    aggregate ([[graft.functions.TopKAgg]]) run as the 100 TB form of
    //    the W6 family: per source, the 5 longest documents under the
    //    strict order (n_chars DESC, doc_id ASC). The idiomatic
    //    row_number window shuffles every row of every group and sorts
    //    each partition (WindowGroupLimit caps it at k per task but the
    //    sort remains); the aggregate's PARTIAL heaps bound map-side
    //    state and shuffle width to k pairs per group per task, and a
    //    strict total order (doc_id unique) makes partial-merge EXACTLY
    //    the global top-k under any layout — so unlike the sketch gates
    //    this hash-compares directly against the window oracle, no
    //    booleans needed. PlanShapeSpec pins the plan: ObjectHashAggregate
    //    partial/final, zero WindowExec. TopKAggSpec proves layout
    //    independence (1/7/64 partitions, reversed input) against a
    //    sort-based reference.
    QueryDef(
      "q254_group_topk",
      (s, dir) => {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        Tables.documents(s, dir)
          .groupBy($"source")
          .agg(call_function("top_k", $"n_chars", $"doc_id", lit(5))
            .as("tk"))
          .select($"source", posexplode($"tk"))
          .select($"source", ($"pos" + 1).cast("int").as("rnk"),
            $"col.key".as("n_chars"), $"col.id".as("doc_id"))
      },
      Some("""SELECT source, CAST(rn AS INT) AS rnk, n_chars, doc_id
        |FROM (
        |  SELECT source, n_chars, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents)
        |WHERE rn <= 5""".stripMargin)),

    // ── Deterministic per-group uniform sample via BOTTOM-k of a salted
    //    md5 hash — the KMV (k-minimum-values) posture: the k smallest
    //    hashes of a group are a mergeable uniform sample (any partition
    //    split of the group yields partial bottom-k sets whose merge is
    //    the global bottom-k, the same argument q254 proves for top-k —
    //    this IS q254's native bounded-heap aggregate, fed the NEGATED
    //    hash). Three properties a random()-based sample can't give:
    //    reproducible across runs/engines, mergeable map-side (k ids per
    //    group per task, no shuffle of the corpus), and consistent under
    //    appends (a new doc evicts at most one sample member). The same
    //    state doubles as a distinct-count estimator (KMV) and rides
    //    Complete-mode streaming unchanged (EventStream.topKStream).
    //    Hash-compared directly against the window oracle.
    QueryDef(
      "q260_bottomk_sample",
      (s, dir) => {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        val h = graft.ext.TextAnalysis.hash60Fast(s,
          concat(lit("samp:"), $"doc_id".cast("string")))
        Tables.documents(s, dir)
          .select($"source", $"doc_id", h.as("h"))
          .groupBy($"source")
          .agg(call_function("top_k", -$"h", $"doc_id", lit(8)).as("tk"))
          .select($"source", posexplode($"tk"))
          .select($"source", ($"pos" + 1).cast("int").as("rnk"),
            (-$"col.key").as("h"), $"col.id".as("doc_id"))
      },
      Some("""SELECT source, CAST(rn AS INT) AS rnk, h, doc_id
        |FROM (
        |  SELECT source, h, doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY h ASC, doc_id ASC) AS rn
        |  FROM (SELECT source, doc_id,
        |    ('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |    FROM documents))
        |WHERE rn <= 8""".stripMargin)),

    // ── KMV set-operation estimation — the sketch operation HLL cannot
    //    give: per-source vocabularies as bottom-64 hash sketches, and
    //    per pair the INTERSECTION estimate from the union's bottom-k
    //    (count members of both sketches inside it), side by side with
    //    the exact intersection/union/Jaccard. Everything is integer and
    //    hash-replayable, so the ESTIMATES hash-compare directly — no
    //    error-bound booleans needed (the stronger form of the q68
    //    posture). Distinct-union estimate (k−1)·2⁶⁰/h_k computes the
    //    product in 38-digit decimal (HUGEINT on the oracle side) and
    //    divides ONCE — dividing 2⁶⁰ by h_k first would truncate the
    //    ratio to an integer and collapse unions just above k to ~k−1
    //    (up to ~50% bias); the widened single division is exact, and
    //    the result fits BIGINT because h_k ≥ k−1 whenever the
    //    full-sketch branch fires (64 distinct hashes ≤ h_k). Scale: sketches
    //    are 64 longs per source forever and MERGEABLE (union = bottom-k
    //    of concatenation — q260's append argument); the pair window
    //    runs over ≤ 2k rows per source pair, never over vocabularies;
    //    only the EXACT side (the gate's truth) touches the full
    //    h-keyed vocab join, and a production run would drop it.
    QueryDef(
      "q282_kmv_intersect",
      (s, dir) => {
        import s.implicits._
        graft.functions.GraftFunctions.register(s)
        val vocab = Tables.documents(s, dir)
          .select($"source", TextAnalysis.tokens($"text").as("_w"))
          .select($"source",
            explode(TextAnalysis.shinglesFromTokens($"_w")).as("shingle"))
          .select($"source",
            TextAnalysis.hash60Fast(s, $"shingle").as("h"))
          .distinct()
          .localCheckpoint()
        val sizes = vocab.groupBy($"source").agg(count(lit(1)).as("n"))
        val kmv = vocab.groupBy($"source")
          .agg(call_function("top_k", -$"h", $"h", lit(KmvK)).as("tk"))
          .select($"source", explode($"tk").as("e"))
          .select($"source", $"e.id".as("h"))
        // `sizes` here is one row per SOURCE (the catalog of corpora), not
        // per document — a dim-bounded frame, unlike the per-doc sizes
        // frames the dedup verify joins must never hint. The hint is load-
        // bearing: sa<sb is a theta-join, so the broadcast nested loop IS
        // the plan (the pair enumeration is O(S²) by design — KMV pairwise).
        val pairs = sizes.select($"source".as("sa"), $"n".as("n_a"))
          .join(broadcast(sizes.select($"source".as("sb"), $"n".as("n_b"))),
            $"sa" < $"sb")
        val pool = pairs.select($"sa", $"sb")
          .join(kmv.select($"source".as("sa"), $"h"), Seq("sa"))
          .withColumn("ina", lit(1L)).withColumn("inb", lit(0L))
          .unionByName(pairs.select($"sa", $"sb")
            .join(kmv.select($"source".as("sb"), $"h"), Seq("sb"))
            .withColumn("ina", lit(0L)).withColumn("inb", lit(1L)))
          .groupBy($"sa", $"sb", $"h")
          .agg(max($"ina").as("ina"), max($"inb").as("inb"))
        val w = Window.partitionBy($"sa", $"sb").orderBy($"h".asc)
        val est = pool
          .withColumn("rn", row_number().over(w))
          .where($"rn" <= KmvK)
          .groupBy($"sa", $"sb")
          .agg(count(lit(1)).as("k_used"),
            sum($"ina" * $"inb").as("est_inter_k"),
            max($"h").as("h_k"))
          .withColumn("est_j_1e6",
            expr("est_inter_k * 1000000 div k_used"))
          .withColumn("est_union",
            when($"k_used" < KmvK, $"k_used")
              .otherwise(expr(
                s"CAST((CAST(${KmvK - 1} AS DECIMAL(38,0)) * " +
                  "1152921504606846976) div h_k AS BIGINT)")))
          .drop("h_k")
        val inter = vocab.as("a")
          .join(vocab.as("b"),
            $"a.h" === $"b.h" && $"a.source" < $"b.source")
          .groupBy($"a.source".as("sa"), $"b.source".as("sb"))
          .agg(count(lit(1)).as("exact_inter"))
        pairs
          .join(inter, Seq("sa", "sb"), "left")
          .na.fill(0L, Seq("exact_inter"))
          .withColumn("exact_union", $"n_a" + $"n_b" - $"exact_inter")
          .withColumn("j_1e6",
            expr("exact_inter * 1000000 div exact_union"))
          .join(est, Seq("sa", "sb"))
          .withColumnRenamed("sa", "source_a")
          .withColumnRenamed("sb", "source_b")
      },
      Some(s"""WITH t AS (
        |  SELECT source,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(lower(trim(text)), '\\s+') END
        |      AS w
        |  FROM documents),
        |v AS (
        |  SELECT DISTINCT source,
        |    ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        |  FROM (
        |    SELECT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
        |    FROM (SELECT source, w,
        |          unnest(generate_series(1, len(w) - 2)) AS i FROM t))),
        |sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM v GROUP BY 1),
        |kmv AS (
        |  SELECT source, h FROM (
        |    SELECT source, h,
        |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY h ASC) AS rn
        |    FROM v)
        |  WHERE rn <= $KmvK),
        |pr AS (
        |  SELECT a.source AS sa, b.source AS sb, a.n AS n_a, b.n AS n_b
        |  FROM sz a JOIN sz b ON a.source < b.source),
        |pool AS (
        |  SELECT sa, sb, h,
        |    CAST(MAX(ina) AS BIGINT) AS ina, CAST(MAX(inb) AS BIGINT) AS inb
        |  FROM (
        |    SELECT p.sa, p.sb, k.h, 1 AS ina, 0 AS inb
        |    FROM pr p JOIN kmv k ON k.source = p.sa
        |    UNION ALL
        |    SELECT p.sa, p.sb, k.h, 0, 1
        |    FROM pr p JOIN kmv k ON k.source = p.sb)
        |  GROUP BY 1, 2, 3),
        |est AS (
        |  SELECT sa, sb, CAST(COUNT(*) AS BIGINT) AS k_used,
        |    CAST(SUM(ina * inb) AS BIGINT) AS est_inter_k,
        |    MAX(h) AS h_k
        |  FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY sa, sb
        |      ORDER BY h ASC) AS rn
        |    FROM pool)
        |  WHERE rn <= $KmvK GROUP BY 1, 2),
        |ex AS (
        |  SELECT a.source AS sa, b.source AS sb,
        |    CAST(COUNT(*) AS BIGINT) AS exact_inter
        |  FROM v a JOIN v b ON a.h = b.h AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT p.sa AS source_a, p.sb AS source_b, p.n_a, p.n_b,
        |  COALESCE(ex.exact_inter, 0) AS exact_inter,
        |  p.n_a + p.n_b - COALESCE(ex.exact_inter, 0) AS exact_union,
        |  COALESCE(ex.exact_inter, 0) * 1000000
        |    // (p.n_a + p.n_b - COALESCE(ex.exact_inter, 0)) AS j_1e6,
        |  e.k_used, e.est_inter_k,
        |  e.est_inter_k * 1000000 // e.k_used AS est_j_1e6,
        |  CASE WHEN e.k_used < $KmvK THEN e.k_used
        |       ELSE CAST((CAST(${KmvK - 1} AS HUGEINT)
        |                  * 1152921504606846976) // e.h_k AS BIGINT)
        |       END AS est_union
        |FROM pr p
        |LEFT JOIN ex ON ex.sa = p.sa AND ex.sb = p.sb
        |JOIN est e ON e.sa = p.sa AND e.sb = p.sb""".stripMargin)),

    // ── Subsampling confidence interval (Politis–Romano) with ZERO
    //    randomness: 32 deterministic half-samples by salted hash (the
    //    q63 membership contract — resample b keeps doc d iff
    //    hash('bs:'b':'d) is even), each half-sample's mean document
    //    length from exact BIGINT sums, and the CI is the 2nd/31st
    //    order statistic of the 32 resample means. The uncertainty
    //    number every profiling report should carry, reproducible on
    //    any cluster at any parallelism. Scale: ONE corpus scan fans
    //    out ×32 map-side (explode of a literal sequence — no shuffle
    //    until the 32-row rollup), the rank window runs over 32
    //    post-agg rows (bounded by construction, the W3 argument).
    QueryDef(
      "q283_subsample_ci",
      (s, dir) => {
        import s.implicits._
        val d = Tables.documents(s, dir).select($"doc_id", $"n_chars")
        val means = d
          .select($"doc_id", $"n_chars",
            explode(sequence(lit(0), lit(SubsampleB - 1))).as("b"))
          .where(pmod(TextAnalysis.hash60(concat(lit("bs:"),
            $"b".cast("string"), lit(":"), $"doc_id".cast("string"))),
            lit(2L)) === 0L)
          .groupBy($"b")
          .agg(count(lit(1)).as("nb"), sum($"n_chars").as("sb"))
          .select($"b",
            ($"sb".cast("double") / $"nb".cast("double")).as("mb"))
        val w = Window.orderBy($"mb".asc, $"b".asc)
        val ranked = means.withColumn("rn", row_number().over(w))
        d.agg(count(lit(1)).as("n_docs"),
            (sum($"n_chars").cast("double") /
              count(lit(1)).cast("double")).as("mean_chars"))
          .crossJoin(broadcast(ranked.where($"rn" === 2)
            .select($"mb".as("lo_mean"))))
          .crossJoin(broadcast(ranked.where($"rn" === SubsampleB - 1)
            .select($"mb".as("hi_mean"))))
          .withColumn("n_resamples", lit(SubsampleB).cast("long"))
      },
      Some(s"""WITH r AS (
        |  SELECT b, CAST(COUNT(*) AS BIGINT) AS nb,
        |    CAST(SUM(n_chars) AS BIGINT) AS sb
        |  FROM documents,
        |    (SELECT unnest(generate_series(0, ${SubsampleB - 1})) AS b)
        |  WHERE ('0x' || substr(md5('bs:' || CAST(b AS VARCHAR) || ':'
        |      || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
        |  GROUP BY b),
        |m AS (SELECT b, CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb
        |  FROM r),
        |rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY mb ASC, b ASC) AS rn
        |  FROM m),
        |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS mean_chars
        |  FROM documents)
        |SELECT f.n_docs, f.mean_chars, lo.mb AS lo_mean, hi.mb AS hi_mean,
        |  CAST($SubsampleB AS BIGINT) AS n_resamples
        |FROM f,
        |  (SELECT mb FROM rk WHERE rn = 2) lo,
        |  (SELECT mb FROM rk WHERE rn = ${SubsampleB - 1}) hi"""
        .stripMargin))
  )

  /** Subsampling-CI resample count: 32 deterministic half-samples; the
    * CI reads the 2nd and 31st order statistics (≈ the 5/95 band). */
  val SubsampleB = 32

  /** KMV sketch size: bottom-64 hashes per source — fixed-size,
    * mergeable, and shared by the intersection estimator and the
    * distinct-union estimator ((k−1)·2⁶⁰/h_k). */
  val KmvK = 64

  /** Benford expected first-digit frequencies log10(1 + 1/d), d = 1..9,
    * floor-scaled to 1e9 — irrational, so both engines consume these same
    * integer literals and no log is evaluated at query time.
    */
  val BenfordExp1e9: Seq[Long] =
    (1 to 9).map(d => math.floor(math.log10(1.0 + 1.0 / d) * 1e9).toLong)
}
