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
        |FROM hist h JOIN tot t USING (source)""".stripMargin))
  )
}
