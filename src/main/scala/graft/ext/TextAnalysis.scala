package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * Everything is built from codegen'd `functions._` expressions — no UDFs —
  * so whole-stage codegen keeps the hot path compiled and the operators
  * scale linearly with input: one narrow map stage, no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased, trimmed text; [] for blank docs. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(lower(trim(text)), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Cross-engine-stable 60-bit hash: first 15 hex chars of md5 as a long.
    * DuckDB twin: ('0x' || substr(md5(x), 1, 15))::BIGINT.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Native-expression form of [[hash60]] (graft.functions.Hash60): same
    * bits straight from the digest, skipping the hex render + base-16
    * parse. Needs a session for function resolution — hot paths that hash
    * hundreds of thousands of shingles/tokens use this one.
    */
  def hash60Fast(spark: org.apache.spark.sql.SparkSession, c: Column): Column = {
    graft.functions.GraftFunctions.register(spark)
    call_function("hash60", c)
  }

  /** Per-(key, bucket) HyperLogLog MAX-ρ registers over an item column:
    * bucket = top 6 bits of the 60-bit md5 hash (64 registers), ρ = first
    * 1-bit position of the remaining 54 via integer bit-length — no float
    * log anywhere. MAX is commutative/associative/IDEMPOTENT, so partials
    * merge in any order and survive at-least-once replay — the property
    * q225/q227 gate in batch and [[graft.streaming.EventStream.hllMaintain]]
    * exploits as a stream.
    */
  def hllRegisters(spark: org.apache.spark.sql.SparkSession,
      items: DataFrame, key: Column, item: Column): DataFrame =
    items
      .select(key.as("source"), hash60Fast(spark, item).as("h"))
      .select(col("source"),
        expr("h div 18014398509481984").as("bucket"),
        expr("h % 18014398509481984").as("w"))
      .select(col("source"), col("bucket"),
        expr("CASE WHEN w = 0 THEN 55 ELSE 55 - length(bin(w)) END")
          .as("rho"))
      .groupBy(col("source"), col("bucket")).agg(max(col("rho")).as("m"))

  /** Driver-side twin of [[hash60]] for deriving deterministic constants
    * (permutation seeds, hyperplane signs) once instead of per row.
    */
  def hash60Java(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")

  /** Punctuation / digit / stopword / whitespace ratios + a composite
    * quality score in [0,1]; mirrors the reference-era heuristics
    * (length + character-class + stopword density).
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("double")
    val nPunct = (len - length(regexp_replace(text, "[.!?,;:]", ""))).cast("double")
    val nDigit = (len - length(regexp_replace(text, "[0-9]", ""))).cast("double")
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("double")
    val punctRatio = when(len > 0, nPunct / len).otherwise(0.0)
    val digitRatio = when(len > 0, nDigit / len).otherwise(0.0)
    val stopRatio = when(nTok > 0, nStop / nTok).otherwise(0.0)
    val avgTokLen = when(nTok > 0,
      length(regexp_replace(trim(text), "\\s+", "")).cast("double") / nTok)
      .otherwise(0.0)
    // bounded sub-scores; deterministic per-row double math
    val lenScore = least(len / 500.0, lit(1.0))
    val stopScore = least(stopRatio * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio * 10.0, lit(0.0))
    val score = lenScore * 0.4 + stopScore * 0.4 + punctPenalty * 0.2
    Seq(
      "n_tokens" -> size(toks),
      "punct_ratio" -> punctRatio,
      "digit_ratio" -> digitRatio,
      "stopword_ratio" -> stopRatio,
      "avg_token_len" -> avgTokLen,
      "quality_score" -> score)
  }

  /** Marker-word languages for the n-gram-free heuristic language ID. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "und", "die", "das", "mit"),
    "fr" -> Seq("le", "et", "la", "les", "avec"),
    "es" -> Seq("el", "y", "la", "los", "con"))

  /** Per-language marker-hit ratios and the argmax prediction ("und" for
    * unknown when no marker hits). Ties break in [[langMarkers]] order.
    */
  def langIdColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> when(nTok > 0,
        size(filter(toks, t => t.isin(markers: _*))).cast("double") / nTok)
        .otherwise(0.0)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // when-chain built back-to-front so the FIRST language in langMarkers
    // order wins ties.
    val predFirstWins = scores.reverse.foldLeft(lit("und"): Column) {
      case (acc, (lang, sc)) => when(sc === best && best > 0.0, lang).otherwise(acc)
    }
    scores.map { case (l, c) => s"score_$l" -> c } :+ ("pred_lang" -> predFirstWins)
  }

  /** Content fingerprint: md5 hex of whitespace-normalized lowercase text,
    * plus its 60-bit numeric form for cheap joins (rolling-hash stand-in).
    */
  def fingerprintColumns(text: Column): Seq[(String, Column)] = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    Seq(
      "fp_md5" -> md5(norm),
      "fp_num" -> hash60(norm))
  }

  /** Shingles over an ALREADY-MATERIALIZED token array column. Callers must
    * project `tokens(text)` into a real column first: every `element_at`
    * reference re-embeds its input expression tree, so passing `tokens(text)`
    * directly would re-split the text O(words) times per row.
    */
  def shinglesFromTokens(w: Column, n: Int = 3): Column =
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Word n-gram shingles (default 3); [] when the doc has fewer words.
    * Convenience form for tests/small inputs — hot paths should use
    * [[shinglesFromTokens]] over a materialized token column.
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromTokens(tokens(text), n)

  /** PII patterns (q82): restricted to the syntax subset with identical
    * semantics in Java regex (Spark) and RE2 (DuckDB) — character classes
    * and bounded/unbounded repetition; no backreferences, no lookaround.
    */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val UrlPattern   = "https?://[a-z0-9./_-]+"
  val PhonePattern = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Replace every email/URL/phone match with a typed placeholder (the
    * corpus-scrubbing map stage; order pinned email → URL → phone, though
    * the three patterns cannot overlap: only Email contains '@', only Url
    * starts 'http', only Phone starts '+').
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        UrlPattern, "<URL>"),
      PhonePattern, "<PHONE>")
}
