package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection operators for training-corpus curation. */
object Selection {

  /** DSIR-style importance scores (Xie et al. 2023, arXiv:2302.03169) of
    * every NON-target document against a target pool, with hashed n-gram
    * features. Letter-run tokens are 60-bit-hashed into `numFeatures`
    * buckets; each feature carries the INTEGER cross-difference weight
    * w_f = tcount_f·R − rcount_f·T (the same sign as the likelihood-ratio
    * test p_target(f) > p_raw(f), but exact DECIMAL(38,0) arithmetic at
    * any corpus scale — the paper's log ratio is libm-dependent); a doc's
    * score is the exact decimal sum of its token weights, converted once
    * to double. Returns (idCol, n_tokens, dsir_score, target_like).
    *
    * Scale shape: the feature table is `numFeatures` rows BY CONSTRUCTION
    * (broadcast at any corpus size), totals are a 1-row agg over it, and
    * the corpus sees two narrow explode passes plus one per-doc agg.
    */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, numFeatures: Int = 1024): DataFrame = {
    val s = docs.sparkSession
    val toks = docs
      .select(col(idCol), isTarget.as("_tgt"),
        explode(regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0)))
          .as("_token"))
      .withColumn("_f",
        pmod(TextAnalysis.hash60Fast(s, col("_token")), lit(numFeatures.toLong)))
      .select(col(idCol), col("_tgt"), col("_f"))
    val feat = toks.groupBy(col("_f")).agg(
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("_tc"),
      sum(when(!col("_tgt"), 1L).otherwise(0L)).as("_rc"))
    val tot = feat.agg(sum(col("_tc")).as("_tt"), sum(col("_rc")).as("_rt"))
    val w = feat.crossJoin(broadcast(tot))
      .select(col("_f"),
        (col("_tc").cast("decimal(19,0)") * col("_rt").cast("decimal(19,0)") -
          col("_rc").cast("decimal(19,0)") * col("_tt").cast("decimal(19,0)"))
          .as("_w"))
    val per = toks.where(!col("_tgt"))
      .join(broadcast(w), "_f")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("_w")).as("_score"))
    docs.where(isTarget === false).select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("_score").cast("double"), lit(0.0)).as("dsir_score"))
      .withColumn("target_like", col("dsir_score") > 0.0)
  }
}
