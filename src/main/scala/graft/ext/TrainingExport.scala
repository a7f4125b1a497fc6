package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-data export sink: the last mile of the curation pipeline,
  * writing the corpus as split-partitioned parquet shards plus a manifest.
  *
  * Composes the engine's gated operators into the on-disk layout a trainer
  * consumes: the q63 salted-hash split (run-independent — the SAME document
  * always lands in the same split on any cluster, any partitioning), token
  * counts for budget accounting, and a `split=train|validation|test`
  * partitioned directory tree so a trainer's reader prunes to its split at
  * the file listing (no scan of the others). `repartition(split, shard)`
  * aligns the in-memory partitioning with the output tree: each task holds
  * exactly one (split, shard) slice, so the writer emits one file per
  * shard — at 100 TB, `shards` scales with corpus size while file sizes
  * stay trainer-friendly, and the write parallelism is shards × splits.
  *
  * The returned manifest (per-split doc/token totals) is re-read from the
  * written files, not echoed from the input — it attests what landed.
  */
object TrainingExport {

  /** Write `docs` (doc_id, source, text) under `outDir`; returns the
    * per-split manifest read back from disk. Deterministic end-to-end:
    * split and shard are hash-of-doc_id properties, file contents are
    * row-identical across reruns (overwrite semantics).
    */
  def writeShards(docs: DataFrame, outDir: String, shards: Int = 4): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val bucket = pmod(TextAnalysis.hash60(
      concat(lit("split:"), $"doc_id".cast("string"))), lit(100)).cast("int")
    val tagged = docs
      .select($"doc_id", $"source", $"text",
        TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"))
      .withColumn("split",
        when(bucket < 80, "train")
          .when(bucket < 90, "validation").otherwise("test"))
      .withColumn("shard",
        pmod(TextAnalysis.hash60(concat(lit("shard:"),
          $"doc_id".cast("string"))), lit(shards)).cast("int"))
    tagged
      .repartition($"split", $"shard")
      .write.mode("overwrite")
      .partitionBy("split")
      .parquet(outDir)
    s.read.parquet(outDir)
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
  }
}
