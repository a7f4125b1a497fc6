package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training + application over a word-frequency
  * table — the real BPE algorithm (iterative most-frequent-adjacent-pair
  * merging), not just the GPT-2 pre-tokenizer split (q44).
  *
  * Like every production BPE trainer, training runs over word TYPES with
  * frequencies, not over the raw corpus: the corpus-scale work is the one
  * word-count shuffle that builds the vocabulary; each merge round then
  * aggregates a table bounded by |vocab| × word-length — at 100 TB of text
  * the vocabulary is millions of rows, so rounds are sub-second cluster
  * work. The chosen pair per round is a single scalar decision collected to
  * the driver (control-plane, like a ledger max-id — NOT a data collect).
  *
  * Symbol sequences are encoded as strings — `' a  b  c '` (each symbol
  * wrapped in single spaces, double space between symbols, symbols contain
  * no whitespace) — so that applying merge (l, r) is the plain string
  * replace `' l  r ' → ' lr '`: left-to-right, non-overlapping, exactly
  * BPE's merge order, and the double-space invariant means adjacent
  * occurrences never share a boundary character (`a a a a → aa aa`, not
  * `aa a a`). Spark's `replace` and DuckDB's `replace` share these
  * semantics, which is what makes training replayable by the oracle.
  */
object Bpe {

  final case class Merge(step: Int, lhs: String, rhs: String, freq: Long)

  /** `'abc'` → `' a  b  c '` (initial one-symbol-per-character encoding). */
  def encode(token: Column): Column =
    regexp_replace(token, "(.)", " $1 ")

  /** Symbol list from an encoded string. */
  def symbols(enc: Column): Column = split(trim(enc), "  ")

  /** Adjacent (lhs, rhs) symbol pairs of an encoded word, as struct rows. */
  private def adjacentPairs(enc: Column): Column = {
    val s = symbols(enc)
    zip_with(
      slice(s, lit(1), size(s) - 1),
      slice(s, lit(2), size(s) - 1),
      (a, b) => struct(a.as("lhs"), b.as("rhs")))
  }

  /** Train `nMerges` BPE merges over `words(token, freq)`; tokens must be
    * whitespace-free. Returns the merge table and the final per-token
    * segmentation `(token, enc, freq)`. Deterministic: per round the
    * (freq DESC, lhs ASC, rhs ASC) top pair wins.
    */
  def trainMerges(words: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    var w = words
      .select(col("token"), encode(col("token")).as("enc"), col("freq"))
      .localCheckpoint() // iterative loop: cut lineage each round
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = w
        .select(explode(adjacentPairs(col("enc"))).as("p"), col("freq"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("freq")).as("pair_freq"))
        .orderBy(col("pair_freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true // every word fully merged
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, l, r, f)
        w = w.withColumn("enc",
            replace(col("enc"), lit(s" $l  $r "), lit(s" $l$r ")))
          .localCheckpoint()
        step += 1
      }
    }
    (merges.result(), w)
  }
}
