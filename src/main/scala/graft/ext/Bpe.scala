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
    *
    * Two identical-output execution paths (PropertySpec pins equality):
    *
    *  - vocabularies ≤ `maxDriverTypes` collect to the driver and train
    *    in memory — ONE distributed corpus word-count pass, then a merge
    *    loop over the bounded vocabulary. This is how production BPE
    *    trainers work (the vocab is a derived control-plane artifact like
    *    the k-means‖ candidate set, NOT corpus data: even 100 TB of text
    *    yields vocab rows bounded by distinct word types); it removes 2
    *    driver-paced cluster jobs per merge round.
    *  - larger vocabularies run the distributed loop: per round one
    *    pair-count aggregation over the (vocab-bounded) word table and a
    *    1-row top-pair collect (scalar control flow), with per-round
    *    checkpoints to cut lineage.
    */
  def trainMerges(words: DataFrame, nMerges: Int,
      maxDriverTypes: Long = 4000000L): (Seq[Merge], DataFrame) = {
    val vocab = words.select(col("token"), col("freq"))
      .localCheckpoint() // materialize the corpus word-count agg exactly once
    if (vocab.count() <= maxDriverTypes) {
      val spark = words.sparkSession
      import spark.implicits._
      val rows = vocab.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val (merges, segs) = trainLocal(rows, nMerges)
      (merges, segs.toDF("token", "enc", "freq").localCheckpoint())
    } else trainDistributed(vocab, nMerges)
  }

  /** In-memory merge loop (bit-identical to the distributed rounds: same
    * pair counts, same (freq DESC, lhs, rhs) winner, same left-to-right
    * non-overlapping merge application).
    */
  private def trainLocal(words: Seq[(String, Long)], nMerges: Int)
      : (Seq[Merge], Seq[(String, String, Long)]) = {
    def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]; var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += syms(i); i += 1 }
      }
      b.result()
    }
    var ws = words.map { case (w, f) => (w, w.map(_.toString).toVector, f) }
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((_, syms, f) <- ws; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) exhausted = true
      else {
        // pair freqs are positive, so -c never overflows
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        merges += Merge(step, l, r, c)
        ws = ws.map { case (w, syms, f) => (w, applyMerge(syms, l, r), f) }
        step += 1
      }
    }
    val segs = ws.map { case (w, syms, f) =>
      (w, syms.mkString(" ", "  ", " "), f)
    }
    (merges.result(), segs)
  }

  /** The distributed merge loop (vocab too large to collect). */
  private def trainDistributed(vocab: DataFrame, nMerges: Int)
      : (Seq[Merge], DataFrame) = {
    var w = vocab
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
