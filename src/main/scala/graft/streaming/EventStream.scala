package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table shape (SURVEY.md §2.8: the
  * reference is batch-only with a load_id ledger; streaming is the
  * forward-looking extension the driver's north star asks for).
  *
  * Design: `readStream` over a directory (files arriving = micro-batches;
  * `Trigger.AvailableNow` reproduces the reference's "process everything
  * pending then stop" semantics), event-time watermarks bound state, and
  * the same aggregation functions as the batch path so streaming/batch
  * parity is testable (StreamingSpec).
  */
object EventStream {

  /** events schema as landed by an external producer (ts already micros). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * state: the streaming twin of the batch hourly rollup (q43). At scale,
    * state is partitioned by (window, event_type) — bounded keys.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("hour_ts"), col("event_type"),
        col("n_events"), col("total_value"))

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserActivity(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user activity
    * (the shape for sessionization / per-entity accumulators the built-in
    * windows can't express). NoTimeout here: state is bounded by the key
    * domain (users); a production sessionizer would use
    * EventTimeTimeout + a watermark to expire idle keys.
    */
  def userActivity(events: DataFrame): Dataset[UserActivity] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserActivity]) =>
          val prev = state.getOption.getOrElse(UserActivity(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          it.foreach { e => n += 1; tot += e.value }
          val next = UserActivity(uid, n, tot)
          state.update(next)
          next
      }
  }

  /** Session event with microsecond-exact time (java.sql.Timestamp in
    * [[UserEvent]] drops sub-millisecond precision, which would desync
    * session bounds from the batch plan). */
  case class SessEvent(user_id: Long, ts: java.time.Instant, value: Double)
  /** Open session being accumulated in keyed state (epoch MICROS). */
  case class OpenSession(user_id: Long, start: Long, end: Long,
      n: Long, total: Double)
  /** A closed session, emitted when the gap passes or state times out. */
  case class SessionRow(user_id: Long, session_start: java.time.Instant,
      session_end: java.time.Instant, n_events: Long, session_value: Double)

  /** Streaming sessionization with the SAME gap semantics as the batch
    * q26 plan (new session when >gap since the previous event), expressed
    * as flatMapGroupsWithState + EventTimeTimeout: state holds at most ONE
    * open session per user, closed sessions are emitted as soon as a
    * same-batch event overshoots the gap, and the watermark fires the
    * timeout that flushes idle sessions — so state is bounded by the
    * number of concurrently-active users, not by history. This is the
    * production upgrade of [[userActivity]]'s NoTimeout accumulator.
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    def instant(us: Long): java.time.Instant =
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
    def micros(i: java.time.Instant): Long =
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    def close(s: OpenSession): SessionRow = SessionRow(
      s.user_id, instant(s.start), instant(s.end), s.n, s.total)
    events.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts"), col("value")).as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val done = close(state.get)
            state.remove()
            Iterator.single(done)
          } else {
            // micro-batch arrival order is not event order — sort the batch
            val evs = it.toArray.sortBy(e => micros(e.ts))
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
            evs.foreach { e =>
              val t = micros(e.ts)
              open = open match {
                case Some(s) if t - s.end <= gapUs =>
                  Some(s.copy(end = math.max(s.end, t), n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed += close(s)
                  Some(OpenSession(uid, t, t, 1L, e.value))
                case None =>
                  Some(OpenSession(uid, t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // GroupState timeout is millisecond-based; round UP so the
              // timeout can never fire a microsecond early
              state.setTimeoutTimestamp((s.end + gapUs) / 1000L + 1L)
            }
            closed.iterator
          }
      }
  }

  /** Streaming exact dedup on event_id: state bounded by the watermark
    * (duplicates are only possible within the lateness window, so expired
    * keys are dropped). The streaming twin of batch `dropDuplicates`.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  case class DebEvent(user_id: Long, event_type: String, event_id: Long,
      us: Long)
  case class DebFlag(user_id: Long, event_type: String, event_id: Long,
      suppressed: Boolean)

  /** Streaming twin of q158's debounce: an event is suppressed when the
    * same (user, type) key fired within the preceding `windowUs`. Keyed
    * state is ONE long (the last event time per key); micro-batch arrival
    * order is not event order, so each batch's group is sorted by
    * (us, event_id) before the state fold — exactly the batch LAG
    * window's order, so flags match the batch q158 bit-for-bit under
    * AvailableNow. At-scale posture: state is #active-keys × 8 bytes;
    * an EventTimeTimeout eviction (as in [[sessionize]]) would bound it
    * to keys active inside the watermark.
    */
  def debounceStream(events: DataFrame,
      windowUs: Long = 5000000L): Dataset[DebFlag] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us")).as[DebEvent]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: (Long, String), it: Iterator[DebEvent],
            state: GroupState[Long]) =>
          val evs = it.toArray.sortBy(e => (e.us, e.event_id))
          var last = state.getOption
          val out = evs.map { e =>
            val sup = last.exists(l => e.us - l <= windowUs)
            last = Some(e.us)
            DebFlag(e.user_id, e.event_type, e.event_id, sup)
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  case class AsofEvent(user_id: Long, event_type: String, event_id: Long,
      ts: java.time.Instant) {
    def us: Long = ts.getEpochSecond * 1000000L + ts.getNano / 1000L
  }
  case class AsofMatch(event_id: Long, user_id: Long, err_us: Long,
      next_click_us: Option[Long], latency_us: Option[Long],
      matched: Boolean)

  /** Streaming forward as-of join — q172's "first click within 5 minutes
    * after each error" as keyed state: per user, pending errors wait in
    * state until either a qualifying click arrives (emit matched) or the
    * EVENT-TIME TIMEOUT fires past the tolerance horizon (emit unmatched)
    * — so every error is emitted exactly once and state per user is
    * bounded by the errors inside one tolerance window (+ lateness).
    * Micro-batch groups are sorted by (us, event_id) before the fold, so
    * under ordered arrival the MATCHED output equals the batch q172
    * RANGE-frame window bit for bit, and unmatched errors emit as soon as
    * any event proves the horizon passed (StreamingSpec pins both). The
    * scale posture of a streaming as-of: state never holds the click side
    * at all — clicks only probe and retire pending errors.
    */
  def asofForwardStream(events: DataFrame,
      toleranceUs: Long = 300000000L): Dataset[AsofMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .where(col("event_type").isin("error", "click")).as[AsofEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[AsofEvent],
            state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) {
            // horizon passed: every pending error is definitively unmatched
            val pending = state.getOption.getOrElse(Nil)
            state.remove()
            pending.sortBy(identity).iterator.map { case (us, id) =>
              AsofMatch(id, user, us, None, None, matched = false)
            }
          } else {
            val evs = it.toArray.sortBy(e => (e.us, e.event_id))
            var pending = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[AsofMatch]
            evs.foreach { e =>
              if (e.event_type == "error") pending ::= (e.us, e.event_id)
              else {
                val (hit, keep) = pending.partition { case (us, _) =>
                  e.us > us && e.us - us <= toleranceUs
                }
                hit.sortBy(identity).foreach { case (us, id) =>
                  out += AsofMatch(id, user, us, Some(e.us),
                    Some(e.us - us), matched = true)
                }
                // clicks also expire pending errors beyond the tolerance
                val (dead, live) = keep.partition(_._1 + toleranceUs < e.us)
                dead.sortBy(identity).foreach { case (us, id) =>
                  out += AsofMatch(id, user, us, None, None, matched = false)
                }
                pending = live
              }
            }
            if (pending.nonEmpty) {
              state.update(pending)
              // wake when event time passes the oldest pending horizon
              state.setTimeoutTimestamp(
                (pending.map(_._1).min + toleranceUs) / 1000L + 1L)
            } else state.remove()
            out.iterator
          }
      }
  }

  /** Filesystem-portable state probe for the foreachBatch maintainers:
    * resolves the path through the Hadoop FileSystem API, so state tables
    * work on HDFS/object-store URIs as well as the local FS a
    * java.io.File probe would silently assume.
    */
  private def stateExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Crash-safer state refresh: write the merged table to a `_tmp` sibling
    * (the plan reads the OLD state files directly while writing NEW files
    * elsewhere — no read-vs-overwrite race, so no checkpoint whose blocks
    * could vanish with an executor), then swap with a delete + rename. A
    * maintainer dying mid-refresh never leaves a half-written table
    * VISIBLE, but the delete→rename window can leave NEITHER table
    * visible (old deleted, complete new still at `_tmp`) — a restart
    * that read the missing path as "no state yet" would silently restart
    * the accumulation from empty, which is why every swap-state
    * maintainer runs [[recoverSwap]] before each state read (per batch
    * and once after termination). Assumes a SINGLE maintaining
    * process per state path — concurrent maintainers would need a real
    * table format's commit protocol, not a directory swap.
    */
  private def swapWrite(spark: SparkSession, df: DataFrame,
      statePath: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(statePath)
    val tmp = new org.apache.hadoop.fs.Path(statePath + "_tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
    ()
  }

  /** Atomic state+ledger commit for the SUM-merged maintainers
    * ([[decayedMaintain]], [[kmeansMaintain]]): the merged cell table and
    * the FULL applied-batch ledger are both written under one `_tmp`
    * commit directory (cells first, ledger last), then the whole
    * directory swaps into place with a single rename. A crash anywhere
    * inside the batch leaves either the previous commit (state AND ledger
    * both say "batch not applied" → replay re-merges once) or the new one
    * (both say "applied" → replay skips) — the state-written-but-ledger-
    * missing window that would double-merge sum state under replay cannot
    * exist, because the two tables are never visible in different
    * versions. The ledger is a handful of longs, so rewriting it whole
    * per commit is free; the appends-based [[dedupMaintain]] gets its
    * exactly-once from per-batch overwrite partitions instead (see its
    * scaladoc). Same single-maintainer caveat as [[swapWrite]].
    */
  private def swapCommit(spark: SparkSession, cells: DataFrame,
      commitP: String, applied: Set[Long], batchId: Long): Unit = {
    val dst = new org.apache.hadoop.fs.Path(commitP)
    val tmp = new org.apache.hadoop.fs.Path(commitP + "_tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    cells.write.mode("overwrite").parquet(commitP + "_tmp/cells")
    import spark.implicits._
    (applied + batchId).toSeq.sorted.toDF("batch_id").coalesce(1)
      .write.mode("overwrite").parquet(commitP + "_tmp/ledger")
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
    ()
  }

  /** Crash recovery for [[swapCommit]]: a missing commit directory next
    * to a `_tmp` is EITHER the delete→rename window of a COMPLETE tmp
    * (every commit after the first — the tmp is fully written before the
    * old commit is touched) OR a first-ever commit that died mid-tmp-write
    * (no dst has ever existed, so the tmp may be half-written). The two
    * are told apart by the tmp's own completeness marker: [[swapCommit]]
    * writes the ledger LAST, so `_tmp/ledger/_SUCCESS` present proves the
    * whole tmp is complete and promoting it is safe; absent, the tmp is
    * garbage from a dead first attempt and is DELETED — promoting it
    * would replay the first batch against state that already holds it
    * (double-merged sums) or leave unreadable half-written cells wedging
    * every restart. A `_tmp` sitting NEXT TO a live commit is a
    * half-written attempt that died mid-write; it is ignored here and
    * clobbered by the next commit. Exercised by StreamingSpec's
    * crash-injection cases (orphan promotion, incomplete-first-tmp
    * deletion, garbage-tmp-beside-live-commit).
    */
  private def recoverCommit(spark: SparkSession, commitP: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(commitP)
    val tmp = new org.apache.hadoop.fs.Path(commitP + "_tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dst) && fs.exists(tmp)) {
      val done = new org.apache.hadoop.fs.Path(
        commitP + "_tmp/ledger/_SUCCESS")
      if (fs.exists(done)) fs.rename(tmp, dst) else fs.delete(tmp, true)
      ()
    }
  }

  /** [[recoverCommit]]'s twin for the single-table [[swapWrite]] states
    * (hll/kmv sketch tables, the CC root map): a missing state dir next
    * to a `_tmp` is either the delete→rename window of a complete swap
    * (promote — the parquet job's own `_SUCCESS` marker proves the tmp
    * complete) or a first-ever write that died mid-tmp (delete; the
    * batch replays against genuinely-empty state, which the idempotent
    * merges absorb). Without this, a crash inside the rename window
    * silently restarted the ACCUMULATION from empty on the next run —
    * the one data-loss hole the swap design left open. Runs before every
    * state read: at each foreachBatch entry and once after termination.
    */
  private def recoverSwap(spark: SparkSession, statePath: String): Unit = {
    val dst = new org.apache.hadoop.fs.Path(statePath)
    val tmp = new org.apache.hadoop.fs.Path(statePath + "_tmp")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dst) && fs.exists(tmp)) {
      val done = new org.apache.hadoop.fs.Path(statePath + "_tmp/_SUCCESS")
      if (fs.exists(done)) fs.rename(tmp, dst) else fs.delete(tmp, true)
      ()
    }
  }

  /** Applied-batch ledger for the REPLAY-IDEMPOTENT maintainers
    * ([[dedupMaintain]]'s partition-overwrite replay, [[ccMaintain]]'s
    * idempotent min-merge): there the ledger only SKIPS work — a batch
    * replayed because its ledger row is missing or unreadable recomputes
    * identical state — so reads tolerate a corrupt ledger by treating it
    * as empty rather than wedging every restart on a half-landed file,
    * and writes rewrite the whole ledger (a handful of longs) through
    * [[swapWrite]]'s tmp-then-rename instead of `mode("append")`, whose
    * task-commit/job-commit crash window can leave a visible partial
    * parquet file. The SUM-merged maintainers must NOT use this pair:
    * for them a lost ledger row means a double-merge, which is exactly
    * why their ledger rides inside [[swapCommit]]'s atomic directory.
    */
  private def readLedger(spark: SparkSession, ledgerP: String): Set[Long] =
    if (!stateExists(spark, ledgerP)) Set.empty
    else
      try spark.read.parquet(ledgerP).select(col("batch_id"))
        .collect().map(_.getLong(0)).toSet
      catch { case scala.util.control.NonFatal(_) => Set.empty }

  private def ledgerCommit(spark: SparkSession, ledgerP: String,
      done: Set[Long], batchId: Long): Unit = {
    import spark.implicits._
    swapWrite(spark,
      (done + batchId).toSeq.sorted.toDF("batch_id").coalesce(1), ledgerP)
  }

  /** The r7 atomic-commit redesign moved sum-merged state from
    * `statePath/{cells,ledger}` to `statePath/commit/{cells,ledger}`
    * with no migration path: a stream restarted over a pre-redesign
    * state directory would silently start from EMPTY state (and an
    * external source checkpoint would prevent re-reading the consumed
    * data), losing the accumulated sums without any error. Fail loudly
    * instead — the operator moves the two tables under `commit/` by
    * hand (they are layout-identical) or starts fresh deliberately.
    */
  private def guardOldLayout(spark: SparkSession, statePath: String,
      commitP: String, who: String, flatLegacy: Boolean = false): Unit = {
    val noCommit =
      !stateExists(spark, commitP) && !stateExists(spark, commitP + "_tmp")
    require(!(stateExists(spark, statePath + "/cells") && noCommit),
      s"$who: pre-atomic-commit state layout at $statePath (cells/ outside " +
        "commit/) — move cells/ and ledger/ under commit/ or start a fresh " +
        "state path; continuing would silently drop the accumulated sums")
    // rollupMaintain's pre-r8 layout was FLAT: swapWrite landed the state
    // parquet at statePath itself (statePath/_SUCCESS + part files), not
    // statePath/cells — the cells/ check above never sees it. Restarting
    // over such a directory would silently restart accumulation from
    // empty, so fail loudly on a flat parquet table with no commit/ dir.
    if (flatLegacy)
      require(!(stateExists(spark, statePath + "/_SUCCESS") && noCommit),
        s"$who: pre-atomic-commit FLAT state layout at $statePath (parquet " +
          "state at the state root, no commit/) — move the table to " +
          "commit/cells (and its ledger to commit/ledger) or start a fresh " +
          "state path; continuing would silently drop the accumulated sums")
  }

  /** Incremental materialized-view maintenance via foreachBatch — q165's
    * merge contract run as a stream: each micro-batch is rolled up to
    * per-type partials (count / exact-decimal sum / max / min) and merged
    * into a parquet state table by re-aggregation (sums add, counts add,
    * extrema compose). The state table is #types rows at any stream
    * length, each refresh touches only the arriving batch, and decimal
    * partials make the merged sum EXACTLY the monolithic sum regardless
    * of how the stream was batched — the warehouse-upsert pattern stated
    * as code. Counts and sums are sum-merged ⇒ not replay-idempotent, so
    * this maintainer carries the same atomically-committed batch-id
    * ledger as [[decayedMaintain]] ([[swapCommit]], one rename covers
    * cells + ledger) — previously it had NO replay guard at all, and a
    * re-presented batch id would have double-counted every partial.
    * Returns the final state table.
    */
  def rollupMaintain(spark: SparkSession, events: DataFrame,
      statePath: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val commitP = statePath + "/commit"
    val cellsP = commitP + "/cells"
    val ledgerP = commitP + "/ledger"
    guardOldLayout(spark, statePath, commitP, "rollupMaintain",
      flatLegacy = true)
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4)))
          .cast(DecimalType(18, 4)).as("total_dec"),
        max(col("value")).as("vmax"), min(col("value")).as("vmin"))
    val q = events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        recoverCommit(spark, commitP)
        val done: Set[Long] =
          if (stateExists(spark, ledgerP))
            spark.read.parquet(ledgerP).select(col("batch_id"))
              .collect().map(_.getLong(0)).toSet
          else Set.empty
        if (!done.contains(batchId)) {
          val incoming = partials(batch)
          val merged =
            if (stateExists(spark, cellsP)) {
              spark.read.parquet(cellsP)
                .withColumn("total_dec",
                  col("total_dec").cast(DecimalType(18, 4)))
                .unionByName(incoming)
                .groupBy(col("event_type"))
                .agg(sum(col("n")).as("n"),
                  sum(col("total_dec")).cast(DecimalType(18, 4))
                    .as("total_dec"),
                  max(col("vmax")).as("vmax"), min(col("vmin")).as("vmin"))
            } else incoming
          swapCommit(spark, merged, commitP, done, batchId)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    // zero-batch restart: recover a rename-window crash before reading
    recoverCommit(spark, commitP)
    spark.read.parquet(cellsP)
      .withColumn("total", col("total_dec").cast("double"))
      .withColumn("avg_v", col("total") / col("n").cast("double"))
      .drop("total_dec")
  }

  /** Streaming HyperLogLog maintenance via foreachBatch — q227's
    * mergeability contract run as a stream: each micro-batch of documents
    * folds into the per-(source, bucket) MAX-ρ register table
    * ([[graft.ext.TextAnalysis.hllRegisters]], the same kernel the batch
    * gate q225 hash-compares). MAX is idempotent as well as
    * commutative/associative, so unlike the sum-merged rollup above this
    * state survives AT-LEAST-ONCE delivery unchanged — a replayed batch
    * cannot corrupt a register, which is why sketch maintenance needs no
    * exactly-once ledger. State is ≤ 64 rows per source forever; distinct
    * estimates come off the table at read time without touching the data.
    * (The replay-safety claim is LOGICAL — durability of the state table
    * itself is [[swapWrite]]'s tmp-then-rename swap, single maintainer per
    * path.)
    */
  def hllMaintain(spark: SparkSession, docs: DataFrame,
      statePath: String): DataFrame = {
    import graft.ext.TextAnalysis
    def registers(df: DataFrame): DataFrame =
      TextAnalysis.hllRegisters(spark,
        df.select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("token")),
        col("source"), col("token"))
    val q = docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        recoverSwap(spark, statePath)
        val incoming = registers(batch)
        val merged =
          if (stateExists(spark, statePath))
            spark.read.parquet(statePath)
              .unionByName(incoming)
              .groupBy(col("source"), col("bucket"))
              .agg(max(col("m")).as("m"))
          else incoming
        swapWrite(spark, merged, statePath)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverSwap(spark, statePath)
    spark.read.parquet(statePath)
  }

  /** Streaming KMV sketch maintenance via foreachBatch — q282's
    * bottom-k vocabulary sketches run as a stream: each micro-batch's
    * per-source shingle-hash bottom-64 folds into the state table by
    * re-sketching the union (bottom-k of a union = bottom-k of the
    * concatenation of bottom-k's — the KMV merge law), so state is ≤ 64
    * rows per source forever and every downstream estimate (distinct
    * union, pair intersection) reads off the table without touching
    * data. Like [[hllMaintain]] and unlike the sum-merged maintainers,
    * the merge is MIN-idempotent: a replayed batch cannot move the
    * sketch, so no batch-id ledger is needed — at-least-once delivery
    * is already exactly-once for this state.
    */
  def kmvMaintain(spark: SparkSession, docs: DataFrame,
      statePath: String, k: Int = 64): DataFrame = {
    import graft.ext.TextAnalysis
    graft.functions.GraftFunctions.register(spark)
    def bottomK(rows: DataFrame): DataFrame = rows
      .distinct()
      .groupBy(col("source"))
      .agg(call_function("top_k", -col("h"), col("h"), lit(k)).as("tk"))
      .select(col("source"), explode(col("tk")).as("e"))
      .select(col("source"), col("e.id").as("h"))
    def sketch(df: DataFrame): DataFrame = bottomK(df
      .select(col("source"), TextAnalysis.tokens(col("text")).as("_w"))
      .select(col("source"),
        explode(TextAnalysis.shinglesFromTokens(col("_w"))).as("shingle"))
      .select(col("source"),
        TextAnalysis.hash60Fast(spark, col("shingle")).as("h")))
    val q = docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        recoverSwap(spark, statePath)
        val incoming = sketch(batch)
        val merged =
          if (stateExists(spark, statePath))
            bottomK(spark.read.parquet(statePath).unionByName(incoming))
          else incoming
        swapWrite(spark, merged, statePath)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverSwap(spark, statePath)
    spark.read.parquet(statePath)
  }

  /** Streaming exponential-decay counter maintenance via foreachBatch —
    * q262's fixed-point recency score run as a stream. State is the
    * per-(event_type, day) COUNT partial table — NOT the decayed sum:
    * each day-bucket's weight is the single power of two 2^(20−lag), so
    * deriving the score at READ time ages every bucket exactly, where a
    * shiftright on a pre-summed dec_w would floor away mixed low bits
    * and drift from the batch recompute (the q262 scaladoc's argument,
    * here made executable). Counts are sum-merged ⇒ not replay-
    * idempotent ⇒ the batch-id ledger rides along, committed ATOMICALLY
    * with the cells via [[swapCommit]]'s single rename (like
    * [[kmeansMaintain]]; the MAX-merged [[hllMaintain]] needs no ledger
    * at all). State is #types × #days rows forever; buckets
    * past the 20-day clip contribute zero weight and could be compacted
    * to one row per type without changing any output. Returns exactly
    * q262's (event_type, n_events, dec_w, dec_score_1e6).
    */
  def decayedMaintain(spark: SparkSession, events: DataFrame,
      statePath: String): DataFrame = {
    val commitP = statePath + "/commit"
    val cellsP = commitP + "/cells"
    val ledgerP = commitP + "/ledger"
    guardOldLayout(spark, statePath, commitP, "decayedMaintain")
    val q = events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        recoverCommit(spark, commitP)
        val done: Set[Long] =
          if (stateExists(spark, ledgerP))
            spark.read.parquet(ledgerP).select(col("batch_id"))
              .collect().map(_.getLong(0)).toSet
          else Set.empty
        if (!done.contains(batchId)) {
          val incoming = batch
            .select(col("event_type"),
              unix_date(col("ts").cast("date")).cast("long").as("d"))
            .groupBy(col("event_type"), col("d"))
            .agg(count(lit(1)).as("n"))
          val merged =
            if (stateExists(spark, cellsP))
              spark.read.parquet(cellsP).unionByName(incoming)
                .groupBy(col("event_type"), col("d"))
                .agg(sum(col("n")).as("n"))
            else incoming
          swapCommit(spark, merged, commitP, done, batchId)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    // a restarted run that fires ZERO batches (no new files) never enters
    // foreachBatch, so a crash left in the delete→rename window would
    // otherwise still be unrecovered at this read
    recoverCommit(spark, commitP)
    val cells = spark.read.parquet(cellsP)
    val mx = cells.agg(max(col("d")).as("maxd"))
    cells.crossJoin(org.apache.spark.sql.functions.broadcast(mx))
      .select(col("event_type"), col("n"),
        (col("maxd") - col("d")).as("lag"))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_events"),
        sum(when(col("lag") <= 20L, col("n") *
          expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - lag AS INT))"))
          .otherwise(0L)).as("dec_w"))
      .withColumn("dec_score_1e6",
        expr("dec_w * 1000000 div shiftleft(CAST(1 AS BIGINT), 20)"))
  }

  /** Streaming incremental near-dup dedup via foreachBatch — q88's
    * daily-crawl contract run continuously: each micro-batch (the
    * "delta") is LSH-banded, candidate-paired against the ACCUMULATED
    * corpus band index plus its own earlier rows (same-batch pairs are
    * oriented `doc_b < doc_a`, exactly q88's delta convention),
    * Jaccard-verified on the hashed-shingle store, and then APPENDED to
    * the index — candidate cost per batch is ∝ |delta| and the old×old
    * pair space is never re-examined. State = three grow-only tables
    * (band index, shingle store, per-doc verdicts), each PARTITIONED BY
    * BATCH and written as an overwrite of its own batch=<id> partition,
    * plus a batch-id ledger: a crash anywhere before the ledger row
    * makes the replayed batch recompute the identical deterministic rows
    * (index reads exclude the batch's own partition, so a half-landed
    * attempt cannot pollute its replay) and clobber its stale
    * partitions, so exactly-once holds through ANY crash point — the
    * ledger skip saves work; it is not the correctness guard the
    * sum-merged maintainers need ([[swapCommit]] serves those). The
    * skew cap is q36's:
    * bucket counts over ALL band rows (index + delta) partial-agg'd, so
    * a degenerate band key cannot go quadratic in any batch. At 100 TB
    * the band index and shingle store are bucketed tables keyed on
    * (band_id, band_key) / doc_id, one partition appended per batch;
    * here plain parquet directories with a single maintaining process
    * ([[swapWrite]]'s caveat applies to the layout, not the appends).
    * Small-files pressure is bounded by TIERED compaction riding the
    * ledgered cycle (`tierK`, see [[tierCompact]]): every K ledgered
    * per-batch partitions fold into a segment, K segments into a
    * higher-level segment — O(log_K N) rewrites per row and O(K·log_K N)
    * live partitions over the stream's whole life, vs one partition per
    * batch forever (and vs [[compactState]]'s O(store²/K) if run on a
    * cadence). `tierK = 0` disables (the pre-r14 layout).
    * Returns the accumulated verdicts table: one row per ingested doc
    * with its dup flag and best earlier match (ties to the smallest doc
    * id — q88's tiebreak).
    */
  def dedupMaintain(spark: SparkSession, docs: DataFrame, statePath: String,
      threshold: Double = 0.5, maxBandBucket: Int = 100000,
      tierK: Int = 8, checkpoint: Option[String] = None): DataFrame = {
    import graft.ext.Dedup
    val bandsP = statePath + "/bands"
    val shP = statePath + "/shingles"
    val verdictsP = statePath + "/verdicts"
    val ledgerP = statePath + "/ledger"
    // `checkpoint` persists source offsets + batch ids across CALLS: a
    // caller that must pin arrival order exactly (q337's closed-form
    // oracle) writes wave w, runs the maintainer to completion, then
    // writes wave w+1 — each run sees only the files that exist, so
    // ordering needs no filesystem mtime/listing assumptions at all,
    // and batch ids continue monotonically from the checkpoint.
    val writer = docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // recover a compaction that died in its rename window before any
        // store read ([[compactState]]'s contract)
        // ledgerP included: the ledger itself is swapWrite-rewritten, so a
        // crash in its delete→rename window would otherwise read as an
        // EMPTY ledger — every ledgered batch would replay, and after
        // compactState folded them into batch=-1 the replay would re-land
        // per-batch partitions beside the compacted copy (duplicate rows).
        Seq(bandsP, shP, verdictsP, ledgerP).foreach(recoverSwap(spark, _))
        val done: Set[Long] = readLedger(spark, ledgerP)
        if (!done.contains(batchId)) {
          // delta substrate: checkpointed once (delta-sized), consumed by
          // candidate generation, verification, and the index append
          val sh = Dedup.hashedShingleRows(batch, "doc_id", "text")
            .localCheckpoint()
          val bands = Dedup.bandRows(
            Dedup.minhashSignatures(sh, "doc_id"), "doc_id")
            .localCheckpoint()
          // index reads EXCLUDE this batch's own partition: a crashed
          // attempt may have landed batch=<id> rows before the ledger
          // said so, and pairing the delta against its own stale copy
          // would break the `doc_b < doc_a` same-batch orientation
          val haveIdx = stateExists(spark, bandsP)
          val allBands = bands.withColumn("_delta", lit(true))
            .unionByName(
              if (haveIdx)
                readTiered(spark, bandsP)
                  .where(col("batch") =!= batchId).drop("batch")
                  .withColumn("_delta", lit(false))
              else bands.withColumn("_delta", lit(true)).limit(0))
          val keep = allBands.groupBy(col("band_id"), col("band_key"))
            .agg(count(lit(1)).as("bucket_n"))
            .where(col("bucket_n") <= maxBandBucket && col("bucket_n") >= 2)
            .select(col("band_id"), col("band_key"))
          val capped = allBands.join(keep, Seq("band_id", "band_key"))
          val a = capped.where(col("_delta"))
            .select(col("doc_id").as("doc_a"), col("band_id"),
              col("band_key"))
          val b = capped.select(col("doc_id").as("doc_b"),
            col("_delta").as("_delta_b"), col("band_id"), col("band_key"))
          val cands = a.join(b, Seq("band_id", "band_key"))
            .where(col("doc_b") =!= col("doc_a") &&
              (!col("_delta_b") || col("doc_b") < col("doc_a")))
            .select(col("doc_a"), col("doc_b")).distinct()
            .localCheckpoint()
          val allSh =
            if (stateExists(spark, shP))
              sh.unionByName(readTiered(spark, shP)
                .where(col("batch") =!= batchId).drop("batch"))
            else sh
          val best = Dedup.jaccardFor(cands, allSh, "doc_id")
            .where(col("jaccard") >= threshold)
            .groupBy(col("doc_a"))
            .agg(max_by(struct(col("jaccard"), col("doc_b")),
              struct(col("jaccard"), -col("doc_b"))).as("bm"))
            .select(col("doc_a"), col("bm.doc_b").as("best_match"),
              col("bm.jaccard").as("best_jaccard"))
          val verdicts = batch.select(col("doc_id"))
            .join(best, col("doc_id") === col("doc_a"), "left")
            .select(col("doc_id"), lit(batchId).as("batch_id"),
              col("best_match").isNotNull.as("is_dup"),
              col("best_match"), col("best_jaccard"))
          // verdicts computed BEFORE the index grows; each table's batch
          // contribution lands as an OVERWRITE of its own batch=<id>
          // partition — a replayed batch (crash before the ledger row)
          // recomputes the identical deterministic rows and clobbers the
          // stale partition instead of doubling it, so the ledger-last
          // rewrite only ever skips work, never guards correctness:
          // exactly-once across batches holds through any crash point
          verdicts.write.mode("overwrite").parquet(s"$verdictsP/batch=$batchId")
          bands.write.mode("overwrite").parquet(s"$bandsP/batch=$batchId")
          sh.write.mode("overwrite").parquet(s"$shP/batch=$batchId")
          ledgerCommit(spark, ledgerP, done, batchId)
          // tiered segment compaction rides the ledgered cycle: only
          // ledgered partitions fold, so replay/own-batch semantics are
          // untouched (see the tierCompact protocol note)
          Seq(bandsP, shP, verdictsP)
            .foreach(tierCompact(spark, _, done + batchId, tierK))
        }
      }
    val q = checkpoint.fold(writer)(
        cp => writer.option("checkpointLocation", cp))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverSwap(spark, verdictsP)
    readTiered(spark, verdictsP).drop("batch")
  }

  /** Streaming PERCEPTUAL-dedup index maintenance — [[dedupMaintain]]'s
    * contract for fingerprint columns (the q308/q309/q310 family): input
    * batches carry (doc_id, fp) where fp is any ≤`fpBits`-bit perceptual
    * hash (image dHash, audio/video gradient hash — fingerprinting itself
    * is a stateless map, so the maintainer is CODEC-AGNOSTIC and one
    * state store serves every modality; widths are enforced in-plan, a
    * wider fp fails the batch rather than degrading band recall
    * silently). Per batch: the delta's two (fpBits/2)-bit band
    * rows probe the accumulated fingerprint index (own-batch partition
    * excluded — the stale-replay guard), candidates respect the
    * bucket cap and the arrival orientation (index docs, or same-batch
    * docs with smaller id), survivors verify with popcount ≤ radius, and
    * each delta doc reports its best match (min distance, deterministic
    * tie). Stores: fps (8 bytes/doc — the index), verdicts, ledger; all
    * per-batch overwrite partitions (deterministic ⇒ replay clobbers,
    * never doubles), ledger swapWrite-recovered, [[compactState]]
    * applies. The batch twin is q312's shape; StreamingSpec pins parity,
    * replay, and compaction.
    */
  def fpDedupMaintain(spark: SparkSession, docs: DataFrame,
      statePath: String, radius: Int = 4,
      maxBandBucket: Int = 100000, fpBits: Int = 32,
      tierK: Int = 8, checkpoint: Option[String] = None): DataFrame = {
    // `checkpoint`: the same wave-pinning contract as dedupMaintain's.
    // The 2-band split must COVER the fingerprint: a fp wider than
    // fpBits would silently push its high bits into one oversized band
    // and weaken the low-band collision guarantee (gradientHash can emit
    // up to 62 bits). The width is a parameter, and the contract is
    // enforced IN-PLAN on every delta row (assert_true compiles into the
    // projection — a too-wide fp fails the batch with a message instead
    // of degrading recall unobserved).
    require(fpBits >= 2 && fpBits <= 62, s"fpBits must be 2..62, got $fpBits")
    val loBits = fpBits / 2
    val fpsP = statePath + "/fps"
    val verdictsP = statePath + "/verdicts"
    val ledgerP = statePath + "/ledger"
    val writer = docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ledgerP included: same rename-window recovery as dedupMaintain
        Seq(fpsP, verdictsP, ledgerP).foreach(recoverSwap(spark, _))
        val done: Set[Long] = readLedger(spark, ledgerP)
        if (!done.contains(batchId)) {
          val fps = batch
            .select(col("doc_id").cast("long"), col("fp").cast("long"))
            // NULL fps are data, not failures (an undecodable blob lands a
            // NULL fingerprint — the Multimodal contract): a NULL can't
            // participate in banded dedup, so drop it BEFORE the width
            // assert; assert_true treats the NULL the condition would
            // evaluate to as a failure and would kill the whole batch with
            // a misleading too-wide message
            .where(col("fp").isNotNull)
            // a WHERE, not a dropped projection column — an unused
            // Project column would be column-pruned and the check with it
            .where(assert_true(col("fp") >= 0 &&
              shiftright(col("fp"), fpBits) === 0,
              lit(s"fpDedupMaintain: fp exceeds fpBits=$fpBits — " +
                "widen fpBits or narrow the fingerprint")).isNull)
            .localCheckpoint()
          val haveIdx = stateExists(spark, fpsP)
          val allFps = fps.withColumn("_delta", lit(true))
            .unionByName(
              if (haveIdx)
                readTiered(spark, fpsP)
                  .where(col("batch") =!= batchId).drop("batch")
                  .withColumn("_delta", lit(false))
              else fps.withColumn("_delta", lit(true)).limit(0))
          val allBands = allFps.select(col("doc_id"), col("fp"),
            col("_delta"),
            posexplode(array(
              (col("fp") % (1L << loBits)).cast("long"),
              shiftright(col("fp"), loBits).cast("long")))
              .as(Seq("band_id", "band_key")))
          val keep = allBands.groupBy(col("band_id"), col("band_key"))
            .agg(count(lit(1)).as("bucket_n"))
            .where(col("bucket_n") <= maxBandBucket && col("bucket_n") >= 2)
            .select(col("band_id"), col("band_key"))
          val capped = allBands.join(keep, Seq("band_id", "band_key"))
          val a = capped.where(col("_delta"))
            .select(col("doc_id").as("doc_a"), col("fp").as("fp_a"),
              col("band_id"), col("band_key"))
          val b = capped.select(col("doc_id").as("doc_b"),
            col("fp").as("fp_b"), col("_delta").as("_delta_b"),
            col("band_id"), col("band_key"))
          val ham = a.join(b, Seq("band_id", "band_key"))
            .where(col("doc_b") =!= col("doc_a") &&
              (!col("_delta_b") || col("doc_b") < col("doc_a")))
            .select(col("doc_a"), col("doc_b"),
              bit_count(col("fp_a").bitwiseXOR(col("fp_b")))
                .cast("int").as("hamming"))
            .where(col("hamming") <= radius) // narrow BEFORE the dedup
            .distinct()
          val best = ham.groupBy(col("doc_a"))
            .agg(max_by(struct(col("hamming"), col("doc_b")),
              struct(-col("hamming"), -col("doc_b"))).as("bm"))
            .select(col("doc_a"), col("bm.doc_b").as("best_match"),
              col("bm.hamming").as("best_hamming"))
          val verdicts = fps.select(col("doc_id"))
            .join(best, col("doc_id") === col("doc_a"), "left")
            .select(col("doc_id"), lit(batchId).as("batch_id"),
              col("best_match").isNotNull.as("is_dup"),
              col("best_match"), col("best_hamming"))
          verdicts.write.mode("overwrite")
            .parquet(s"$verdictsP/batch=$batchId")
          fps.write.mode("overwrite").parquet(s"$fpsP/batch=$batchId")
          ledgerCommit(spark, ledgerP, done, batchId)
          Seq(fpsP, verdictsP)
            .foreach(tierCompact(spark, _, done + batchId, tierK))
        }
      }
    val q = checkpoint.fold(writer)(
        cp => writer.option("checkpointLocation", cp))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverSwap(spark, verdictsP)
    readTiered(spark, verdictsP).drop("batch")
  }

  /** [[fpDedupMaintain]] with q347's CAPPED-index fast path wired into
    * the per-batch candidate generation (round 16 — the r15 verdict's
    * "flat per-batch cost" item). The uncapped maintainer re-reads and
    * re-aggregates the FULL accumulated band population every micro-batch
    * (bucket-cap agg + candidate join are both O(corpus) per batch); for
    * fingerprint bands the bucket KEY SPACE is bounded (2 bands ×
    * 2^(fpBits/2) values), so a dedicated capped-index state — per
    * bucket, its `capC` LOWEST doc_ids plus the exact member count —
    * is bounded at 2·2^(fpBits/2)·capC rows AT ANY CORPUS SIZE, a
    * constant. Per batch the delta consults ONLY that state:
    *
    *  - bucket with `old_n <= capC`: the capped index holds EVERY prior
    *    member, so probing it is COMPLETE — no recall trade at all;
    *  - bucket with `old_n > capC` (cap-saturated): the delta rows of
    *    that bucket FALL THROUGH to the full tiered fps store,
    *    restricted to the saturated keys — exactness is preserved and
    *    the expensive path is paid only where occupancy demands it;
    *  - `old_n + delta_n > maxBandBucket`: bucket excluded entirely —
    *    the same skew cap, now decided from the maintained count
    *    without touching the store.
    *
    * Verdicts are therefore IDENTICAL to [[fpDedupMaintain]]'s on every
    * input (q350 gates the equality against the uncapped closed form);
    * what changes is the cost shape: steady-state per-batch work is
    * O(|delta| + capped-index size) — flat in the corpus — instead of
    * O(corpus). The capped index is sum-merged state (counts), so it
    * commits through [[swapCommit]]'s atomic cells+ledger directory and
    * that ledger is the maintainer's exactly-once authority; fps and
    * verdicts land as deterministic per-batch overwrite partitions
    * BEFORE the commit (a replay recomputes identical rows and
    * clobbers), and tiered compaction rides the ledgered cycle as in
    * every maintainer here. At 100 TB the fall-through read is a
    * bucket-pruned scan of the [[graft.ext.Dedup.writeBandIndexBucketed]]
    * layout; the capped index itself is small enough to BROADCAST into
    * the probe join — the q347 plan shape, now incremental.
    */
  def fpDedupMaintainCapped(spark: SparkSession, docs: DataFrame,
      statePath: String, radius: Int = 4,
      maxBandBucket: Int = 100000, fpBits: Int = 32, capC: Int = 64,
      tierK: Int = 8, checkpoint: Option[String] = None,
      fallThrough: Boolean = true): DataFrame = {
    require(fpBits >= 2 && fpBits <= 62, s"fpBits must be 2..62, got $fpBits")
    require(capC >= 1, s"capC must be >= 1, got $capC")
    val loBits = fpBits / 2
    val fpsP = statePath + "/fps"
    val verdictsP = statePath + "/verdicts"
    val capCommitP = statePath + "/capcommit"
    val capCellsP = capCommitP + "/cells"
    val capLedgerP = capCommitP + "/ledger"
    val writer = docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        recoverCommit(spark, capCommitP)
        Seq(fpsP, verdictsP).foreach(recoverSwap(spark, _))
        // STRICT ledger read (the cdcRollupMaintain posture): bucket
        // counts are sum-merged, so a swallowed ledger row would
        // double-count; inside the atomic commit dir a partial ledger
        // cannot exist, so a read failure is real corruption
        val done: Set[Long] =
          if (stateExists(spark, capLedgerP))
            spark.read.parquet(capLedgerP).select(col("batch_id"))
              .collect().map(_.getLong(0)).toSet
          else Set.empty
        if (!done.contains(batchId)) {
          val fps = batch
            .select(col("doc_id").cast("long"), col("fp").cast("long"))
            .where(col("fp").isNotNull)
            .where(assert_true(col("fp") >= 0 &&
              shiftright(col("fp"), fpBits) === 0,
              lit(s"fpDedupMaintainCapped: fp exceeds fpBits=$fpBits — " +
                "widen fpBits or narrow the fingerprint")).isNull)
            .localCheckpoint()
          def bandsOf(df: DataFrame): DataFrame =
            df.select(col("doc_id"), col("fp"),
              posexplode(array(
                (col("fp") % (1L << loBits)).cast("long"),
                shiftright(col("fp"), loBits).cast("long")))
                .as(Seq("band_id", "band_key")))
          val dBands = bandsOf(fps).localCheckpoint()
          val haveCap = stateExists(spark, capCellsP)
          // old capped-index state: (band_id, band_key, doc_id, fp,
          // bucket_n) — bucket_n duplicated across a bucket's member rows
          val old =
            if (haveCap) spark.read.parquet(capCellsP)
            else dBands.withColumn("bucket_n", lit(0L)).limit(0)
          val oldStats = old.groupBy(col("band_id"), col("band_key"))
            .agg(max(col("bucket_n")).as("old_n"))
          val dStats = dBands.groupBy(col("band_id"), col("band_key"))
            .agg(count(lit(1)).as("d_n"))
          // candidate-relevant buckets: touched by the delta, inside the
          // skew cap, able to pair — with the SATURATION flag that picks
          // the path. The whole frame is delta-keyed and tiny.
          // `fallThrough = false` is the PURE q347 dial: saturated
          // buckets are NOT re-probed against the full store — the delta
          // pairs only with the capC earliest members, so per-batch cost
          // is bounded by the keyspace·capC state size at ANY corpus
          // (the deterministic bounded-recall trade q347 documents);
          // with it on (default), saturated buckets fall through and
          // verdicts are exactly the uncapped maintainer's.
          val keepB = dStats
            .join(oldStats, Seq("band_id", "band_key"), "left")
            .na.fill(0L, Seq("old_n"))
            .withColumn("tot_n", col("old_n") + col("d_n"))
            .where(col("tot_n") <= maxBandBucket && col("tot_n") >= 2)
            .select(col("band_id"), col("band_key"),
              (lit(fallThrough) && col("old_n") > capC).as("sat"))
          val a = dBands.join(keepB, Seq("band_id", "band_key"))
            .select(col("doc_id").as("doc_a"), col("fp").as("fp_a"),
              col("band_id"), col("band_key"), col("sat"))
          // capped fast path: unsaturated buckets probe the bounded
          // member state — COMPLETE there (old_n <= capC means every
          // prior member is present)
          val candCap = a.where(!col("sat"))
            .join(old.select(col("doc_id").as("doc_b"),
              col("fp").as("fp_b"), col("band_id"), col("band_key")),
              Seq("band_id", "band_key"))
          // fall-through: saturated buckets probe the full tiered store
          // (own-batch partition excluded — the stale-replay guard),
          // restricted to exactly those keys by the delta-side join
          val haveIdx = stateExists(spark, fpsP)
          val candSat =
            if (!haveIdx) candCap.limit(0)
            else a.where(col("sat"))
              .join(bandsOf(readTiered(spark, fpsP)
                  .where(col("batch") =!= batchId).drop("batch"))
                .select(col("doc_id").as("doc_b"), col("fp").as("fp_b"),
                  col("band_id"), col("band_key")),
                Seq("band_id", "band_key"))
          // same-batch pairs: delta×delta inside kept buckets, smaller
          // id first — the arrival orientation both maintainers share
          val candSame = a
            .join(dBands.select(col("doc_id").as("doc_b"),
              col("fp").as("fp_b"), col("band_id"), col("band_key")),
              Seq("band_id", "band_key"))
            .where(col("doc_b") < col("doc_a"))
          val ham = candCap.unionByName(candSat)
            .where(col("doc_b") =!= col("doc_a"))
            .unionByName(candSame)
            .select(col("doc_a"), col("doc_b"),
              bit_count(col("fp_a").bitwiseXOR(col("fp_b")))
                .cast("int").as("hamming"))
            .where(col("hamming") <= radius)
            .distinct()
          val best = ham.groupBy(col("doc_a"))
            .agg(max_by(struct(col("hamming"), col("doc_b")),
              struct(-col("hamming"), -col("doc_b"))).as("bm"))
            .select(col("doc_a"), col("bm.doc_b").as("best_match"),
              col("bm.hamming").as("best_hamming"))
          val verdicts = fps.select(col("doc_id"))
            .join(best, col("doc_id") === col("doc_a"), "left")
            .select(col("doc_id"), lit(batchId).as("batch_id"),
              col("best_match").isNotNull.as("is_dup"),
              col("best_match"), col("best_hamming"))
          // partitions BEFORE the commit: a crash in between replays the
          // batch against the unchanged committed state and clobbers
          verdicts.write.mode("overwrite")
            .parquet(s"$verdictsP/batch=$batchId")
          fps.write.mode("overwrite").parquet(s"$fpsP/batch=$batchId")
          // new capped-index state: exact counts over ALL buckets, the
          // capC lowest doc_ids per bucket — one bounded-size shuffle
          val newStats = oldStats
            .join(dStats, Seq("band_id", "band_key"), "full_outer")
            .na.fill(0L, Seq("old_n", "d_n"))
            .select(col("band_id"), col("band_key"),
              (col("old_n") + col("d_n")).as("bucket_n"))
          val mergedMembers = old
            .select(col("band_id"), col("band_key"), col("doc_id"),
              col("fp"))
            .unionByName(dBands
              .select(col("band_id"), col("band_key"), col("doc_id"),
                col("fp")))
            .withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("band_id"), col("band_key"))
                .orderBy(col("doc_id"))))
            .where(col("rn") <= capC).drop("rn")
          val newState = mergedMembers
            .join(newStats, Seq("band_id", "band_key"))
          swapCommit(spark, newState, capCommitP, done, batchId)
          Seq(fpsP, verdictsP)
            .foreach(tierCompact(spark, _, done + batchId, tierK))
        }
      }
    val q = checkpoint.fold(writer)(
        cp => writer.option("checkpointLocation", cp))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverCommit(spark, capCommitP)
    recoverSwap(spark, verdictsP)
    readTiered(spark, verdictsP).drop("batch")
  }

  /** Streaming Bronze VARIANT landing — the S5/q314 ingestion path as an
    * incremental maintainer: input batches carry (doc_id, json_text);
    * each batch parses its documents ONCE (`parse_json`) and lands the
    * encoded variant binary in its own `batch=<id>` overwrite partition
    * under the ledgered exactly-once protocol every maintainer here
    * shares (deterministic parse ⇒ a replayed batch clobbers its stale
    * partition instead of doubling it; the ledger write is swap-atomic
    * and rename-window-recovered). Downstream consumers run typed
    * `variant_get` paths against the STORE and never re-parse text —
    * the parse cost is paid once per document ever, not once per
    * consumer per read, which at 100 TB of crawl JSON is the difference
    * between one linear pass and N of them. [[compactState]] applies to
    * the store. Returns the accumulated (doc_id, raw_data) view.
    */
  def variantMaintain(spark: SparkSession, docs: DataFrame,
      statePath: String, tierK: Int = 8): DataFrame = {
    val storeP = statePath + "/variants"
    val ledgerP = statePath + "/ledger"
    val q = docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Seq(storeP, ledgerP).foreach(recoverSwap(spark, _))
        val done: Set[Long] = readLedger(spark, ledgerP)
        if (!done.contains(batchId)) {
          batch.select(col("doc_id").cast("long"),
              parse_json(col("json_text")).as("raw_data"))
            .write.mode("overwrite").parquet(s"$storeP/batch=$batchId")
          ledgerCommit(spark, ledgerP, done, batchId)
          tierCompact(spark, storeP, done + batchId, tierK)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverSwap(spark, storeP)
    readTiered(spark, storeP).drop("batch")
  }

  /** Streaming snapshot reconciliation — the INCREMENTAL q320: instead of
    * re-diffing two petabyte snapshots per comparison, a CDC stream of
    * (doc_id, op, fp, seq) events maintains a log-structured fingerprint
    * store and emits per-batch diff verdicts (added / removed / changed /
    * touched-same / ghost-delete / stale counts plus the xor-fold delta
    * checksum — q218/q320's order-independent contract). State is an
    * append-only LOG of per-batch overwrite partitions: writes are
    * delta-sized (never an O(state) rewrite per batch), per-batch READS
    * are delta-KEYED (classification folds only the log rows of the
    * batch's own keys — [[priorState]]'s broadcast left-semi prune, so a
    * long-running stream never re-aggregates its full history per
    * micro-batch), and the current
    * snapshot is the last-writer-wins fold by `seq` — the CDC version,
    * authoritative over arrival order, so a late event older than the
    * stored version counts `n_stale` and cannot regress the snapshot
    * (tombstones keep their seq for exactly this reason: a late update
    * older than a delete must not resurrect the row). Fingerprinting is
    * a stateless upstream map (q320's 60-bit md5 row hash), which makes
    * the maintainer SCHEMA-AGNOSTIC — one store shape serves any table.
    * Exactly-once: deterministic per-batch partitions clobber on replay,
    * own-batch partitions are excluded from prior-state reads (the
    * stale-replay guard), and the ledger is swap-atomic and skip-only.
    * [[compactState]] applies to fps/verdicts (src_batch and seq ride as
    * DATA columns, so the LWW fold survives the batch=-1 rewrite).
    * Contract: events collapse last-wins by seq within a batch; op is
    * 'U' (upsert, fp required) or 'D' (delete) — anything else fails the
    * batch loudly in-plan rather than silently corrupting the snapshot.
    *
    * Auto-compaction cadence (opt-in, `compactEvery` > 0): every
    * `compactEvery` LEDGERED batches the maintainer folds its own log to
    * `high-water seq − retention` via [[compactSnapshotLog]] — without
    * this the steady-state O(delta) claim for [[priorState]] depends on
    * an operator remembering to compact between runs, and a forgotten
    * log grows without bound. The cadence runs AFTER the batch's ledger
    * commit (the batch is durable either way; a crash mid-compaction is
    * the swap protocol's recovered case), counts only ledgered batches
    * (replays skip, so a replayed run never double-compacts), and is
    * monotone-safe: a high-water that hasn't advanced past the current
    * horizon is a no-op, not an error. `retention` is in SEQ units —
    * versions newer than `high-water − retention` stay individually
    * time-travelable, older ones fold into the base.
    */
  def snapshotDiffMaintain(spark: SparkSession, changes: DataFrame,
      statePath: String, compactEvery: Int = 0,
      retention: Long = 0L, tierK: Int = 8): DataFrame = {
    val logP = statePath + "/fps"
    val verdictsP = statePath + "/verdicts"
    val ledgerP = statePath + "/ledger"
    val q = changes.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Seq(logP, verdictsP, ledgerP).foreach(recoverSwap(spark, _))
        val done: Set[Long] = readLedger(spark, ledgerP)
        if (!done.contains(batchId)) {
          val evs = batch
            .select(col("doc_id").cast("long"), col("op"),
              col("fp").cast("long"), col("seq").cast("long"))
            .where(assert_true(col("op").isin("U", "D") &&
              (col("op") === "D" || col("fp").isNotNull) &&
              col("seq").isNotNull,
              lit("snapshotDiffMaintain: op must be 'U'|'D', upserts " +
                "need fp, every event needs seq")).isNull)
            .groupBy(col("doc_id"))
            .agg(max_by(struct(col("op"), col("fp"), col("seq")),
              col("seq")).as("e"))
            .select(col("doc_id"), col("e.op").as("op"),
              col("e.fp").as("fp"), col("e.seq").as("seq"))
            .localCheckpoint()
          val priorAll =
            if (stateExists(spark, logP)) priorState(spark, logP, batchId, evs)
            else evs.select(col("doc_id"), col("op").as("p_op"),
              col("fp").as("p_fp"), col("seq").as("p_seq")).limit(0)
          val cls = when(col("p_seq").isNotNull &&
              col("seq") <= col("p_seq"), "stale")
            .when(col("op") === "U" &&
              (col("p_op").isNull || col("p_op") === "D"), "added")
            .when(col("op") === "U" && col("p_fp") === col("fp"),
              "touched_same")
            .when(col("op") === "U", "changed")
            .when(col("p_op") === "U", "removed")
            .otherwise("ghost_delete")
          val verdict = evs.join(priorAll, Seq("doc_id"), "left")
            .select(cls.as("cls"), col("fp"))
            .agg(
              count(when(col("cls") === "added", 1)).as("n_added"),
              count(when(col("cls") === "removed", 1)).as("n_removed"),
              count(when(col("cls") === "changed", 1)).as("n_changed"),
              count(when(col("cls") === "touched_same", 1))
                .as("n_touched_same"),
              count(when(col("cls") === "ghost_delete", 1))
                .as("n_ghost_deletes"),
              count(when(col("cls") === "stale", 1)).as("n_stale"),
              expr("bit_xor(CASE WHEN cls IN ('added','changed') " +
                "THEN fp END)").as("delta_fp"))
            .withColumn("batch_id", lit(batchId))
          verdict.write.mode("overwrite")
            .parquet(s"$verdictsP/batch=$batchId")
          evs.withColumn("src_batch", lit(batchId))
            .write.mode("overwrite").parquet(s"$logP/batch=$batchId")
          ledgerCommit(spark, ledgerP, done, batchId)
          // only the VERDICTS store tiers (one partition per batch
          // forever otherwise); the fps LOG self-bounds through the
          // compactEvery horizon fold below, whose version semantics
          // own that layout
          tierCompact(spark, verdictsP, done + batchId, tierK)
          if (compactEvery > 0 && (done.size + 1) % compactEvery == 0) {
            val hw = spark.read.parquet(logP)
              .agg(max(col("seq")), min(col("seq"))).head()
            val target = hw.getLong(0) - retention
            // skip when nothing would fold (target below every event):
            // a no-op compaction still rewrites the whole log
            if (target > snapshotHorizon(spark, statePath) &&
                target >= hw.getLong(1))
              compactSnapshotLog(spark, statePath, target)
          }
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverSwap(spark, verdictsP)
    readTiered(spark, verdictsP).drop("batch")
  }

  /** The per-batch prior-state read [[snapshotDiffMaintain]] classifies
    * against: the LWW fold by (seq, src_batch) restricted to EXACTLY the
    * batch's keys. The key set left-semi prunes the log scan BEFORE the
    * fold — the semi-join is a broadcast (a micro-batch's distinct keys
    * are delta-sized by definition), so it executes map-side against each
    * log partition and the fold's exchange + aggregation buffers carry
    * only rows for keys the batch actually touches. Without the prune the
    * maintainer would re-aggregate the ENTIRE accumulated log every
    * micro-batch — O(log) reads per batch, quadratic over a stream's
    * lifetime; with it the per-batch cost is O(log-rows-of-batch-keys),
    * which [[compactSnapshotLog]]'s horizon bounds to O(delta) in steady
    * state. Classification is key-local (the verdict left-joins the batch
    * to this frame on doc_id), so pruning to the batch's keys is an
    * identity, not an approximation. PlanShapeSpec pins the plan shape:
    * the fold's aggregate sits ABOVE the broadcast left-semi join.
    *
    * The broadcast is only forced while the batch's key count is
    * broadcast-sized: a micro-batch is delta-sized by DEFINITION in
    * steady state, but an initial backfill or a replay burst after
    * downtime can land one batch with tens of millions of distinct keys
    * — broadcasting that set would blow the driver/broadcast limits, a
    * failure mode the old full-log fold never had. Above the threshold
    * the prune falls back to a plain (shuffled) left-semi join: same
    * rows, same fold, one extra key-bearing Exchange — the right trade
    * for a batch that is itself a large fraction of the log. `keys` is
    * the caller's localCheckpointed collapsed batch, so the count is a
    * cheap materialized-RDD count, not a recompute.
    */
  private[graft] def priorState(spark: SparkSession, logP: String,
      excludeBatch: Long, keys: DataFrame,
      broadcastKeyLimit: Long = 4000000L): DataFrame = {
    val k = keys.select(col("doc_id"))
    val semi = if (keys.count() <= broadcastKeyLimit) broadcast(k) else k
    spark.read.parquet(logP).where(col("batch") =!= excludeBatch)
      .join(semi, Seq("doc_id"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(max_by(struct(col("op"), col("fp"), col("seq")),
        struct(col("seq"), col("src_batch"))).as("p"))
      .select(col("doc_id"), col("p.op").as("p_op"),
        col("p.fp").as("p_fp"), col("p.seq").as("p_seq"))
  }

  /** The current reconstructed snapshot from [[snapshotDiffMaintain]]'s
    * log: the LWW fold by (seq, src_batch), live rows only — what a
    * reconciler compares against the source table's own fingerprints.
    */
  def snapshotCurrent(spark: SparkSession, statePath: String): DataFrame =
    snapshotAsOf(spark, statePath, Long.MaxValue)

  /** TIME TRAVEL over the CDC log: the snapshot as of version `maxSeq` —
    * the LWW fold restricted to events with seq ≤ maxSeq. The log
    * structure makes every historical version reconstructible from the
    * same store at the cost of one filtered fold (this is the capability
    * a versioned lakehouse table sells; here it falls out of keeping
    * tombstones and seq as data). The filter prunes BEFORE the fold's
    * exchange, so an early version over a long log shuffles only the
    * surviving prefix. Versions between two seqs that touched no key are
    * identical — seq is the CDC version axis, not wall time.
    */
  def snapshotAsOf(spark: SparkSession, statePath: String,
      maxSeq: Long): DataFrame = {
    val logP = statePath + "/fps"
    recoverSwap(spark, logP)
    require(stateExists(spark, logP),
      s"snapshotAsOf: no snapshot log at $logP")
    // versions at or below the compaction horizon were folded into the
    // batch=-1 base by [[compactSnapshotLog]] — reconstructing one would
    // silently return the HORIZON's state, so refuse loudly instead
    val h = snapshotHorizon(spark, statePath)
    require(maxSeq >= h,
      s"snapshotAsOf: version $maxSeq predates the compaction horizon $h" +
        " — its events were folded into the base and cannot be replayed")
    spark.read.parquet(logP)
      .where(col("seq") <= maxSeq)
      .groupBy(col("doc_id"))
      .agg(max_by(struct(col("op"), col("fp"), col("seq")),
        struct(col("seq"), col("src_batch"))).as("p"))
      .where(col("p.op") === "U")
      .select(col("doc_id"), col("p.fp").as("fp"))
  }

  /** The snapshot log's compaction horizon: versions ≤ this seq have been
    * folded into the base and are no longer individually reconstructible.
    * Long.MinValue when the log has never been horizon-compacted.
    */
  def snapshotHorizon(spark: SparkSession, statePath: String): Long = {
    val markerP = statePath + "/horizon"
    recoverSwap(spark, markerP)
    if (!stateExists(spark, markerP)) Long.MinValue
    else spark.read.parquet(markerP).agg(max(col("horizon")))
      .head().getLong(0)
  }

  /** HISTORY SCRUB — the composition of deletion propagation (q325) with
    * time travel (q322) that neither alone provides: remove a tombstoned
    * key set's ENTIRE history from [[snapshotDiffMaintain]]'s log, so
    * [[snapshotAsOf]] provably cannot resurrect a scrubbed subject at ANY
    * version, while the fold for every surviving key is untouched (their
    * log rows are byte-identical; LWW is per-key). The reference's S11
    * delete+insert idempotency pattern
    * (`scripts/transformations/utils.py:36-43`) extended to the version
    * axis. The sweep is PARTITION-PRUNED: a broadcast semi-join finds the
    * batch partitions that hold any subject row (control-plane sized —
    * one row per affected batch), only those partitions are rewritten
    * (anti-join, dynamic partition overwrite — atomic per partition like
    * every Catalog batch rewrite), and partitions emptied by the scrub
    * are deleted outright (dynamic overwrite cannot replace a partition
    * with nothing). Re-running after a mid-sweep crash is idempotent:
    * the anti-join finds nothing left to remove in already-swept
    * partitions. The ledger is left intact — batch ids stay ledgered so
    * stream replay still skips them; the verdicts store keeps its
    * per-batch COUNTS (aggregates carry the subjects' influence, not
    * their rows — the q325 contract). Returns the number of log rows
    * removed.
    */
  def scrubHistory(spark: SparkSession, statePath: String,
      keys: DataFrame): Long = {
    val logP = statePath + "/fps"
    recoverSwap(spark, logP)
    require(stateExists(spark, logP),
      s"scrubHistory: no snapshot log at $logP")
    val k = keys.select(col("doc_id").cast("long").as("doc_id"))
      .distinct().localCheckpoint()
    val log = spark.read.parquet(logP)
    val affected: Map[Long, Long] = log
      .join(broadcast(k), Seq("doc_id"), "left_semi")
      .groupBy(col("batch")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[Number]("batch").longValue() -> r.getAs[Long]("n"))
      .toMap
    if (affected.isEmpty) 0L
    else {
      val scrubbed = log
        .where(col("batch").isInCollection(affected.keys.toSeq))
        .join(broadcast(k), Seq("doc_id"), "left_anti")
        .localCheckpoint() // cannot overwrite partitions while reading them
      val survivors: Map[Long, Long] = scrubbed
        .groupBy(col("batch")).agg(count(lit(1)).as("n"))
        .collect()
        .map(r => r.getAs[Number]("batch").longValue() -> r.getAs[Long]("n"))
        .toMap
      scrubbed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch").parquet(logP)
      val fs = new org.apache.hadoop.fs.Path(logP)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      affected.keys.filter(b => survivors.getOrElse(b, 0L) == 0L)
        .foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$logP/batch=$b"), true)
        }
      // the anti-join removed exactly the subject rows the semi-join found
      affected.values.sum
    }
  }

  /** HORIZON-AWARE compaction of the snapshot log: fold every event with
    * seq ≤ `horizon` into one per-key base row (the LWW winner INCLUDING
    * tombstones — a delete's seq must survive so a late event older than
    * it still classifies stale and cannot resurrect the row), keep every
    * event above the horizon verbatim, and record the horizon so
    * [[snapshotAsOf]] below it fails loudly instead of silently returning
    * the horizon's state. This is what bounds the log in production: the
    * plain [[compactState]] merges FILES but keeps every version forever,
    * so a long-running stream's log — and with it [[priorState]]'s
    * per-batch read and every time-travel fold — grows without bound;
    * folding the cold prefix caps both at (live keys + tail) while
    * preserving exact reconstruction of every version the retention
    * policy still promises. Fold correctness is associativity of per-key
    * LWW max: for v ≥ horizon, fold(events ≤ v) = fold(fold(events ≤
    * horizon) ∪ events in (horizon, v]) — the base keeps each winner's
    * (seq, src_batch) so tiebreaks are unchanged. Crash-safe and
    * fail-closed: the horizon marker commits FIRST (a crash between
    * marker and rewrite refuses some still-reconstructible versions —
    * conservative), then the log rewrites via the [[recoverSwap]] swap
    * protocol. The ledger is untouched: batch ids stay ledgered, replay
    * still skips them, and the reserved base id −1 can never collide
    * with a live batch. Monotone: a new horizon below the current one is
    * rejected (those versions are already gone).
    */
  def compactSnapshotLog(spark: SparkSession, statePath: String,
      horizon: Long): Unit = {
    val logP = statePath + "/fps"
    recoverSwap(spark, logP)
    require(stateExists(spark, logP),
      s"compactSnapshotLog: no snapshot log at $logP")
    val prev = snapshotHorizon(spark, statePath)
    require(horizon >= prev,
      s"compactSnapshotLog: horizon $horizon below the existing $prev")
    val conf = spark.sparkContext.hadoopConfiguration
    def swapWrite(path: String)(write: String => Unit): Unit = {
      val dst = new org.apache.hadoop.fs.Path(path)
      val tmp = new org.apache.hadoop.fs.Path(path + "_tmp")
      val fs = dst.getFileSystem(conf)
      fs.delete(tmp, true)
      write(tmp.toString)
      // marker EXPLICITLY and LAST — the swapCommit ledger-last contract
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")).close()
      fs.delete(dst, true)
      fs.rename(tmp, dst)
      ()
    }
    import spark.implicits._
    // marker first: fail-closed (versions ≤ horizon refuse before the
    // events that reconstruct them can be folded away)
    swapWrite(statePath + "/horizon") { tmp =>
      Seq(horizon).toDF("horizon").coalesce(1).write.parquet(tmp)
    }
    val log = spark.read.parquet(logP).localCheckpoint()
    val base = log.where(col("seq") <= horizon)
      .groupBy(col("doc_id"))
      .agg(max_by(
        struct(col("op"), col("fp"), col("seq"), col("src_batch")),
        struct(col("seq"), col("src_batch"))).as("p"))
      .select(col("doc_id"), col("p.op").as("op"), col("p.fp").as("fp"),
        col("p.seq").as("seq"), col("p.src_batch").as("src_batch"))
    val tail = log.where(col("seq") > horizon)
      .select(col("doc_id"), col("op"), col("fp"), col("seq"),
        col("src_batch"), col("batch"))
    swapWrite(logP) { tmp =>
      base.write.parquet(s"$tmp/batch=-1")
      if (!tail.isEmpty)
        tail.write.mode("append").partitionBy("batch").parquet(tmp)
    }
  }

  /** SERVING-TABLE materialization of the current snapshot — the q323
    * bucketed layout made INCREMENTAL (the r11 judge's option (b)):
    * [[snapshotCurrent]] is a log fold, the right shape for occasional
    * reads, but a reconciler that reads the current state every run — or
    * diffs a source table against it nightly — wants a bucketed
    * (doc_id, op, fp, seq, src_batch) TABLE, where reads are
    * bucket-local scans and recurring diffs join with ZERO key-bearing
    * Exchange (q104/q323's durable co-location contract). This folds the
    * log once and lands it bucketed; [[mergeServing]] then advances the
    * table by one delta-sized merge per refresh instead of re-folding
    * the log. The table CARRIES TOMBSTONES (the per-key LWW winner
    * including op='D' rows, exactly like [[compactSnapshotLog]]'s base):
    * a tombstone's seq is what lets a later [[mergeServing]] classify a
    * late event older than the delete as stale instead of resurrecting
    * the key — the maintainer's own rule. Readers go through
    * [[readServing]] (filter op='U'), never the raw table. Returns the
    * table name.
    */
  def materializeServing(spark: SparkSession, statePath: String,
      tag: String, buckets: Int = 8): String = {
    val logP = statePath + "/fps"
    recoverSwap(spark, logP)
    require(stateExists(spark, logP),
      s"materializeServing: no snapshot log at $logP")
    val cur = spark.read.parquet(logP)
      .groupBy(col("doc_id"))
      .agg(max_by(
        struct(col("op"), col("fp"), col("seq"), col("src_batch")),
        struct(col("seq"), col("src_batch"))).as("p"))
      .select(col("doc_id"), col("p.op").as("op"), col("p.fp").as("fp"),
        col("p.seq").as("seq"), col("p.src_batch").as("src_batch"))
    val tbl = s"graft_snap_serve_$tag"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    cur.write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/graft_bucketed/$tbl")
      .saveAsTable(tbl)
    tbl
  }

  /** The read contract for [[materializeServing]]/[[mergeServing]]
    * tables: live rows only (tombstones are merge bookkeeping, not
    * state). Bucket-local — the filter is a non-key predicate, so the
    * scan keeps its HashPartitioning and downstream key joins still
    * plan with zero Exchange.
    */
  def readServing(spark: SparkSession, table: String): DataFrame =
    spark.table(table).where(col("op") === "U")
      .select(col("doc_id"), col("fp"), col("seq"), col("src_batch"))

  /** The retirement horizon recorded ON a serving table (table property
    * `graft.tombstone.horizon`) — Long.MinValue when never retired.
    * Durable metadata, not caller discipline: once a generation has had
    * tombstones retired at H, every later [[mergeServing]] against it —
    * or any generation derived from it — enforces the admissibility
    * promise (delta seqs > H) automatically and carries H forward, so a
    * caller who never heard about the scrub cannot silently resurrect a
    * retired key.
    */
  def servingHorizon(spark: SparkSession, table: String): Long = {
    // FAIL-CLOSED read discipline: "no horizon recorded" (property and
    // marker both ABSENT) is Long.MinValue, but an unreadable or
    // unparseable record THROWS — treating a transient FS error or a
    // corrupt marker as "no horizon" would silently disable the
    // admissibility enforcement this metadata exists to guarantee,
    // which is exactly the resurrection hazard. A missing TABLE also
    // throws (the caller's merge would fail on it anyway).
    val prop = spark.sql(s"SHOW TBLPROPERTIES $table")
      .where(col("key") === "graft.tombstone.horizon")
      .collect().headOption.map(_.getString(1).toLong)
    // catalog-independent fallback: a session that re-attached the
    // bucketed PATH as a fresh table (or a different engine reading the
    // files) must still see the horizon, or the enforcement silently
    // evaporates with the catalog entry
    prop.orElse {
      val p = new org.apache.hadoop.fs.Path(
        servingTablePath(spark, table), HorizonMarker)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val txt =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        val v = txt.trim.toLongOption.getOrElse(throw new IllegalStateException(
          s"servingHorizon: unparseable horizon marker at $p " +
            s"(content: '${txt.take(40)}') — refusing to merge without " +
            "enforcement; repair or remove the marker explicitly"))
        Some(v)
      }
    }.getOrElse(Long.MinValue)
  }

  private val HorizonMarker = "_graft_tombstone_horizon"

  private def servingTablePath(spark: SparkSession, table: String): String =
    spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location.toString

  /** The horizon is recorded TWICE: as a table property (the catalog
    * surface SHOW TBLPROPERTIES exposes) and as a marker FILE inside
    * the table path (the [[snapshotHorizon]] pattern) — the property
    * dies with a session-scoped catalog, and a serving table is
    * path-backed, so only the in-path marker survives a re-attach.
    */
  private def recordServingHorizon(spark: SparkSession, table: String,
      horizon: Long): Unit =
    if (horizon != Long.MinValue) {
      // marker FIRST (the fail-closed ordering every horizon in this
      // file uses): the in-path file is the durable record, the catalog
      // property is session-scoped convenience — a crash between the
      // two leaves the durable one present, never the reverse
      val p = new org.apache.hadoop.fs.Path(
        servingTablePath(spark, table), HorizonMarker)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try out.write(horizon.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES(" +
        s"'graft.tombstone.horizon'='$horizon')")
    }

  /** The merge plan [[mergeServing]] executes — exposed so PlanShapeSpec
    * can pin its shape: the serving side scans its buckets IN PLACE (the
    * merge hint keeps the fixture-scale plan the SMJ shape the 100 TB
    * plan has) and the LWW-collapsed delta pays the ONLY key-bearing
    * Exchange, micro-batch-sized. Survival rules match the maintainer's
    * contract exactly: a delta event wins only STRICTLY by seq (a tie is
    * stale — same as the maintainer's `seq <= p_seq` rule), and a
    * winning 'D' lands as a TOMBSTONE row (op='D', fp null, the delete's
    * seq) rather than disappearing — dropping it would erase the only
    * evidence that the key died at that version, so a later merge
    * presenting a stale event older than the delete would see no current
    * row and resurrect the key (the exact divergence
    * snapshotDiffMaintain/compactSnapshotLog avoid by keeping tombstone
    * seqs). A delta-only 'D' (ghost delete) still lands a tombstone — a
    * later stale upsert for that key must lose to it too. Reads filter
    * op='U' ([[readServing]]).
    *
    * `tombstoneHorizon` (opt-in, default off) RETIRES tombstones with
    * seq ≤ horizon from the output generation — the serving-table
    * counterpart of [[compactSnapshotLog]]'s retention policy. Without
    * retirement a long-lived high-churn serving table accumulates one
    * op='D' row per key that ever died, forever; with it the tombstone
    * population is bounded by the keys deleted inside the retention
    * window. Safety is the SAME promise the log horizon makes: the
    * caller asserts no future delta will ever present an event with
    * seq ≤ horizon. Under that promise retirement is exact — a
    * tombstone at seq s ≤ horizon can only defeat events with seq ≤ s,
    * which never arrive; any event that does arrive has seq > horizon ≥
    * s and would defeat the tombstone anyway — so retire-then-merge ≡
    * merge-then-retire for every admissible delta (q330 gates the
    * commute). The filter rides the generation rewrite the merge
    * already pays: retirement costs zero extra passes. ADMISSIBILITY IS
    * ENFORCED, not assumed: when a horizon is set, a delta event with
    * seq ≤ horizon fails the merge loudly in-plan (the family's
    * fail-closed style) — such an event is exactly the resurrection
    * hazard retirement's exactness rests on excluding, and merging it
    * silently could re-insert a key whose defeating tombstone was
    * already retired.
    */
  private[graft] def servingMergePlan(spark: SparkSession, table: String,
      delta: DataFrame, srcBatch: Long,
      tombstoneHorizon: Long = Long.MinValue): DataFrame = {
    val admissible =
      if (tombstoneHorizon == Long.MinValue) delta
      else delta.where(assert_true(
        col("seq").cast("long") > lit(tombstoneHorizon),
        lit(s"mergeServing: delta event at seq <= tombstoneHorizon " +
          s"$tombstoneHorizon — inadmissible under the retirement " +
          "promise (could resurrect a retired key); merge without the " +
          "horizon or raise it")).isNull)
    val d = admissible
      .select(col("doc_id").cast("long").as("doc_id"), col("op"),
        col("fp").cast("long").as("fp"), col("seq").cast("long").as("seq"))
      .groupBy(col("doc_id"))
      .agg(max_by(struct(col("op"), col("fp"), col("seq")), col("seq"))
        .as("e"))
      .select(col("doc_id"), col("e.op").as("d_op"),
        col("e.fp").as("d_fp"), col("e.seq").as("d_seq"))
    val cur = spark.table(table).hint("merge")
      .select(col("doc_id"), col("op").as("c_op"), col("fp").as("c_fp"),
        col("seq").as("c_seq"), col("src_batch").as("c_src"))
    val takeDelta = col("d_seq").isNotNull &&
      (col("c_seq").isNull || col("d_seq") > col("c_seq"))
    val merged = cur.join(d, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(takeDelta, col("d_op")).otherwise(col("c_op")).as("op"),
        when(takeDelta, col("d_fp")).otherwise(col("c_fp")).as("fp"),
        when(takeDelta, col("d_seq")).otherwise(col("c_seq")).as("seq"),
        when(takeDelta, lit(srcBatch)).otherwise(col("c_src"))
          .as("src_batch"))
    if (tombstoneHorizon == Long.MinValue) merged
    else merged.where(!(col("op") === "D" &&
      col("seq") <= lit(tombstoneHorizon)))
  }

  /** Advance a [[materializeServing]] table by one CDC delta: a single
    * co-located merge pass over current ∪ delta — O(current + delta)
    * sequential work with a delta-sized shuffle, vs O(log) fold per
    * read. The output lands as a NEW bucketed generation (serving
    * tables swap, they are never patched in place — same reason
    * compaction swap-writes); callers flip readers to the returned
    * table name. Delta rows record `srcBatch` as their provenance.
    * Tombstones ride along generation to generation (see
    * [[servingMergePlan]]); read through [[readServing]]. Pass
    * `tombstoneHorizon` to retire dead tombstones in the same rewrite
    * (see [[servingMergePlan]] for the promise that makes it exact).
    *
    * Crash-recovery contract (same as [[scrubServingTombstones]]): the
    * horizon metadata lands AFTER the data write — an in-path marker
    * cannot survive saveAsTable's overwrite of that path — so a crash
    * in that window leaves a generation whose tombstones were retired
    * but whose horizon is unrecorded, i.e. a generation that would NOT
    * enforce delta admissibility. That generation was never adopted:
    * the RETURNED NAME is the commit point, and recovery is RE-RUN —
    * the overwrite is idempotent (same input generation, same delta,
    * same effective horizon → same rows, then the marker lands).
    * Adopting a generation by name this call never returned is outside
    * the contract, the rule every swap-write in this file follows.
    * StreamingSpec crash-injects exactly this window.
    */
  def mergeServing(spark: SparkSession, table: String, delta: DataFrame,
      outTag: String, buckets: Int = 8, srcBatch: Long = -1L,
      tombstoneHorizon: Long = Long.MinValue): String = {
    val out = s"graft_snap_serve_$outTag"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    // the effective horizon is the max of the caller's and the input
    // generation's recorded one — a past retirement binds every future
    // merge even if the caller never heard about it
    val eff = math.max(tombstoneHorizon, servingHorizon(spark, table))
    servingMergePlan(spark, table, delta, srcBatch, eff)
      .write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/graft_bucketed/$out")
      .saveAsTable(out)
    recordServingHorizon(spark, out, eff)
    out
  }

  /** Retire tombstones from a [[materializeServing]]/[[mergeServing]]
    * table WITHOUT a delta: rewrite the table as a new generation
    * dropping op='D' rows with seq ≤ `horizon`. Same promise and same
    * exactness argument as [[servingMergePlan]]'s `tombstoneHorizon` —
    * use this for a serving table that is read-heavy but rarely merged
    * (a merge-time horizon would wait indefinitely for the next delta).
    * Live rows are untouched; the bucketed layout is preserved, and the
    * rewrite is bucket-local (the filter is a non-key predicate, so no
    * key-bearing Exchange — at 100 TB this is a parallel scan+write,
    * never a shuffle). Returns the new table name.
    *
    * Crash-recovery contract: the horizon metadata lands AFTER the
    * data write (a marker inside the path cannot survive saveAsTable's
    * overwrite of that path), so a crash in that window leaves a
    * generation with retired tombstones but no recorded horizon. The
    * recovery is RE-RUN: the overwrite is idempotent (same input, same
    * horizon → same rows, then the marker lands). Adopting a
    * generation by name that this call never RETURNED is outside the
    * contract — the returned name is the commit point, the same rule
    * every swap-write in this file follows.
    */
  def scrubServingTombstones(spark: SparkSession, table: String,
      horizon: Long, outTag: String, buckets: Int = 8): String = {
    val out = s"graft_snap_serve_$outTag"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val eff = math.max(horizon, servingHorizon(spark, table))
    spark.table(table)
      .where(!(col("op") === "D" && col("seq") <= lit(eff)))
      .write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .option("path", s"$wh/graft_bucketed/$out")
      .saveAsTable(out)
    // the horizon is DURABLE metadata on the generation: later merges
    // read it, enforce delta admissibility against it, and carry it on
    recordServingHorizon(spark, out, eff)
    out
  }

  /** Crash-safe compaction for the grow-only per-batch partition stores
    * ([[dedupMaintain]]'s bands/shingles/verdicts, [[joinMaintain]]'s
    * sides and output): after thousands of micro-batches the stores hold
    * thousands of tiny `batch=<id>` partitions — a listing and
    * small-files problem at 100 TB. Compaction rewrites the WHOLE table
    * into a single reserved `batch=-1` partition via the swap protocol
    * (write to `_tmp` with the parquet job's `_SUCCESS` at its root,
    * delete + rename — [[recoverSwap]]'s contract, which the maintainers
    * now run on these stores before every read, so a crash in the rename
    * window is recovered and a half-written `_tmp` beside the live store
    * is ignored). Correctness under replay is preserved by construction:
    * only LEDGERED batches get compacted (run this between stream runs —
    * the single-maintainer caveat), a ledgered batch id is skipped on
    * replay so its now-merged partition is never recomputed, and the
    * reserved id −1 can never equal a live non-negative batchId, so the
    * "exclude own batch" index reads keep the compacted rows visible.
    */
  def compactState(spark: SparkSession, tablePath: String): Unit = {
    recoverSwap(spark, tablePath)
    if (stateExists(spark, tablePath)) {
      val dst = new org.apache.hadoop.fs.Path(tablePath)
      val tmp = new org.apache.hadoop.fs.Path(tablePath + "_tmp")
      val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // tiered-aware: fold the LIVE view (manifest-filtered), not the raw
      // directory — a raw read would double-count a committed segment
      // together with not-yet-GC'd member partitions, or include an
      // uncommitted orphan segment from a crashed tier fold
      readTiered(spark, tablePath).drop("batch")
        .write.mode("overwrite").parquet(tmp.toString + "/batch=-1")
      // the tmp-root completeness marker recoverSwap keys on is written
      // EXPLICITLY and LAST (the swapCommit ledger-last contract) — a
      // partitionBy write's own root marker placement depends on the
      // session's partitionOverwriteMode committer (dynamic mode stages
      // partitions and leaves no root _SUCCESS), and an absent marker
      // makes recovery DELETE the renamed store as a half-written orphan
      fs.create(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")).close()
      fs.delete(dst, true)
      fs.rename(tmp, dst)
      ()
    }
  }

  // ───────────────────────────────────────────────────────────────────
  // Tiered (LSM-style) segment compaction for the grow-only per-batch
  // partition stores — the 100 TB small-files fix PLANS.md's r13 analysis
  // called for. [[compactState]]'s whole-store rewrite every K batches is
  // O(store²/K) cumulative write amplification over a stream's life (the
  // reason an auto-cadence for these stores was REJECTED in r13); tiering
  // bounds it: K ledgered per-batch partitions fold into one level-1
  // segment, K level-L segments fold into one level-(L+1) segment, so a
  // row is rewritten once per level = O(log_K N) times total, and the
  // live partition count is ≤ K per level × O(log_K N) levels instead of
  // one per batch forever.
  //
  // Crash safety has ONE commit point: the segment MANIFEST, a small
  // in-store file (`_graft_segments`, underscore-prefixed so parquet
  // listings ignore it) mapping each live segment id to the batch ids it
  // covers, rewritten via tmp-write → promote (the [[recoverSwap]]
  // discipline — a parse-valid tmp beside a missing manifest promotes,
  // an invalid one deletes). The live view is DEFINED by the manifest
  // ([[readTiered]]): a batch partition is visible iff not covered by a
  // live segment; a segment partition is visible iff listed. The fold
  // protocol (write segment → commit manifest → GC members) is therefore
  // safe at every crash point: before the commit the new segment is an
  // invisible orphan (overwrite-clobbered by the deterministic re-run;
  // for the FIRST-ever fold, where no manifest exists yet to define it
  // invisible, [[readSegManifest]] detects the sole level-1 orphan with
  // members intact and deletes it on read — see the discriminator note
  // there); after it the stale members are invisible and the next
  // cycle's GC sweep removes them. Segment writes stage through the parquet
  // committer's `_temporary`, so a mid-write crash leaves no visible
  // data files. Same single-maintainer caveat as every swap here.
  //
  // Only LEDGERED batches fold — the in-flight batch's partition is
  // never covered, so the maintainers' `batch =!= batchId` own-batch
  // exclusion (their stale-replay guard) keeps working, and a replayed
  // unledgered batch still overwrite-clobbers its own stale partition.
  // ───────────────────────────────────────────────────────────────────

  private val SegManifest = "_graft_segments"

  /** Segment partition ids are NEGATIVE (disjoint from batch ids ≥ 0 and
    * [[compactState]]'s reserved −1) and deterministic in (level, newest
    * covered batch), so a crashed fold's re-run writes the same id and
    * clobbers its own orphan: id = −((level << 40) | (maxCovered + 2)).
    * Level in the id keeps a parent distinct from its newest child
    * (same maxCovered, level + 1).
    */
  private def segId(level: Long, maxCovered: Long): Long =
    -((level << 40) | (maxCovered + 2))
  private def segLevel(id: Long): Long = (-id) >> 40

  private def segManifestPath(storeP: String) =
    new org.apache.hadoop.fs.Path(storeP, SegManifest)

  /** Parse a manifest body; None if structurally invalid. Format:
    * "v1" header, one "segId:b1,b2,..." line per live segment, "end"
    * terminator — the terminator is the completeness marker that lets
    * recovery tell a whole tmp from one that died mid-write.
    */
  private def parseSegManifest(txt: String): Option[Map[Long, Seq[Long]]] = {
    val lines = txt.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.headOption.contains("v1") && lines.lastOption.contains("end"))
      try Some(lines.drop(1).dropRight(1).map { line =>
        val Array(id, mem) = line.split(":", 2)
        id.toLong -> mem.split(",").filter(_.nonEmpty).map(_.toLong).toSeq
      }.toMap)
      catch { case scala.util.control.NonFatal(_) => None }
    else None
  }

  private def readFileText(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Live segments of a store: {segment id → covered batch ids}. Empty
    * for a store that has never tier-folded (including every pre-tiering
    * state directory — the format is backward compatible). Recovery
    * first: a missing manifest beside a COMPLETE tmp is the
    * delete→promote window (promote); an INVALID tmp is a dead first
    * write (delete). A corrupt LIVE manifest fails loudly — the write
    * protocol stages content before promoting, so corruption there is
    * real filesystem trouble, and treating it as "no segments" would
    * resurrect every GC-surviving stale member partition as live data.
    */
  private[graft] def readSegManifest(spark: SparkSession,
      storeP: String): Map[Long, Seq[Long]] = {
    val p = segManifestPath(storeP)
    val tmp = new org.apache.hadoop.fs.Path(storeP, SegManifest + "_tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) && fs.exists(tmp)) {
      if (parseSegManifest(readFileText(fs, tmp)).isDefined)
        fs.rename(tmp, p)
      else fs.delete(tmp, true)
      ()
    }
    if (!fs.exists(p)) {
      // A MISSING manifest is only "never tiered" when no segment
      // partitions survive. If partitions with id < -1 exist (segments
      // are the only writers of that id range), TWO states are possible
      // and must be told apart (r15 ADVICE — the blanket throw here
      // broke the first-fold crash window's auto-recovery):
      //
      //  (a) PRE-COMMIT ORPHAN of the FIRST-ever fold: fold = segment-
      //      write -> manifest-commit -> member-GC, so a crash between
      //      the first two steps of the very first fold leaves exactly
      //      one LEVEL-1 segment beside a store that never had a
      //      manifest — and NO GC has ever run, so every member batch
      //      partition (in particular batch=maxCovered, decoded from the
      //      segment id) is still intact. Ignoring the segment loses
      //      nothing; the deterministic re-run clobbers it. Recovery
      //      DELETES the orphan here (not just ignores it): the
      //      no-manifest fast path of readTiered is a plain partition
      //      read, which would otherwise double-count the orphan's rows
      //      against its still-live members.
      //
      //  (b) EXTERNAL MANIFEST LOSS after folds committed: members were
      //      GC'd at commit time (covered batch ids are never rewritten
      //      — ids grow monotonically and own-batch overwrite applies
      //      only to the uncovered in-flight batch), so batch=maxCovered
      //      is GONE for at least the first fold's segment. "No
      //      segments" would silently drop the folded rows and the next
      //      GC sweep would delete the live segments. Fail as loudly as
      //      the corrupt-manifest branch below.
      //
      // The discriminator: state (a) is exactly ONE orphan, at level 1,
      // with its batch=maxCovered member present (each fold commits the
      // manifest, so two orphans or a level>=2 orphan imply a commit
      // happened => the manifest existed => its absence is external
      // loss). Anything else throws.
      val storeRoot = new org.apache.hadoop.fs.Path(storeP)
      val orphanSegs =
        if (!fs.exists(storeRoot)) Seq.empty
        else fs.listStatus(storeRoot).toSeq.filter(_.isDirectory)
          .map(_.getPath.getName).filter(_.startsWith("batch="))
          .flatMap(_.stripPrefix("batch=").toLongOption)
          .filter(_ < -1L)
      val preCommitOrphan = orphanSegs match {
        case Seq(id) if segLevel(id) == 1L =>
          val maxCovered = ((-id) & ((1L << 40) - 1)) - 2L
          fs.exists(new org.apache.hadoop.fs.Path(
            s"$storeP/batch=$maxCovered"))
        case _ => false
      }
      if (preCommitOrphan) {
        fs.delete(new org.apache.hadoop.fs.Path(
          s"$storeP/batch=${orphanSegs.head}"), true)
        ()
      } else if (orphanSegs.nonEmpty)
        throw new IllegalStateException(
          s"readSegManifest: manifest at $p is MISSING but segment " +
            s"partitions ${orphanSegs.sorted.mkString("[", ",", "]")} " +
            "survive and are not a first-fold pre-commit orphan — the " +
            "manifest was lost externally; refusing to read or GC " +
            "(folded members are gone, so 'no segments' would silently " +
            "drop their rows); restore the manifest or remove the " +
            "segment partitions explicitly")
      Map.empty
    }
    else parseSegManifest(readFileText(fs, p)).getOrElse(
      throw new IllegalStateException(
        s"readSegManifest: corrupt segment manifest at $p — refusing to " +
          "read the store without it (stale member partitions could " +
          "double-count); repair or remove it explicitly"))
  }

  private def writeSegManifest(spark: SparkSession, storeP: String,
      segs: Map[Long, Seq[Long]]): Unit = {
    val p = segManifestPath(storeP)
    val tmp = new org.apache.hadoop.fs.Path(storeP, SegManifest + "_tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val body = ("v1" +: segs.toSeq.sortBy(_._1).map { case (id, mem) =>
      s"$id:${mem.sorted.mkString(",")}" } :+ "end").mkString("\n")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
    ()
  }

  /** The LIVE view of a tiered store, `batch` column included: committed
    * segments + batch partitions no live segment covers + the reserved
    * [[compactState]] fold. Everything else in the directory (orphan
    * segments from a crashed fold, stale members a crash left un-GC'd)
    * is invisible. With no manifest this is a plain read — zero overhead
    * for never-tiered stores.
    */
  private[graft] def readTiered(spark: SparkSession,
      storeP: String): DataFrame = {
    // manifest (and its recovery side effects — tmp promote, first-fold
    // orphan delete) BEFORE the parquet read: the read lists files
    // eagerly, so a post-listing delete would leave the plan pointing at
    // removed files
    val segs = readSegManifest(spark, storeP)
    val df = spark.read.parquet(storeP)
    if (segs.isEmpty) df
    else {
      // covered batch ids compress to contiguous RANGES before entering
      // the plan: folds take the oldest uncovered run, so coverage is one
      // run (or a few, after a compactState interleaving) — the predicate
      // stays O(ranges), not O(folded batches), over a stream's whole
      // life. Live segment ids are already bounded at O(K·log_K N).
      val covered = segs.values.flatten.toSeq.distinct.sorted
      val ranges = covered.foldLeft(List.empty[(Long, Long)]) {
        case ((lo, hi) :: tail, b) if b == hi + 1 => (lo, b) :: tail
        case (acc, b) => (b, b) :: acc
      }
      val coveredPred = ranges
        .map { case (lo, hi) => col("batch").between(lo, hi) }
        .reduce(_ || _)
      val live = segs.keys.toSeq
      df.where((col("batch") >= 0 && !coveredPred) ||
        col("batch") === -1L || col("batch").isin(live: _*))
    }
  }

  /** One tier-compaction cycle for a store, run inside the maintainer's
    * ledgered batch cycle after the ledger commit. `done` is the ledger
    * (only ledgered batches fold); `k` is the fan-in per level (< 2
    * disables). Folds the oldest k uncovered ledgered batch partitions
    * into a level-1 segment, then cascades: whenever a level holds k
    * segments, its oldest k fold into the next level. Each fold is
    * segment-write → manifest-commit → member-GC (see the protocol note
    * above); the entry GC sweep removes crash leftovers from any prior
    * cycle. Partition pruning makes each fold read exactly its members.
    */
  private[graft] def tierCompact(spark: SparkSession, storeP: String,
      done: Set[Long], k: Int): Unit = {
    if (k < 2 || !stateExists(spark, storeP)) return
    val root = new org.apache.hadoop.fs.Path(storeP)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partIds(): Seq[Long] =
      fs.listStatus(root).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("batch="))
        .flatMap(n => n.stripPrefix("batch=").toLongOption)
    var segs = readSegManifest(spark, storeP)
    def covered: Set[Long] = segs.values.flatten.toSet
    // GC sweep: anything neither live-batch nor listed segment nor the
    // compactState fold is a crash leftover (stale member or orphan)
    partIds().foreach { id =>
      val live = (id >= 0 && !covered.contains(id)) || id == -1L ||
        segs.contains(id)
      if (!live) {
        fs.delete(new org.apache.hadoop.fs.Path(s"$storeP/batch=$id"), true)
        ()
      }
    }
    def fold(memberIds: Seq[Long], coveredBatches: Seq[Long],
        level: Long): Unit = {
      val id = segId(level, coveredBatches.max)
      // coalesce(1): the fold exists to cut file counts, so the segment
      // lands as one file — micro-batch partitions are small by
      // construction here; at real scale the writer splits by size
      // (maxRecordsPerFile / a table format) instead of a fixed 1
      spark.read.parquet(storeP)
        .where(col("batch").isin(memberIds: _*)).drop("batch")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$storeP/batch=$id")
      segs = (segs -- memberIds) + (id -> coveredBatches.sorted)
      writeSegManifest(spark, storeP, segs) // THE commit point
      memberIds.foreach { m =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$storeP/batch=$m"), true)
        ()
      }
    }
    // level-1 folds: oldest k uncovered ledgered batches at a time
    var l0 = partIds().filter(id => id >= 0 && done.contains(id) &&
      !covered.contains(id)).sorted
    while (l0.size >= k) {
      fold(l0.take(k), l0.take(k), 1L)
      l0 = l0.drop(k)
    }
    // cascade: k segments at one level fold into the next
    var cascading = true
    while (cascading) {
      segs.keys.groupBy(segLevel).find(_._2.size >= k) match {
        case Some((lvl, ids)) =>
          val children = ids.toSeq.sortBy(segs(_).max).take(k)
          fold(children, children.flatMap(segs(_)), lvl + 1)
        case None => cascading = false
      }
    }
  }

  /** Retraction-capable streaming rollup — the CDC twin of
    * [[rollupMaintain]] and the one input class no other maintainer
    * handles: rows carry `op` ∈ {+1, −1} (insert / delete — a Flink-style
    * retract stream, e.g. the change feed of an upstream table), and the
    * per-type state keeps SIGNED sum-merged partials (count Σop, exact
    * decimal Σop·value), so a delete retracts exactly what its insert
    * added and the view converges to the rollup over the NET rows for
    * any interleaving of inserts and deletes across batches. MIN/MAX are
    * deliberately absent: extrema are not retractable from partials (a
    * deleted max needs the full value multiset — the reason retract
    * aggregates in stream processors keep per-key heaps); avg derives at
    * read time. Fully-retracted types (n = 0) drop from the view.
    * Signed sums are sum-merged ⇒ NOT replay-idempotent ⇒ the
    * atomically-committed [[swapCommit]] ledger rides along, same as
    * [[decayedMaintain]]. State is #types rows forever.
    */
  def cdcRollupMaintain(spark: SparkSession, changes: DataFrame,
      statePath: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val commitP = statePath + "/commit"
    val cellsP = commitP + "/cells"
    val ledgerP = commitP + "/ledger"
    guardOldLayout(spark, statePath, commitP, "cdcRollupMaintain")
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"))
      .agg(sum(col("op").cast("long")).as("n"),
        sum((col("op") * col("value")).cast(DecimalType(18, 4)))
          .cast(DecimalType(18, 4)).as("total_dec"))
    val q = changes.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        recoverCommit(spark, commitP)
        // STRICT ledger read (not the corrupt-tolerant readLedger): for
        // sum-merged state a swallowed ledger row means a double-merge;
        // inside the atomic commit dir a partial ledger cannot exist, so
        // a read failure here is real corruption and must surface
        val done: Set[Long] =
          if (stateExists(spark, ledgerP))
            spark.read.parquet(ledgerP).select(col("batch_id"))
              .collect().map(_.getLong(0)).toSet
          else Set.empty
        if (!done.contains(batchId)) {
          val incoming = partials(batch)
          val merged =
            if (stateExists(spark, cellsP))
              spark.read.parquet(cellsP)
                .withColumn("total_dec",
                  col("total_dec").cast(DecimalType(18, 4)))
                .unionByName(incoming)
                .groupBy(col("event_type"))
                .agg(sum(col("n")).as("n"),
                  sum(col("total_dec")).cast(DecimalType(18, 4))
                    .as("total_dec"))
            else incoming
          swapCommit(spark, merged, commitP, done, batchId)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverCommit(spark, commitP)
    spark.read.parquet(cellsP)
      .where(col("n") > 0L)
      .withColumn("total", col("total_dec").cast("double"))
      .withColumn("avg_v", col("total") / col("n").cast("double"))
      .drop("total_dec")
  }

  /** Incremental equi-JOIN view maintenance via foreachBatch — the
    * classic IVM delta rule (ΔJ = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB) for a
    * materialized join over two UNBOUNDED growing sides, the view family
    * the other maintainers don't cover (rollup/decay = aggregation, hll/
    * kmv = sketches, dedup/cc = similarity state; this is the join). The
    * input stream carries both sides tagged by a `side` column ('a'/'b')
    * with (k, id) rows; the maintained view is every (k, id_a, id_b)
    * pair. Per batch only delta-proportional work runs — the old×old
    * pair space is never re-joined — and the emitted pairs are complete
    * because a pair (i∈batch p, j∈batch q) is produced exactly once, in
    * batch max(p, q) (same-batch pairs via the ΔA⋈ΔB term). Exactly-once
    * is [[dedupMaintain]]'s grow-only posture: both side stores and the
    * output land as per-batch OVERWRITE partitions, reads exclude the
    * batch's own partition, so a replayed crash recomputes identical
    * deterministic rows and clobbers the stale attempt; the
    * corrupt-tolerant whole-rewrite ledger only skips work. At 100 TB
    * both side stores are tables bucketed on k (the
    * [[graft.ext.Dedup.writeBandIndexBucketed]] layout), so each delta
    * probe shuffles only the batch; a hot key is the join's own
    * semantics — AQE skew-split applies, not a cap. Returns the
    * accumulated joined view.
    */
  def joinMaintain(spark: SparkSession, rows: DataFrame,
      statePath: String, tierK: Int = 8): DataFrame = {
    val aP = statePath + "/a"
    val bP = statePath + "/b"
    val outP = statePath + "/out"
    val ledgerP = statePath + "/ledger"
    val q = rows.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ledgerP: same rename-window recovery as dedupMaintain's list
        Seq(aP, bP, outP, ledgerP).foreach(recoverSwap(spark, _))
        val done: Set[Long] = readLedger(spark, ledgerP)
        if (!done.contains(batchId)) {
          val da = batch.where(col("side") === "a")
            .select(col("k"), col("id")).localCheckpoint()
          val db = batch.where(col("side") === "b")
            .select(col("k"), col("id")).localCheckpoint()
          def old(p: String): DataFrame =
            if (stateExists(spark, p))
              readTiered(spark, p).where(col("batch") =!= batchId)
                .select(col("k"), col("id"))
            else da.limit(0)
          val aSide = da.unionByName(old(aP))
          val delta = aSide
            .join(db.select(col("k"), col("id").as("id_b")), Seq("k"))
            .select(col("k"), col("id").as("id_a"), col("id_b"))
            .unionByName(da
              .join(old(bP).select(col("k"), col("id").as("id_b")), Seq("k"))
              .select(col("k"), col("id").as("id_a"), col("id_b")))
          delta.write.mode("overwrite").parquet(s"$outP/batch=$batchId")
          da.write.mode("overwrite").parquet(s"$aP/batch=$batchId")
          db.write.mode("overwrite").parquet(s"$bP/batch=$batchId")
          ledgerCommit(spark, ledgerP, done, batchId)
          Seq(aP, bP, outP)
            .foreach(tierCompact(spark, _, done + batchId, tierK))
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverSwap(spark, outP)
    readTiered(spark, outP).drop("batch")
  }

  /** Online anomaly scoring with an offline-trained model — the
    * batch-train / stream-score split every production monitor runs:
    * `stats` is the (event_type, mean, std) table the BATCH q108 pipeline
    * trains (broadcast per micro-batch, refreshed by re-reading the
    * table), and the stream scores each completed hourly window against
    * it. Watermark bounds the windowed-count state; the stream-static
    * join never holds stream state for the dimension side. Late hours
    * re-emit corrected counts within the watermark (Update semantics);
    * the z arithmetic is q95's pinned tree, so streamed scores equal the
    * batch recomputation bit for bit (StreamingSpec pins it).
    */
  def rateScoreStream(events: DataFrame, stats: DataFrame): DataFrame = {
    val counts = events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("hour_ts"), col("event_type"), col("c"))
    val z = round(when(col("std") > 0.0,
      (col("c").cast("double") - col("mean")) / col("std")).otherwise(0.0), 9)
    counts.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("hour_ts"), col("c").as("n_events"),
        z.as("z"), (abs(z) > 3.0).as("spike"))
  }

  /** Streaming frequent-items profile: the native Misra-Gries summary
    * ([[graft.functions.HeavyHitters]]) as a Complete-mode streaming
    * aggregate — per micro-batch the partial summaries merge into the
    * state-store buffer, so state is `capacity` entries TOTAL regardless
    * of stream length or key cardinality (the always-on profiling
    * side-channel q98 runs in batch). The MG guarantee (est ≤ true,
    * true − est ≤ N/(capacity+1), presence above the bound) holds across
    * micro-batch merge order; when `capacity` exceeds the live key domain
    * no eviction ever fires and the summary IS the exact count map —
    * both regimes pinned by StreamingSpec.
    */
  def heavyHitterStream(events: DataFrame, capacity: Int): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events.agg(
      call_function("heavy_hitters", col("event_type"), lit(capacity)).as("sk"),
      count(lit(1)).as("n_total"))
  }

  /** Streaming incremental connected components via foreachBatch — the
    * cluster-map maintenance that turns [[dedupMaintain]]'s per-doc
    * verdicts into live duplicate CLUSTERS under daily edge arrivals.
    * Union-find re-expressed relationally: each micro-batch of edges is
    * RELABELED through the current root map (edge (a,b) → (root(a),
    * root(b)), unseen nodes root to themselves), the distinct non-loop
    * root pairs — a graph whose size is bounded by the BATCH, never the
    * accumulated corpus — run through the star-contraction CC, and the
    * resulting root merges rewrite the map. Because min-merge CC labels
    * roots to the minimum member and roots are themselves minimum
    * member ids, the maintained root of every node equals the batch
    * CC's cluster_id over ALL edges seen so far, for ANY arrival order
    * or batching (StreamingSpec pins it over interleaved chain/star
    * waves). Sum-free but not idempotent (a replayed merge is harmless,
    * a replayed APPEND of new singleton nodes is too — but the ledger
    * still guards the map swap so a replayed batch never races a
    * concurrent one; same posture as [[dedupMaintain]]). At 100 TB the
    * map-rewrite join touches only partitions holding AFFECTED roots in
    * a root-partitioned table; here the parquet map is swapped whole.
    * Returns the accumulated (id, root) map.
    */
  def ccMaintain(spark: SparkSession, edges: DataFrame,
      statePath: String): DataFrame = {
    val rootsP = statePath + "/roots"
    val ledgerP = statePath + "/ledger"
    val q = edges.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // ledgerP: same rename-window recovery as dedupMaintain's list
        Seq(rootsP, ledgerP).foreach(recoverSwap(spark, _))
        val done: Set[Long] = readLedger(spark, ledgerP)
        if (!done.contains(batchId)) {
          val eb = batch.select(col("a"), col("b")).localCheckpoint()
          val nodesB = eb.select(col("a").as("id"))
            .union(eb.select(col("b").as("id"))).distinct()
          val haveMap = stateExists(spark, rootsP)
          val roots0 =
            if (haveMap) spark.read.parquet(rootsP)
            else nodesB.select(col("id"), col("id").as("root")).limit(0)
          // nodes never seen before enter as their own root
          val newNodes = nodesB.join(roots0, Seq("id"), "left_anti")
            .select(col("id"), col("id").as("root"))
          val base = roots0.unionByName(newNodes).localCheckpoint()
          val lk = base.select(col("id"), col("root"))
          val rel = eb
            .join(lk.select(col("id").as("a"), col("root").as("ra")), Seq("a"))
            .join(lk.select(col("id").as("b"), col("root").as("rb")), Seq("b"))
            .where(col("ra") =!= col("rb"))
            .select(col("ra"), col("rb")).distinct()
          val merged =
            if (rel.isEmpty) base
            else {
              // batch-bounded root graph → star-contraction CC → root
              // rewrites. Star (O(log² n) rounds), NOT label-prop: the
              // relabeled root graph of an adversarial arrival order is
              // a long path (every third chain edge per wave stitches
              // into a diameter-n/3 root chain), exactly the shape
              // label-prop's O(diameter) rounds can't take.
              val cc = graft.ext.Dedup.connectedComponentsStar(
                rel, "ra", "rb")
              base.join(
                  cc.select(col("id").as("root"), col("cluster_id")),
                  Seq("root"), "left")
                .select(col("id"),
                  coalesce(col("cluster_id"), col("root")).as("root"))
            }
          swapWrite(spark, merged, rootsP)
          ledgerCommit(spark, ledgerP, done, batchId)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverSwap(spark, rootsP)
    spark.read.parquet(rootsP)
  }

  /** Streaming mini-batch k-means (Sculley-style) via foreachBatch — the
    * online codebook-refresh companion to the batch Lloyd trainer
    * ([[graft.ext.KMeans.trainCodebook]]): each micro-batch is assigned
    * to the CURRENT centroids (broadcast k rows, exact cosine, max_by
    * argmax — the same kernel as batch), and its per-(cid, dim)
    * fixed-point sums fold into the state table; centroids are the
    * running means. The state is k×dim (cid, dim, s1e9, n) rows forever,
    * and because the sums are the SAME floor(v·1e9) longs the batch
    * trainer's `tavg` uses, a single-batch run reproduces one Lloyd
    * round BIT-FOR-BIT (identical integer sums, identical two IEEE
    * divisions — StreamingSpec pins it). Multi-batch runs are classic
    * sequential mini-batch: batch i is assigned under the centroids
    * after batches 0..i−1 (arrival order matters, as in every online
    * k-means; counts conserve exactly). Init: the k smallest vec_ids of
    * the FIRST batch (deterministic; an actual orderBy+limit, so a first
    * batch whose ids don't start at 0 still seeds k centroids) — at
    * scale you would train the init offline (k-means‖,
    * `trainCodebookParallel`) and let the stream only refresh. Sum-merged
    * state is NOT replay-idempotent, so this maintainer carries the
    * batch-id ledger, committed ATOMICALLY with the cell table via
    * [[swapCommit]] (one directory rename covers both) — a crash between
    * state write and ledger write cannot double-merge the sums under
    * replay, unlike a ledger appended after the swap would allow.
    * Returns the centroid table (cid, ce, cn2, n_vectors).
    */
  def kmeansMaintain(spark: SparkSession, vecs: DataFrame,
      statePath: String, k: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dotExact
    val commitP = statePath + "/commit"
    val cellsP = commitP + "/cells"
    val ledgerP = commitP + "/ledger"
    guardOldLayout(spark, statePath, commitP, "kmeansMaintain")
    def centroidsOf(cells: DataFrame): DataFrame = cells
      .select(col("cid"), col("dim"),
        ((col("s1e9").cast("double") / lit(1e9)) /
          col("n").cast("double")).as("cv"),
        col("n"))
      .groupBy(col("cid"))
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("cv")))),
          _.getField("cv")).as("ce"),
        max(col("n")).as("n_vectors"))
      .withColumn("cn2", dotExact(col("ce"), col("ce")))
      .select(col("cid"), col("ce"), col("cn2"), col("n_vectors"))
    val q = vecs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        recoverCommit(spark, commitP)
        val done: Set[Long] =
          if (stateExists(spark, ledgerP))
            spark.read.parquet(ledgerP).select(col("batch_id"))
              .collect().map(_.getLong(0)).toSet
          else Set.empty
        if (!done.contains(batchId)) {
          val e = batch
            .select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double"))
                .as("embedding"))
            .withColumn("n2", dotExact(col("embedding"), col("embedding")))
            .localCheckpoint()
          // init = the ACTUAL k smallest vec_ids of the first batch (an
          // orderBy+limit, k rows) — the batch trainer's `vec_id < k`
          // shortcut assumes ids start at 0 and would leave the centroid
          // set EMPTY on a first batch whose ids all exceed k (ranged
          // arrival), silently assigning nothing forever. Identical to
          // the shortcut whenever ids 0..k−1 are present (the parity
          // fixture), robust when they aren't; fail loudly on an empty
          // first batch rather than persist degenerate state.
          val cents =
            if (stateExists(spark, cellsP))
              centroidsOf(spark.read.parquet(cellsP))
            else {
              val c0 = e.orderBy(col("vec_id")).limit(k)
                .select(col("vec_id").as("cid"), col("embedding").as("ce"),
                  col("n2").as("cn2"))
                .localCheckpoint()
              require(c0.count() > 0,
                s"kmeansMaintain: empty first batch cannot seed centroids")
              c0
            }
          val scored = e.join(broadcast(
              cents.select(col("cid"), col("ce"), col("cn2"))))
            .select(col("vec_id"), col("cid"),
              graft.ext.Similarity.cosine(
                dotExact(col("embedding"), col("ce")),
                col("n2"), col("cn2")).as("c_sim"))
          val assign = scored.groupBy(col("vec_id"))
            .agg(max_by(col("cid"), struct(col("c_sim"), -col("cid")))
              .as("cid"))
          val newCells = e.join(assign, "vec_id")
            .select(col("cid"), posexplode(col("embedding"))
              .as(Seq("dim", "v")))
            .groupBy(col("cid"), col("dim"))
            .agg(sum(floor(col("v") * lit(1e9)).cast("long")).as("s1e9"),
              count(lit(1)).as("n"))
          val merged =
            if (stateExists(spark, cellsP))
              spark.read.parquet(cellsP).unionByName(newCells)
                .groupBy(col("cid"), col("dim"))
                .agg(sum(col("s1e9")).as("s1e9"), sum(col("n")).as("n"))
            else newCells
          swapCommit(spark, merged, commitP, done, batchId)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    // zero-batch restart: recover a rename-window crash before reading
    recoverCommit(spark, commitP)
    centroidsOf(spark.read.parquet(cellsP))
  }

  /** Streaming ANN-INDEX maintenance — IVF ingest under a FIXED codebook
    * (the serving-side complement of [[kmeansMaintain]], which TRAINS:
    * serving pins the codebook because retraining moves cell boundaries
    * and would force a full re-index, so the two are separate
    * maintainers). Each arriving micro-batch of vectors is coarse-
    * quantized to its nearest centroid — the q45 assignment kernel:
    * broadcast k-row codebook join + `max_by` partial agg, one shuffled
    * row per vector, exact-decimal cosine with ties to the smallest cid —
    * and landed in the postings store as an OVERWRITE of its own
    * `batch=<id>` partition with the swapWrite batch-id ledger.
    * Assignment under a fixed codebook is deterministic and batching-
    * invariant, so a replayed batch recomputes identical rows and
    * clobbers its stale partition ([[dedupMaintain]]'s exactly-once
    * posture); [[compactState]] applies unchanged. At 100 TB the
    * postings store is a cell-bucketed table (probe joins prune to the
    * nprobe cells — [[graft.ext.Dedup.writeBandIndexBucketed]]'s analog
    * for IVF); here it is a per-batch parquet directory carrying the
    * cell id as a column. Returns the accumulated postings
    * (vec_id, cid, c_sim, n2, embedding).
    */
  def ivfMaintain(spark: SparkSession, vectors: DataFrame,
      statePath: String, codebook: DataFrame,
      tierK: Int = 8): DataFrame = {
    val postP = statePath + "/postings"
    val ledgerP = statePath + "/ledger"
    // k rows by construction — materialized once for every batch's join
    val cb = codebook.select(col("cid"), col("ce"), col("cn2"))
      .localCheckpoint()
    val q = vectors.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Seq(postP, ledgerP).foreach(recoverSwap(spark, _))
        val done: Set[Long] = readLedger(spark, ledgerP)
        if (!done.contains(batchId)) {
          // the shared q45 assignment kernel — single source of truth with
          // the batch index builder (KMeans.writePostingsBucketed)
          graft.ext.KMeans.assignPostings(batch, cb)
            .write.mode("overwrite").parquet(s"$postP/batch=$batchId")
          ledgerCommit(spark, ledgerP, done, batchId)
          tierCompact(spark, postP, done + batchId, tierK)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverSwap(spark, postP)
    readTiered(spark, postP).drop("batch")
  }

  /** Promote the postings [[ivfMaintain]] accumulated into the BUCKETED
    * serving layout ([[graft.ext.KMeans.writePostingsBucketed]]) — the
    * ingest→serve hand-off a production index runs on a schedule: the
    * streamed per-batch partitions (write-optimized) are rewritten once
    * into the cid-bucketed table (read-optimized, zero-shuffle probes via
    * [[graft.ext.KMeans.probePostingsBucketed]]). Run between stream runs
    * (the single-maintainer caveat); the state store itself is untouched,
    * so ingest continues appending and a later promote refreshes the
    * serving table. Returns the serving table name.
    */
  def ivfPromoteBucketed(spark: SparkSession, statePath: String,
      tag: String, buckets: Int = 8): String = {
    val postP = statePath + "/postings"
    recoverSwap(spark, postP)
    require(stateExists(spark, postP),
      s"ivfPromoteBucketed: no postings at $postP — run ivfMaintain first")
    graft.ext.KMeans.writePostingsBucketed(
      readTiered(spark, postP).drop("batch"), tag, buckets)
  }

  /** Query the postings [[ivfMaintain]] accumulated: rank cells per query
    * by centroid similarity, probe the best `nprobe`, exact-rescore ONLY
    * inside probed cells, return the top `k` per query — q45's serving
    * shape against the continuously-maintained index. The probe join is
    * equi on the cell id (partition/bucket-prunable at scale); queries are
    * assumed a small frame and broadcast onto the postings.
    */
  def ivfProbe(spark: SparkSession, statePath: String, codebook: DataFrame,
      queries: DataFrame, nprobe: Int = 2, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions.dotExact
    val postP = statePath + "/postings"
    recoverSwap(spark, postP)
    require(stateExists(spark, postP),
      s"ivfProbe: no postings at $postP — run ivfMaintain first")
    val postings = readTiered(spark, postP).drop("batch")
    val cb = codebook.select(col("cid"), col("ce"), col("cn2"))
    val qe = queries
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("q_emb"))
      .withColumn("q_n2", dotExact(col("q_emb"), col("q_emb")))
    val bySim = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("c_sim").desc, col("cid").asc)
    val probes = qe.join(broadcast(cb))
      .select(col("query_id"), col("q_emb"), col("q_n2"), col("cid"),
        graft.ext.Similarity.cosine(dotExact(col("q_emb"), col("ce")),
          col("q_n2"), col("cn2")).as("c_sim"))
      .withColumn("rn", row_number().over(bySim))
      .where(col("rn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("q_n2"), col("cid"))
    val topk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("cand_id").asc)
    postings.join(broadcast(probes), Seq("cid"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        graft.ext.Similarity.cosine(dotExact(col("q_emb"), col("embedding")),
          col("q_n2"), col("n2")).as("cosine_sim"))
      .withColumn("rank", row_number().over(topk).cast("int"))
      .where(col("rank") <= k)
  }

  /** Streaming SEARCH-INDEX maintenance — the inverted-index ingest for
    * BM25 serving ([[bm25Search]]). State is two per-batch-partitioned
    * stores: `postings` (term, doc_id, tf — the FULL vocabulary, since
    * ingest can't know future queries) and `doclens` (doc_id, dl). Both
    * are deterministic functions of the batch ⇒ per-batch overwrite
    * partitions + the swapWrite batch-id ledger ([[dedupMaintain]]'s
    * exactly-once posture), and [[compactState]] applies unchanged.
    * The corpus statistics BM25 needs (N, Σdl, per-term df) DERIVE from
    * the stores at query time — df re-aggregates the postings (strictly
    * fewer rows than the token stream), so no sum-merged state exists
    * and replay-idempotence is free; at 100 TB the stores are term- /
    * doc-bucketed tables and the df/N rollup is a small maintained view.
    * Returns the accumulated (doc_id, dl) table.
    */
  def bm25Maintain(spark: SparkSession, docs: DataFrame,
      statePath: String, tierK: Int = 8): DataFrame = {
    import graft.ext.TextAnalysis
    val postP = statePath + "/postings"
    val dlP = statePath + "/doclens"
    val ledgerP = statePath + "/ledger"
    val q = docs.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Seq(postP, dlP, ledgerP).foreach(recoverSwap(spark, _))
        val done: Set[Long] = readLedger(spark, ledgerP)
        if (!done.contains(batchId)) {
          val b = batch.select(col("doc_id"), col("text")).localCheckpoint()
          val tf = b
            .select(col("doc_id"),
              explode(TextAnalysis.tokens(col("text"))).as("term"))
            .groupBy(col("term"), col("doc_id"))
            .agg(count(lit(1)).as("tf"))
          val dl = b.select(col("doc_id"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("dl"))
          tf.write.mode("overwrite").parquet(s"$postP/batch=$batchId")
          dl.write.mode("overwrite").parquet(s"$dlP/batch=$batchId")
          ledgerCommit(spark, ledgerP, done, batchId)
          Seq(postP, dlP)
            .foreach(tierCompact(spark, _, done + batchId, tierK))
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    recoverSwap(spark, dlP)
    readTiered(spark, dlP).drop("batch")
  }

  /** BM25 ranked retrieval over the index [[bm25Maintain]] accumulated —
    * q83's exact scoring (k1 = 1.2, b = 0.75, LINEAR idf N/df, per-term
    * scores floor-truncated at 1e-9 so the per-doc sum is exact integer
    * arithmetic and ranking ties are impossible to get wrong), same
    * output schema, so the parity test compares against the batch q83
    * plan bit-for-bit. Scale shape: the postings scan prunes to the
    * query terms (term-bucketed at scale), df re-aggregates the pruned
    * postings, the 1-row stats frame broadcasts, and the top-k is a
    * TakeOrderedAndProject.
    */
  def bm25Search(spark: SparkSession, statePath: String,
      terms: Seq[String], k: Int = 20): DataFrame = {
    val postP = statePath + "/postings"
    val dlP = statePath + "/doclens"
    Seq(postP, dlP).foreach(recoverSwap(spark, _))
    require(stateExists(spark, postP) && stateExists(spark, dlP),
      s"bm25Search: no index at $statePath — run bm25Maintain first")
    val dl = readTiered(spark, dlP).drop("batch")
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("dl_sum"))
    val tf = readTiered(spark, postP).drop("batch")
      .where(col("term").isin(terms: _*))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        floor(((col("n_docs").cast("double") / col("df").cast("double")) *
          ((col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
              lit(0.75) * (col("dl").cast("double") /
                (col("dl_sum").cast("double") / col("n_docs").cast("double")))))))
          * lit(1e9)).cast("long").as("s9"))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(sum(col("s9")).as("s9"), count(lit(1)).as("n_terms"))
    perDoc.orderBy(col("s9").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("s9").desc, col("doc_id").asc)).cast("int"))
      .select(col("doc_id"), (col("s9").cast("double") / lit(1e9)).as("bm25"),
        col("n_terms").cast("int").as("n_terms"), col("rank"))
  }

  /** Streaming grouped top-k: the native bounded-heap aggregate
    * ([[graft.functions.TopKAgg]]) as a Complete-mode streaming agg —
    * per (group) key the state-store buffer holds at most k (key, id)
    * pairs, merged heap-union-truncate per micro-batch, so the
    * always-current "top events per type" leaderboard costs
    * #groups × k state forever. Unlike [[heavyHitterStream]]'s sketch
    * this is EXACT under any batching (strict total order ⇒ partial
    * merge = global top-k), so the parity test compares against the
    * batch window plan bit-for-bit. The top-k key here is the
    * microsecond event time ties-to-smallest-event-id — "latest k" —
    * but any BIGINT priority works.
    */
  def topKStream(events: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .groupBy(col("event_type"))
      .agg(call_function("top_k", col("us"), col("event_id"), lit(k))
        .as("tk"))
      .select(col("event_type"), posexplode(col("tk")))
      .select(col("event_type"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.key").as("us"), col("col.id").as("event_id"))
  }

  /** Stream-stream interval self-join — the "followed-by within N
    * minutes" pattern (funnel/causality analysis): pair each event with
    * the same user's subsequent events inside the interval. Both sides
    * carry a watermark and the join condition bounds event time on BOTH
    * ends, which is exactly what lets Structured Streaming expire join
    * state: a row can only match partners inside
    * [l_ts, l_ts + withinMinutes], so state is (lateness + interval)
    * bounded per user — without the upper bound the state store would
    * grow forever. Works identically on a batch frame (withWatermark is a
    * no-op there), which is what the parity test exploits.
    */
  def followedBy(events: DataFrame, withinMinutes: Int = 5): DataFrame = {
    val l = events.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = events.withWatermark("ts", "2 hours")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("user_id"), col("l_id"), col("r_id"), col("l_ts"),
        col("r_ts"))
  }

  /** LEFT-OUTER stream-stream interval join — [[followedBy]] keeping the
    * "never followed" rows: an event with NO successor inside the
    * interval emits exactly once, with null partner columns, after the
    * watermark passes l_ts + interval (outer results cannot be emitted
    * earlier — a matching right row could still arrive, so the emission
    * moment IS the state-expiry moment). This is the funnel-drop-off
    * detector: matched rows say "followed by", null rows say "abandoned
    * here". Same bounded-state argument as the inner form. CONTRACT: a
    * terminating run only emits outer results whose join window CLOSED
    * under the final watermark — rows within (lateness + interval) of
    * the stream's end stay pending, so batch parity holds on the
    * closable region (the parity test states it exactly).
    */
  def followedByOuter(events: DataFrame,
      withinMinutes: Int = 5): DataFrame = {
    val l = events.withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
    val r = events.withWatermark("ts", "2 hours")
      .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
    l.join(r,
      col("user_id") === col("r_user") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
      "left_outer")
      .select(col("user_id"), col("l_id"), col("l_ts"), col("r_id"),
        col("r_ts"))
      .withColumn("followed", col("r_id").isNotNull)
  }

  /** Stream-static enrichment join — the standard streaming dimension
    * join: each micro-batch equi-joins a STATIC (batch) dimension frame
    * with no state at all (the dimension is re-planned per batch, so a
    * dimension refresh between batches is picked up automatically). At
    * scale the dimension side is broadcast; the stream side never
    * shuffles for the join. Inner join keeps watermark semantics intact
    * for any downstream windowed aggregation.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "inner")

  /** End-to-end INCREMENTAL corpus curation: the batch q62 pipeline
    * (quality + language-ID + keeper dedup on the content fingerprint) as
    * one streaming query. Signal extraction is the same stateless narrow
    * projection as batch; the keeper stage is a watermarked streaming
    * dedup — `dropDuplicatesWithinWatermark` keyed on the fingerprint, so
    * state holds one entry per distinct fp seen inside the lateness window
    * and the watermark expires older fingerprints (the bounded-state
    * contract; an unbounded-history dedup would grow forever at 100 TB/day
    * ingest). Dedup runs BEFORE the quality/language filters, mirroring
    * q62's keeper-then-filter order. Batch keeps min(doc_id) per fp;
    * streaming keeps the FIRST ARRIVAL per fp — identical whenever arrival
    * order is id order (StreamingSpec pins parity that way).
    *
    * `docs` must carry an `ingest_ts` timestamp (stamped by the ingestion
    * layer — the arrival-time analog of the batch ledger's load time).
    */
  def curationStream(docs: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame = {
    import graft.ext.TextAnalysis
    val qc = TextAnalysis.qualityColumns(col("text")).toMap
    val lc = TextAnalysis.langIdColumns(col("text")).toMap
    docs
      .select(col("doc_id"), col("ingest_ts"),
        qc("quality_score").as("quality_score"),
        qc("n_tokens").as("n_tokens"),
        lc("pred_lang").as("pred_lang"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
      .withWatermark("ingest_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .where(col("quality_score") >= 0.5 && col("pred_lang") =!= "und")
      .select(col("doc_id"), col("pred_lang"), col("quality_score"),
        col("n_tokens"))
  }

  /** Exactly-once ledgered streaming ingestion — the continuous analog of
    * the batch load ledger (`Ingestion.alreadyLoaded`, the reference's
    * idempotent delete+insert): Structured Streaming replays a failed
    * micro-batch under the SAME batchId, so the foreachBatch sink is
    * exactly-once iff it skips batch ids already committed to the ledger.
    * Each committed batch appends its rows partitioned by
    * `load_id = batchId` plus one ledger row; a replayed (or re-run)
    * batch id is a no-op, and downstream batch-scoped reads prune to the
    * new partition directory. At 100 TB this is the standard streaming
    * warehouse sink: partition-append + transactional-enough ledger, no
    * external coordinator.
    */
  def ledgeredIngest(streamed: DataFrame, catalog: graft.pipeline.Catalog,
      schema: String, table: String): Unit = {
    val ledger = s"${table}__ledger"
    val q = streamed.writeStream
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val done: Set[Long] =
          if (catalog.exists(schema, ledger))
            catalog.read(schema, ledger).select("batch_id")
              .collect().map(_.getLong(0)).toSet
          else Set.empty
        if (!done.contains(batchId)) {
          catalog.appendBatched(
            df.withColumn("load_id", lit(batchId)), schema, table)
          val s = df.sparkSession
          import s.implicits._
          catalog.append(Seq(batchId).toDF("batch_id"), schema, ledger)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Run a streaming query to completion over currently-available data
    * (memory sink), returning the result — used by tests to assert
    * streaming/batch parity.
    *
    * `Trigger.AvailableNow` processes everything pending in as few
    * micro-batches as possible and then terminates on its own — no
    * `processAllAvailable` polling and no empty trailing batches.
    *
    * `statePartitions` sizes the state store to the key domain: streaming
    * state partition count is pinned by the first batch's checkpoint, so
    * it should be chosen from expected distinct keys (here: windows ×
    * event types, a few thousand), not inherited from the batch shuffle
    * width — each state partition costs a store instance plus per-batch
    * delta-file commits.
    */
  def runToBatch(spark: SparkSession, streamed: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Complete(),
      statePartitions: Int = 8): DataFrame = {
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = streamed.writeStream
        .format("memory").queryName(name).outputMode(outputMode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    spark.table(name)
  }
}
