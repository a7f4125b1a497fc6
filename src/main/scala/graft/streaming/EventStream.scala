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

  /** Run a streaming query to completion over currently-available data
    * (memory sink), returning the result — used by tests to assert
    * streaming/batch parity.
    */
  def runToBatch(spark: SparkSession, streamed: DataFrame, name: String,
      outputMode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = streamed.writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
