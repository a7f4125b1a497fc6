package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming/batch parity: the same hourly rollup computed via
  * Structured Streaming (file micro-batches + watermark) and via the batch
  * plan must agree exactly; stateful per-user accumulation must match the
  * batch groupBy.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_stream").toString
    // land the sf0.001 events (micros ts) as the "arriving" files
    Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .write.mode("overwrite").parquet(d)
    d
  }

  test("streaming hourly window agg matches batch plan") {
    val streamed = EventStream.runToBatch(spark,
      EventStream.hourlyCounts(EventStream.readStream(spark, dir)),
      "hourly_out")
    val batch = spark.read.parquet(dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("total_value"))
      .select($"window.start".as("hour_ts"), $"event_type", $"n_events",
        $"total_value")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful per-user activity matches batch groupBy") {
    val streamed = EventStream.runToBatch(spark,
      EventStream.userActivity(
        EventStream.readStream(spark, dir)).toDF(),
      "user_out", org.apache.spark.sql.streaming.OutputMode.Update())
    val batch = spark.read.parquet(dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"value").as("total_value"))
    // Update mode emits one row per user per micro-batch; take the last
    val last = streamed
      .groupBy($"user_id")
      .agg(max($"n_events").as("n_events"), max($"total_value").as("total_value"))
    assert(last.count() == batch.count())
    val joined = last.as("s").join(batch.as("b"), "user_id")
      .where($"s.n_events" =!= $"b.n_events" ||
        abs($"s.total_value" - $"b.total_value") > 1e-9)
    assert(joined.isEmpty)
  }
}
