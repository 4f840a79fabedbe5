package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Decimals._

/** Event-stream analytics in batch form — the same logical plans
  * `graft.streaming.EventStreams` runs incrementally with Structured
  * Streaming (tumbling windows + watermark, gap-based sessionization
  * with state). Keeping a batch twin gives the driver's oracle a way to
  * check the semantics.
  */
object EventOps {

  /** q50: tumbling 1-hour window aggregation (the reference's trace
    * time-series summaries). Window start as epoch-µs so output is
    * timezone-tag-free. */
  def hourlyWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum6(col("value")).as("sum_value"))
      .orderBy("hour_us", "event_type")

  /** q51: gap-based sessionization (30-min inactivity gap) per user:
    * lag → new-session flag → running session counter → per-session
    * aggregates. One shuffle on user_id shared by both window passes. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_seconds(col("ts")) - unix_seconds(col("prev_ts")) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(cum))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        unix_seconds(min(col("ts"))).as("t_start_s"),
        unix_seconds(max(col("ts"))).as("t_end_s"),
        (unix_seconds(max(col("ts"))) - unix_seconds(min(col("ts")))).as("duration_s"),
        sum6(col("value")).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** q52: the built-in session_window operator (streaming-capable; see
    * graft.streaming.EventStreams.sessionWindows for the incremental
    * twin). window.end = last event + gap by definition. */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum6(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start_us")
}
