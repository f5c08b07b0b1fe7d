package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming aggregations over an event stream (events-table schema:
  * event_id, ts, user_id, event_type, value, props): watermarked tumbling
  * windows and a custom-state operator via `mapGroupsWithState` — the
  * Structured Streaming surface of SURVEY.md §2 H.
  */
object EventWindows {

  /** Watermarked tumbling-window counts per event type. Works on a streaming
    * OR batch DataFrame (same plan both ways — used by the parity test).
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    // watermarks require TIMESTAMP (with zone); parquet written by pandas
    // carries TIMESTAMP_NTZ — normalize first
    val tz = events.withColumn("ts", col("ts").cast("timestamp"))
    val src = if (tz.isStreaming) tz.withWatermark("ts", watermark) else tz
    src.groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserState(events: Long, total: Double)
  final case class UserSummary(user_id: Long, events: Long, total: Double)

  /** Custom per-key state: running event count + value total per user via
    * `mapGroupsWithState` (the KeyValueGroupedDataset stateful path).
    */
  def userTotals(events: Dataset[UserEvent]): Dataset[UserSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserSummary](GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.events
          var tot = prev.total
          rows.foreach { e => n += 1; tot += e.value }
          state.update(UserState(n, tot))
          UserSummary(user, n, math.round(tot * 10000).toDouble / 10000)
      }
  }
}
