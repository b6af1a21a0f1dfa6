package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch twins of the streaming time-window operators (SURVEY.md §2.B
  * "B/S" rows). The `*Agg` bodies below are the SAME physical aggregations
  * `graft.streaming.Streams` applies to an unbounded DataFrame — the batch
  * queries wrap them with an ORDER BY for the oracle, the streaming paths
  * wrap them with a watermark. That shared-body equivalence is what the
  * MemoryStream parity specs in src/test assert.
  */
object Windowed {
  import Tables._
  type Q = (SparkSession, String) => DataFrame

  /** Tumbling 1-hour windows: count + sum per event_type. Epoch-aligned, so
    * the oracle can use date_trunc('hour'). Shared batch/stream body.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Relational.sumValue2(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  val qTumblingWindow: Q = (s, d) =>
    tumblingAgg(events(s, d)).orderBy("window_start", "event_type")

  /** Sliding windows, 1 hour wide, 15-minute slide: each event lands in 4
    * epoch-aligned windows. Shared batch/stream body.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), Relational.sumValue2(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  val qSlidingWindow: Q = (s, d) =>
    slidingAgg(events(s, d)).orderBy("window_start", "event_type")

  /** Session aggregation via `session_window` (30-minute gap) — the body
    * the streaming path uses. The batch twin below reproduces the same
    * sessions relationally (lag + running sum) because `session_window`'s
    * struct output is awkward for the oracle, and the parity spec asserts
    * both forms agree on (user_id, session_start, session_end, n, sum).
    */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Relational.sumValue2(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))

  /** Sessionization with a 30-minute inactivity gap, batch form: lag +
    * running sum of session-start flags — the oracle-checkable twin of
    * streaming `session_window`. Single shuffle on user_id; the window sort
    * is per-key, never global.
    */
  val qSessionize: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(asc("ts"), asc("event_id"))
    events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Relational.sumValue2(col("value")).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  val queries: Map[String, Q] = Map(
    "q_tumbling_window" -> qTumblingWindow,
    "q_sliding_window" -> qSlidingWindow,
    "q_sessionize" -> qSessionize
  )
}
