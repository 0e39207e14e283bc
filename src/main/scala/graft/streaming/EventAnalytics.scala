package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming analytics over an events stream (the `events` table shape:
  * ts, user_id, event_type, value) — the watermark + windowed-agg
  * surface the reference lacks entirely (SURVEY.md §2.6 "no windows, no
  * watermarks") and a 100 TB pipeline needs.
  *
  * All transforms are source-agnostic `Dataset` functions: feed them
  * from `readStream` (kafka/rate/memory) or from a batch DataFrame —
  * same plan, which is how the batch `q13_events_daily` oracle checks
  * the same aggregation logic the stream runs.
  */
object EventAnalytics {

  case class Event(ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Tumbling-window counts/sums per event type with a 10 s watermark:
    * late data beyond the watermark is dropped (vs. the reference,
    * which drops ALL unknown-run events immediately —
    * SchedulerProcessor.java:142-148). */
  def windowedTotals(events: Dataset[Event],
      windowLen: String = "1 minute",
      watermark: String = "10 seconds"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))
  }

  /** Per-user session windows (5 s gap): the sessionization primitive
    * for behavioral training data. */
  def userSessions(events: Dataset[Event],
      gap: String = "5 seconds",
      watermark: String = "10 seconds"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("user_id"), col("n_events"), col("session_value"))
  }
}
