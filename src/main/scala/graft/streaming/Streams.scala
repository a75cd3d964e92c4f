package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming generalization of the reference's scheduled /
  * nightly incremental sync (/root/reference/insights.md:169-172;
  * SURVEY.md §2.9). Each transform takes any events-shaped DataFrame —
  * batch or streaming — so the identical logical plan serves
  * `spark.read` and `spark.readStream`: the batch instantiations are the
  * declared oracle queries in [[graft.operators.Windowed]], the streaming
  * ones run with watermarked state under an incremental sink.
  *
  * State design for scale: every aggregation below keys its state by
  * (window/session, group key), and the watermark bounds state retention
  * — late events beyond 2 hours are dropped, so executor state stays
  * proportional to the active window, not the stream history.
  */
object Streams {

  /** Tumbling 1-hour counts per event type with a 2-hour watermark —
    * streaming dual of [[graft.operators.Windowed.qWindowTumbling]]. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** 30-minute-gap session windows per user via the native
    * `session_window` state operator — streaming dual of
    * [[graft.operators.Windowed.qSessionGap]]. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("user_id"), col("n_events"))

  /** Exactly-once ingest dedup on the logical event id within the
    * watermark horizon — the streaming analog of the reference docs'
    * idempotent re-sync requirement (resources re-fetched nightly must
    * not double-count). */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
}
