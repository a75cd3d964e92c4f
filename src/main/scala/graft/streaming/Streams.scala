package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Input/output/state records for the custom stateful sessionizer. */
case class SessionEvent(user_id: Long, event_id: Long, ts: Timestamp)
case class SessionState(start: Long, end: Long, n: Long)
case class SessionOut(user_id: Long, session_start: Timestamp,
  session_end: Timestamp, n_events: Long)

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

  /** Custom per-key state machine via `flatMapGroupsWithState` — the
    * escape hatch for session semantics `session_window` can't express
    * (here: emit a closed session the moment a new one opens, carrying a
    * running event count; timeout closes idle sessions when the
    * watermark passes). State per user is O(1) — three longs — so
    * executor state scales with active users, not history.
    */
  def sessionizeStateful(events: Dataset[SessionEvent],
    gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, evs: Iterator[SessionEvent],
          state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(user, new Timestamp(s.start),
              new Timestamp(s.end), s.n))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t),
                    s.n + 1))
                case Some(s) =>
                  closed += SessionOut(user, new Timestamp(s.start),
                    new Timestamp(s.end), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
