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
    * (here: emit a closed session the moment a later one is known,
    * carrying a running event count; timeout closes idle sessions when
    * the watermark passes). State per user is O(1) — three longs — so
    * executor state scales with active users, not history.
    *
    * Out-of-order handling (ADVICE round 2 — the old gap test
    * `t - end <= gap` was vacuously true for any in-watermark event
    * earlier than the session end, silently corrupting session_start):
    * the trigger's events and the carried state are merged as
    * *intervals*. An event within `gap` of the active session on
    * either side extends it (session start CAN move down); an event
    * more than `gap` before the active session's start forms its own
    * earlier session, emitted closed immediately — the one divergence
    * from `session_window`, which could still merge it with even-later
    * stragglers; keeping one active interval per key is what bounds
    * state at O(1).
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
            // carried session + each event as (start, end, n) intervals,
            // merged where closer than the gap
            val ivs = (state.getOption.map(s => (s.start, s.end, s.n)).toSeq
              ++ evs.map(e => (e.ts.getTime, e.ts.getTime, 1L)).toSeq)
              .sortBy(iv => (iv._1, iv._2))
            val merged = ivs.foldLeft(List.empty[(Long, Long, Long)]) {
              case ((hs, he, hn) :: tail, (s2, e2, n2))
                  if s2 <= he + gapMs =>
                (hs, math.max(he, e2), hn + n2) :: tail
              case (acc, iv) => iv :: acc
            }.reverse
            // the latest interval stays active; every earlier one is
            // final (nothing in this trigger can extend it any more)
            val active = merged.last
            state.update(SessionState(active._1, active._2, active._3))
            state.setTimeoutTimestamp(active._2 + gapMs)
            merged.init.map { case (s2, e2, n2) =>
              SessionOut(user, new Timestamp(s2), new Timestamp(e2), n2)
            }.iterator
          }
      }
  }
}
