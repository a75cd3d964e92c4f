package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Time-window operators over the `events` audit table — the batch
  * formulation of the reference docs' scheduled/nightly incremental sync
  * generalization (/root/reference/insights.md:169-172; SURVEY.md §2.9).
  * The Structured Streaming variants of the same aggregations live in
  * [[graft.streaming.Streams]]; the batch forms declared here are the
  * DuckDB-oracle-checkable ones.
  */
object Windowed {

  /** Tumbling 1-hour window counts per event type:
    * `groupBy(window($"ts", "1 hour"), $"event_type")`. Spark's `window()`
    * aligns hour windows to the epoch, which for whole-hour widths equals
    * `date_trunc('hour', ts)` — the DuckDB-expressible equivalent.
    *
    * Scale shape: a hash aggregate with map-side partials on
    * (window, type) — cardinality = hours × types, tiny at any data
    * scale; the shuffle carries only partial counts.
    */
  def qWindowTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sliding (hopping) 1-hour windows every 30 minutes — the overlap
    * member of the window family (tumbling = slide == width; session =
    * data-driven bounds). Spark's `window(ts, "1 hour", "30 minutes")`
    * assigns each event to exactly width/slide = 2 epoch-aligned
    * windows, which the oracle reproduces by unioning the event's
    * 30-minute bucket with that bucket shifted back one slide.
    *
    * Scale shape: the window expression EXPANDS each row to its two
    * (window, type) assignments before the hash aggregate — the fanout
    * is width/slide (a plan constant, 2 here), map-side partials absorb
    * it, and the shuffle still carries only (window, type) partial
    * counts, cardinality ≈ 2 × hours × types. No join, no second pass:
    * at 100 TB the cost is one scan with a constant-factor expand,
    * exactly how overlap should be paid.
    */
  def qWindowSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .orderBy(col("window_start"), col("event_type"))

  /** Session windows via the lag-gap cumulative-sum formulation: a new
    * session starts when the gap to the previous event of the same user
    * exceeds 30 minutes. Deterministic ordering ties broken by event_id.
    * This is the batch-expressible dual of
    * [[graft.streaming.Streams.sessionCounts]]'s `session_window`.
    *
    * Scale shape: one shuffle on user_id (the window partition key);
    * per-user state is a sort within the partition — no driver
    * involvement, skew bounded by the busiest single user.
    */
  def qSessionGap(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000 // 30 min in microseconds
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }
}
