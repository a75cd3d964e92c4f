package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Streams

/** End-to-end streaming with checkpoint recovery — the actual hard part
  * of the reference docs' nightly incremental-sync story
  * (/root/reference/insights.md:169-172): a file-source drop folder
  * feeding the tumbling-window counts, a parquet sink with a
  * checkpoint, and a kill + restart in the middle. Exactly-once means
  * the restarted query neither loses the first run's windows nor
  * re-emits them.
  */
class StreamingRecoverySpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType)))

  private def drop(dir: String, evs: Seq[Ev]): Unit = {
    import spark.implicits._
    evs.toDF().coalesce(1).write.mode("append").json(dir)
  }

  private def runUntilDrained(input: String, cp: String,
    out: String): Unit = {
    val stream = spark.readStream.schema(schema).json(input)
    val q = Streams.tumblingCounts(stream)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def result(out: String): Seq[(String, String, Long)] =
    spark.read.parquet(out)
      .orderBy("window_start", "event_type").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSeq

  test("tumbling counts survive a kill + checkpoint restart exactly once") {
    val base = Files.createTempDirectory("graft_stream_e2e").toString
    val (input, cp, out) = (s"$base/in", s"$base/cp", s"$base/out")
    Files.createDirectories(java.nio.file.Paths.get(input))

    // run 1: two clicks in hour 10; the 13:30 event advances the
    // watermark to 11:30, finalizing the hour-10 window under the
    // 2-hour watermark + append mode
    drop(input, Seq(
      Ev(1, Timestamp.valueOf("2024-01-01 10:05:00"), 1, "click"),
      Ev(2, Timestamp.valueOf("2024-01-01 10:20:00"), 2, "click"),
      Ev(3, Timestamp.valueOf("2024-01-01 13:30:00"), 1, "flush")))
    runUntilDrained(input, cp, out)
    assert(result(out) == Seq(("2024-01-01 10:00:00.0", "click", 2L)))

    // the query is now DEAD (killed). Drop more data: one more hour-13
    // event plus an 18:00 event that finalizes hour 13 — then restart
    // from the same checkpoint
    drop(input, Seq(
      Ev(4, Timestamp.valueOf("2024-01-01 13:40:00"), 2, "click"),
      Ev(5, Timestamp.valueOf("2024-01-01 18:00:00"), 1, "flush")))
    runUntilDrained(input, cp, out)
    assert(result(out) == Seq(
      ("2024-01-01 10:00:00.0", "click", 2L),
      ("2024-01-01 13:00:00.0", "click", 1L),
      ("2024-01-01 13:00:00.0", "flush", 1L)))

    // restart once more with NO new data: exactly-once means nothing is
    // re-emitted from the already-committed files
    runUntilDrained(input, cp, out)
    assert(result(out).size == 3)
  }

  test("stateful sessionizer state survives a kill + checkpoint restart") {
    import graft.streaming.{SessionEvent, Streams}
    val base = Files.createTempDirectory("graft_session_e2e").toString
    val (input, cp, out) = (s"$base/in", s"$base/cp", s"$base/out")
    Files.createDirectories(java.nio.file.Paths.get(input))
    val sessSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    def run(): Unit = {
      import spark.implicits._
      val stream = spark.readStream.schema(sessSchema).json(input)
        .as[SessionEvent]
      val q = Streams.sessionizeStateful(stream)
        .toDF()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def dropS(evs: Seq[(Long, Long, String)]): Unit = {
      import spark.implicits._
      evs.map { case (u, e, t) =>
        graft.streaming.SessionEvent(u, e, Timestamp.valueOf(t)) }
        .toDF().coalesce(1).write.mode("append").json(input)
    }
    // run 1: one open session [10:00, 10:10] — custom flatMapGroups
    // state persists into the checkpoint when the query is killed
    dropS(Seq((1L, 1L, "2024-01-01 10:00:00"),
      (1L, 2L, "2024-01-01 10:10:00")))
    run()
    assert(!java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .anyMatch(p => p.toString.endsWith(".parquet")) ||
      spark.read.parquet(out).count() == 0)
    // run 2 (restarted from checkpoint): 12:50 advances the watermark
    // to 10:50, past the recovered session's 10:40 expiry; run 3 is
    // processed under that watermark, so the session RECOVERED FROM
    // STATE is guaranteed emitted (with both original events) by its end
    dropS(Seq((1L, 3L, "2024-01-01 12:50:00")))
    run()
    dropS(Seq((1L, 4L, "2024-01-01 13:00:00")))
    run()
    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_events") == 2L)
    assert(rows.head.getAs[Timestamp]("session_start") ==
      Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(rows.head.getAs[Timestamp]("session_end") ==
      Timestamp.valueOf("2024-01-01 10:10:00"))
  }

  test("rolling-count window cells survive a kill + checkpoint restart") {
    import graft.streaming.{RollingEvent, Streams}
    val base = Files.createTempDirectory("graft_rolling_e2e").toString
    val (input, cp, out) = (s"$base/in", s"$base/cp", s"$base/out")
    Files.createDirectories(java.nio.file.Paths.get(input))
    val rollSchema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    def run(): Unit = {
      import spark.implicits._
      val stream = spark.readStream.schema(rollSchema).json(input)
        .as[RollingEvent]
      val q = Streams.rollingStateful(stream)
        .toDF()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def dropR(evs: Seq[(Long, Long, String)]): Unit = {
      import spark.implicits._
      evs.map { case (u, e, t) =>
        RollingEvent(u, e, Timestamp.valueOf(t)) }
        .toDF().coalesce(1).write.mode("append").json(input)
    }
    def sec(t: String): Long =
      Math.floorDiv(Timestamp.valueOf(t).getTime, 1000L)
    // run 1: two user-1 events inside one hour; the 13:20 flush pushes
    // the watermark to 11:20, finalizing both (counts 1 and 2) — their
    // (second, count) window cells persist into the checkpoint
    dropR(Seq((1L, 1L, "2024-01-01 10:50:00"),
      (1L, 2L, "2024-01-01 11:10:00"),
      (99L, 3L, "2024-01-01 13:20:00")))
    run()
    // run 2 (restarted): the 11:40 event's trailing hour spans BOTH
    // recovered cells — count 3 proves the window state was restored,
    // not rebuilt from the live stream; 16:00 pushes the watermark to
    // 14:00, finalizing 11:40 and run 1's 13:20 flush event
    dropR(Seq((1L, 4L, "2024-01-01 11:40:00"),
      (99L, 5L, "2024-01-01 16:00:00")))
    run()
    // run 3: no new data — exactly-once, nothing re-emits
    run()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("s"), r.getAs[Long]("n_trailing_hour")))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(rows == Seq(
      (1L, 1L, sec("2024-01-01 10:50:00"), 1L),
      (1L, 2L, sec("2024-01-01 11:10:00"), 2L),
      (1L, 4L, sec("2024-01-01 11:40:00"), 3L),
      (99L, 3L, sec("2024-01-01 13:20:00"), 1L)))
  }
}
