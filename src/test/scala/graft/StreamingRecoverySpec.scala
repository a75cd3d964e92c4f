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
}
