package graft

import org.apache.spark.sql.functions._

import graft.operators.Documents
import graft.sources.{BatchedSink, InJvmUpsertStore, TransientSinkError}

/** Top-level so the closure does not capture the (non-serializable)
  * spec instance: records committed rows and enforces the batch-size
  * bound by throwing (surfacing as a task failure) on violation. */
case class RecorderEndpoint(storeName: String, bound: Int)
    extends graft.sources.UpsertEndpoint {
  override def upsertBatch(batch: Seq[(String, String)]): Unit = {
    if (batch.isEmpty || batch.size > bound)
      throw new IllegalStateException(
        s"batch size ${batch.size} violates bound $bound")
    InJvmUpsertStore.get(storeName).committedRows.addAndGet(batch.size)
  }
}

/** Partition-batched external sink (SURVEY §2.1 S6 external form):
  * bounded batches, bounded retry, and exactly-once EFFECT via
  * idempotent upsert-by-key under injected transient failures with
  * partial batch effects.
  */
class SinkSpec extends SparkTestBase {

  private def sourceFrame(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (f"k$i%04d", s"payload-$i"))
      .toDF("key", "payload").repartition(4)
  }

  test("flaky endpoint with partial batch effects still lands every row exactly once") {
    val st = InJvmUpsertStore.fresh("spec_flaky")
    BatchedSink.write(sourceFrame(137),
      InJvmUpsertStore.FlakyEndpoint("spec_flaky", failFirstAttempt = true),
      batchSize = 10)
    // every row present with its latest payload, none duplicated/lost
    assert(st.rows.size() == 137)
    (0 until 137).foreach { i =>
      assert(st.rows.get(f"k$i%04d") == s"payload-$i")
    }
    // every batch needed exactly 2 attempts (fail + successful replay),
    // and the successful attempts committed each row exactly once
    import scala.jdk.CollectionConverters._
    assert(st.attempts.values().asScala.forall(_.get() == 2))
    assert(st.committedRows.get() == 137L)
  }

  test("batches respect the configured size bound") {
    InJvmUpsertStore.fresh("spec_sizes")
    BatchedSink.write(sourceFrame(57), RecorderEndpoint("spec_sizes", 10),
      batchSize = 10)
    assert(InJvmUpsertStore.get("spec_sizes").committedRows.get() == 57L)
  }

  test("retry exhaustion propagates the sink error instead of dropping data") {
    InJvmUpsertStore.fresh("spec_down")
    val e = intercept[Exception] {
      BatchedSink.write(sourceFrame(5),
        InJvmUpsertStore.AlwaysDownEndpoint("spec_down"),
        batchSize = 10, maxRetries = 2)
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(_.isInstanceOf[TransientSinkError]), e)
  }

  test("streaming ForeachWriter sink lands every row exactly once under flaky batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val st = InJvmUpsertStore.fresh("spec_stream")
    val input = MemoryStream[(String, String)](spark)
    val q = input.toDS()
      .writeStream
      .foreach(new graft.sources.UpsertForeachWriter(
        InJvmUpsertStore.FlakyEndpoint("spec_stream",
          failFirstAttempt = true), batchSize = 7))
      .outputMode("append").start()
    try {
      input.addData((0 until 40).map(i => (f"s$i%03d", s"v$i-a")))
      q.processAllAvailable()
      // a second epoch UPSERTS over half the keys — latest value wins
      input.addData((0 until 20).map(i => (f"s$i%03d", s"v$i-b")))
      q.processAllAvailable()
    } finally q.stop()
    assert(st.rows.size() == 40)
    (0 until 40).foreach { i =>
      val want = if (i < 20) s"v$i-b" else s"v$i-a"
      assert(st.rows.get(f"s$i%03d") == want)
    }
    // every batch attempt sequence was fail-once-then-succeed
    import scala.jdk.CollectionConverters._
    assert(st.attempts.values().asScala.forall(_.get() == 2))
  }

  test("q_sink_batched roundtrip equals the source practitioner table") {
    val got = Documents.qSinkBatched(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val want = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_suppkey")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == want)
    // and the flaky endpoint really did exercise retry underneath
    import scala.jdk.CollectionConverters._
    val st = InJvmUpsertStore.get("q_sink_batched")
    assert(st.attempts.values().asScala.forall(_.get() == 2))
  }

  test("q_sink_batched read-back is a distributed scan, not a driver dump") {
    val plan = Documents.qSinkBatched(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the read-back stage must be a parallel Range->slice-scan source;
    // a driver-side createDataFrame would show up as LocalTableScan
    assert(plan.contains("Range"), plan)
    assert(!plan.contains("LocalTableScan"), plan)
  }

  test("sliced store scan partitions the keyspace exactly") {
    import scala.jdk.CollectionConverters._
    val st = InJvmUpsertStore.fresh("slice_test")
    (0 until 101).foreach(i => st.rows.put(s"k$i", s"v$i"))
    val slices = (0 until 7).map(s =>
      InJvmUpsertStore.scanSlice("slice_test", s, 7).toSeq)
    assert(slices.flatten.sorted ==
      st.rows.values().asScala.toSeq.sorted)
    assert(slices.count(_.nonEmpty) > 1) // genuinely spread over tasks
  }
}
