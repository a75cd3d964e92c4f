package graft

import org.apache.spark.sql.functions._

import graft.operators.{Frame, MediaDoc, Multimodal}

class MultimodalSpec extends SparkTestBase {

  test("mediaFrom produces binary payloads matching the source text") {
    val media = Multimodal.mediaFrom(spark, sfDir).collect()
    assert(media.nonEmpty)
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    media.foreach { m =>
      assert(new String(m.content, "UTF-8") == texts(m.doc_id))
      assert(m.format == "utf8-text")
    }
  }

  test("q_multimodal_meta extracts sizes and digests without decoding") {
    val df = Multimodal.qMultimodalMeta(spark, sfDir)
    val rows = df.collect()
    assert(rows.length ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
    rows.foreach { r =>
      assert(r.getAs[Int]("n_bytes") > 0)
      assert(r.getAs[String]("content_md5").matches("[0-9a-f]{32}"))
      val w = r.getAs[Int]("probe_width")
      assert(w >= 320 && w < 640)
    }
    // pure expression plan: no mapPartitions / DeserializeToObject
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions"))
  }

  test("sampleFrames caps expansion at 5 frames and is deterministic") {
    val media = Multimodal.mediaFrom(spark, sfDir)
    val frames = Multimodal.sampleFrames(media).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.doc_id)
    byDoc.values.foreach { fs =>
      assert(fs.length <= 5)
      assert(fs.map(_.frame_idx).sorted.toSeq == fs.indices.toSeq)
    }
    // stub decode is pure arithmetic on the payload
    frames.foreach { f =>
      assert(f.pixel_hash == f.doc_id * 1000003L + f.frame_idx * 97L)
    }
    val again = Multimodal.sampleFrames(media).collect()
    assert(frames.sortBy(f => (f.doc_id, f.frame_idx))
      .sameElements(again.sortBy(f => (f.doc_id, f.frame_idx))))
  }

  test("sampleFrames handles empty partitions and empty payloads") {
    import spark.implicits._
    val media = Seq(MediaDoc(1L, Array.empty[Byte], "utf8-text"))
      .toDS().repartition(8)
    val frames = Multimodal.sampleFrames(media).collect()
    // empty payload still yields the minimum single probe frame
    assert(frames.toSeq == Seq(Frame(1L, 0, 320, 240, 1000003L)))
  }
}
