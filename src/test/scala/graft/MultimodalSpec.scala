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

  // ---- real header parsing (ImageMeta) --------------------------------

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
    import spark.implicits._
    Seq(Tuple1(b)).toDF("bin")
      .select(graft.functions.BinaryFunctions.imageMeta(col("bin")).as("m"))
      .select("m.format", "m.width", "m.height").collect().headOption
      .flatMap(r => if (r.isNullAt(0) && r.isNullAt(1)) None
        else Some((r.getString(0), r.getInt(1), r.getInt(2))))
  }

  test("ImageMeta parses real PNG and JPEG headers, edge markers included") {
    // 3x2 PNG: signature, IHDR len/tag, w=3, h=2, depth/color/crc
    assert(parse(hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000003 00000002" +
        " 0806000000 DEADBEEF")) == Some(("png", 3, 2)))
    // baseline JPEG: SOI, JFIF APP0, SOF0 h=16 w=32
    assert(parse(hexBytes(
      "FFD8 FFE00010 4A46494600 0101 00 0001 0001 00 00" +
        " FFC00011 08 0010 0020 03 012200 021101 031101 FFD9")) ==
      Some(("jpeg", 32, 16)))
    // progressive JPEG (SOF2) with a COM segment and a TEM standalone
    // marker before the frame header
    assert(parse(hexBytes(
      "FFD8 FF01 FFFE0004 4849 FFC20011 08 0100 0180 03 012200 021101" +
        " 031101")) == Some(("jpeg", 384, 256)))
    // fill bytes before a marker are legal padding
    assert(parse(hexBytes(
      "FFD8 FFFF FFC00011 08 000A 0014 03 012200 021101 031101")) ==
      Some(("jpeg", 20, 10)))
  }

  test("ImageMeta rejects corrupt payloads as NULL rows, never failures") {
    assert(parse("not an image".getBytes("UTF-8")).isEmpty)
    assert(parse(Array.empty[Byte]).isEmpty)
    // PNG signature but truncated before the IHDR payload
    assert(parse(hexBytes("89504E470D0A1A0A 0000000D 494844")).isEmpty)
    // PNG signature with a non-IHDR first chunk
    assert(parse(hexBytes(
      "89504E470D0A1A0A 0000000D 58585858 00000003 00000002" +
        " 0806000000 DEADBEEF")).isEmpty)
    // JPEG that ends (EOI) before any SOF
    assert(parse(hexBytes("FFD8 FFE00004 4A46 FFD9")).isEmpty)
    // JPEG marker desynchronization (a non-FF where a marker must be)
    assert(parse(hexBytes("FFD8 00C0")).isEmpty)
    // JPEG SOF truncated mid-dimensions
    assert(parse(hexBytes("FFD8 FFC00011 08 00")).isEmpty)
    // zero dimensions are not an image
    assert(parse(hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000000 00000002" +
        " 0806000000 DEADBEEF")).isEmpty)
  }

  test("q_image_meta roundtrips built headers through the parser") {
    val rows = Multimodal.qImageMeta(spark, sfDir).collect()
    assert(rows.length ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == (if (id % 2 == 0) "png" else "jpeg"))
      assert(r.getInt(2) == 16 + (id % 640).toInt)
      assert(r.getInt(3) == 16 + (id % 480).toInt)
    }
    // stays a pure expression plan (no UDF, no object boundary)
    val plan = Multimodal.qImageMeta(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions") && !plan.contains("BatchEvalPython"))
  }

  // ---- real header parsing (AudioMeta) --------------------------------

  private def parseWav(
    b: Array[Byte]): Option[(String, Int, Int, Int, Long)] = {
    import spark.implicits._
    Seq(Tuple1(b)).toDF("bin")
      .select(graft.functions.BinaryFunctions.audioMeta(col("bin")).as("m"))
      .select("m.format", "m.channels", "m.sample_rate",
        "m.bits_per_sample", "m.duration_ms").collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None
        else Some((r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
          r.getLong(4))))
  }

  /** Hand-serialized canonical WAV header: mono, 8 kHz, 16-bit PCM,
    * byte_rate 16000, data 32000 bytes → exactly 2000 ms. */
  private val canonicalWav: String =
    "52494646 247D0000 57415645" + // RIFF <size> WAVE
      " 666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      " 64617461 007D0000" // data 32000

  test("AudioMeta parses real WAV headers, chunk order and padding included") {
    assert(parseWav(hexBytes(canonicalWav)) ==
      Some(("wav", 1, 8000, 16, 2000L)))
    // an odd-sized LIST chunk before fmt must be skipped WITH its pad
    // byte; stereo 44100 Hz, data 88200 → 500 ms
    assert(parseWav(hexBytes(
      "52494646 00000000 57415645" +
        " 4C495354 05000000 494E464F 78 00" + // LIST len 5 + pad
        " 666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000" +
        " 64617461 88580100")) == Some(("wav", 2, 44100, 16, 500L)))
  }

  test("AudioMeta rejects corrupt payloads as NULL rows, never failures") {
    assert(parseWav("not audio at all, nowhere near".getBytes).isEmpty)
    assert(parseWav(Array.empty[Byte]).isEmpty)
    // RIFF magic but not WAVE
    assert(parseWav(hexBytes(canonicalWav.replace("57415645",
      "58585858"))).isEmpty)
    // truncated before the fmt payload completes
    assert(parseWav(hexBytes(
      "52494646 24000000 57415645 666D7420 10000000 0100")).isEmpty)
    // missing data chunk entirely
    assert(parseWav(hexBytes(
      "52494646 24000000 57415645" +
        " 666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000"))
      .isEmpty)
    // zero byte_rate would divide by zero → quarantined, not thrown
    assert(parseWav(hexBytes(canonicalWav.replace("803E0000",
      "00000000"))).isEmpty)
    // zero channels
    assert(parseWav(hexBytes(canonicalWav.replace("0100 0100",
      "0100 0000"))).isEmpty)
  }

  test("AudioMeta survives a max-size chunk header without offset overflow") {
    // A declared chunk size of 0x7FFFFFFF is legal per the size<=Int.Max
    // gate, but 8 + size + pad overflows Int arithmetic: an Int walk
    // offset wraps negative, passes the loop guard, and indexes out of
    // bounds (a task failure). The Long walk must quarantine instead.
    // size FFFFFF7F le == 0x7FFFFFFF (odd → +1 pad byte on the advance)
    assert(parseWav(hexBytes(
      "52494646 24000000 57415645" +
        " 4C495354 FFFFFF7F 00000000 00000000 00000000")).isEmpty)
    // same with an even near-max size (0x7FFFFFF0)
    assert(parseWav(hexBytes(
      "52494646 24000000 57415645" +
        " 4C495354 F0FFFF7F 00000000 00000000 00000000")).isEmpty)
    // max-size chunk AFTER a valid fmt: still no data chunk reachable →
    // null, not an exception
    assert(parseWav(hexBytes(
      "52494646 24000000 57415645" +
        " 666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
        " 4C495354 FFFFFF7F 00000000")).isEmpty)
  }

  test("q_audio_meta roundtrips built WAV containers through the parser") {
    val rows = Multimodal.qAudioMeta(spark, sfDir).collect()
    assert(rows.length ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
    rows.foreach { r =>
      val id = r.getLong(0)
      val ch = 1 + (id % 2).toInt
      val sr = 8000 * (1 + (id % 4).toInt)
      val ds = 1000L + id % 9000
      assert(r.getString(1) == "wav")
      assert(r.getInt(2) == ch)
      assert(r.getInt(3) == sr)
      assert(r.getInt(4) == 16)
      assert(r.getLong(5) == ds * 1000L / (sr.toLong * ch * 2))
    }
    val plan = Multimodal.qAudioMeta(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions") && !plan.contains("BatchEvalPython"))
  }

  private def parseMp4(b: Array[Byte]): Option[(String, String, Int, Long)] = {
    import spark.implicits._
    Seq(Tuple1(b)).toDF("bin")
      .select(graft.functions.BinaryFunctions.videoMeta(col("bin")).as("m"))
      .select("m.format", "m.major_brand", "m.timescale", "m.duration_ms")
      .collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None
        else Some((r.getString(0), r.getString(1), r.getInt(2),
          r.getLong(3))))
  }

  /** Hand-serialized canonical MP4: ftyp isom + moov/mvhd v0,
    * timescale 600, duration 6000 units → exactly 10000 ms. */
  private val mvhdV0: String =
    "0000006C 6D766864 00000000 00000000 00000000 00000258 00001770" +
      " " + "00" * 80
  private val canonicalMp4: String =
    "00000010 66747970 69736F6D 00000000" + // ftyp isom
      " 00000074 6D6F6F76 " + mvhdV0 // moov > mvhd

  test("VideoMeta walks real MP4 boxes: v0/v1, skips, largesize, to-EOF") {
    assert(parseMp4(hexBytes(canonicalMp4)) ==
      Some(("mp4", "isom", 600, 10000L)))
    // a free box between ftyp and moov must be skipped
    assert(parseMp4(hexBytes(
      "00000010 66747970 6D703432 00000000" + // ftyp mp42
        " 0000000B 66726565 706164" + // free, 3-byte payload
        " 00000074 6D6F6F76 " + mvhdV0)) ==
      Some(("mp4", "mp42", 600, 10000L)))
    // v1 mvhd: 64-bit times/duration; timescale 1000, duration 2500
    assert(parseMp4(hexBytes(
      "00000010 66747970 61766331 00000000" +
        " 00000080 6D6F6F76" +
        " 00000078 6D766864 01000000" +
        " 0000000000000000 0000000000000000 000003E8" +
        " 00000000000009C4 " + "00" * 80)) ==
      Some(("mp4", "avc1", 1000, 2500L)))
    // largesize moov (size==1, 64-bit 124 = 16-byte header + mvhd 108)
    assert(parseMp4(hexBytes(
      "00000010 66747970 69736F6D 00000000" +
        " 00000001 6D6F6F76 000000000000007C " + mvhdV0)) ==
      Some(("mp4", "isom", 600, 10000L)))
    // size==0: moov runs to EOF (legal for the last top-level box)
    assert(parseMp4(hexBytes(
      "00000010 66747970 69736F6D 00000000" +
        " 00000000 6D6F6F76 " + mvhdV0)) ==
      Some(("mp4", "isom", 600, 10000L)))
  }

  test("VideoMeta rejects corrupt payloads as NULL rows, never failures") {
    assert(parseMp4("definitely not a movie file".getBytes).isEmpty)
    assert(parseMp4(Array.empty[Byte]).isEmpty)
    // moov/mvhd but no ftyp anywhere → no brand → quarantined
    assert(parseMp4(hexBytes("00000074 6D6F6F76 " + mvhdV0)).isEmpty)
    // moov without an mvhd child
    assert(parseMp4(hexBytes(
      "00000010 66747970 69736F6D 00000000 00000008 6D6F6F76")).isEmpty)
    // mvhd truncated: child size runs past the moov bound
    assert(parseMp4(hexBytes(
      "00000010 66747970 69736F6D 00000000" +
        " 00000018 6D6F6F76 0000006C 6D766864 00000000")).isEmpty)
    // zero timescale would divide by zero → quarantined, not thrown
    assert(parseMp4(hexBytes(canonicalMp4.replace("00000258",
      "00000000"))).isEmpty)
    // unknown mvhd version (2)
    assert(parseMp4(hexBytes(canonicalMp4.replace("6D766864 00000000",
      "6D766864 02000000"))).isEmpty)
    // child box with size < 8 cannot make progress
    assert(parseMp4(hexBytes(
      "00000010 66747970 69736F6D 00000000" +
        " 00000010 6D6F6F76 00000004 6D766864")).isEmpty)
  }

  test("q_video_meta roundtrips built MP4 containers through the parser") {
    val rows = Multimodal.qVideoMeta(spark, sfDir).collect()
    assert(rows.length ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
    rows.foreach { r =>
      val id = r.getLong(0)
      val brand = (id % 3) match {
        case 0 => "isom"; case 1 => "mp42"; case _ => "avc1"
      }
      val ts = 600 * (1 + (id % 5).toInt)
      val dur = 1000L + id % 90000
      assert(r.getString(1) == "mp4")
      assert(r.getString(2) == brand)
      assert(r.getInt(3) == ts)
      assert(r.getLong(4) == dur * 1000L / ts)
    }
    val plan = Multimodal.qVideoMeta(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions") && !plan.contains("BatchEvalPython"))
  }
}
