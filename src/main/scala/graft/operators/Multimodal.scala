package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** A multimodal record: opaque binary payload + typed metadata — the
  * columnar shape for image/audio/video at 100 TB (binary column stays
  * opaque to the engine; metadata columns drive pruning/partitioning). */
case class MediaDoc(doc_id: Long, content: Array[Byte], format: String)

/** One decoded/sampled frame of a media document. */
case class Frame(doc_id: Long, frame_idx: Int, width: Int, height: Int,
  pixel_hash: Long)

/** Multimodal column handling — the north-star extension for
  * image/audio/video corpora (BASELINE.json). The container ships no
  * codec libraries, so the *decode* step is a clearly-marked
  * deterministic STUB; everything Spark-side — schema, binary column
  * construction, metadata extraction, the typed mapPartitions decode
  * boundary, frame-row expansion — is real and tested.
  *
  * Scale design: the binary payload is carried as an opaque
  * `BinaryType` column (parquet keeps it out of dictionary/stats paths);
  * metadata extraction is pure codegen'd expressions so corpus-wide
  * filters (by size/format/hash) never touch a decoder; the decoder
  * boundary is `Dataset[MediaDoc].mapPartitions` — the documented
  * last-resort escape hatch (SURVEY §7.3), justified here because a
  * codec call cannot be a Catalyst expression — and emits a bounded
  * number of frame rows per document so the expansion factor is capped.
  */
object Multimodal {

  /** Binary ingest: wrap each document's text as a UTF-8 binary payload
    * with a format tag — the stand-in for reading image/audio bytes. */
  def mediaFrom(spark: SparkSession, dir: String): Dataset[MediaDoc] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"),
        lit("utf8-text").as("format"))
      .as[MediaDoc]
  }

  /** Metadata extraction over the binary column — byte length, content
    * digest, and deterministic "probe" dimensions — all built-in
    * expressions (no decode, no UDF), so corpus-scale filtering and
    * dedup on these columns is a pure columnar scan.
    */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val bin = encode(col("text"), "UTF-8")
    val nb = length(bin)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        lit("utf8-text").as("format"),
        nb.as("n_bytes"),
        md5(bin).as("content_md5"),
        (lit(320) + nb % 320).as("probe_width"),
        (lit(240) + nb % 240).as("probe_height"))
      .orderBy(col("doc_id"))
  }

  /** Real binary header parsing (r8 verdict item 7): the corpus rows
    * become genuine PNG / JPEG payloads — actual signature + IHDR
    * bytes, actual SOI → APP0 → SOF0 marker sequences, with dimensions
    * derived from doc_id and serialized big-endian by pure expressions
    * (`unhex(lpad(hex(...)))`) — and the codegen'd
    * [[graft.functions.ImageMeta]] expression parses them BACK. The
    * roundtrip makes the parse real: a byte-order, offset, or
    * marker-walk bug breaks the equality with the oracle's
    * independently-recomputed dimensions. No codec involved — headers
    * are public fixed formats, which is exactly why metadata filters
    * at 100 TB never need a decoder.
    */
  def qImageMeta(spark: SparkSession, dir: String): DataFrame = {
    val wd = (lit(16) + col("doc_id") % 640).cast("int")
    val ht = (lit(16) + col("doc_id") % 480).cast("int")
    def be(x: org.apache.spark.sql.Column, hexDigits: Int) =
      unhex(lpad(hex(x), hexDigits, "0"))
    // PNG signature + IHDR length/tag, width, height, bit depth 8,
    // color type 6, compression/filter/interlace 0, (fake) CRC
    val png = concat(
      unhex(lit("89504E470D0A1A0A0000000D49484452")),
      be(wd, 8), be(ht, 8), unhex(lit("0806000000DEADBEEF")))
    // SOI, JFIF APP0 (len 16), SOF0 (len 17: precision 8, height,
    // width, 3 components), EOI
    val jpeg = concat(
      unhex(lit("FFD8FFE000104A46494600010100000100010000FFC0001108")),
      be(ht, 4), be(wd, 4),
      unhex(lit("03012200021101031101FFD9")))
    val bin = when(col("doc_id") % 2 === 0, png).otherwise(jpeg)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.BinaryFunctions.imageMeta(bin).as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"))
      .orderBy(col("doc_id"))
  }

  /** Real WAV/RIFF header parsing — the audio member of the multimodal
    * metadata family, same discipline as [[qImageMeta]]: the corpus
    * rows become GENUINE WAV containers (RIFF/WAVE magic, a chunk walk
    * with an odd-sized LIST chunk planted before `fmt ` on odd ids to
    * exercise the WORD-alignment rule, the 16-byte PCM `fmt ` payload,
    * a `data` chunk header) serialized little-endian by pure
    * expressions, and the codegen'd [[graft.functions.AudioMeta]]
    * expression parses them BACK. The oracle recomputes
    * channels/rate/duration independently from doc_id, so any
    * endianness, offset, chunk-skip, or padding bug breaks the hash
    * compare. Duration is exact integer floor arithmetic:
    * data_bytes × 1000 / byte_rate.
    */
  def qAudioMeta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    def le(x: Column, nBytes: Int): Column =
      unhex(concat((0 until nBytes).map(k =>
        lpad(hex(shiftright(x, 8 * k).bitwiseAND(lit(255))), 2, "0")): _*))
    def ascii(s: String): Column = encode(lit(s), "UTF-8")
    val ch = (lit(1) + col("doc_id") % 2).cast("int")
    val sr = (lit(8000) * (lit(1) + col("doc_id") % 4)).cast("int")
    val bits = lit(16)
    val ba = (ch * lit(2)).cast("int")
    val br = (sr * ba).cast("int")
    val ds = (lit(1000) + col("doc_id") % 9000).cast("int")
    val riff = concat(ascii("RIFF"), le(lit(36) + ds, 4), ascii("WAVE"))
    // odd-sized LIST payload + its pad byte: the walk must skip 8+5+1
    val junk = concat(ascii("LIST"), le(lit(5), 4), ascii("INFOx"),
      unhex(lit("00")))
    val fmt = concat(ascii("fmt "), le(lit(16), 4), le(lit(1), 2),
      le(ch, 2), le(sr, 4), le(br, 4), le(ba, 2), le(bits, 2))
    val dataHdr = concat(ascii("data"), le(ds, 4))
    val bin = when(col("doc_id") % 2 === 1,
      concat(riff, junk, fmt, dataHdr))
      .otherwise(concat(riff, fmt, dataHdr))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.BinaryFunctions.audioMeta(bin).as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.channels").as("channels"),
        col("m.sample_rate").as("sample_rate"),
        col("m.bits_per_sample").as("bits_per_sample"),
        col("m.duration_ms").as("duration_ms"))
      .orderBy(col("doc_id"))
  }

  /** Real MP4/ISO-BMFF header parsing — the VIDEO member of the
    * decoder-free metadata family, same roundtrip discipline as
    * [[qImageMeta]]/[[qAudioMeta]]: the corpus rows become genuine
    * big-endian MP4 box sequences (ftyp with a per-id major brand, a
    * `free` box planted before moov on doc_id%3==1 to exercise the
    * unknown-box skip, moov/mvhd in BOTH spec versions — v0 32-bit and
    * v1 64-bit fields by id parity, full-length 100/112-byte payloads)
    * and the codegen'd [[graft.functions.VideoMeta]] box walk parses
    * them back. The oracle recomputes brand/timescale and the exact
    * floor-division duration_ms directly from doc_id, so a size
    * off-by-one, version-branch, or big-endian bug breaks the hash.
    */
  def qVideoMeta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    def be(x: Column, nBytes: Int): Column =
      unhex(concat((nBytes - 1 to 0 by -1).map(k =>
        lpad(hex(shiftright(x, 8 * k).bitwiseAND(lit(255))), 2, "0")): _*))
    def ascii(s: String): Column = encode(lit(s), "UTF-8")
    val brand = when(col("doc_id") % 3 === 0, lit("isom"))
      .when(col("doc_id") % 3 === 1, lit("mp42"))
      .otherwise(lit("avc1"))
    val ts = (lit(600) * (lit(1) + col("doc_id") % 5)).cast("int")
    val dur = (lit(1000) + col("doc_id") % 90000).cast("long")
    val ftyp = concat(be(lit(16), 4), ascii("ftyp"),
      encode(brand, "UTF-8"), be(lit(0), 4))
    val free = concat(be(lit(11), 4), ascii("free"), ascii("pad"))
    val tail80 = unhex(lit("00" * 80))
    // v0: 4 version+flags, 4+4 times, 4 timescale, 4 duration, 80 tail
    val mvhd0 = concat(be(lit(108), 4), ascii("mvhd"), be(lit(0), 4),
      be(lit(0), 4), be(lit(0), 4), be(ts, 4), be(dur.cast("int"), 4),
      tail80)
    // v1: version byte 1, 8+8 times, 4 timescale, 8 duration, 80 tail
    val mvhd1 = concat(be(lit(120), 4), ascii("mvhd"),
      unhex(lit("01000000")), be(lit(0), 8), be(lit(0), 8), be(ts, 4),
      be(dur, 8), tail80)
    val isV0 = col("doc_id") % 2 === 0
    val moov = concat(
      be(when(isV0, lit(116)).otherwise(lit(128)), 4), ascii("moov"),
      when(isV0, mvhd0).otherwise(mvhd1))
    val bin = when(col("doc_id") % 3 === 1, concat(ftyp, free, moov))
      .otherwise(concat(ftyp, moov))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.BinaryFunctions.videoMeta(bin).as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.major_brand").as("major_brand"),
        col("m.timescale").as("timescale"),
        col("m.duration_ms").as("duration_ms"))
      .orderBy(col("doc_id"))
  }

  /** Decode + frame-sample through the typed boundary. A real build
    * would invoke an image/video codec per record here; the container
    * has none, so the decode is a STUB: deterministic fake frames whose
    * count/dimensions/hash are pure arithmetic on the payload — which is
    * exactly what makes the plumbing (batch iteration, expansion bound,
    * output schema) testable and oracle-checkable.
    */
  def sampleFrames(media: Dataset[MediaDoc]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { docs =>
      docs.flatMap { d =>
        // STUB decode: replace with a codec call (e.g. JavaCV) in a
        // container that ships one. Deterministic fake below.
        val nBytes = d.content.length
        val nFrames = math.min(5, nBytes / 100 + 1)
        (0 until nFrames).iterator.map { i =>
          Frame(d.doc_id, i, 320 + nBytes % 320, 240 + nBytes % 240,
            d.doc_id * 1000003L + i * 97L)
        }
      }
    }
  }

  /** Declared query: binary ingest → typed decode boundary → frame rows,
    * ordered for the oracle (the stub's arithmetic is SQL-expressible,
    * so the whole plumbing path is hash-checked end-to-end).
    */
  def qFrameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaFrom(spark, dir))
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
}
