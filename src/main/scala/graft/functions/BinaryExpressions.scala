package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Image dimensions from REAL container bytes (r8 verdict item 7): the
  * multimodal metadata path's probe dimensions were stub arithmetic
  * because the container ships no codec libraries — but the published
  * container FORMATS need no codec for their headers. This expression
  * parses the two formats every public image-corpus pipeline meets:
  *
  *   - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
  *     chunk whose type tag sits at offset 12 and whose payload opens
  *     with width/height as big-endian uint32 at offsets 16/20
  *     (PNG spec §5.2/§11.2.2 — fixed offsets, IHDR is mandatory
  *     first).
  *   - JPEG: `FF D8` SOI, then a marker walk — each segment is
  *     `FF <marker> <len16be>` with len counting itself; standalone
  *     markers (TEM, RSTn) carry no length; the frame header SOFn
  *     (C0–CF minus the non-frame C4/C8/CC) carries precision(1),
  *     height(2), width(2) at payload offsets 0/1/3 (JPEG/JFIF
  *     interchange format — dimensions live in the SOF, not at a fixed
  *     offset, hence the walk).
  *
  * Output: struct(format, width, height), or NULL for anything that
  * does not parse (wrong signature, truncated header, marker
  * desynchronization, EOI before a SOF, zero dimensions) — corrupt
  * bytes become filterable rows, never a task failure, the same
  * quarantine posture as the PERMISSIVE JSON ingest. One primitive
  * per-row loop that stays inside whole-stage codegen next to the
  * scan: a 100 TB corpus filter on decoded-free metadata (drop tiny
  * images, partition by aspect bucket) runs at scan speed with zero
  * decoder involvement.
  */
case class ImageMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_image_meta"

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def be16(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)

  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def row(fmt: String, w: Long, h: Long): InternalRow =
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), w.toInt, h.toInt))

  def compute(b: Array[Byte]): InternalRow = {
    // PNG: fixed-offset signature + mandatory-first IHDR
    if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G' && u8(b, 4) == 0x0d &&
        u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a) {
      if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
        return null
      return row("png", be32(b, 16), be32(b, 20))
    }
    // JPEG: SOI then the marker walk to the first frame header
    if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 1 < b.length) {
        if (u8(b, i) != 0xff) return null // desynchronized
        var m = u8(b, i + 1)
        while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i += 2 // standalone marker, no length field
        } else if (m == 0xd9) {
          return null // EOI before any SOF
        } else {
          if (i + 3 >= b.length) return null
          val len = be16(b, i + 2)
          if (len < 2) return null
          val isSof = m >= 0xc0 && m <= 0xcf &&
            m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (len < 7 || i + 8 >= b.length) return null
            return row("jpeg", be16(b, i + 7).toLong, be16(b, i + 5).toLong)
          }
          i += 2 + len
        }
      }
      return null
    }
    null
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("imageMeta", this,
      classOf[ImageMeta].getName)
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = $self.compute($b);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(
    newChild: Expression): ImageMeta = copy(child = newChild)
}

/** Audio metadata from REAL container bytes — the audio dual of
  * [[ImageMeta]], closing the multimodal metadata family (image +
  * audio) without a codec: WAV is RIFF, a public fixed chunk format.
  *
  *   - `RIFF <size32le> WAVE`, then a chunk walk: each chunk is
  *     `<id4> <size32le> <payload>` with chunks WORD-aligned (odd sizes
  *     pad one byte — the classic parser bug, handled here);
  *   - the `fmt ` chunk carries audio_format(2le), channels(2le),
  *     sample_rate(4le), byte_rate(4le), block_align(2le),
  *     bits_per_sample(2le) at payload offsets 0/2/4/8/12/14;
  *   - the `data` chunk's size is the PCM byte count, so
  *     duration_ms = data_size * 1000 / byte_rate — exact integer
  *     arithmetic, floor division.
  *
  * Chunk order is NOT fixed by the spec (LIST/INFO chunks commonly
  * precede `fmt `), so the walk is generic — both chunks must be found
  * before emitting. NULL for anything that does not parse (bad magic,
  * truncated walk, missing fmt/data, zero byte_rate or channels) —
  * same quarantine posture as [[ImageMeta]]: corrupt bytes become
  * filterable rows, never task failures. Codegen'd, so a 100 TB
  * audio-corpus filter on sample-rate/duration runs at scan speed.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("duration_ms", org.apache.spark.sql.types.LongType,
      nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_audio_meta"

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  def compute(b: Array[Byte]): InternalRow = {
    if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return null
    // The walk offset is a Long: a declared chunk size near Int.MaxValue
    // (legal — only size > Int.MaxValue is rejected) would overflow an
    // Int offset to a negative value that still passes the loop guard
    // and indexes out of bounds. Long arithmetic makes an oversized
    // advance simply exit the guard and fall through to the null return
    // — the same corrupt-bytes-become-filterable-rows posture as
    // [[VideoMeta]]'s Long box walk.
    var off = 12L
    var channels = -1; var sampleRate = -1L; var byteRate = -1L
    var bits = -1; var dataSize = -1L
    while (off + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val i = off.toInt // off + 8 <= length, so the Int view is exact
      val size = le32(b, i + 4)
      if (size < 0 || size > Int.MaxValue) return null
      if (tag(b, i, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return null
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
        bits = le16(b, i + 22)
      } else if (tag(b, i, "data")) {
        dataSize = size
      }
      // chunks are WORD-aligned: odd payloads carry one pad byte
      off += 8L + size + (size & 1L)
    }
    if (channels <= 0 || sampleRate <= 0 || byteRate <= 0 || bits <= 0 ||
        dataSize < 0 || sampleRate > Int.MaxValue) return null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString("wav"), channels, sampleRate.toInt,
        bits, dataSize * 1000L / byteRate))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("audioMeta", this,
      classOf[AudioMeta].getName)
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = $self.compute($b);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(
    newChild: Expression): AudioMeta = copy(child = newChild)
}

/** Video metadata from REAL container bytes — the video member of the
  * decoder-free metadata family ([[ImageMeta]] PNG/JPEG, [[AudioMeta]]
  * WAV/RIFF): MP4 is ISO base-media (ISO/IEC 14496-12), a public
  * nested-box format whose movie header needs no codec.
  *
  *   - a file is a sequence of boxes `size32be type4 payload`; size
  *     includes the 8-byte header; size==1 means a 64-bit `largesize`
  *     follows the type; size==0 means the box runs to EOF (legal for
  *     the last top-level box only);
  *   - `ftyp` (spec: should be first) opens with major_brand(4 ascii);
  *   - `moov` is a pure container; its child `mvhd` carries
  *     version(1)+flags(3), then v0: creation(4) modification(4)
  *     timescale(4be) duration(4be) — or v1 with 64-bit
  *     creation/modification/duration;
  *   - duration_ms = duration * 1000 / timescale, exact floor
  *     arithmetic, the same discipline as the WAV duration.
  *
  * The walk skips unknown boxes at both levels (free/skip/mdat before
  * moov is common in real files) and recurses exactly one level, into
  * moov. NULL for anything that does not parse (no ftyp, truncated
  * box or header, moov without mvhd, zero timescale, negative or
  * overflowing sizes) — corrupt bytes become filterable rows, never
  * task failures. Codegen'd: a 100 TB video-corpus filter on
  * duration/timescale runs at scan speed with zero decoder
  * involvement.
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("major_brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ms", org.apache.spark.sql.types.LongType,
      nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_video_meta"

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** mvhd payload → (timescale, duration) or null. `i` is the payload
    * start (after the 8-byte box header), `end` its exclusive bound. */
  private def mvhdFields(b: Array[Byte], i: Int, end: Int): Array[Long] = {
    if (i + 4 > end) return null
    u8(b, i) match {
      case 0 =>
        if (i + 20 > end) return null
        Array(be32(b, i + 12), be32(b, i + 16))
      case 1 =>
        if (i + 32 > end) return null
        Array(be32(b, i + 20), be64(b, i + 24))
      case _ => null // unknown mvhd version
    }
  }

  def compute(b: Array[Byte]): InternalRow = {
    val n = b.length
    var i = 0
    var brand: String = null
    var ts = -1L; var dur = -1L
    while (i + 8 <= n && (brand == null || ts < 0)) {
      val size0 = be32(b, i)
      var payload = i + 8
      var boxEnd = 0L
      if (size0 == 1) { // 64-bit largesize follows the type
        if (i + 16 > n) return null
        val ls = be64(b, i + 8)
        if (ls < 16) return null
        payload = i + 16
        boxEnd = i + ls
      } else if (size0 == 0) { // to EOF — last box only
        boxEnd = n
      } else {
        if (size0 < 8) return null
        boxEnd = i + size0
      }
      if (boxEnd > n) return null // truncated box
      if (tag(b, i + 4, "ftyp")) {
        if (payload + 4 > boxEnd) return null
        brand = new String(b, payload, 4, "US-ASCII")
      } else if (tag(b, i + 4, "moov")) {
        // one-level recursion: scan moov's children for mvhd
        var j = payload
        while (j + 8 <= boxEnd && ts < 0) {
          val cs = be32(b, j)
          if (cs < 8 || j + cs > boxEnd) return null
          if (tag(b, j + 4, "mvhd")) {
            val f = mvhdFields(b, j + 8, (j + cs).toInt)
            if (f == null) return null
            ts = f(0); dur = f(1)
          }
          j += cs.toInt
        }
        if (ts < 0) return null // moov without mvhd
      }
      if (boxEnd <= i) return null // no forward progress
      i = boxEnd.toInt
    }
    if (brand == null || ts <= 0 || dur < 0 || ts > Int.MaxValue)
      return null
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString("mp4"), UTF8String.fromString(brand),
        ts.toInt, dur * 1000L / ts))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("videoMeta", this,
      classOf[VideoMeta].getName)
    nullSafeCodeGen(ctx, ev, b => s"""
      ${ev.value} = $self.compute($b);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(
    newChild: Expression): VideoMeta = copy(child = newChild)
}

object BinaryFunctions {
  /** struct(format, width, height) parsed from real PNG/JPEG header
    * bytes; NULL when the payload is not a parseable image header. */
  def imageMeta(bin: Column): Column =
    ColumnBridge.column(ImageMeta(ColumnBridge.expression(bin)))

  /** struct(format, channels, sample_rate, bits_per_sample,
    * duration_ms) parsed from real WAV/RIFF header bytes; NULL when the
    * payload is not a parseable WAV container. */
  def audioMeta(bin: Column): Column =
    ColumnBridge.column(AudioMeta(ColumnBridge.expression(bin)))

  /** struct(format, major_brand, timescale, duration_ms) parsed from
    * real MP4/ISO-BMFF box bytes; NULL when the payload is not a
    * parseable movie container. */
  def videoMeta(bin: Column): Column =
    ColumnBridge.column(VideoMeta(ColumnBridge.expression(bin)))
}
