package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, TernaryExpression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType,
  DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-sketching expressions. Round 2 built the text sketches
  * from higher-order array lambdas plus explode→aggregate shuffles;
  * these expressions collapse each sketch to one JIT-compiled per-row
  * loop (same motivation and structure as the vector expressions — HOF
  * lambdas evaluate interpreted, and explode+64-aggregate shapes pay a
  * full shuffle for what is per-row arithmetic). Hash parity — scoped
  * (ADVICE r3): [[ShingleHashes]] and [[SimHash64]] use Spark's own
  * XXH64 with the same seeding as the `xxhash64(...)` column function,
  * so their values are identical to the round-2 formulations (pinned
  * by TextOpsSpec). [[MinHashBandHashes]] deliberately changed hash
  * family in round 3: minhashes are `XXH64.hashLong(shingleHash,
  * seed=i)` and band buckets a fold-seeded hash of the band's rows,
  * whereas round 2 chained `xxhash64(s, lit(i))` — internally
  * consistent, but the signatures and buckets differ from round 2.
  * That is acceptable because the minhash query is declared rows-only;
  * its tested guarantee is behavioral (candidate parity with the exact
  * Jaccard path), not bitwise signature stability.
  *
  * Each expression's codegen emits a call to the expression's `compute`
  * method (a normal JVM method the JIT compiles) rather than inlining
  * loops into the generated source — inlined wide loops pushed the
  * generated method past HotSpot's 8 KB JIT limit for the LSH
  * signatures and ran interpreted.
  */

/** Distinct xxhash64 values of the word k-gram shingles of a token
  * array (one whole-text shingle when there are fewer than k tokens) —
  * the fused equivalent of
  * `transform(array_distinct(<zip of k shifted slices>), xxhash64)`.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  private val space = UTF8String.fromString(" ")

  private def hashOf(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  def compute(w: ArrayData): ArrayData = {
    val n = w.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n >= k) {
      var i = 0
      while (i <= n - k) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = w.getUTF8String(i + j); j += 1 }
        seen.add(hashOf(UTF8String.concatWs(space, parts: _*)))
        i += 1
      }
    } else {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = w.getUTF8String(j); j += 1 }
      seen.add(hashOf(UTF8String.concatWs(space, parts: _*)))
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleHashes", this,
      classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $self.compute($w);")
  }

  override protected def withNewChildInternal(
    newChild: Expression): ShingleHashes = copy(child = newChild)
}

/** LSH band hashes of a MinHash signature, fused: nHashes minima of
  * `XXH64.hashLong(shingleHash, seed=i)` computed in one pass over the
  * shingle-hash array, then each band of `nHashes / bands` consecutive
  * minima folded into one 64-bit band hash (seeded by the band index).
  * Replaces the round-2 explode → 64-min-aggregate → band-hash shuffle
  * with per-row arithmetic; 64-bit band buckets mean random collisions
  * are negligible, so candidates ≈ true near-dups.
  */
case class MinHashBandHashes(child: Expression, nHashes: Int, bands: Int)
    extends UnaryExpression {
  require(nHashes % bands == 0, "nHashes must be a multiple of bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash_bands"

  def compute(shash: ArrayData): ArrayData = {
    val rows = nHashes / bands
    val mins = Array.fill(nHashes)(Long.MaxValue)
    val n = shash.numElements()
    var s = 0
    while (s < n) {
      val h = shash.getLong(s)
      var i = 0
      while (i < nHashes) {
        val v = XXH64.hashLong(h, i)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var j = 0
      while (j < rows) { acc = XXH64.hashLong(mins(b * rows + j), acc); j += 1 }
      out(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minhashBands", this,
      classOf[MinHashBandHashes].getName)
    nullSafeCodeGen(ctx, ev, u => s"${ev.value} = $self.compute($u);")
  }

  override protected def withNewChildInternal(
    newChild: Expression): MinHashBandHashes = copy(child = newChild)
}

/** Frequency-weighted 64-bit SimHash of a token array, emitted as the
  * 64-char bitstring (MSB first) — bit-identical to the round-2
  * explode → 64-sum-aggregate formulation (each token occurrence votes
  * ±1 per bit of its `xxhash64`, i.e. XXH64 over the token bytes with
  * Spark's default seed 42), but computed in one per-row loop with no
  * shuffle at all.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_simhash64"

  def compute(w: ArrayData): UTF8String = {
    val cnt = new Array[Int](64)
    val n = w.numElements()
    var i = 0
    while (i < n) {
      val t = w.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
        t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
        b += 1
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(64)
    var b = 63
    while (b >= 0) { sb.append(if (cnt(b) > 0) '1' else '0'); b -= 1 }
    UTF8String.fromString(sb.toString)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhash", this,
      classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $self.compute($w);")
  }

  override protected def withNewChildInternal(
    newChild: Expression): SimHash64 = copy(child = newChild)
}

/** Per-ROW md5-plane SimHash signature halves — bit-for-bit the
  * aggregate formulation `TextOps.simhashMd5Halves` computes with an
  * explode → 64-sum shuffle, collapsed to one per-row loop:
  * struct(sig_hi, sig_lo) where each token OCCURRENCE votes ±1 per
  * bit of the top 16 hex chars of `md5(token)` (chars 1-8 → the high
  * 32 signature bits, 9-16 → the low) and a signature bit is
  * `vote count > 0` (ties vote 0).
  *
  * Why it exists (r13 verdict item 6): the STREAMING SimHash intake
  * must sign arriving documents ROW-LOCALLY — the batch family's
  * explode → groupBy vote aggregation is a streaming AGGREGATION
  * (state, watermark, update mode), and serving wants none of that.
  * This is the [[ClassifyScore]] posture applied to the signature: the
  * same arithmetic, stateless, append-mode-legal, and inside
  * whole-stage codegen. The batch family keeps the aggregate
  * formulation (its one exchange ships 24-byte rows and the HOF
  * md5-per-lambda blowup stays out of the plan); equality of the two
  * is parity-pinned in TextOpsSpec over the sf corpus.
  *
  * Hash parity with the oracle plane: `java.security.MessageDigest`
  * md5 over the token's UTF-8 bytes, first 8 bytes big-endian split
  * into two unsigned 32-bit halves — exactly the
  * `conv(substring(md5(t), 1|9, 8), 16, 10)` parse both engines run.
  * An EMPTY token array returns NULL (the aggregate formulation emits
  * no row for a doc the explode dropped; callers filter on it). */
case class SimhashMd5Sig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("sig_hi", LongType, nullable = false),
    StructField("sig_lo", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_simhash_md5"

  def compute(w: ArrayData): InternalRow = {
    val n = w.numElements()
    if (n == 0) return null
    val cnt = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val t = w.getUTF8String(i)
      md.reset()
      val dg = md.digest(t.getBytes)
      // chars 1-8 of the hex digest are bytes 0-3 big-endian (the
      // unsigned 32-bit value conv() parses); chars 9-16 are bytes 4-7
      val hi = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
        ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
      val lo = ((dg(4) & 0xffL) << 24) | ((dg(5) & 0xffL) << 16) |
        ((dg(6) & 0xffL) << 8) | (dg(7) & 0xffL)
      // aggregate-form bit map: signature bit b (63..32) reads bit
      // b-32 of hi, bit b (31..0) reads bit b of lo
      var b = 0
      while (b < 32) {
        if (((hi >>> b) & 1L) == 1L) cnt(32 + b) += 1 else cnt(32 + b) -= 1
        if (((lo >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
        b += 1
      }
      i += 1
    }
    var sigHi = 0L
    var sigLo = 0L
    var b = 0
    while (b < 32) {
      if (cnt(32 + b) > 0) sigHi |= (1L << b)
      if (cnt(b) > 0) sigLo |= (1L << b)
      b += 1
    }
    new GenericInternalRow(Array[Any](sigHi, sigLo))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simhashmd5", this,
      classOf[SimhashMd5Sig].getName)
    nullSafeCodeGen(ctx, ev, w => s"""
      ${ev.value} = $self.compute($w);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(
    newChild: Expression): SimhashMd5Sig = copy(child = newChild)
}

/** The FIRST PassJoin key index at which a (build, probe) head pair
  * collides under the multi-match-aware enumeration — the emit-once
  * predicate of the edit-distance joins (r14: the [[SimhashMd5Sig]] /
  * first-matching-table discipline applied to PassJoin, deleting the
  * pair-keyed `dropDuplicates` exchange the candidate set previously
  * paid, and making the cross probe STREAMING-LEGAL — a stateless
  * row-local predicate instead of a stateful distinct).
  *
  * Returns −1 when the shorts channel collides first (build len ≤ d,
  * probe len ≤ 2d, |Δ| ≤ d — the join's own length gate), else the
  * smallest segment index i whose build segment `seg_i(build)` occurs
  * in the probe head at a start inside the PVLDB'11 §4.2 window
  * computed for the TRUE build length (lo/hi mirror `editProbeKeys`
  * exactly: x = st − pᵢ must satisfy |x| + |Δ − x| ≤ d and
  * |Δ − x| ≤ d − i, truncated starts dropped), else −99 (no admissible
  * witness — for a pair at ed ≤ d this cannot happen, by the
  * multi-match-aware completeness argument the batch join already
  * relies on; candidates reachable ONLY through foreign assumed-length
  * windows are exactly the ones the DP would reject, so dropping them
  * pre-DP is free). A joined candidate row emits iff its key index
  * equals this value: per pair, exactly one row survives — no
  * exchange, no state.
  *
  * Capped-cell caveat (the family's documented shorts tradeoff,
  * unchanged in direction): when a degenerate cell's shorts keys were
  * star-reduced at index build, a non-min build row has no shorts key,
  * and a pair this expression routes to −1 has no joined row to emit
  * through — above the cap the pair stream is star-shaped exactly as
  * the batch contract states (healthy corpora never trip it; the
  * pure-star fixture is spec-pinned on both paths).
  *
  * Character semantics ride `UTF8String` (`numChars`/`substringSQL`),
  * matching Spark's own `length`/`substr` — a Java-String mirror
  * would count astral plane characters differently. */
case class EditFirstMatch(left: Expression, right: Expression, d: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"(${a.simpleString}, ${b.simpleString})")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_edit_first_match"

  def compute(build: UTF8String, probe: UTF8String): Int = {
    val k = d + 1
    val la = build.numChars()
    val lb = probe.numChars()
    val dl = lb - la
    if (math.abs(dl) > d) return -99 // outside the join's length gate
    if (la <= d && lb <= 2 * d) return -1 // shorts channel wins
    var i = 0
    while (i < k) {
      if (EditFirstMatch.windowWitness(build, probe, la, lb, dl, i, k, d))
        return i
      i += 1
    }
    -99
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("editFirstMatch", this,
      classOf[EditFirstMatch].getName)
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = $self.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
    newRight: Expression): EditFirstMatch =
    copy(left = newLeft, right = newRight)
}

object EditFirstMatch {
  /** Does PassJoin window `i` (of `k`, for TRUE build length `la`)
    * witness this (build, probe) pair — i.e. does build's i-th even
    * segment occur in the probe head at a start admissible under the
    * PVLDB'11 §4.2 multi-match-aware window (|x| + |Δ − x| ≤ d and
    * |Δ − x| ≤ d − i, truncated starts dropped)? Shared by
    * [[EditFirstMatch]] (full first-match scan, the registered SQL
    * surface) and [[EditEmitAt]] (the joins' hot path, which knows the
    * colliding index and probes it first). */
  def windowWitness(build: UTF8String, probe: UTF8String, la: Int,
      lb: Int, dl: Int, i: Int, k: Int, d: Int): Boolean = {
    val start = i * la / k
    val slen = (i + 1) * la / k - start
    if (slen <= 0) return false
    val seg = build.substringSQL(start + 1, slen)
    val slack = (d - math.abs(dl)) / 2
    val lo = math.max(math.min(dl, 0) - slack, dl - (k - 1 - i))
    val hi = math.min(math.max(dl, 0) + slack, dl + (k - 1 - i))
    var st = start + lo
    val stHi = start + hi
    while (st <= stHi) {
      if (st >= 0 && st + slen <= lb &&
          probe.substringSQL(st + 1, slen).equals(seg)) return true
      st += 1
    }
    false
  }
}

/** The PassJoin PROBE-side key enumeration fused to one codegen'd
  * per-row loop (r15 — the r14 verdict's q_edit_pairs cost finding,
  * second half): the distinct (idx, seg, blen) substring keys of a
  * probe head under the multi-match-aware window (PVLDB'11 §4.2)
  * across all assumed build lengths within ±d, plus the shorts key
  * when len ≤ 2d. Replaces a nested HOF chain
  * (`transform(sequence(...), la => transform(filter(sequence(...)),
  * st => struct(...)))` + `flatten` + `array_distinct`) that evaluated
  * INTERPRETED per element — the same lambda-cost motivation as every
  * fused expression in this file — and allocated ~k·(2d+1)²
  * intermediate structs per row before the distinct. Output set and
  * first-occurrence order are IDENTICAL to the HOF formulation
  * (parity-pinned in TextOpsSpec over randomized heads); the joins'
  * pair streams cannot move.
  *
  * `blen` is the ASSUMED build length `la` the window was computed
  * for (r17 — PVLDB'11 §4's length-segmented inverted index, the
  * structural fix for segment-key saturation: the build side's own
  * length joins this field, so the former `|Δ| ≤ d` post-join filter
  * becomes part of the equi-key, key diversity multiplies by ~(2d+1),
  * and a saturated cell's candidate mass splits by length before any
  * DP runs). The shorts key carries the `-1` sentinel — its channel
  * is per-lang by construction and keeps the post-join length gate.
  * Keys are distinct on the full (idx, la, seg) triple, so a segment
  * value shared across assumed lengths now emits one key per length —
  * a bounded ≤ (2d+1)× row-count trade for strictly smaller cells.
  *
  * Window math mirrors [[EditFirstMatch.windowWitness]] exactly with
  * roles swapped (this is the probe side: Δ = probe len − assumed
  * build len, segment boundaries from the ASSUMED length): a start
  * shift x = st − pᵢ is admissible iff |x| + |Δ − x| ≤ d and
  * |Δ − x| ≤ d − i; truncated substrings are dropped. lo ≤ Δ ≤ hi
  * always holds, so the enumeration is never empty-ranged. */
case class EditProbeKeys(child: Expression, d: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${t.simpleString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("seg", StringType, nullable = false),
    StructField("blen", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_edit_probe_keys"

  def compute(head: UTF8String): ArrayData = {
    val k = d + 1
    val m = head.numChars()
    val seen = new java.util.LinkedHashSet[(Int, Int, UTF8String)]()
    var i = 0
    while (i < k) {
      var la = math.max(m - d, 0)
      val laHi = m + d
      while (la <= laHi) {
        val start = i * la / k
        val slen = (i + 1) * la / k - start
        if (slen > 0) {
          val dl = m - la
          val slack = (d - math.abs(dl)) / 2
          val lo = math.max(math.min(dl, 0) - slack, dl - (k - 1 - i))
          val hi = math.min(math.max(dl, 0) + slack, dl + (k - 1 - i))
          var st = start + lo
          val stHi = start + hi
          while (st <= stHi) {
            if (st >= 0 && st + slen <= m)
              seen.add((i, la, head.substringSQL(st + 1, slen)))
            st += 1
          }
        }
        la += 1
      }
      i += 1
    }
    val out = new Array[Any](seen.size + (if (m <= 2 * d) 1 else 0))
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) {
      val (idx, la, seg) = it.next()
      out(j) = new GenericInternalRow(Array[Any](idx, seg, la))
      j += 1
    }
    if (m <= 2 * d)
      out(j) = new GenericInternalRow(Array[Any](-1,
        UTF8String.fromString("short"), -1))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("editProbeKeys", this,
      classOf[EditProbeKeys].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $self.compute($h);")
  }

  override protected def withNewChildInternal(
    newChild: Expression): EditProbeKeys = copy(child = newChild)
}

/** Emit-once predicate of the edit-distance joins in its JOIN-AWARE
  * form (r15, closing the r14 verdict's per-candidate-cost finding):
  * TRUE iff `idx` — the PassJoin key index this candidate row actually
  * collided on — equals [[EditFirstMatch]]'s first-match index for the
  * pair. Decision-identical to
  * `idx === graft_edit_first_match(build, probe, d)` (parity-pinned in
  * FunctionsSpec over randomized corpora), but ordered for the join's
  * cost profile:
  *
  *   1. probe window `idx` FIRST — a candidate reachable only through
  *      a foreign assumed-length window (seg content collided under an
  *      assumed build length ≠ the true one) has no true-length witness
  *      at `idx`, and the old first-match scan paid all k·(2d+1)
  *      substring probes to discover that (-99); this form pays ~one
  *      window;
  *   2. then scan windows < `idx` and reject on the first earlier
  *      witness — emitted rows (first witness IS idx) pay exactly the
  *      old cost, never more.
  *
  * Shorts routing is byte-identical to [[EditFirstMatch]]: pairs inside
  * the shorts gate (build ≤ d, probe ≤ 2d) emit through the `idx = -1`
  * shorts-keyed row only — a segment-keyed row of such a pair returns
  * FALSE exactly as `firstMatch = -1 ≠ idx` did. Out-of-range `idx`
  * (SQL surface only; the joins feed the key they built) returns FALSE
  * like the old equality against −99. */
case class EditEmitAt(left: Expression, right: Expression,
    idx: Expression, d: Int) extends TernaryExpression {

  override def first: Expression = left
  override def second: Expression = right
  override def third: Expression = idx

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType, idx.dataType) match {
      case (StringType, StringType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string, int), got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_edit_emit_at"

  def compute(build: UTF8String, probe: UTF8String, idx: Int): Boolean = {
    val k = d + 1
    val la = build.numChars()
    val lb = probe.numChars()
    val dl = lb - la
    if (math.abs(dl) > d) return false // outside the join's length gate
    val shorts = la <= d && lb <= 2 * d
    if (idx == -1) return shorts // shorts-keyed row emits iff gate holds
    if (shorts || idx < 0 || idx >= k) return false
    if (!EditFirstMatch.windowWitness(build, probe, la, lb, dl, idx, k, d))
      return false // foreign assumed-length candidate: ~1 window, not k
    var i = 0
    while (i < idx) {
      if (EditFirstMatch.windowWitness(build, probe, la, lb, dl, i, k, d))
        return false // an earlier window owns the emit
      i += 1
    }
    true
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("editEmitAt", this,
      classOf[EditEmitAt].getName)
    nullSafeCodeGen(ctx, ev,
      (a, b, c) => s"${ev.value} = $self.compute($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
    newSecond: Expression, newThird: Expression): EditEmitAt =
    copy(left = newFirst, right = newSecond, idx = newThird)
}

/** TRUE iff any band index strictly below `band` holds equal band
  * hashes in both signature arrays — the emit-once "a pair surfaces
  * only in its FIRST colliding band" predicate of the banded LSH joins
  * (text MinHash and embedding hyperplane alike), fused. The HOF
  * formulation (`!exists(zip_with(slice(x,1,band), slice(y,1,band),
  * _===_), identity)`) evaluated interpreted per CANDIDATE row and
  * allocated two slices plus a zipped array per evaluation; this is one
  * primitive early-exit loop that stays inside codegen with the rest of
  * the join. Decision-identical to the HOF form on null-free arrays —
  * same pairwise equality over the same 0-based prefix, parity-pinned
  * in FunctionsSpec; on nullable arrays (SQL surface only — the banded
  * paths emit containsNull=false) null slots count as non-colliding
  * where the HOF form would yield SQL NULL.
  *
  * Full SQL-surface input space (ADVICE r6; the engine's banded paths
  * always produce equal-length arrays with band < length, but the
  * registered function accepts anything): the compared prefix is
  * clamped to `min(band, |a|, |b|)`, so band > length degrades to
  * whole-array comparison and LENGTH-MISMATCHED signatures compare
  * only their shared prefix — always returning a BOOLEAN. This is a
  * deliberate divergence from the HOF form, whose `zip_with` NULL-pads
  * the shorter side and can surface SQL NULL on mismatched lengths;
  * both behaviors are pinned in FunctionsSpec.
  */
case class EarlierBandCollision(first: Expression, second: Expression,
  third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      // both LSH band-signature widths: the text path's 64-bit band
      // hashes and the embedding path's packed 8-bit-int band sigs
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _),
        IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two like-typed array<bigint>|array<int> " +
          s"signatures and an int band, got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_earlier_band_collision"

  private lazy val longElems =
    first.dataType.asInstanceOf[ArrayType].elementType == LongType

  def compute(a: ArrayData, b: ArrayData, band: Int): Boolean = {
    // `band` is the 0-based posexplode index, so exactly the indices
    // [0, band) are the earlier bands. NULL slots are treated as
    // non-colliding (a null hash equals nothing): the engine's banded
    // paths emit containsNull=false arrays so this never fires there,
    // but the SQL surface accepts nullable arrays, and reading a null
    // slot as 0 would fabricate collisions between unrelated pairs.
    val n = math.min(band, math.min(a.numElements(), b.numElements()))
    var i = 0
    if (longElems) {
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i) &&
          a.getLong(i) == b.getLong(i)) return true
        i += 1
      }
    } else {
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i) &&
          a.getInt(i) == b.getInt(i)) return true
        i += 1
      }
    }
    false
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("earlierCollision", this,
      classOf[EarlierBandCollision].getName)
    nullSafeCodeGen(ctx, ev,
      (a, b, c) => s"${ev.value} = $self.compute($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
    newSecond: Expression, newThird: Expression): EarlierBandCollision =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Unicode NFC normalization (UAX #15 canonical composition) — the
  * one step of the text-normalization pass no Spark built-in covers
  * (lower/trim/regexp are built-ins; canonical composition is not).
  * Wraps `java.text.Normalizer` in a codegen'd expression so the whole
  * normalization chain stays inside whole-stage codegen; the JDK and
  * DuckDB's utf8proc both implement the same published algorithm, so
  * the oracle compares the composed bytes directly. Fast path: pure
  * ASCII (the overwhelming majority of crawl text after language
  * filtering) short-circuits via `Normalizer.isNormalized` without
  * allocating.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nfcNormalize", this,
      classOf[NfcNormalize].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(
    newChild: Expression): NfcNormalize = copy(child = newChild)
}

/** POSITIONAL xxhash64 values of the word k-gram shingles of a token
  * array: element `i` is the hash of the span starting at token `i`
  * (length `n - k + 1`; an empty array when the document has fewer
  * than `k` tokens — a short document HAS no k-spans, unlike
  * [[ShingleHashes]]'s whole-text fallback, which serves the
  * set-similarity metrics where an empty sketch would be wrong).
  * Bit-identical to [[ShingleHashes]] on the spans both emit (same
  * seed, same space-joined bytes), so a positional occurrence list and
  * a distinct span sketch of the same document agree on every hash —
  * the duplicate-span SCRUB joins positions against a document
  * frequency computed from the distinct form.
  */
case class PositionalShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_positional_shingle_hashes"

  private val space = UTF8String.fromString(" ")

  private def hashOf(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  def compute(w: ArrayData): ArrayData = {
    val n = w.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = w.getUTF8String(i + j); j += 1 }
      out(i) = hashOf(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("positionalShingleHashes", this,
      classOf[PositionalShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, w => s"${ev.value} = $self.compute($w);")
  }

  override protected def withNewChildInternal(
    newChild: Expression): PositionalShingleHashes = copy(child = newChild)
}

/** Duplicate-span scrub kernel: given a document's token array and the
  * 0-based start positions of its flagged k-spans, return the tokens
  * NOT covered by any flagged span, in order. One boolean mask pass —
  * O(n + |starts|·k) — where the equivalent higher-order-function
  * formulation (`filter(tokens, (t, i) -> !exists(starts, ...))`)
  * evaluates interpreted at O(n·|starts|): a fully-boilerplate
  * document degenerates quadratic there and stays linear here. Start
  * positions may arrive in any order and may overlap; out-of-range
  * starts are clipped (a start beyond `n - k` can only reach the
  * array end).
  */
case class ScrubSpans(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_scrub_spans"

  def compute(w: ArrayData, starts: ArrayData): ArrayData = {
    val n = w.numElements()
    val m = starts.numElements()
    if (m == 0 || n == 0) return w
    val covered = new Array[Boolean](n)
    var i = 0
    while (i < m) {
      val s = starts.getInt(i)
      var j = math.max(s, 0)
      val end = math.min(s.toLong + k, n.toLong).toInt
      while (j < end) { covered(j) = true; j += 1 }
      i += 1
    }
    var kept = 0
    i = 0
    while (i < n) { if (!covered(i)) kept += 1; i += 1 }
    val out = new Array[AnyRef](kept)
    i = 0
    var o = 0
    while (i < n) {
      if (!covered(i)) { out(o) = w.getUTF8String(i); o += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("scrubSpans", this,
      classOf[ScrubSpans].getName)
    nullSafeCodeGen(ctx, ev,
      (w, s) => s"${ev.value} = $self.compute($w, $s);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
    newRight: Expression): ScrubSpans =
    copy(left = newLeft, right = newRight)
}

/** Row-local centroid-classifier scoring kernel for the streaming
  * serving path ([[graft.streaming.Streams.classifyIntake]]): one pass
  * over the token array accumulating exact per-class LONG hit counts
  * through a MERGED token → counts-per-class table, then the argmax of
  * score = hits ÷ class-total (the batch arithmetic of
  * `TextOps.classifySource` verbatim — at most one IEEE division per
  * class) with the `greatest(struct(score, class))` tie order
  * (lexicographically largest class wins ties; all-zero scores fall
  * back to "none", the batch's absent-doc shape).
  *
  * The model rides as a REFERENCE OBJECT in the compiled plan
  * (`ctx.addReferenceObj`), NOT as literal maps in the expression tree
  * (ADVICE r11): `typedlit` per-class maps grow the analyzed plan,
  * Janino constant pool, and per-batch analysis cost linearly with
  * vocabulary × classes and hit Janino's 64 KB method limits first;
  * here plan size and codegen are O(1) in model size, so the same
  * serving path holds for a 10⁶-entry vocabulary. One hash probe per
  * token (not one per token per class) is also strictly less work than
  * the per-class `aggregate` HOF chain it replaces. */
case class ClassifyScore(child: Expression,
    model: Seq[(String, Map[String, Long], Long)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("predicted", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  override def prettyName: String = "graft_classify_score"

  // A zero class total would make every score for that class 0/0 = NaN,
  // and NaN ORDERS DIFFERENTLY in the two implementations this kernel
  // must agree between: Spark's greatest(struct) sorts NaN above every
  // value, while the kernel's `s >= bestScore` is false for NaN
  // (ADVICE r12). A centroid fit over any nonempty source always has a
  // positive total, so an offending model is a broken artifact —
  // reject it at plan build instead of diverging row-by-row.
  require(model.nonEmpty && model.forall(_._3 > 0L),
    "graft_classify_score: every class total must be > 0 (a zero " +
      "total scores NaN, which greatest(struct) and this kernel order " +
      "differently)")

  // classes in UTF8String BINARY order (UTF-8 bytes = code-point
  // order), so an equal-score later index IS the struct-comparison-
  // larger class — the greatest(struct(score, class)) tie order
  // EXACTLY. Java's String sort orders UTF-16 code units, which
  // disagrees beyond the BMP: a supplementary character (surrogate
  // pair, 0xD800–0xDFFF units) sorts BELOW 0xE000+ BMP chars there but
  // ABOVE all of them as UTF-8 bytes (0xF0 lead) — the order struct
  // comparison actually uses (ADVICE r12).
  @transient private lazy val sortedModel
      : Seq[(String, Map[String, Long], Long)] =
    model.sortWith((a, b) => UTF8String.fromString(a._1)
      .compareTo(UTF8String.fromString(b._1)) < 0)
  @transient private lazy val classes: Array[UTF8String] =
    sortedModel.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val totals: Array[Double] =
    sortedModel.map(_._3.toDouble).toArray
  @transient private lazy val merged
      : java.util.HashMap[UTF8String, Array[Long]] = {
    val m = new java.util.HashMap[UTF8String, Array[Long]]()
    for (((_, counts, _), i) <- sortedModel.zipWithIndex;
         (tok, n) <- counts) {
      val key = UTF8String.fromString(tok)
      var arr = m.get(key)
      if (arr == null) { arr = new Array[Long](classes.length); m.put(key, arr) }
      arr(i) += n
    }
    m
  }
  private val none = UTF8String.fromString("none")

  def compute(toks: ArrayData): InternalRow = {
    val k = classes.length
    val hits = new Array[Long](k)
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        val arr = merged.get(t)
        if (arr != null) {
          var c = 0
          while (c < k) { hits(c) += arr(c); c += 1 }
        }
      }
      i += 1
    }
    var best = 0
    var bestScore = hits(0).toDouble / totals(0)
    var c = 1
    while (c < k) {
      val s = hits(c).toDouble / totals(c)
      if (s >= bestScore) { best = c; bestScore = s }
      c += 1
    }
    new GenericInternalRow(Array[Any](
      if (bestScore == 0.0) none else classes(best), bestScore))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("classifyScore", this,
      classOf[ClassifyScore].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(
    newChild: Expression): ClassifyScore = copy(child = newChild)
}

object TextFunctions {
  /** Unicode NFC canonical composition of a string column. */
  def nfcNormalize(s: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(s)))

  /** struct(predicted, score) of the centroid classifier over a
    * token-array column; the model rides as a plan reference object. */
  def classifyScore(toks: Column,
      model: Seq[(String, Map[String, Long], Long)]): Column =
    ColumnBridge.column(ClassifyScore(ColumnBridge.expression(toks), model))

  /** Distinct hashed word k-gram shingles of a token-array column. */
  def shingleHashes(w: Column, k: Int = 3): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(w), k))

  /** Positional (non-distinct) hashed k-gram spans: element i = span
    * starting at token i; empty below k tokens. */
  def positionalShingleHashes(w: Column, k: Int): Column =
    ColumnBridge.column(
      PositionalShingleHashes(ColumnBridge.expression(w), k))

  /** Tokens not covered by any flagged k-span start (0-based). */
  def scrubSpans(w: Column, starts: Column, k: Int): Column =
    ColumnBridge.column(ScrubSpans(ColumnBridge.expression(w),
      ColumnBridge.expression(starts), k))

  /** MinHash LSH band hashes (array<long>, one per band). */
  def minhashBands(shash: Column, nHashes: Int, bands: Int): Column =
    ColumnBridge.column(MinHashBandHashes(ColumnBridge.expression(shash),
      nHashes, bands))

  /** 64-bit frequency-weighted SimHash bitstring of a token array. */
  def simhash64(w: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(w)))

  /** Per-row md5-plane SimHash halves struct(sig_hi, sig_lo) — the
    * stateless streaming-intake dual of the batch vote aggregation
    * (NULL on an empty token array, mirroring the explode drop). */
  def simhashMd5Sig(w: Column): Column =
    ColumnBridge.column(SimhashMd5Sig(ColumnBridge.expression(w)))

  /** Emit-once predicate: does any EARLIER band (index < `band`)
    * already collide for this pair? */
  def earlierBandCollision(a: Column, b: Column, band: Column): Column =
    ColumnBridge.column(EarlierBandCollision(ColumnBridge.expression(a),
      ColumnBridge.expression(b), ColumnBridge.expression(band)))

  /** First PassJoin key index (−1 = shorts, −99 = none) at which a
    * (build head, probe head) pair collides — the edit joins'
    * emit-once site. */
  def editFirstMatch(build: Column, probe: Column, d: Int): Column =
    ColumnBridge.column(EditFirstMatch(ColumnBridge.expression(build),
      ColumnBridge.expression(probe), d))

  /** Join-aware emit-once predicate: TRUE iff `idx` (the key index
    * this candidate row collided on) is the pair's first match —
    * decision-identical to `idx === editFirstMatch(build, probe, d)`
    * but probes the colliding window first. */
  def editEmitAt(build: Column, probe: Column, idx: Column,
      d: Int): Column =
    ColumnBridge.column(EditEmitAt(ColumnBridge.expression(build),
      ColumnBridge.expression(probe), ColumnBridge.expression(idx), d))

  /** Distinct PassJoin probe keys (idx, seg) of a head under the
    * multi-match-aware window, shorts key included — one codegen'd
    * loop replacing the interpreted HOF enumeration. */
  def editProbeKeys(head: Column, d: Int): Column =
    ColumnBridge.column(EditProbeKeys(ColumnBridge.expression(head), d))
}
