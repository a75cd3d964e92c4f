package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

object TextFunctions {
  /** Distinct hashed word k-gram shingles of a token-array column. */
  def shingleHashes(w: Column, k: Int = 3): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(w), k))

  /** MinHash LSH band hashes (array<long>, one per band). */
  def minhashBands(shash: Column, nHashes: Int, bands: Int): Column =
    ColumnBridge.column(MinHashBandHashes(ColumnBridge.expression(shash),
      nHashes, bands))

  /** 64-bit frequency-weighted SimHash bitstring of a token array. */
  def simhash64(w: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(w)))
}
