package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenization of a text column against a
  * fixed merge list — the real-tokenizer member of the text family
  * ([[graft.operators.TextOps]] counts whitespace/BPE-ish-regex tokens;
  * this APPLIES a trained subword vocabulary, the operation an actual
  * LLM-training pipeline runs per document to budget sequences).
  *
  * Semantics (Sennrich/Haddow/Birch 2016, "Neural Machine Translation
  * of Rare Words with Subword Units" — the published BPE recipe):
  * each word starts as its character symbols; merge rules apply IN RANK
  * ORDER, each rule replacing adjacent symbol pairs (a, b) with the
  * fused symbol ab left-to-right, non-overlapping, exhaustively (for
  * pair rules one L2R non-overlapping pass IS exhaustive leftmost
  * application, and rank-order iteration is complete because merging
  * rank r can only create adjacencies involving the NEW symbol, which
  * by construction of the merge list only rank > r rules reference).
  * Merges never cross word boundaries. Output is the token stream,
  * space-joined.
  *
  * Scope contract (documented, spec-pinned): input is single-space-
  * separated text — the `documents` corpus shape. The two control
  * characters U+001E/U+001F are reserved by the oracle's replay
  * encoding and are stripped defensively first (both engines).
  *
  * Why a custom expression: the built-in formulation is a K-deep chain
  * of `replace` calls over a delimiter-wrapped rendering (see
  * [[graft.operators.Bpe.encodeViaReplace]], kept as the parity
  * reference and the DuckDB oracle's shape) — K full-string passes per
  * row, and a ~200-rule chain nests 200 expression nodes (the round-3
  * analysis-blowup lesson). This kernel does one pass over each word's
  * symbol array per applicable rule with an off-to-the-side word memo
  * (natural-language corpora repeat words heavily — Zipf — so steady
  * state is one hash probe per word), and parity with the built-in
  * chain is spec-pinned bitwise.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val mergeArr: Array[(String, String)] =
    merges.toArray

  /** Per-expression word→encoding memo. Bounded: past 64k distinct
    * words new entries are computed but not cached (no eviction churn
    * in the hot loop); correctness never depends on a hit. */
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def compute(s: UTF8String): UTF8String = {
    var text = s.toString
    if (text.indexOf('\u001E') >= 0 || text.indexOf('\u001F') >= 0)
      text = text.replace("\u001E", "").replace("\u001F", "")
    val out = new java.lang.StringBuilder(text.length * 2)
    var i = 0
    val n = text.length
    while (i < n) {
      if (text.charAt(i) == ' ') i += 1
      else {
        var j = i + 1
        while (j < n && text.charAt(j) != ' ') j += 1
        if (out.length > 0) out.append(' ')
        out.append(encodeWord(text.substring(i, j)))
        i = j
      }
    }
    UTF8String.fromString(out.toString)
  }

  private def encodeWord(w: String): String = {
    if (w.length <= 1) return w
    val cached = memo.get(w)
    if (cached != null) return cached
    val syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var len = w.length
    var r = 0
    while (r < mergeArr.length && len > 1) {
      val m = mergeArr(r)
      len = BpeEncode.mergePass(syms, len, m._1, m._2)
      r += 1
    }
    val sb = new java.lang.StringBuilder(w.length * 2)
    i = 0
    while (i < len) {
      if (i > 0) sb.append(' ')
      sb.append(syms(i))
      i += 1
    }
    val enc = sb.toString
    if (memo.size < 65536) memo.put(w, enc)
    enc
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
    ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeEncode", this,
      classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $self.compute($t);")
  }

  override protected def withNewChildInternal(
    newChild: Expression): BpeEncode = copy(child = newChild)
}

object BpeEncode {
  /** One left-to-right non-overlapping merge pass of (a, b) → a+b over
    * the first `n` symbols, in place (write never outruns read);
    * returns the new symbol count. Shared verbatim by the encoder and
    * the trainer ([[graft.operators.Bpe.trainBpe]]) so fit-time and
    * encode-time merge semantics cannot drift.
    */
  private[graft] def mergePass(syms: Array[String], n: Int,
      a: String, b: String): Int = {
    var read = 0
    var write = 0
    while (read < n) {
      if (read + 1 < n && syms(read) == a && syms(read + 1) == b) {
        syms(write) = a + b
        read += 2
      } else {
        syms(write) = syms(read)
        read += 1
      }
      write += 1
    }
    write
  }
}

object BpeFunctions {
  /** BPE-encode a single-space-separated text column against a fixed
    * rank-ordered merge list; returns the space-joined token stream. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), merges))
}
