package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate row for the bounded top-k aggregate. */
case class ScoredNeighbor(cosine: Double, vec_id: Long)

/** Bounded top-k-per-group aggregate: the buffer is a sorted array of at
  * most k (cosine desc, vec_id asc) entries, so *partial aggregation on
  * the map side* reduces every input partition to ≤ k rows per group
  * before anything shuffles — the fix for the round-2 note that
  * `q_cosine_topk`'s rank window funneled the whole scored set through
  * one task per query (parallelism capped at #queries). The merge is
  * associative and commutative, and ties are broken by vec_id, so the
  * result is deterministic regardless of partitioning. (NULL cosines —
  * zero-norm vectors under try_divide — are filtered out by the caller
  * before the aggregate; a typed aggregator's input encoder would read
  * a null double as 0.0.)
  */
class TopKByCosine(k: Int)
    extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor],
      Seq[ScoredNeighbor]] {

  private def trim(b: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    b.sortBy(s => (-s.cosine, s.vec_id)).take(k)

  override def zero: Seq[ScoredNeighbor] = Seq.empty

  override def reduce(b: Seq[ScoredNeighbor],
    a: ScoredNeighbor): Seq[ScoredNeighbor] =
    // fast path: skip entries that can't enter a full buffer
    if (b.size >= k && {
      val last = b.last
      a.cosine < last.cosine ||
        (a.cosine == last.cosine && a.vec_id > last.vec_id)
    }) b
    else trim(b :+ a)

  override def merge(x: Seq[ScoredNeighbor],
    y: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = trim(x ++ y)

  override def finish(b: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = trim(b)

  override def bufferEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()

  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
}

object TopKByCosine {
  /** Column form: `topk(cosine, vec_id)` usable directly in `agg`. */
  def topk(k: Int)(cosine: Column, vecId: Column): Column =
    udaf(new TopKByCosine(k)).apply(cosine, vecId)
}

/** A shortlist candidate that remembers which IVF bucket it came from,
  * so the exact re-rank fetch can equi-join the bucket-partitioned
  * float corpus on (bucket, vec_id) and stay partition-pruned. */
case class ScoredCandidate(score: Double, vec_id: Long, bucket: Int)

/** [[TopKByCosine]] with a carried bucket payload — same bounded
  * buffer, same (score desc, vec_id asc) total order (the bucket is
  * payload, never a sort key), same map-side ≤k-rows-per-group
  * guarantee before the exchange. */
class TopKCandidates(k: Int)
    extends Aggregator[ScoredCandidate, Seq[ScoredCandidate],
      Seq[ScoredCandidate]] {

  private def trim(b: Seq[ScoredCandidate]): Seq[ScoredCandidate] =
    b.sortBy(s => (-s.score, s.vec_id)).take(k)

  override def zero: Seq[ScoredCandidate] = Seq.empty

  override def reduce(b: Seq[ScoredCandidate],
    a: ScoredCandidate): Seq[ScoredCandidate] =
    if (b.size >= k && {
      val last = b.last
      a.score < last.score ||
        (a.score == last.score && a.vec_id > last.vec_id)
    }) b
    else trim(b :+ a)

  override def merge(x: Seq[ScoredCandidate],
    y: Seq[ScoredCandidate]): Seq[ScoredCandidate] = trim(x ++ y)

  override def finish(b: Seq[ScoredCandidate]): Seq[ScoredCandidate] =
    trim(b)

  override def bufferEncoder: Encoder[Seq[ScoredCandidate]] =
    ExpressionEncoder[Seq[ScoredCandidate]]()

  override def outputEncoder: Encoder[Seq[ScoredCandidate]] =
    ExpressionEncoder[Seq[ScoredCandidate]]()
}

object TopKCandidates {
  /** Column form: `topk(score, vec_id, bucket)` usable in `agg`. */
  def topk(k: Int)(score: Column, vecId: Column, bucket: Column): Column =
    udaf(new TopKCandidates(k)).apply(score, vecId, bucket)
}

/** One drawn document for the bounded bottom-k reservoir aggregate. */
case class DrawnDoc(draw: Long, doc_id: Long)

/** Bounded BOTTOM-k-per-group aggregate — the [[TopKByCosine]] buffer
  * discipline pointed the other way (draw asc, doc_id asc): keeps the
  * k smallest uniform draws per group with ≤ k rows of state per map
  * partition per group, so an exact uniform k-subset per stratum
  * shuffles #strata × k fixed-width rows instead of sorting the corpus
  * (the `row_number()` window formulation's cost). Associative +
  * commutative merge and a doc_id tie-break make the pick set
  * deterministic under any partitioning. */
class BottomKDraws(k: Int)
    extends Aggregator[DrawnDoc, Seq[DrawnDoc], Seq[DrawnDoc]] {

  private def trim(b: Seq[DrawnDoc]): Seq[DrawnDoc] =
    b.sortBy(s => (s.draw, s.doc_id)).take(k)

  override def zero: Seq[DrawnDoc] = Seq.empty

  override def reduce(b: Seq[DrawnDoc], a: DrawnDoc): Seq[DrawnDoc] =
    // fast path: skip entries that can't enter a full buffer
    if (b.size >= k && {
      val last = b.last
      a.draw > last.draw ||
        (a.draw == last.draw && a.doc_id > last.doc_id)
    }) b
    else trim(b :+ a)

  override def merge(x: Seq[DrawnDoc], y: Seq[DrawnDoc]): Seq[DrawnDoc] =
    trim(x ++ y)

  override def finish(b: Seq[DrawnDoc]): Seq[DrawnDoc] = trim(b)

  override def bufferEncoder: Encoder[Seq[DrawnDoc]] =
    ExpressionEncoder[Seq[DrawnDoc]]()

  override def outputEncoder: Encoder[Seq[DrawnDoc]] =
    ExpressionEncoder[Seq[DrawnDoc]]()
}

object BottomKDraws {
  /** Column form: `bottomk(draw, doc_id)` usable directly in `agg`. */
  def bottomk(k: Int)(draw: Column, docId: Column): Column =
    udaf(new BottomKDraws(k)).apply(draw, docId)
}
