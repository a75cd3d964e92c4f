package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One heavy-hitter summary entry: the token and its Misra-Gries
  * counter — a LOWER bound on the true count, with true − est ≤ N/(c+1)
  * for capacity c over N observations. */
case class HeavyHitter(token: String, est: Long)

/** Misra-Gries frequent-items sketch as a bounded-state aggregate — the
  * frequency member of the engine's mergeable-sketch family (HLL++ for
  * cardinality in `q_approx_distinct`, GK for quantiles in
  * `q_token_percentiles`). The buffer holds at most `capacity`
  * counters, so map-side partial aggregation reduces every input
  * partition to one bounded summary before the shuffle — a corpus-scale
  * token stream never funnels raw rows to one reducer, which is why
  * this shape survives 100 TB while an exact top-k must pay the full
  * vocabulary-keyed aggregate first (`q_vocab_topk`, the declared exact
  * dual).
  *
  * Classic guarantees (Misra & Gries 1982; merge rule from the
  * mergeable-summaries line of work):
  *
  *   - each counter is a lower bound: est ≤ true;
  *   - undercount ≤ N/(capacity+1), N = total observations — so any
  *     item with true count > N/(capacity+1) is GUARANTEED present;
  *   - when distinct(input) ≤ capacity no decrement ever fires and
  *     every counter is EXACT — the regime the oracle checks, the same
  *     exact-regime contract as the GK percentiles and full-probe IVF.
  *
  * Reduce: increment a present key; insert below capacity; at capacity
  * a new key triggers the decrement-all step (drop zeros — the new key
  * is absorbed by its own decrement). Merge: sum counters, then if over
  * capacity subtract the (capacity+1)-largest value from all and drop
  * the non-positive — the standard merge that preserves both bounds.
  * Deterministic by construction: counter values never depend on
  * arrival order in the exact regime, and the caller fixes ordering by
  * (est desc, token) before any limit.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[HeavyHitter]] {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(n) => b.updated(tok, n + 1)
      case None if b.size < capacity => b.updated(tok, 1L)
      case None =>
        // decrement-all absorbs the arrival; zeros drop out
        b.iterator.map { case (k, n) => k -> (n - 1) }
          .filter(_._2 > 0).toMap
    }

  override def merge(x: Map[String, Long],
    y: Map[String, Long]): Map[String, Long] = {
    val m = y.foldLeft(x) { case (acc, (k, n)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + n)
    }
    if (m.size <= capacity) m
    else {
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      m.iterator.map { case (k, n) => k -> (n - cut) }
        .filter(_._2 > 0).toMap
    }
  }

  override def finish(b: Map[String, Long]): Seq[HeavyHitter] =
    b.iterator.map { case (k, n) => HeavyHitter(k, n) }.toSeq
      .sortBy(h => (-h.est, h.token))

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[HeavyHitter]] =
    ExpressionEncoder[Seq[HeavyHitter]]()
}

object MisraGries {
  /** Column form: `heavyHitters(capacity)(token)` usable in `agg`. */
  def heavyHitters(capacity: Int)(token: Column): Column =
    udaf(new MisraGries(capacity)).apply(token)
}
