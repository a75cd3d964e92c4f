package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.util.sketch.BloomFilter

/** Pre-shuffle bloom pruning for asymmetric probes (the manual analog
  * of Spark's runtime row-level bloom join filter, which the optimizer
  * cannot inject here because both join keys are DERIVED — posexploded
  * band rows, not scan attributes).
  *
  * The incremental-dedup probes join a corpus-sized published index
  * against an increment ~0.1% its size. The increment already rides the
  * SHUFFLE_HASH build side, so per-partition memory is increment-shaped
  * — but the INDEX still pays a full shuffle write+read of every banded
  * row, almost none of which have a partner: at 100 TB the probe's cost
  * is the index exchange, not the join. A bloom over the increment's
  * join-key hashes, planted as a scan-side filter on the index branch,
  * discards partnerless index rows BEFORE the exchange — shuffled index
  * bytes drop from corpus-banded-sized to ~(hits + fpp·corpus), while
  * correctness is untouched: bloom false positives are just surplus
  * candidates for the exact verify stage, and false negatives cannot
  * exist (every true partner's key was inserted).
  *
  * Build cost is two increment-side jobs (a count to size/guard, then
  * the filter aggregation) and a driver-held sketch of
  * ~1.2 bytes/key at the default fpp — the same bounded-model-pull
  * contract as the IVF centroid fit. When the increment outgrows
  * `maxKeys` (a driver bloom would stop being broadcast-small), the
  * prune SKIPS and returns the index branch unchanged — the exact
  * posture of Spark's own `runtimeFilter.creationSideThreshold`.
  */
private[graft] object ProbeFilters {

  /** 8M keys ≈ 9.2 MiB sketch at fpp 0.01 — the broadcast-small bound;
    * above it the prune skips rather than ship a fat literal into
    * every task. */
  val defaultMaxKeys: Long = 8L * 1000 * 1000

  /** Shared key shape for build and probe sides: xxhash64 of the join
    * key columns. `BloomFilterMightContain` consumes a LONG value, and
    * putLong/mightContainLong on the sketch are the matching pair —
    * hash parity between the two paths is pinned in ProbeFilterSpec. */
  private def keyHash(keyCols: Seq[String]): Column =
    xxhash64(keyCols.map(col): _*)

  /** `might_contain(bloom, value)` as a codegen'd Column over a
    * driver-built sketch (the serialized filter folds into the plan as
    * a binary literal, deserialized once per task). */
  private[graft] def mightContain(bf: BloomFilter, value: Column): Column = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray), ColumnBridge.expression(value)))
  }

  /** `big` restricted to rows whose (keyCols) join key MIGHT appear in
    * `probe` — a map-side semi-join sketch, no shuffle on either side
    * (the bloom build is a scan-side aggregation of the probe; sizing
    * uses the probe's raw row count, an upper bound on distinct keys,
    * so no distinct shuffle either). Returns `big` unchanged when the
    * probe is empty (nothing can join — but the zero-row case only
    * arises in degenerate fixtures; keeping the plan shape uniform
    * costs nothing there) or exceeds `maxKeys` (skip-guard). */
  def bloomSemi(big: DataFrame, probe: DataFrame, keyCols: Seq[String],
    fpp: Double = 0.01, maxKeys: Long = defaultMaxKeys): DataFrame = {
    val kh = keyHash(keyCols)
    val n = probe.count()
    if (n == 0 || n > maxKeys) big
    else {
      val bf = probe.select(kh.as("kh")).stat
        .bloomFilter("kh", math.max(n, 1L), fpp)
      big.filter(mightContain(bf, kh))
    }
  }
}
