package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive scan spread (r19 optimization round; guide §2.5's
  * input-skew rule — "one huge unsplittable file … repartition
  * immediately after the read").
  *
  * The driver's testdata ships each table as ONE parquet file with ONE
  * row group, so a scan of it is a single task no matter the core
  * count — and the corpus operators do their heaviest per-row work
  * (tokenize / shingle / hash / DP-segment / multi-distinct partial
  * aggregation) scan-side, which serialized whole stages on one core:
  * the round-start stage audit measured 49.5 s of the 82.8 s
  * full-surface wall inside single-task stages on a 32-core session.
  *
  * [[afterScan]] hash-repartitions by the table's row key to the
  * session's default parallelism — but ONLY when the planned scan
  * yields fewer partitions than that. The branch is scale-adaptive,
  * not a local constant: any real multi-file table (at 100 TB a scan
  * carries thousands of splits) already exceeds the core count, the
  * branch reads false, and NO exchange is added — the physical plan is
  * byte-identical to the pre-r19 one. The split count comes from the
  * planned scan RDD (no job runs), and is memoized per (path, session
  * parallelism) so warm bench passes never re-plan the probe scan.
  *
  * Correctness: a hash repartition on a deterministic key only changes
  * WHERE rows are processed. It is applied exclusively upstream of
  * partition-order-free consumers — per-row projections and exact
  * int / decimal / min / max / count-distinct aggregates; the
  * partition-order-sensitive families (Misra–Gries summaries, GK
  * `approx_percentile` sketches) deliberately keep their unspread
  * reads (see OPTIMIZATION_r19.md).
  */
object Spread {
  /** Planned-scan split counts, memoized per (path, parallelism) —
    * a physical-plan property of an immutable input directory, never
    * data or results. */
  private val scanParts =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private[graft] def afterScan(df: DataFrame, key: String,
      cacheKey: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val n = scanParts.computeIfAbsent(s"$cacheKey@$p",
      _ => Integer.valueOf(df.rdd.getNumPartitions))
    if (n < p) df.repartition(p, col(key)) else df
  }

  /** Unmemoized variant for frames that are not a stable per-path
    * table read (e.g. a caller-supplied landed drop): the split count
    * is re-planned per call. */
  private[graft] def afterScan(df: DataFrame, key: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, col(key)) else df
  }
}
