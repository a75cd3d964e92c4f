package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketed, co-located fact-to-fact join — the storage-layout answer
  * to the one join class nothing else in the engine removes the
  * exchange from.
  *
  * Every other join here dodges its shuffle by making one side small
  * (broadcast dims, delta-sized CDC batches, increment-sized dedup
  * probes) or by pre-clustering one table (the silver point layout,
  * [[Relational.qPointLookupSilver]]). The orders⋈lineitem class —
  * two FACT tables joined on the same key, the §2.3 J1 child-records
  * shape at warehouse scale — has no small side: at 100 TB BOTH
  * relations pay a full shuffle write+read on every query, and that
  * exchange, not the join itself, is the cluster bottleneck.
  *
  * Bucketing moves that exchange to WRITE time, once: both tables are
  * persisted `bucketBy(N, key)` + `sortBy(key)` (Spark's
  * Murmur3-`pmod` bucket spec), so every subsequent join, aggregation,
  * or distinct on the key reads bucket i of one table against bucket i
  * of the other and sort-merges with ZERO exchange in the plan — the
  * layout cost amortizes across the whole downstream query mix,
  * exactly the [[Vectors.ivfFit]] fit-once/probe-many posture applied
  * to relational storage. The write repartitions by the bucket
  * expression first, so each bucket lands as ONE file per table and
  * the on-disk order satisfies the SMJ's requirement directly (a
  * multi-file bucket would re-sort per task — still exchange-free, but
  * the single-file layout skips even that).
  *
  * The declared query forces the merge join with a `hint("merge")` on
  * both sides: at test SF the dimension-sized orders table would
  * otherwise broadcast — correct, but then the plan proves nothing
  * about the co-location; at 100 TB neither side broadcasts and SMJ is
  * what the optimizer picks anyway, so the hint pins the
  * production-shape plan at every scale. BucketedSpec asserts the
  * join subtree contains no ShuffleExchange and that values equal the
  * plain unbucketed join row-for-row; the driver's oracle checks the
  * same equality against DuckDB on the raw parquet.
  *
  * Layout lifecycle: built once per (JVM, sf-dir) in an engine-owned
  * scratch directory removed on exit ([[graft.sources.TempDirs]]),
  * registered in the session catalog under names keyed by the sf dir —
  * the [[Relational]] silver-layout discipline; [[FitCache]] carries
  * the lazy-holder and failed-build-eviction contract. Bucket count is
  * 8 at test SF; at cluster scale it is sized so one bucket ≈ one
  * executor-core task (e.g. 2¹²–2¹⁴ for 100 TB), a write-time knob
  * with no code change.
  */
private[graft] object Bucketed {

  private val numBuckets = 8

  /** Catalog-safe name component for an sf dir: the hex of its UTF-8
    * md5 prefix (stable across JVMs, no sign/collision issues a raw
    * hashCode would bring). */
  private def dirTag(dir: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
    d.take(4).map(b => f"$b%02x").mkString
  }

  /** One bucketed (orders, lineitem) layout per (JVM, sf-dir): table
    * names registered in the in-memory catalog, data under a scratch
    * root removed on exit. */
  private val layoutCache = new FitCache[(String, String)]((s, d) => {
    val root = graft.sources.TempDirs.scratchDir("graft_bucketed").toString
    val tag = dirTag(d)
    val (ot, lt) = (s"graft_bkt_orders_$tag", s"graft_bkt_lineitem_$tag")
    def writeBucketed(df: DataFrame, key: String, path: String,
        table: String): Unit =
      df.repartition(numBuckets, col(key))
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(numBuckets, key).sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    writeBucketed(Tables.orders(s, d), "o_orderkey", s"$root/orders", ot)
    writeBucketed(Tables.lineitem(s, d), "l_orderkey", s"$root/lineitem", lt)
    (ot, lt)
  })

  private[graft] def layoutFor(spark: SparkSession,
      dir: String): (String, String) = layoutCache.get(spark, dir)

  /** The co-located join itself (no aggregate), exposed for the plan
    * pin: orders⋈lineitem on the bucket key, merge-hinted. Over the
    * bucketed layout this plans as SortMergeJoin with zero exchange
    * and zero per-task sort (one pre-sorted file per bucket). */
  private[graft] def colocatedJoin(spark: SparkSession,
      dir: String): DataFrame = {
    val (ot, lt) = layoutFor(spark, dir)
    spark.table(ot).hint("merge")
      .join(spark.table(lt).hint("merge"),
        col("o_orderkey") === col("l_orderkey"))
  }

  /** Declared query: revenue rollup by order priority over the
    * co-located join. The only exchanges in the whole plan are ABOVE
    * the join — the priority-keyed aggregate (map-side partials of a
    * 5-row group space) and the final sort; the two fact scans feed
    * the SMJ directly. Money sum through the exact DECIMAL accumulator
    * emitted as a single decimal→double conversion on both engines
    * ([[Relational.qCountByKey]] determinism discipline).
    */
  /** The layout's second dividend, declared: a grouped aggregate ON
    * the bucket key consumes the bucketed distribution directly — the
    * scan reports hash-partitioning on `l_orderkey`, so the per-order
    * rollup plans as a single HashAggregate with ZERO exchange (a
    * plain parquet scan pays a full corpus shuffle here). This is the
    * "every subsequent join/agg/distinct on the key" half of the
    * [[qBucketJoin]] amortization argument as its own oracle-checked
    * row; BucketedSpec pins the exchange-free aggregate subtree. At
    * 100 TB this shape is the repeated per-entity rollup (per-user,
    * per-document, per-order) that dominates warehouse load — paying
    * its shuffle once at write time is the point of the layout.
    */
  def qBucketAgg(spark: SparkSession, dir: String): DataFrame = {
    val (_, lt) = layoutFor(spark, dir)
    aggPlan(spark.table(lt))
      .orderBy(col("l_orderkey"))
  }

  /** The aggregate alone (no determinism sort) — shared by the
    * declared query and the spec's exchange-count pin. */
  private[graft] def aggPlan(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).as("sum_qty"),
        // exact decimal accumulator, emitted through a single
        // decimal→double conversion: see qCountByKey's determinism note
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).cast("decimal(38,6)")
          .cast("double").as("revenue"))

  /** Third consumer of the layout (r11 verdict item 5 — widening the
    * amortization argument past one data point): the
    * `lineitem.l_orderkey → orders` leg of the RI audit
    * ([[Joins.qRiAudit]]) served from the bucketed tables. That leg is
    * the audit's ONLY fact-sized anti-join (every other parent is
    * broadcast-sized), i.e. exactly the join class the layout exists
    * for: on plain parquet both sides pay a key shuffle per run; over
    * the bucketed layout the parent's distinct collapses into the
    * bucket distribution and the LEFT ANTI sort-merges bucket-to-bucket
    * with ZERO exchange below the final 1-row count aggregates —
    * BucketedSpec pins the exchange-free anti-join subtree. Values
    * ride the same plain-parquet SQL as the q_ri_audit row (the layout
    * is value-invisible), so the green row certifies layout
    * transparency for a THIRD plan shape: inner SMJ, keyed aggregate,
    * and now anti-join — the "every subsequent join/agg/distinct on
    * the key" claim with each clause carrying its own oracle. An RI
    * audit is also the natural repeated consumer: it runs after every
    * nightly drop, amortizing the write-time shuffle fastest. */
  def qBucketRi(spark: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = layoutFor(spark, dir)
    riAntiPlan(spark.table(lt), spark.table(ot))
  }

  /** The audit row over explicit frames — shared by the declared query
    * and the spec's exchange pin; mirrors [[Joins.riRelation]] with
    * merge-hinted sides (the [[colocatedJoin]] rationale: pin the
    * production SMJ shape, not the test-SF broadcast). */
  private[graft] def riAntiPlan(lineitem: DataFrame,
      orders: DataFrame): DataFrame = {
    val keys = orders.select(col("o_orderkey")).distinct().hint("merge")
    val orphans = lineitem.hint("merge")
      .filter(col("l_orderkey").isNotNull)
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_anti")
    lineitem
      .agg(count(lit(1)).as("n_child"),
        count(when(col("l_orderkey").isNull, lit(1))).as("n_null_fk"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphans"),
        countDistinct(col("l_orderkey")).as("n_orphan_keys")))
      .select(lit("lineitem.l_orderkey->orders").as("relation"),
        col("n_child"), col("n_null_fk"), col("n_orphans"),
        col("n_orphan_keys"))
  }

  def qBucketJoin(spark: SparkSession, dir: String): DataFrame =
    colocatedJoin(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).cast("decimal(38,6)")
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
}
