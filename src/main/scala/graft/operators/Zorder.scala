package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional layout clustering — the
  * lakehouse data-skipping technique (Delta `OPTIMIZE ZORDER BY`,
  * Iceberg sort-order z-curves; Morton 1966) that
  * [[Relational.writePointLayout]]'s single-key sort cannot give: a
  * layout sorted on ONE key prunes parquet footer min/max only for
  * predicates on THAT key — a second dimension's values are spread
  * uniformly through every file, so its min/max spans are useless. A
  * 100 TB fact table queried by several dimensions (the reference's
  * searches filter patient, code, AND date — coding_task_1.py:70,
  * coding_task_3.py:60) needs ONE layout serving all of them.
  *
  * Interleaving the bits of the two dimension keys and range-sorting
  * on the interleave makes each file — and every parquet ROW GROUP
  * inside it, since the sort runs through the writer — cover a small
  * RECTANGLE of the key space: footer min/max become tight on BOTH
  * columns, so an ordinary pushed range predicate on EITHER (or both)
  * skips most row groups in the reader (parquet stats skipping is
  * row-group/page granular; `numFiles` never shrinks — the reader
  * opens a footer and reads nothing). No index structure, no
  * query-side changes, plain parquet stats. The bit-spread is five
  * shift/mask steps per dimension (the published magic-number
  * bit-twiddling recipe), pure built-in expressions — nothing custom
  * to maintain.
  *
  * Scale posture: the layout write is one range-exchange + local sort
  * (exactly what any sorted-table ingest pays); value→bucket
  * normalization needs only the two columns' min/max — a one-row
  * aggregate, the bounded-model driver pull. Queries are scan-only:
  * the declared query plans a plain filtered parquet scan whose
  * `PushedFilters` carry both range predicates; ZorderSpec pins that
  * the SAME predicate emits a fraction of the z-ordered rows but ALL
  * files of a single-key-sorted copy.
  */
object Zorder {

  /** Spread the low 16 bits of `x` to even bit positions (16→32-bit
    * Morton spread, magic-number steps). */
  private def spread16(x: Column): Column = {
    val m = Seq(0x00FF00FFL -> 8, 0x0F0F0F0FL -> 4,
      0x33333333L -> 2, 0x55555555L -> 1)
    m.foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (v, (mask, s)) =>
      v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(mask))
    }
  }

  /** 32-bit Morton code of two 16-bit bucket values: bit i of `x` at
    * position 2i, bit i of `y` at 2i+1. */
  private[graft] def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Normalize a long column onto the 16-bit bucket grid given its
    * [lo, hi] range (exact integer arithmetic; hi == lo degenerates to
    * bucket 0). */
  private[graft] def bucket16(c: Column, lo: Long, hi: Long): Column =
    ((c - lit(lo)) * lit(65536L) / lit(math.max(hi - lo, 0L) + 1L))
      .cast("long")

  /** Write `df` z-ordered on `(colA, colB)`: bucket both keys onto the
    * 16-bit grid from their observed min/max (one-row aggregate),
    * range-partition + locally sort on the Morton code, drop the
    * helper column (a Project after the sort — no exchange), write
    * `files` range slices as plain parquet. Readers need nothing but
    * the path: skipping comes entirely from footer stats. */
  def writeZorderLayout(df: DataFrame, colA: String, colB: String,
      path: String, files: Int,
      blockSize: Long = 128L * 1024 * 1024): Unit = {
    val r = df.agg(min(col(colA)), max(col(colA)),
      min(col(colB)), max(col(colB))).head()
    val (aLo, aHi) = (r.getLong(0), r.getLong(1))
    val (bLo, bHi) = (r.getLong(2), r.getLong(3))
    df.withColumn("_graft_z",
        zValue(bucket16(col(colA), aLo, aHi), bucket16(col(colB), bLo, bHi)))
      .repartitionByRange(files, col("_graft_z"))
      .sortWithinPartitions(col("_graft_z"))
      .drop("_graft_z")
      .write.mode("overwrite")
      .option("parquet.block.size", blockSize)
      .parquet(path)
  }

  /** One z-ordered lineitem copy per (JVM, sf-dir) — the
    * [[Relational.qPointLookupSilver]] fit-once lifecycle. */
  private val layoutCache = new FitCache[String]((s, d) => {
    val p = graft.sources.TempDirs.scratchDir("graft_zorder").toString
    writeZorderLayout(Tables.lineitem(s, d), "l_partkey", "l_suppkey",
      p, files = 32)
    p
  })
  private[graft] def layoutFor(spark: SparkSession, dir: String): String =
    layoutCache.get(spark, dir)

  /** `q_zorder_search` — a two-dimensional box predicate served from
    * the z-ordered layout: both range predicates reach the scan as
    * `PushedFilters`, and because every row group covers a key-space
    * rectangle, footer min/max skip the row groups whose rectangle
    * misses the box — on either dimension. Values are byte-identical to the
    * same filter over the base table, which is exactly what the oracle
    * asserts (the layout may never change results, only file IO); rows
    * are ordered by the full projection so duplicate projected rows
    * hash stably. */
  def qZorderSearch(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Pq.read(spark, layoutFor(spark, dir))
      .filter(col("l_partkey").between(40L, 120L) &&
        col("l_suppkey").between(2L, 7L))
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"))

  val zorderSearchOracle: String =
    """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
      |FROM lineitem
      |WHERE l_partkey BETWEEN 40 AND 120 AND l_suppkey BETWEEN 2 AND 7
      |ORDER BY l_orderkey, l_partkey, l_suppkey, l_quantity""".stripMargin
}
