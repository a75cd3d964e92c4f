package graft

import graft.operators.Zorder
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Z-order layout: Morton-code correctness vs a bit-by-bit reference,
  * result equality with the base table, and the data-skipping pin —
  * the SAME second-dimension predicate prunes z-ordered files but
  * reads ALL files of a single-key-sorted copy.
  */
class ZorderSpec extends SparkTestBase {
  import spark.implicits._

  private def refZ(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("Morton code matches the bit-by-bit reference on the 16-bit grid") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L),
      (65535L, 0L), (0L, 65535L), (65535L, 65535L), (12345L, 54321L))
    val got = pts.toDF("x", "y")
      .select(Zorder.zValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    val want = pts.map { case (x, y) => refZ(x, y) }
    assert(got.toSeq === want)
    // spot values: z(1,0)=1, z(0,1)=2, z(3,3)=15
    assert(refZ(1, 0) === 1L && refZ(0, 1) === 2L && refZ(3, 3) === 15L)
  }

  test("bucket16 is monotone, spans the grid, and survives degenerate " +
      "ranges") {
    val vals = Seq(0L, 1L, 500L, 999L, 1000L)
    val b = vals.toDF("v")
      .select(Zorder.bucket16(col("v"), 0L, 1000L).as("b"))
      .collect().map(_.getLong(0))
    assert(b.toSeq === b.toSeq.sorted)
    assert(b.head === 0L && b.last <= 65535L && b.last >= 65000L)
    val deg = Seq(7L).toDF("v")
      .select(Zorder.bucket16(col("v"), 7L, 7L)).head().getLong(0)
    assert(deg === 0L)
  }

  test("q_zorder_search equals the same filter over the base table, " +
      "and the layout conserves rows") {
    val base = Tables.lineitem(spark, sfDir)
      .filter(col("l_partkey").between(40L, 120L) &&
        col("l_suppkey").between(2L, 7L))
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .orderBy("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      .collect()
    val layered = Zorder.qZorderSearch(spark, sfDir).collect()
    assert(layered.toSeq === base.toSeq)
    assert(base.nonEmpty)
    val layoutRows = spark.read.parquet(Zorder.layoutFor(spark, sfDir))
      .count()
    assert(layoutRows === Tables.lineitem(spark, sfDir).count())
  }

  test("data skipping: a suppkey-only range skips most z-ordered row " +
      "groups but reads every row group of a partkey-sorted layout") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case q: QueryStageExec => fileScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(fileScans)
    }
    val big = spark.read
      .parquet("/root/testdata/sf0.1/lineitem.parquet")
    val total = big.count()
    val zDir = graft.sources.TempDirs.scratchDir("graft_z_skip")
    val linDir = graft.sources.TempDirs.scratchDir("graft_lin_skip")
    try {
      // 64 KB row groups => many row groups per file, so stats
      // skipping is observable at test scale (the point-layout spec's
      // recipe); parquet skipping is row-group granular — numFiles
      // never shrinks, emitted rows do.
      Zorder.writeZorderLayout(big, "l_partkey", "l_suppkey",
        zDir.toString, files = 32, blockSize = 64 * 1024)
      big.repartitionByRange(32, col("l_partkey"))
        .sortWithinPartitions(col("l_partkey"))
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(linDir.toString)

      def rowsEmitted(path: String): Long = {
        val df = spark.read.parquet(path)
          .filter(col("l_suppkey").between(100L, 149L))
          .select("l_orderkey", "l_suppkey")
        df.collect() // execute THIS queryExecution so metrics populate
        fileScans(df.queryExecution.executedPlan).head
          .metrics("numOutputRows").value
      }
      val zRows = rowsEmitted(zDir.toString)
      val linRows = rowsEmitted(linDir.toString)
      // single-key sort: suppkey spreads through every row group — the
      // scan reads essentially the whole table
      assert(linRows * 10 >= total * 9,
        s"partkey-sorted copy emitted $linRows of $total — unexpectedly " +
          "skipped on the unsorted dimension")
      // z-order: every row group covers a key-space rectangle, so the
      // 5%-wide suppkey range admits a small fraction of them
      assert(zRows * 2 <= total,
        s"z-order emitted $zRows of $total rows — no second-dim skipping")
      assert(zRows * 4 <= linRows,
        s"z-order ($zRows) must beat the single-key sort ($linRows) by 4x")
      // and the box predicate over BOTH dims skips even harder
      val boxDf = spark.read.parquet(zDir.toString)
        .filter(col("l_partkey").between(40L, 120L) &&
          col("l_suppkey").between(2L, 7L))
      boxDf.collect()
      val boxScan = fileScans(boxDf.queryExecution.executedPlan).head
      assert(boxScan.metrics("numOutputRows").value * 10 <= total)
      assert(boxScan.toString.contains("PushedFilters"))
    } finally {
      graft.sources.TempDirs.deleteTree(zDir)
      graft.sources.TempDirs.deleteTree(linDir)
    }
  }
}
