package graft

import org.apache.spark.sql.functions._

import graft.operators.Spread

/** r19 optimization round: the scale-adaptive scan spread
  * ([[graft.operators.Spread]]). Pins the branch semantics — spread
  * fires only below the session's default parallelism, is an identity
  * above it, and never changes results of the partition-order-free
  * consumers it guards. */
class SpreadSpec extends SparkTestBase {

  test("afterScan spreads a single-split scan to default parallelism") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_spread").toString
    import spark.implicits._
    (1L to 1000L).toDF("k").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    val df = spark.read.parquet(s"$dir/t.parquet")
    assert(df.rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism)
    val out = Spread.afterScan(df, "k", s"$dir/t")
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // result-identity: same rows, and order-free aggregates agree
    assert(out.count() == 1000L)
    val a = out.agg(sum(col("k")), countDistinct(col("k"))).collect()(0)
    assert(a.getLong(0) == 500500L && a.getLong(1) == 1000L)
  }

  test("afterScan is the identity when splits already cover the cores") {
    import spark.implicits._
    val wide = (1L to 1000L).toDF("k")
      .repartition(spark.sparkContext.defaultParallelism * 2)
    val out = Spread.afterScan(wide, "k")
    // no new exchange: the very same Dataset comes back
    assert(out eq wide)
  }

  test("spread q_profile emits null counts equal to the unspread " +
      "approx variant's") {
    // q_profile reads the SPREAD orders scan, q_profile_approx the
    // plain one (see Relational) — their shared exact columns
    // (n_rows, n_nulls, min/max) must agree row-for-row, which pins
    // that the spread changed nothing but where rows are processed
    val exact = graft.operators.Relational.qProfile(spark, sfDir)
      .collect().map(r => r.getAs[String]("column") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"))).toMap
    val approx = graft.operators.Relational.qProfileApprox(spark, sfDir)
      .collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      assert(exact(r.getAs[String]("column")) ==
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"))))
    }
  }
}
