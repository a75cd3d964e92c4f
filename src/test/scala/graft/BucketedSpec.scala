package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketed

/** Pins for the declared bucketed co-located join (`q_bucket_join`):
  * the plan shape that makes the layout worth paying for (zero
  * exchanges under the fact⋈fact join), the one-file-per-bucket write
  * that also removes the per-task sort, and value equality with the
  * plain unbucketed join (which is also what the driver's oracle
  * checks against DuckDB).
  */
class BucketedSpec extends SparkTestBase {

  test("co-located join plans SMJ with zero exchanges and bucket scans") {
    val j = Bucketed.colocatedJoin(spark, sfDir)
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p.take(2000))
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n${p.take(2000)}")
    assert(p.contains("SelectedBucketsCount"), p.take(2000))
  }

  test("grouped aggregate on the bucket key plans with zero exchanges") {
    val (_, lt) = Bucketed.layoutFor(spark, sfDir)
    val a = Bucketed.aggPlan(spark.table(lt))
    val p = a.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n${p.take(2000)}")
    // and the values are the plain-scan aggregate's, row-for-row
    val plain = Bucketed
      .aggPlan(spark.read.parquet(s"$sfDir/lineitem.parquet"))
      .orderBy(col("l_orderkey")).collect().toSeq
    assert(a.orderBy(col("l_orderkey")).collect().toSeq == plain)
  }

  test("RI anti-join over the layout is exchange-free below the counts") {
    val (ot, lt) = Bucketed.layoutFor(spark, sfDir)
    // pin the anti-join SUBTREE (scan → distinct → anti SMJ), before
    // the 1-row count aggregates that legitimately exchange one row
    val keys = spark.table(ot).select(col("o_orderkey"))
      .distinct().hint("merge")
    val anti = spark.table(lt).hint("merge")
      .filter(col("l_orderkey").isNotNull)
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_anti")
    val p = anti.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") && p.contains("LeftAnti"),
      p.take(2000))
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n${p.take(2000)}")
    // and the declared audit row equals the plain-parquet leg exactly
    val out = Bucketed.qBucketRi(spark, sfDir).collect().toSeq
    val plain = Bucketed.riAntiPlan(
      spark.read.parquet(s"$sfDir/lineitem.parquet"),
      spark.read.parquet(s"$sfDir/orders.parquet")).collect().toSeq
    assert(out == plain && out.nonEmpty)
  }

  test("q_bucket_join equals the plain unbucketed join row-for-row") {
    val out = Bucketed.qBucketJoin(spark, sfDir).collect().toSeq
    val plain = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).cast("decimal(38,6)")
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect().toSeq
    assert(out == plain)
    assert(out.nonEmpty)
  }
}
