package graft

import org.apache.spark.sql.functions._

import graft.operators.Pipelines

class PipelinesSpec extends SparkTestBase {

  test("q_pipeline_etl keeps every filtered patient exactly once") {
    val df = Pipelines.qPipelineEtl(spark, sfDir).cache()
    val expected = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").count()
    assert(df.count() == expected)
    assert(df.select("c_custkey").distinct().count() == expected)
    df.unpersist()
  }

  test("q_pipeline_etl documents parse and reflect the composed stages") {
    val rows = Pipelines.qPipelineEtl(spark, sfDir).collect()
    rows.foreach { r =>
      val doc = r.getAs[String]("doc")
      // PII scrub composed through the struct build: no numeric
      // identifier token survives into given[]
      val parsed = ujsonLite(doc)
      assert(parsed.contains("\"resourceType\":\"Patient\""))
      assert(!parsed.matches(""".*"given":\[[^\]]*"\d+".*"""))
      // impute composed through concat: the district (imputed or real)
      // appears in the address text
      assert(parsed.contains("\"district\":\""))
      val nv = r.getAs[Int]("n_violations")
      assert(nv >= 0 && nv <= 3)
    }
  }

  /** Minimal "parse" helper: we only assert on the raw compact JSON
    * string (the oracle compares it byte-wise anyway). */
  private def ujsonLite(s: String): String = s

  test("q_pipeline_etl violation counts agree with a driver-side recompute") {
    import spark.implicits._
    val got = Pipelines.qPipelineEtl(spark, sfDir)
      .select("c_custkey", "n_violations").as[(Long, Int)].collect().toMap
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").collect()
    val withOrders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    cust.foreach { c =>
      val key = c.getAs[Long]("c_custkey")
      var expect = 0
      if (c.getAs[Double]("c_acctbal") < 0) expect += 1
      if (!withOrders.contains(key)) expect += 1
      if (!c.getAs[String]("c_name").startsWith("Customer#")) expect += 1
      assert(got(key) == expect, s"customer $key")
    }
  }

  test("q_pipeline_caregap splits patients into created vs existing exactly") {
    import spark.implicits._
    val got = Pipelines.qPipelineCareGap(spark, sfDir)
      .select("c_custkey", "origin").as[(Long, String)].collect().toMap
    val withRecent = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp"))
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val all = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    assert(got.keySet == all.toSet)
    all.foreach { k =>
      val expect = if (withRecent.contains(k)) "existing" else "created"
      assert(got(k) == expect, s"customer $k")
    }
    // synthesized docs carry the literal vitals build
    val docs = Pipelines.qPipelineCareGap(spark, sfDir)
      .filter(col("origin") === "created").select("doc").collect()
    assert(docs.nonEmpty)
    docs.foreach { r =>
      assert(r.getString(0).contains("\"systolic\":\"120\""))
      assert(r.getString(0).contains("\"encounter\":\"synthesized\""))
    }
  }

  test("q_pipeline_curation composes the proven stages into consistent keep decisions") {
    val rows = Pipelines.qPipelineCuration(spark, sfDir).collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.length.toLong == nDocs) // audit row per document
    rows.foreach { r =>
      val keep = r.getAs[Boolean]("keep")
      assert(keep == (r.getAs[Boolean]("near_kept") &&
        r.getAs[Boolean]("quality_ok")))
      assert(r.getAs[Boolean]("quality_ok") ==
        (r.getAs[Int]("n_tokens") >= 25 &&
          r.getAs[Double]("stop_ratio") >= 0.02 &&
          r.getAs[Double]("ttr") >= 0.3))
    }
    // the gate must split the corpus non-trivially, or the thresholds
    // test nothing on this data
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")))
    // flag flow: near_kept agrees with the standalone clustering query
    val standalone = graft.operators.TextOps.qDedupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    rows.foreach(r => assert(
      r.getAs[Boolean]("near_kept") == standalone(r.getAs[Long]("doc_id"))))
  }

  test("golden: pipeline output chained through the parquet sink round-trips") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_pipeline_golden").toString
    val direct = Pipelines.qPipelineEtl(spark, sfDir)
    direct.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == direct.count())
    // byte-stable round trip: sink then re-read changes nothing
    assert(back.except(direct).count() == 0)
    assert(direct.except(back).count() == 0)
  }
}
