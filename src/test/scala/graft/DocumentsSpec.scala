package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Documents

class DocumentsSpec extends SparkTestBase {

  test("q_build_struct emits parseable JSON with the declared shape") {
    val df = Documents.qBuildStruct(spark, sfDir)
    val schema = StructType(Seq(
      StructField("resourceType", StringType),
      StructField("id", StringType),
      StructField("code", StructType(Seq(
        StructField("coding", ArrayType(StructType(Seq(
          StructField("system", StringType),
          StructField("code", StringType),
          StructField("display", StringType))))),
        StructField("text", StringType)))),
      StructField("balance", StringType)))
    val parsed = df.select(col("c_custkey"),
      from_json(col("doc"), schema).as("p"))
    assert(parsed.filter(col("p.resourceType") =!= "Patient").count() == 0)
    assert(parsed.filter(col("p.code.coding")(0)("system").isNull).count() == 0)
    // id round-trips the key
    val bad = parsed.filter(
      col("p.id") =!= concat(lit("Patient/"), col("c_custkey"))).count()
    assert(bad == 0)
  }

  test("q_struct_patch applies withField/dropFields surgery") {
    val rows = Documents.qStructPatch(spark, sfDir).limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val doc = r.getAs[String]("doc")
      assert(doc.contains("\"status\":\"final\""))
      assert(doc.contains("\"profile\":[\"http://example.org/profile/patient\"]"))
      assert(!doc.contains("scratch"))
      // patched field order: status first, then meta
      assert(doc.startsWith("{\"status\":\"final\",\"meta\":"))
    }
  }

  test("q_er7_serialize emits 4-segment ER7 messages") {
    val rows = Documents.qEr7Serialize(spark, sfDir).limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val segs = r.getAs[String]("er7").split("\r")
      assert(segs.map(_.takeWhile(_ != '|')).toSeq ==
        Seq("MSH", "PID", "PV1", "DG1"))
      assert(segs(0).contains("ADT^A01"))
      assert(segs(3).endsWith("^I10"))
    }
  }

  test("q_validate flags exactly the negative balances") {
    val df = Documents.qValidate(spark, sfDir)
    val flagged = df.filter(col("violation") === "negative account balance")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val negative = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_acctbal") < 0)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(flagged == negative)
    // the well-formed constraints never fire on the testdata
    assert(df.filter(col("violation") === "bad name format").count() == 0)
    assert(df.filter(col("violation") === "nationkey out of range").count() == 0)
  }

  test("q_sink_roundtrip read-back equals the source projection") {
    val back = Documents.qSinkRoundtrip(spark, sfDir)
    val src = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select("s_suppkey", "s_name", "s_acctbal")
    assert(back.count() == src.count())
    assert(back.except(src).count() == 0)
    assert(src.except(back).count() == 0)
  }
}
