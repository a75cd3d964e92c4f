package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Ingest
import graft.sources.PatientJson

/** Nested-JSON ingestion + corrupt-input quarantine (SURVEY §1.3, §2.2
  * P1/P3/P7): the reference's patient ETL over a real schema-declared
  * array-of-struct source, and the PERMISSIVE/FAILFAST malformed-input
  * contract.
  */
class IngestSpec extends SparkTestBase {

  test("q_patient_ingest applies the reference transform to every patient") {
    val rows = Ingest.qPatientIngest(spark, sfDir).collect()
    val nCust = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(rows.length.toLong == nCust)
    rows.foreach { r =>
      val pid = r.getAs[Long]("pid")
      // P3 scrub: keys with a planted us-ssn identifier lose exactly it
      assert(r.getAs[Int]("n_ssn_scrubbed") == (if (pid % 3 != 0) 1 else 0))
      assert(r.getAs[Int]("n_ids_kept") == 1)
      assert(r.getAs[String]("kept_id_value") == s"MRN-$pid")
      // P1 deep navigation is null-safe on the empty given[] rows
      if (pid % 11 == 0) assert(r.isNullAt(r.fieldIndex("given0")))
      else assert(r.getAs[String]("given0") == s"Given${pid % 7}")
      // F1: null AND blank district both impute to the reference default
      if (pid % 5 <= 1)
        assert(r.getAs[String]("district_filled") == "Not found")
      else assert(r.getAs[String]("district_filled").startsWith("District-"))
      // the rebuilt address text embeds the imputed district
      assert(r.getAs[String]("addr_text")
        .contains(s", ${r.getAs[String]("district_filled")}, "))
    }
  }

  test("patient read is schema-declared, with absent fields as NULL") {
    val p = PatientJson.readPatients(spark, sfDir)
    assert(p.schema == PatientJson.patientSchema)
    // `communication` is declared in the schema but absent from every
    // document: a PERMISSIVE schema-declared read yields NULL, never
    // an error and never schema inference
    assert(p.filter(col("communication").isNotNull).count() == 0)
    assert(p.filter(col("identifier").isNull).count() == 0)
  }

  test("q_observation_flatten explodes ragged dual-coded components correctly") {
    val rows = Ingest.qObservationFlatten(spark, sfDir).collect()
    val nOrders = spark.read.parquet(s"$sfDir/orders.parquet").count()
    // 2 components per observation, 3 when key % 4 == 0
    val byObs = rows.groupBy(_.getAs[Long]("obs_id"))
    assert(byObs.size.toLong == nOrders)
    byObs.foreach { case (id, comps) =>
      val want = if (id % 4 == 0) 3 else 2
      assert(comps.length == want, s"obs $id: ${comps.length} components")
      val sorted = comps.sortBy(_.getAs[Int]("comp_idx"))
      // FIXTURES §A pin: the 85354-9 panel with 8480-6/8462-4 dual-coded
      assert(sorted.forall(_.getAs[String]("panel_code") == "85354-9"))
      assert(sorted(0).getAs[String]("loinc_code") == "8480-6")
      assert(sorted(0).getAs[String]("snomed_code") == "271649006")
      assert(sorted(0).getAs[Double]("value") == 100.0 + id % 40)
      assert(sorted(1).getAs[String]("loinc_code") == "8462-4")
      assert(sorted(1).getAs[Double]("value") == 60.0 + id % 30)
      if (want == 3) {
        assert(sorted(2).getAs[String]("loinc_code") == "8867-4")
        assert(sorted(2).getAs[Double]("value") == 55.0 + id % 50)
      }
    }
  }

  test("q_corrupt_quarantine never throws and never drops rows") {
    val rows = Ingest.qCorruptQuarantine(spark, sfDir).collect()
    val nCust = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(rows.length.toLong == nCust) // nothing silently dropped
    val (bad, good) = rows.partition(_.getAs[Boolean]("is_corrupt"))
    assert(bad.nonEmpty && good.nonEmpty)
    bad.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("pid")))
      assert(r.getAs[String]("raw").startsWith("CORRUPT"))
    }
    good.foreach { r =>
      assert(r.getAs[String]("status") == "good")
      assert(r.isNullAt(r.fieldIndex("raw")))
    }
  }

  test("FAILFAST rejects the malformed lines PERMISSIVE quarantines") {
    val e = intercept[Exception] {
      PatientJson.readCorruptFailfast(spark, sfDir).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(m => m.contains("FAILFAST") ||
      m.contains("Malformed")), chain(e))
    // the PERMISSIVE read of the same files must not throw
    PatientJson.readCorruptPermissive(spark, sfDir).collect()
  }

  test("streaming read quarantines corrupt records like the batch path") {
    // the nightly-sync generalization ingests the same files via
    // readStream: malformed lines must land in _corrupt_record rows
    // under PERMISSIVE exactly as in batch — no crash, no drop
    val input = PatientJson.writeCorruptFixture(spark, sfDir)
    val out = java.nio.file.Files
      .createTempDirectory("graft_stream_quarantine").toString
    val q = spark.readStream.schema(PatientJson.corruptRecordSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(input)
      .writeStream.format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/cp")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$out/data")
    val nCust = spark.read.parquet(s"$sfDir/customer.parquet").count()
    assert(got.count() == nCust)
    val nBadStream = got.filter(col("_corrupt_record").isNotNull).count()
    // (the batch dual can't count corrupt rows straight off the raw
    // files — Spark disallows queries referencing ONLY _corrupt_record
    // over raw JSON — so derive the expected count from the source)
    val nBadWant = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(pmod(col("c_custkey"), lit(97)) === 3).count()
    assert(nBadStream == nBadWant && nBadStream > 0)
  }

  test("from_json FAILFAST conformance check rejects malformed documents") {
    import spark.implicits._
    val schema = StructType(Seq(StructField("id", LongType)))
    val df = Seq("""{"id": 1}""", """CORRUPT{""").toDF("s")
    // PERMISSIVE from_json: malformed -> null-filled struct, no throw
    val perm = df.select(from_json(col("s"), schema).as("j")).collect()
    assert(perm(0).getStruct(0).getLong(0) == 1L)
    assert(perm(1).isNullAt(0) || perm(1).getStruct(0).isNullAt(0))
    // FAILFAST from_json: malformed -> error at execution
    intercept[Exception] {
      df.select(from_json(col("s"), schema,
        Map("mode" -> "FAILFAST")).as("j")).collect()
    }
  }
}
