package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's second nested document shape: Observation panels
  * with dual-coded components (/root/reference/src/data/observation
  * .json:67-136 — each component carries a LOINC and a SNOMED coding
  * and a `valueQuantity`; builder at src/coding_task_3.py:89-206).
  * FIXTURES.md §A pins the 85354-9 blood-pressure panel with 8480-6 /
  * 8462-4 components.
  *
  * One Observation per order (orders → encounters role mapping), with
  * a VARIABLE-length component array (2 or 3 entries) so the flatten
  * query exercises ragged explode, and every component dual-coded so
  * code selection must filter the coding array by system — the same
  * navigation a real FHIR consumer performs.
  */
object ObservationJson {

  private val codingType = StructType(Seq(
    StructField("system", StringType),
    StructField("code", StringType),
    StructField("display", StringType)))

  val observationSchema: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("status", StringType),
    StructField("code", StructType(Seq(
      StructField("coding", ArrayType(codingType)),
      StructField("text", StringType)))),
    StructField("subject", StructType(Seq(
      StructField("reference", StringType)))),
    StructField("effectiveDateTime", DateType),
    StructField("component", ArrayType(StructType(Seq(
      StructField("code", StructType(Seq(
        StructField("coding", ArrayType(codingType))))),
      StructField("valueQuantity", StructType(Seq(
        StructField("value", DoubleType),
        StructField("unit", StringType),
        StructField("system", StringType),
        StructField("code", StringType))))))))))

  def fixtureDir(dir: String): String =
    s"/tmp/graft_fixtures/observations/${new java.io.File(dir).getName}"

  private def comp(loinc: String, snomed: String, display: String,
    value: Column): Column =
    struct(
      struct(array(
        struct(lit("http://loinc.org").as("system"), lit(loinc).as("code"),
          lit(display).as("display")),
        struct(lit("http://snomed.info/sct").as("system"),
          lit(snomed).as("code"), lit(display).as("display"))).as("coding"))
        .as("code"),
      struct(value.as("value"), lit("mmHg").as("unit"),
        lit("http://unitsofmeasure.org").as("system"),
        lit("mm[Hg]").as("code")).as("valueQuantity"))

  /** Observation document per order: BP panel (systolic + diastolic,
    * plus a pulse component when key % 4 == 0) with values a pure
    * function of the key. */
  private def observationDoc: Column = {
    val key = col("o_orderkey")
    val systolic = comp("8480-6", "271649006", "Systolic blood pressure",
      (lit(100) + pmod(key, lit(40))).cast("double"))
    val diastolic = comp("8462-4", "271650006", "Diastolic blood pressure",
      (lit(60) + pmod(key, lit(30))).cast("double"))
    val pulse = when(pmod(key, lit(4)) === 0,
      comp("8867-4", "364075005", "Heart rate",
        (lit(55) + pmod(key, lit(50))).cast("double")))
    to_json(struct(
      lit("Observation").as("resourceType"),
      concat(lit("Observation/"), key.cast("string")).as("id"),
      lit("final").as("status"),
      struct(array(
        struct(lit("http://loinc.org").as("system"),
          lit("85354-9").as("code"),
          lit("Blood pressure panel").as("display"))).as("coding"),
        lit("Blood pressure panel").as("text")).as("code"),
      struct(concat(lit("Patient/"), col("o_custkey").cast("string"))
        .as("reference")).as("subject"),
      to_date(col("o_orderdate")).as("effectiveDateTime"),
      filter(array(systolic, diastolic, pulse), x => x.isNotNull)
        .as("component")))
  }

  def writeFixture(spark: SparkSession, dir: String): String =
    FixturePublish.once(fixtureDir(dir), tmp =>
      Tables.orders(spark, dir).select(observationDoc.as("value"))
        .write.mode("overwrite").text(tmp))

  def readObservations(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(observationSchema)
      .json(writeFixture(spark, dir))
}
