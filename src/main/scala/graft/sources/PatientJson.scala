package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-declared nested-JSON ingestion — the reference's ACTUAL data
  * shape (r3 verdict item 1): every reference input is a 3–5-level
  * array-of-struct FHIR document (/root/reference/src/data/patient.json:
  * 15-59), navigated as `name[0].given[0]`
  * (/root/reference/src/coding_task_1.py:77-81) and mutated by the
  * identifier/address ETL (:194-210). The engine never read that shape
  * from a source before this round: builders only CONSTRUCTED structs
  * and `q_project_nested` extracted one key from a JSON string.
  *
  * The fixture corpus is derived deterministically from the driver's
  * `customer`/`nation`/`region` tables (one Patient document per
  * customer, FIXTURES.md §A shape: a us-ssn identifier on most rows for
  * the P3 scrub, a null OR blank `district` for F1, an empty `given[]`
  * for F2), written as newline-delimited JSON under a FIXED path keyed
  * by scale-factor directory name — fixed so the driver's DuckDB oracle
  * can `read_ndjson` the SAME files with the same declared struct types
  * (the t2 contract runs at sf0.01). Reads use the DECLARED
  * [[patientSchema]], never inference: inference at 100 TB means a full
  * extra pass over the corpus before the first real job.
  */
object PatientJson {

  private val coding = StructType(Seq(
    StructField("system", StringType),
    StructField("code", StringType)))

  /** FIXTURES.md §A patient schema (fields the fixture exercises, plus
    * `communication`, declared but absent from every document — the
    * missing-field → NULL contract of a PERMISSIVE schema-declared
    * read). 4 levels of nesting: identifier[].type.coding[].code. */
  val patientSchema: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("identifier", ArrayType(StructType(Seq(
      StructField("use", StringType),
      StructField("type", StructType(Seq(
        StructField("coding", ArrayType(coding))))),
      StructField("system", StringType),
      StructField("value", StringType))))),
    StructField("active", BooleanType),
    StructField("name", ArrayType(StructType(Seq(
      StructField("use", StringType),
      StructField("family", StringType),
      StructField("given", ArrayType(StringType)))))),
    StructField("gender", StringType),
    StructField("birthDate", DateType),
    StructField("address", ArrayType(StructType(Seq(
      StructField("use", StringType),
      StructField("type", StringType),
      StructField("text", StringType),
      StructField("line", ArrayType(StringType)),
      StructField("city", StringType),
      StructField("district", StringType),
      StructField("state", StringType),
      StructField("postalCode", StringType))))),
    StructField("communication", ArrayType(StructType(Seq(
      StructField("language", StructType(Seq(
        StructField("coding", ArrayType(StructType(Seq(
          StructField("system", StringType),
          StructField("code", StringType),
          StructField("display", StringType))))),
        StructField("text", StringType))))))))))

  /** Fixed fixture root: the oracle SQL must name the same files, so
    * the path is a function of the sf directory NAME only (t2 always
    * runs at sf0.01 — see SparkEntry.oracleSql). Never cleaned up on
    * exit: the driver's DuckDB compare runs in a later process. */
  def fixtureDir(dir: String): String =
    s"/tmp/graft_fixtures/patients/${new java.io.File(dir).getName}"

  def corruptFixtureDir(dir: String): String =
    s"/tmp/graft_fixtures/patients_corrupt/${new java.io.File(dir).getName}"

  /** The Patient document JSON column, one per customer row (expects
    * c_custkey/c_name/c_mktsegment/n_name/r_name in scope). All
    * branching is on the key, so content is a pure deterministic
    * function of the joined tables:
    *   - key % 3 != 0 → a us-ssn identifier precedes the MRN one
    *     (exercises the P3 scrub's hit and miss branches)
    *   - key % 11 == 0 → empty given[] (F2's missing-first-name)
    *   - key % 5 == 0 → district null (absent in JSON); % 5 == 1 →
    *     district "" (blank) — both must impute to 'Not found' (F1)
    */
  private def patientDoc: Column = {
    val key = col("c_custkey")
    val idType = (code: String) => struct(
      array(struct(
        lit("http://terminology.hl7.org/CodeSystem/v2-0203").as("system"),
        lit(code).as("code"))).as("coding"))
    val ssnId = when(pmod(key, lit(3)) =!= 0, struct(
      lit("official").as("use"),
      idType("SS").as("type"),
      lit("http://hl7.org/fhir/sid/us-ssn").as("system"),
      lpad(pmod(key * 37 + 11, lit(1000000000)).cast("string"), 9, "0")
        .as("value")))
    val mrnId = struct(
      lit("usual").as("use"),
      idType("MR").as("type"),
      lit("http://hospital.example.org/mrn").as("system"),
      concat(lit("MRN-"), key.cast("string")).as("value"))
    val givenNames = when(pmod(key, lit(11)) === 0,
      array().cast(ArrayType(StringType, containsNull = false)))
      .otherwise(array(
        concat(lit("Given"), pmod(key, lit(7)).cast("string")),
        lit("Middle")))
    val district = when(pmod(key, lit(5)) === 0, lit(null).cast("string"))
      .when(pmod(key, lit(5)) === 1, lit(""))
      .otherwise(concat(lit("District-"), pmod(key, lit(9)).cast("string")))
    to_json(struct(
      lit("Patient").as("resourceType"),
      concat(lit("Patient/"), key.cast("string")).as("id"),
      filter(array(ssnId, mrnId), x => x.isNotNull).as("identifier"),
      (pmod(key, lit(7)) =!= 0).as("active"),
      array(struct(
        lit("official").as("use"),
        initcap(lower(col("c_mktsegment"))).as("family"),
        givenNames.as("given"))).as("name"),
      when(pmod(key, lit(2)) === 0, lit("female")).otherwise(lit("male"))
        .as("gender"),
      date_add(to_date(lit("1950-01-01")),
        pmod(key, lit(18000)).cast("int")).as("birthDate"),
      array(struct(
        lit("home").as("use"),
        lit("both").as("type"),
        array(concat(key.cast("string"), lit(" Main St"))).as("line"),
        col("n_name").as("city"),
        district.as("district"),
        col("r_name").as("state"),
        lpad(pmod(key, lit(100000)).cast("string"), 5, "0")
          .as("postalCode"))).as("address")))
  }

  private def joined(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))

  def writePatientFixture(spark: SparkSession, dir: String): String =
    FixturePublish.once(fixtureDir(dir), tmp =>
      joined(spark, dir).select(patientDoc.as("value"))
        .write.mode("overwrite").text(tmp))

  /** Corrupt-line fixture (P7): every key ≡ 3 (mod 97) emits a
    * malformed line (unterminated JSON, with the key recoverable from
    * the raw text); all other rows are well-formed minimal documents.
    * Mirrors the reference's branch-on-every-bad-response posture
    * (/root/reference/src/coding_task_1.py:147-149, 161-163). */
  def writeCorruptFixture(spark: SparkSession, dir: String): String =
    FixturePublish.once(corruptFixtureDir(dir), tmp =>
      Tables.customer(spark, dir).select(
        when(pmod(col("c_custkey"), lit(97)) === 3,
          concat(lit("CORRUPT{\"id\":"), col("c_custkey").cast("string")))
          .otherwise(to_json(struct(
            col("c_custkey").as("id"),
            lit("good").as("status")))).as("value"))
        .write.mode("overwrite").text(tmp))

  /** Schema-declared nested read of the patient corpus — the real
    * ingestion surface: `spark.read.schema(...).json(...)` (SURVEY
    * §1.3), PERMISSIVE by default. */
  def readPatients(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(patientSchema)
      .json(writePatientFixture(spark, dir))

  val corruptRecordSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("status", StringType),
    StructField("_corrupt_record", StringType)))

  /** PERMISSIVE + `_corrupt_record` quarantine read: malformed lines
    * surface as rows with null fields and the raw line captured —
    * never an exception, never a silent drop. */
  def readCorruptPermissive(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(corruptRecordSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(writeCorruptFixture(spark, dir))

  /** FAILFAST conformance read over the same files — throws on the
    * first malformed line (the strict-contract ingestion mode; spec
    * coverage in IngestSpec). */
  def readCorruptFailfast(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(StructType(corruptRecordSchema
        .filterNot(_.name == "_corrupt_record")))
      .option("mode", "FAILFAST")
      .json(writeCorruptFixture(spark, dir))
}

/** Atomic fixture publication, shared by every JSON fixture family.
  * A bare `mode(overwrite)` to the final path is delete-then-write: a
  * concurrent reader could see a half-written directory, and a losing
  * concurrent writer's late part files could DOUBLE the corpus under
  * the oracle's `part-*` glob. Instead: reuse an existing complete
  * fixture (`_SUCCESS` present — content is a pure deterministic
  * function of the driver tables), otherwise write to a process-unique
  * temp directory and atomically rename it into place; the losing
  * writer of a publish race discards its copy. Readers only ever
  * observe a complete directory. The per-JVM map makes repeat
  * invocations free (input staging, not part of the declared
  * operators).
  */
private[sources] object FixturePublish {

  private val published =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def deleteRec(p: java.nio.file.Path): Unit =
    TempDirs.deleteTree(p)

  def once(path: String, write: String => Unit): String =
    published.computeIfAbsent(path, _ => {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val target = Paths.get(path)
      val success = target.resolve("_SUCCESS")
      if (!Files.exists(success)) {
        // leftovers of a crashed writer (dir without _SUCCESS) go away
        deleteRec(target)
        val tmp = path + ".tmp-" + java.util.UUID.randomUUID()
        write(tmp)
        Files.createDirectories(target.getParent)
        try {
          Files.move(Paths.get(tmp), target,
            StandardCopyOption.ATOMIC_MOVE)
        } catch {
          case e: java.io.IOException =>
            // lost a publish race: the winner's copy is complete and
            // byte-identical; drop ours. Anything else is real.
            if (Files.exists(success)) deleteRec(Paths.get(tmp))
            else throw e
        }
      }
      path
    })
}
