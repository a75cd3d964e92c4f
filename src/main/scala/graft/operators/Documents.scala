package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Document construction layer — the reference's largest code surface
  * (~260 LoC of nested dict building, SURVEY.md §2.7): assembling FHIR
  * resources, patching them, serializing to HL7 v2 ER7, validating, and
  * the write path.
  *
  * Everything is built-in Catalyst expressions (`struct`, `to_json`,
  * `withField`/`dropFields`, `concat_ws`) — no UDFs, so whole-stage
  * codegen covers every query and the DuckDB oracle stays expressible
  * (DuckDB `struct_pack`/`to_json` emit the same compact JSON).
  *
  * Determinism notes: JSON field order = struct declaration order in both
  * engines; no null fields are built (Spark's to_json drops them, DuckDB
  * keeps them — avoiding nulls sidesteps the divergence); numbers are
  * either integers or pre-formatted decimal strings so float rendering
  * can't differ.
  */
object Documents {

  /** D1–D3 — nested resource builder (Condition builder
    * /root/reference/src/coding_task_1.py:238-319, Observation builder
    * coding_task_3.py:89-206, Procedure builder coding_task_4.py:87-148):
    * assemble a deeply nested Patient-like document per customer —
    * CodeableConcept with a coding array, narrative from F9's HTML
    * templating (coding_task_1.py:246-253), address lines, a reference to
    * the managing org (nation, via broadcast join).
    *
    * Scale shape: one broadcast probe + pure projection; no shuffle
    * before the mandated final sort.
    */
  def qBuildStruct(spark: SparkSession, dir: String): DataFrame = {
    val seg = col("c_mktsegment")
    val display = concat(upper(substring(seg, 1, 1)),
      lower(substring(seg, 2, 100)))
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"),
        to_json(struct(
          lit("Patient").as("resourceType"),
          concat(lit("Patient/"), col("c_custkey").cast("string")).as("id"),
          struct(
            lit("generated").as("status"),
            format_string(
              "<div xmlns=\"http://www.w3.org/1999/xhtml\"><p>%s</p></div>",
              col("c_name")).as("div")
          ).as("text"),
          struct(
            array(struct(
              lit("http://terminology.example.org/segment").as("system"),
              seg.as("code"),
              display.as("display"))).as("coding"),
            seg.as("text")
          ).as("code"),
          array(struct(
            trim(concat_ws(" ", col("c_name"), col("n_name"))).as("text"),
            split(col("c_name"), "#").as("line"),
            col("n_name").as("city")
          )).as("address"),
          struct(
            concat(lit("Organization/"), col("n_name")).as("reference")
          ).as("managingOrganization"),
          col("c_acctbal").cast("decimal(12,2)").cast("string").as("balance")
        )).as("doc"))
      .orderBy(col("c_custkey"))
  }

  /** D4 — document patch/merge (/root/reference/src/coding_task_1.py:341-434:
    * attach meta.profile :352-354, backfill clinicalStatus :368-380, drop
    * internal fields): build a draft doc, then patch it with
    * `Column.withField` / `dropFields` — Catalyst's native struct-surgery
    * expressions, optimized to a single projection by OptimizeUpdateFields.
    */
  def qStructPatch(spark: SparkSession, dir: String): DataFrame = {
    val draft = struct(
      lit("draft").as("status"),
      struct(lit("1").as("versionId")).as("meta"),
      col("c_name").as("name"),
      col("c_mktsegment").as("segment"),
      lit("internal-scratch").as("scratch"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        to_json(
          draft
            .withField("status", lit("final"))
            .withField("meta.profile",
              array(lit("http://example.org/profile/patient")))
            .dropFields("scratch")
        ).as("doc"))
      .orderBy(col("c_custkey"))
  }

  /** D5/F8 — HL7 v2 ADT^A01 ER7 serialization
    * (/root/reference/src/coding_task_5.py:97-175, golden output
    * src/data/adt_message.txt): MSH/PID/PV1/DG1 segments as pure
    * `concat_ws` composition — `|` field, `^` component, `\r` segment
    * separators. The nondeterministic MSH-7 wall-clock timestamp
    * (coding_task_5.py:138, SURVEY §2 F7) is replaced by the encounter
    * date so the output is reproducible.
    *
    * Demographics come from the patient (customer), the encounter (PV1)
    * and diagnosis (DG1) from the deterministic first order per patient
    * (partial-agg min(struct)), the facility from the broadcast nation dim.
    */
  def qEr7Serialize(spark: SparkSession, dir: String): DataFrame = {
    val firstOrd = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(min(struct(col("o_orderdate"), col("o_orderkey"),
        col("o_orderpriority"))).as("f"))
      .select(col("o_custkey"), col("f.o_orderkey").as("enc_id"),
        col("f.o_orderdate").as("enc_date"),
        col("f.o_orderpriority").as("diag_code"))
    val pid = col("c_custkey").cast("string")
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(firstOrd, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"),
        concat_ws("\r",
          concat_ws("|", lit("MSH"), lit("^~\\&"), lit("GRAFT"),
            col("n_name"), lit("PRIMARY"), lit("FAC"),
            date_format(col("enc_date"), "yyyyMMddHHmmss"), lit(""),
            lit("ADT^A01"), pid, lit("P"), lit("2.5")),
          concat_ws("|", lit("PID"), lit("1"), lit(""), pid, lit(""),
            concat_ws("^", regexp_replace(col("c_name"), "#", ""),
              col("c_mktsegment")),
            lit(""), date_format(col("enc_date"), "yyyyMMdd"),
            upper(substring(col("c_mktsegment"), 1, 1))),
          concat_ws("|", lit("PV1"), lit("1"), lit("I"), col("n_name"),
            col("enc_id").cast("string")),
          concat_ws("|", lit("DG1"), lit("1"), lit(""),
            concat_ws("^", col("diag_code"), lit("I10")))
        ).as("er7"))
      .orderBy(col("c_custkey"))
  }

  /** V1 — constraint validation (`$validate` analog,
    * /root/reference/src/validation.py:8-34): evaluate a battery of
    * boolean constraints per row and emit one (key, violation) row per
    * failure — the engine-side `OperationOutcome` issues table. Rows with
    * no violations disappear (explode of an empty array), matching the
    * reference's "No issues detected" outcome.
    */
  def qValidate(spark: SparkSession, dir: String): DataFrame = {
    val checks = array(
      when(col("c_acctbal") < 0, lit("negative account balance")),
      when(!col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "FURNITURE",
        "HOUSEHOLD", "MACHINERY"), lit("unknown market segment")),
      when(!col("c_name").startsWith("Customer#"), lit("bad name format")),
      when(col("c_nationkey") < 0 || col("c_nationkey") > 24,
        lit("nationkey out of range")))
    Tables.customer(spark, dir)
      .select(col("c_custkey"),
        explode(filter(checks, x => x.isNotNull)).as("violation"))
      .orderBy(col("c_custkey"), col("violation"))
  }

  /** S6 — sink roundtrip (POST/create + read-back,
    * /root/reference/src/coding_task_1.py:222-235): write the projected
    * practitioner table to an engine-owned parquet location, read it back
    * and return it — write-path parity is checked by the oracle comparing
    * the read-back against the source table. (The reference's
    * server-assigned id is the parquet file identity here; REST sinks
    * would be `ds.foreachPartition` per SURVEY §2.1 S6.)
    */
  def qSinkRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .write.mode("overwrite").parquet(Documents.sinkRoundtripDir)
    graft.sources.Pq.read(spark, Documents.sinkRoundtripDir).orderBy(col("s_suppkey"))
  }

  /** S6 (external form) — partition-batched REST-style sink roundtrip
    * (r3 verdict item 5; /root/reference/src/coding_task_1.py:222-235):
    * serialize each practitioner to a JSON payload, push it through the
    * [[graft.sources.BatchedSink]] `foreachPartition` path against an
    * endpoint that INJECTS a transient failure with partial effects on
    * every batch's first attempt, then read the "server" state back and
    * return it. The oracle compares against the source table directly —
    * so the green row certifies retry + idempotent-upsert exactly-once:
    * any lost batch, duplicated row, or replay divergence would break
    * the hash compare.
    */
  def qSinkBatched(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{BatchedSink, InJvmUpsertStore}
    import org.apache.spark.sql.types._
    import spark.implicits._
    val src = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("string").as("key"),
        to_json(struct(col("s_suppkey"), col("s_name"), col("s_acctbal")))
          .as("payload"))
    // one named store per query key, reset per invocation (same
    // overwrite lifecycle as the parquet roundtrip sink); the VERSIONED
    // key pins this invocation's read-back to this invocation's store,
    // so a later invocation's reset can't mutate an already-returned
    // DataFrame's source
    val storeName = InJvmUpsertStore.freshVersioned("q_sink_batched")
    BatchedSink.write(src,
      InJvmUpsertStore.FlakyEndpoint(storeName, failFirstAttempt = true),
      batchSize = 25)
    val payloadSchema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_acctbal", DoubleType)))
    // DISTRIBUTED read-back (r4 verdict item 3): one task per keyspace
    // hash slice calls the store's sliced scan API — the plan is a
    // Range source fanned into parallel store scans, not a driver-side
    // createDataFrame (which serialized the whole server state through
    // the driver as a LocalTableScan; the 100 TB read-back is a source
    // stage like any other). Slice count is a modest multiple of one
    // executor's cores here; at scale it tracks the store's shard count.
    val numSlices = 8
    spark.range(0, numSlices, 1, numSlices).as[Long]
      .flatMap(s =>
        InJvmUpsertStore.scanSlice(storeName, s.toInt, numSlices))
      .toDF("payload")
      .select(from_json(col("payload"), payloadSchema).as("j"))
      .select(col("j.s_suppkey").as("s_suppkey"),
        col("j.s_name").as("s_name"), col("j.s_acctbal").as("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }

  /** One temp sink location per JVM, removed on exit: concurrent
    * PROCESSES (bench + sbt test) get distinct dirs so they cannot race
    * on a fixed path (ADVICE round 2), repeated invocations within one
    * process overwrite the same dir so nothing accumulates, and nothing
    * assumes this container's repo layout. */
  private lazy val sinkRoundtripDir: String =
    graft.sources.TempDirs.scratchDir("graft_sink_roundtrip").toString
}
