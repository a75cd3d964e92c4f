package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Composed end-to-end pipelines — the reference's actual *product* is
  * not single operators but whole task dataflows
  * (/root/reference/src/coding_task_1.py:438-459, SURVEY §3 EP1–EP3).
  * Round 2 implemented every stage as a separate declared query; this
  * object chains them into single plans so stage-composition behavior
  * (schema drift between clean→build, null flow across the join) is
  * itself oracle-checked.
  */
object Pipelines {

  /** EP1 — the task-1 pipeline as ONE declared plan:
    *
    *   filtered scan (S3, coding_task_1.py:64-83)
    *   → PII array-filter (P3: numeric identifier tokens scrubbed from
    *     the name, :199-204)
    *   → first-encounter lookup (J1+A3 child records reduced to a
    *     deterministic first-of-group, :85-109/:122-127) as a LEFT join
    *   → null imputation (F1: district ← 'Not found' for patients with
    *     no encounter, :211-212)
    *   → concat/trim normalization (F3 address text, :214-220)
    *   → hierarchy enrichment (J2 nation→region, :137-175)
    *   → nested struct build + JSON serialization (D1, :238-319)
    *   → constraint validation count (V1, validation.py:8-34)
    *
    * Scale shape: one shuffled first-of-group aggregate on orders (8-byte
    * keys, map-side partials), one shuffled left join fact⋈fact on
    * c_custkey, two broadcast dimension joins, then pure per-row
    * expressions — no stage materializes anything wider than the output
    * row. All JSON struct fields are non-null strings/arrays so Spark's
    * `to_json` and DuckDB's `to_json(struct_pack(...))` agree byte-wise
    * (the q_build_struct parity result).
    */
  def qPipelineEtl(spark: SparkSession, dir: String): DataFrame = {
    // S3: server-side filtered scan (pushed to parquet)
    val pts = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
    // J1+A3: deterministic first encounter per patient
    val fo = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(min(struct(col("o_orderdate"), col("o_orderkey"),
        col("o_orderpriority"))).as("f"))
      .select(col("o_custkey"),
        col("f.o_orderkey").as("first_orderkey"),
        col("f.o_orderdate").as("first_orderdate"),
        col("f.o_orderpriority").as("first_priority"))
    val nation = broadcast(Tables.nation(spark, dir))
    val region = broadcast(Tables.region(spark, dir))

    // P3: PII scrub — numeric identifier tokens dropped from the name
    val nameParts = filter(split(col("c_name"), "#"),
      p => !p.rlike("^[0-9]+$"))

    val enriched = pts
      .join(fo, col("c_custkey") === col("o_custkey"), "left")
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .withColumn("name_parts", nameParts)
      .withColumn("name_text", array_join(col("name_parts"), " "))
      // F1: impute the district from the first encounter's priority
      .withColumn("district",
        coalesce(col("first_priority"), lit("Not found")))
      // F3: normalized address text
      .withColumn("addr_text", trim(concat_ws(" ",
        col("name_text"), col("n_name"), col("district"), col("r_name"))))

    // V1: constraint battery evaluated on the *composed* row
    val checks = array(
      when(col("c_acctbal") < 0, lit("negative account balance")),
      when(col("first_orderkey").isNull, lit("no encounters on file")),
      when(!col("c_name").startsWith("Customer#"), lit("bad name format")))

    enriched.select(
      col("c_custkey"),
      to_json(struct(
        lit("Patient").as("resourceType"),
        concat(lit("Patient/"), col("c_custkey").cast("string")).as("id"),
        struct(
          lit("generated").as("status"),
          concat(lit("<div xmlns=\"http://www.w3.org/1999/xhtml\"><p>"),
            col("name_text"), lit("</p></div>")).as("div")).as("text"),
        struct(
          col("name_text").as("text"),
          col("name_parts").as("given")).as("name"),
        struct(
          col("addr_text").as("text"),
          col("n_name").as("city"),
          col("district").as("district"),
          col("r_name").as("state")).as("address"),
        struct(
          concat(lit("Encounter/"),
            coalesce(col("first_orderkey").cast("string"), lit("none")))
            .as("reference"),
          coalesce(date_format(col("first_orderdate"), "yyyyMMdd"),
            lit("none")).as("period")).as("encounter"))).as("doc"),
      size(filter(checks, x => x.isNotNull)).as("n_violations"))
      .orderBy(col("c_custkey"))
  }

  /** EP2 — the task-3 create-if-missing pipeline as ONE declared plan
    * (/root/reference/src/coding_task_3.py:54-87 + main :236-245; the
    * `insights.md:223` care-gap query): patients WITHOUT a recent
    * encounter get a synthesized vitals Observation (the reference's
    * literal 120/80 build, coding_task_3.py:159,188); patients WITH one
    * carry their deterministic first recent encounter as the existing
    * Observation. The anti/semi split is one left join observed two
    * ways, the build is the D2 struct shape, and the union is implicit
    * in the CASE'd projection — exactly the imperative
    * `if entry is None: create` re-expressed declaratively.
    *
    * Scale shape: one shuffled first-of-group aggregate over the
    * date-filtered orders (the filter is pushed to the scan, so only
    * recent keys shuffle), one shuffled left join on c_custkey, then
    * per-row expressions.
    */
  def qPipelineCareGap(spark: SparkSession, dir: String): DataFrame = {
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(min(struct(col("o_orderdate"), col("o_orderkey"))).as("f"))
      .select(col("o_custkey"),
        col("f.o_orderkey").as("enc_key"),
        col("f.o_orderdate").as("enc_date"))
    val joined = Tables.customer(spark, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left")
    val created = col("enc_key").isNull
    joined.select(
      col("c_custkey"),
      when(created, lit("created")).otherwise(lit("existing"))
        .as("origin"),
      to_json(struct(
        lit("Observation").as("resourceType"),
        lit("vital-signs").as("category"),
        concat(lit("Patient/"), col("c_custkey").cast("string"))
          .as("subject"),
        when(created, lit("synthesized"))
          .otherwise(concat(lit("Encounter/"),
            col("enc_key").cast("string"))).as("encounter"),
        coalesce(date_format(col("enc_date"), "yyyy-MM-dd"),
          lit("1900-01-01")).as("effectiveDate"),
        struct(
          lit("120").as("systolic"),
          lit("80").as("diastolic")).as("component"))).as("doc"))
      .orderBy(col("c_custkey"))
  }
}
