package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.PatientJson

/** Nested-document ingestion operators (r3 verdict items 1 and 4): the
  * reference's patient ETL re-expressed over a REAL schema-declared
  * nested JSON source — array-of-struct navigation, identifier-array
  * PII scrub, district imputation, address-text rebuild
  * (/root/reference/src/coding_task_1.py:77-81, 194-210) — plus the
  * PERMISSIVE/_corrupt_record quarantine path for malformed input
  * (:147-149, 161-163; SURVEY §2.2 P7).
  */
object Ingest {

  /** P1 (deep) + P3 + F1 — ingest the nested Patient corpus and run the
    * reference's transform as one projection:
    *   - `name[0].family` / `name[0].given[0]` navigation (null-safe:
    *     `get()` returns NULL on the empty `given[]` rows, exactly like
    *     DuckDB's 1-based list index)
    *   - scrub every identifier whose `system` contains "us-ssn"
    *     (higher-order `filter` over the struct array — the PII scrub
    *     on a real identifier[] column)
    *   - impute null/blank `address[0].district` to 'Not found' and
    *     rebuild the address text exactly as the reference formats it
    *
    * Everything is a codegen'd projection straight off the JSON scan —
    * no shuffle before the mandated presentation sort. The read path
    * prunes to the referenced top-level columns (PlanAuditSpec pins the
    * ReadSchema).
    */
  def qPatientIngest(spark: SparkSession, dir: String): DataFrame = {
    val p = PatientJson.readPatients(spark, dir)
    val name0 = get(col("name"), lit(0))
    val addr0 = get(col("address"), lit(0))
    // reference semantics (coding_task_1.py:199-204): drop identifiers
    // whose system mentions us-ssn; identifiers with NO system are kept
    val kept = filter(col("identifier"),
      x => !coalesce(x.getField("system").contains("us-ssn"), lit(false)))
    val districtFilled =
      coalesce(nullif(addr0.getField("district"), lit("")), lit("Not found"))
    val addrText = trim(concat(
      get(addr0.getField("line"), lit(0)), lit(" "),
      addr0.getField("city"), lit(", "),
      districtFilled, lit(", "),
      addr0.getField("state"), lit(" "),
      addr0.getField("postalCode")))
    p.select(
      element_at(split(col("id"), "/"), 2).cast("long").as("pid"),
      name0.getField("family").as("family"),
      get(name0.getField("given"), lit(0)).as("given0"),
      col("gender"),
      col("birthDate").as("birth_date"),
      col("active"),
      size(kept).cast("int").as("n_ids_kept"),
      (size(col("identifier")) - size(kept)).cast("int").as("n_ssn_scrubbed"),
      get(kept, lit(0)).getField("value").as("kept_id_value"),
      districtFilled.as("district_filled"),
      addrText.as("addr_text"))
      .orderBy(col("pid"))
  }

  /** P1 (ragged) — flatten dual-coded Observation components from the
    * nested source (/root/reference/src/data/observation.json:67-136):
    * one row per (observation, component) via `posexplode` over the
    * variable-length component array, selecting the LOINC and SNOMED
    * codes out of each component's dual coding array by system — the
    * navigation a FHIR consumer performs on every panel read. Pure
    * generator + projection off the scan; output grows ~2.25× the
    * source rows (2–3 components each), ordered by (obs_id, comp_idx).
    */
  def qObservationFlatten(spark: SparkSession, dir: String): DataFrame = {
    val o = graft.sources.ObservationJson.readObservations(spark, dir)
    def codeBySystem(sys: String) =
      get(filter(col("c.code.coding"),
        x => x.getField("system") === sys), lit(0)).getField("code")
    o.select(
      element_at(split(col("id"), "/"), 2).cast("long").as("obs_id"),
      col("subject.reference").as("patient_ref"),
      col("effectiveDateTime").as("eff_date"),
      get(col("code.coding"), lit(0)).getField("code").as("panel_code"),
      posexplode(col("component")).as(Seq("comp_idx", "c")))
      .select(col("obs_id"), col("patient_ref"), col("eff_date"),
        col("panel_code"), col("comp_idx").cast("int").as("comp_idx"),
        codeBySystem("http://loinc.org").as("loinc_code"),
        codeBySystem("http://snomed.info/sct").as("snomed_code"),
        col("c.valueQuantity.value").as("value"),
        col("c.valueQuantity.unit").as("unit"))
      .orderBy(col("obs_id"), col("comp_idx"))
  }

  /** P7 — corrupt-input quarantine: PERMISSIVE read with a declared
    * `_corrupt_record` column. Malformed lines become rows with null
    * schema fields and the raw line quarantined — the read never
    * throws and never drops a row (row count equals the source's, by
    * oracle). The sort key is recovered from the raw line for corrupt
    * rows so ordering stays total. */
  def qCorruptQuarantine(spark: SparkSession, dir: String): DataFrame =
    PatientJson.readCorruptPermissive(spark, dir)
      .select(
        coalesce(col("id"),
          regexp_extract(col("_corrupt_record"), "([0-9]+)", 1)
            .cast("long")).as("sort_key"),
        col("id").as("pid"),
        col("status"),
        col("_corrupt_record").isNotNull.as("is_corrupt"),
        col("_corrupt_record").as("raw"))
      .orderBy(col("sort_key"))
}
