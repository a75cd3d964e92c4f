package graft

/** Driver-surface smoke: every declared query must execute at sf0.001
  * (the t1 scale), so no query can depend on literals/keys that only
  * exist at larger scale factors, and the flagship entry returns rows.
  */
class EntrySmokeSpec extends SparkTestBase {

  test("every declared query executes and has a schema at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name: empty schema")
      val n = df.count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("queries that must be non-empty at sf0.001 are non-empty") {
    val mustHaveRows = Seq("q_scan", "q_point_lookup", "q_child_records",
      "q_parent_lookup", "q_child_lookup", "q_code_map",
      "q_resource_counts", "q_build_struct", "q_struct_patch",
      "q_er7_serialize", "q_sink_roundtrip", "q_window_tumbling",
      "q_session_gap", "q_dedup_exact", "q_text_stats", "q_lang_id",
      "q_simhash", "q_fingerprint", "q_cosine_topk", "q_multimodal_meta",
      "q_frame_sample", "q_token_count", "q_hierarchy_closure",
      "q_pipeline_etl", "q_pipeline_caregap", "q_patient_ingest",
      "q_corrupt_quarantine", "q_sink_batched", "q_observation_flatten",
      "q_token_percentiles", "q_dedup_clusters")
    mustHaveRows.foreach { name =>
      assert(SparkEntry.queries(name)(spark, sfDir).count() > 0,
        s"$name returned 0 rows at sf0.001")
    }
  }

  test("every oracle entry has a matching declared query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
