package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a
  * `(SparkSession, sfDir) => DataFrame`, with matching ANSI SQL in
  * [[oracleSql]] for the driver's DuckDB compare (omitted only where the
  * output is not SQL-expressible; those get rows-only checks plus ScalaTest
  * coverage). Column names and total ORDER BY are kept identical between
  * the Spark plan and the SQL so the hash compare is stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A condensed end-to-end analog of the reference's task-1 pipeline
    * (filtered patient scan → child-records join → enrichment → agg).
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir  = "/root/testdata/sf0.001"
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    val ords = spark.read.parquet(s"$dir/orders.parquet")
    cust.join(ords, cust("c_custkey") === ords("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("spend"))
      .orderBy(col("c_custkey"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M1 — relational core (SURVEY §2.1–§2.6)
    "q_scan"            -> (Relational.qScan _),
    "q_point_lookup"    -> (Relational.qPointLookup _),
    "q_point_lookup_silver" -> (Relational.qPointLookupSilver _),
    "q_zorder_search"   -> (Zorder.qZorderSearch _),
    "q_filtered_search" -> (Relational.qFilteredSearch _),
    "q_project_nested"  -> (Relational.qProjectNested _),
    "q_drop_cols"       -> (Relational.qDropCols _),
    "q_array_filter"    -> (Relational.qArrayFilter _),
    "q_topk"            -> (Relational.qTopk _),
    "q_topk_per_group"  -> (Relational.qTopkPerGroup _),
    "q_first_per_key"   -> (Relational.qFirstPerKey _),
    "q_count_by_key"    -> (Relational.qCountByKey _),
    "q_null_impute"     -> (Relational.qNullImpute _),
    "q_concat_norm"     -> (Relational.qConcatNorm _),
    "q_string_shape"    -> (Relational.qStringShape _),
    "q_profile"         -> (Relational.qProfile _),
    "q_profile_approx"  -> (Relational.qProfileApprox _),
    // M2 — joins & enrichment (SURVEY §2.3, §2.4 A2)
    "q_child_records"   -> (Joins.qChildRecords _),
    "q_parent_lookup"   -> (Joins.qParentLookup _),
    "q_child_lookup"    -> (Joins.qChildLookup _),
    "q_code_map"        -> (Joins.qCodeMap _),
    "q_anti_missing"    -> (Joins.qAntiMissing _),
    "q_semi_exists"     -> (Joins.qSemiExists _),
    "q_asof_join"       -> (Joins.qAsofJoin _),
    "q_bucket_join"     -> (Bucketed.qBucketJoin _),
    "q_bucket_agg"      -> (Bucketed.qBucketAgg _),
    "q_bucket_ri"       -> (Bucketed.qBucketRi _),
    "q_hierarchy_closure" -> (Joins.qHierarchyClosure _),
    "q_resource_counts" -> (Joins.qResourceCounts _),
    "q_rollup_counts"   -> (Joins.qRollupCounts _),
    "q_cube_counts"     -> (Joins.qCubeCounts _),
    "q_pivot_lang"      -> (Joins.qPivotLang _),
    "q_value_histogram" -> (Joins.qValueHistogram _),
    "q_approx_distinct" -> (Joins.qApproxDistinct _),
    "q_distinct_exact"  -> (Joins.qDistinctExact _),
    // M2.5 — nested-JSON ingestion + corrupt-input quarantine (SURVEY
    // §1.3, §2.2 P1/P3/P7; r3 verdict items 1 & 4)
    "q_patient_ingest"    -> (Ingest.qPatientIngest _),
    "q_observation_flatten" -> (Ingest.qObservationFlatten _),
    "q_corrupt_quarantine" -> (Ingest.qCorruptQuarantine _),
    // M3 — document ops & sinks (SURVEY §2.7, §2.8, §2.1 S6)
    "q_build_struct"    -> (Documents.qBuildStruct _),
    "q_struct_patch"    -> (Documents.qStructPatch _),
    "q_er7_serialize"   -> (Documents.qEr7Serialize _),
    "q_validate"        -> (Documents.qValidate _),
    "q_sink_roundtrip"  -> (Documents.qSinkRoundtrip _),
    "q_sink_batched"    -> (Documents.qSinkBatched _),
    // M3.5 — composed end-to-end pipelines (SURVEY §3 EP1/EP2; round-2 verdict)
    "q_pipeline_etl"     -> (Pipelines.qPipelineEtl _),
    "q_pipeline_caregap" -> (Pipelines.qPipelineCareGap _),
    "q_pipeline_curation" -> (Pipelines.qPipelineCuration _),
    "q_pipeline_manifest" -> (Pipelines.qPipelineManifest _),
    "q_pipeline_mix"      -> (Pipelines.qPipelineMix _),
    "q_pipeline_nightly"  -> (TextOps.qPipelineNightly _),
    "q_pipeline_sequence" -> (Pipelines.qPipelineSequence _),
    "q_pipeline_multimodal" -> (Pipelines.qPipelineMultimodal _),
    "q_pipeline_engagement" -> (Pipelines.qPipelineEngagement _),
    "q_pipeline_quality"  -> (Pipelines.qPipelineQuality _),
    // M4 — time windows (SURVEY §2.9; streaming duals in graft.streaming)
    "q_window_tumbling" -> (Windowed.qWindowTumbling _),
    "q_window_sliding"  -> (Windowed.qWindowSliding _),
    "q_session_gap"     -> (Windowed.qSessionGap _),
    // M4.5 — event analytics (bin-bucketed range join, funnel, retention)
    "q_range_join"      -> (Events.qRangeJoin _),
    "q_funnel"          -> (Events.qFunnel _),
    "q_retention"       -> (Events.qRetention _),
    "q_click_attribution" -> (Events.qClickAttribution _),
    "q_gap_fill"        -> (Events.qGapFill _),
    "q_scd2_dim"        -> (Events.qScd2Dim _),
    "q_outliers"        -> (Events.qOutliers _),
    "q_outliers_approx" -> (Events.qOutliersApprox _),
    "q_ri_audit"        -> (Joins.qRiAudit _),
    "q_temporal_join"   -> (Events.qTemporalJoin _),
    "q_pipeline_landing" -> (Pipelines.qPipelineLanding _),
    "q_pipeline_publish" -> (Pipelines.qPipelinePublish _),
    "q_transitions"     -> (Events.qTransitions _),
    "q_rolling_count"   -> (Events.qRollingCount _),
    "q_snapshot_diff"   -> (Curation.qSnapshotDiff _),
    "q_cdc_merge"       -> (Curation.qCdcMerge _),
    "q_mv_refresh"      -> (Curation.qMvRefresh _),
    "q_edit_pairs"      -> (TextOps.qEditPairs _),
    "q_edit_clusters"   -> (TextOps.qEditClusters _),
    "q_edit_incremental" -> (TextOps.qEditIncremental _),
    "q_edit_compact"    -> (TextOps.qEditCompact _),
    "q_cluster_assign"  -> (Vectors.qClusterAssign _),
    "q_mix_drift"       -> (Curation.qMixDrift _),
    "q_user_journey"    -> (Events.qUserJourney _),
    // M5 — LLM-pipeline text ops (SURVEY §2.10; BASELINE.json north star)
    "q_dedup_exact"     -> (TextOps.qDedupExact _),
    "q_jaccard_pairs"   -> (TextOps.qJaccardPairs _),
    "q_dedup_minhash"   -> (TextOps.qDedupMinhash _),
    "q_dedup_minhash_carried"  -> (TextOps.qDedupMinhashCarried _),
    "q_dedup_minhash_joinback" -> (TextOps.qDedupMinhashJoinback _),
    "q_dedup_clusters"  -> (TextOps.qDedupClusters _),
    "q_dedup_incremental" -> (TextOps.qDedupIncremental _),
    "q_dedup_compact"   -> (TextOps.qDedupCompact _),
    "q_dup_spans"       -> (TextOps.qDupSpans _),
    "q_span_scrub"      -> (TextOps.qSpanScrub _),
    "q_boilerplate"     -> (TextOps.qBoilerplate _),
    "q_token_freq_score" -> (TextOps.qTokenFreqScore _),
    "q_quality_quartiles" -> (TextOps.qQualityQuartiles _),
    "q_text_stats"      -> (TextOps.qTextStats _),
    "q_token_count"     -> (TextOps.qTokenCount _),
    "q_vocab_topk"      -> (TextOps.qVocabTopk _),
    "q_heavy_hitters"   -> (TextOps.qHeavyHitters _),
    "q_heavy_hitters_verified" -> (TextOps.qHeavyHittersVerified _),
    "q_heavy_hitters_by_lang" -> (TextOps.qHeavyHittersByLang _),
    "q_tfidf_topk"      -> (TextOps.qTfidfTopk _),
    "q_bm25_topk"       -> (TextOps.qBm25Topk _),
    "q_lm_score"        -> (TextOps.qLmScore _),
    "q_classify_source" -> (TextOps.qClassifySource _),
    "q_score_deciles"   -> (TextOps.qScoreDeciles _),
    "q_score_deciles_approx" -> (TextOps.qScoreDecilesApprox _),
    "q_colloc_pmi"      -> (TextOps.qCollocPmi _),
    "q_token_percentiles" -> (TextOps.qTokenPercentiles _),
    "q_lang_id"         -> (TextOps.qLangId _),
    "q_simhash"         -> (TextOps.qSimhash _),
    "q_simhash_checked" -> (TextOps.qSimhashChecked _),
    "q_simhash_pairs"   -> (TextOps.qSimhashPairs _),
    "q_simhash_clusters" -> (TextOps.qSimhashClusters _),
    "q_simhash_incremental" -> (TextOps.qSimhashIncremental _),
    "q_simhash_compact" -> (TextOps.qSimhashCompact _),
    "q_fingerprint"     -> (TextOps.qFingerprint _),
    "q_fingerprint_checked" -> (TextOps.qFingerprintChecked _),
    "q_bpe_encode"      -> (Bpe.qBpeEncode _),
    "q_bpe_checked"     -> (Bpe.qBpeChecked _),
    "q_bpe_vocab"       -> (Bpe.qBpeVocab _),
    "q_bpe_fertility"   -> (Bpe.qBpeFertility _),
    // M5 — similarity search over embeddings
    "q_quantize_embed"  -> (Vectors.qQuantizeEmbed _),
    "q_cosine_topk"     -> (Vectors.qCosineTopk _),
    "q_hard_negatives"  -> (Vectors.qHardNegatives _),
    "q_hard_negatives_ivf"  -> (Vectors.qHardNegativesIvf _),
    "q_hard_negatives_full" -> (Vectors.qHardNegativesFull _),
    "q_dedup_embed"     -> (Vectors.qDedupEmbed _),
    "q_dedup_embed_lsh" -> (Vectors.qDedupEmbedLsh _),
    "q_dedup_embed_clusters" -> (Vectors.qDedupEmbedClusters _),
    "q_dedup_embed_incremental" -> (Vectors.qDedupEmbedIncremental _),
    "q_dedup_embed_compact" -> (Vectors.qDedupEmbedCompact _),
    "q_ann_ivf"         -> (Vectors.qAnnIvf _),
    "q_ann_ivf_full"    -> (Vectors.qAnnIvfFull _),
    "q_ann_ivf_pq"      -> (Vectors.qAnnIvfPq _),
    "q_ann_ivf_pq_exact" -> (Vectors.qAnnIvfPqExact _),
    // M5 — multimodal binary columns
    "q_multimodal_meta" -> (Multimodal.qMultimodalMeta _),
    "q_image_meta"      -> (Multimodal.qImageMeta _),
    "q_audio_meta"      -> (Multimodal.qAudioMeta _),
    "q_video_meta"      -> (Multimodal.qVideoMeta _),
    "q_frame_sample"    -> (Multimodal.qFrameSample _),
    // M6 — corpus curation (split / sample / decontaminate / pack / mix)
    "q_train_split"       -> (Curation.qTrainSplit _),
    "q_sample_stratified" -> (Curation.qSampleStratified _),
    "q_sample_weighted" -> (Curation.qSampleWeighted _),
    "q_sample_reservoir" -> (Curation.qSampleReservoir _),
    "q_decontaminate"     -> (Curation.qDecontaminate _),
    "q_contamination_report" -> (Curation.qContaminationReport _),
    "q_repetition"        -> (Curation.qRepetition _),
    "q_pii_scrub"         -> (Curation.qPiiScrub _),
    "q_normalize_text"    -> (Curation.qNormalizeText _),
    "q_source_cap"        -> (Curation.qSourceCap _),
    "q_chunk_docs"        -> (Curation.qChunkDocs _),
    "q_pack_sequences"    -> (Curation.qPackSequences _),
    "q_pack_manifest"     -> (Curation.qPackManifest _),
    "q_corpus_mix"        -> (Curation.qCorpusMix _),
    "q_mix_resample"      -> (Curation.qMixResample _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** Exact n-gram Jaccard pair SQL — the oracle for the exact baseline
    * AND both forced-layout rides of the banded scale path (the pair
    * sets coincide on the test corpora; see q_dedup_minhash_carried's
    * map entry). */
  private val jaccardPairsOracle: String =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(w) >= 3
      |      THEN [array_to_string(w[i:i+2], ' ')
      |            for i in range(1, len(w) - 1)]
      |      ELSE [array_to_string(w, ' ')] END)) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents) t),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |       CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
      |FROM pairs
      |JOIN sz sa ON sa.doc_id = id_a
      |JOIN sz sb ON sb.doc_id = id_b
      |WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin

  /** Full-corpus near-dup cluster reachability SQL — the oracle for
    * BOTH the batch clustering query and the incremental path (whose
    * contract is exactly "equals a full recompute"). */
  private val dedupClustersOracle: String =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(w) >= 3
      |      THEN [array_to_string(w[i:i+2], ' ')
      |            for i in range(1, len(w) - 1)]
      |      ELSE [array_to_string(w, ' ')] END)) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents) t),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |cp AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |jp AS (
      |  SELECT id_a, id_b FROM cp
      |  JOIN sz sa ON sa.doc_id = id_a
      |  JOIN sz sb ON sb.doc_id = id_b
      |  WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8),
      |e AS (SELECT id_a AS a, id_b AS b FROM jp
      |      UNION ALL SELECT id_b, id_a FROM jp),
      |reach AS (
      |  SELECT doc_id AS node, doc_id AS r FROM documents
      |  UNION
      |  SELECT e.a, reach.r FROM reach JOIN e ON reach.node = e.b)
      |SELECT node AS doc_id, min(r) AS cluster_id,
      |       (min(r) = node) AS is_kept
      |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  /** Full-corpus embedding near-dup cluster reachability SQL (exact
    * ≥0.8-cosine pair graph) — the oracle for both the batch embedding
    * clustering query and its incremental twin. */
  private val embedClustersOracle: String =
    """WITH RECURSIVE base AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, v,
      |    sqrt(list_reduce(list_transform(v, x -> x * x),
      |         (a, b) -> a + b)) AS nrm
      |  FROM base),
      |un AS (
      |  SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM n),
      |jp AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM un a, un b
      |  WHERE a.vec_id < b.vec_id
      |    AND list_reduce(list_transform(list_zip(a.u, b.u),
      |        p -> p[1] * p[2]), (x, y) -> x + y) >= 0.8),
      |e AS (SELECT id_a AS a, id_b AS b FROM jp
      |      UNION ALL SELECT id_b, id_a FROM jp),
      |reach AS (
      |  SELECT vec_id AS node, vec_id AS r FROM embeddings
      |  UNION
      |  SELECT e.a, reach.r FROM reach JOIN e ON reach.node = e.b)
      |SELECT node AS vec_id, min(r) AS cluster_id,
      |       (min(r) = node) AS is_kept
      |FROM reach GROUP BY node ORDER BY vec_id""".stripMargin

  /** Brute-force unit-cosine top-5 SQL — the oracle both exact-regime
    * ANN rides share: `q_ann_ivf_full` (full probe of the float
    * pipeline) and `q_ann_ivf_pq_exact` (full probe + corpus-sized
    * shortlist of the compressed pipeline). Cosines are computed on
    * unit vectors in both engines — the bitwise-identical left-fold
    * dot that q_dedup_embed's green compare pins. */
  private val annExactTopkOracle: String =
    """WITH base AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, v,
      |    sqrt(list_reduce(list_transform(v, x -> x * x),
      |         (a, b) -> a + b)) AS nrm
      |  FROM base),
      |un AS (
      |  SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM n),
      |scored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
      |    list_reduce(list_transform(list_zip(q.u, c.u),
      |        p -> p[1] * p[2]), (x, y) -> x + y) AS cosine
      |  FROM un q, un c WHERE q.vec_id < 10 AND c.vec_id >= 10),
      |ranked AS (
      |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      |  FROM scored)
      |SELECT q_id, rank, neighbor_id, cosine FROM ranked
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** Min-reachable-id labels over the exact edit-distance pair graph —
    * the full-recompute reachability every PassJoin-family clusters
    * member contracts on (`q_edit_clusters` and, r14, the incremental
    * and compaction members: whatever path built the flags, the truth
    * is this naive recompute over the corpus's true text). */
  private val editClustersOracle: String =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id, lang, substr(text, 1, 30) AS head,
      |         length(substr(text, 1, 30)) AS len
      |  FROM documents),
      |jp AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  WHERE abs(a.len - b.len) <= 3
      |    AND levenshtein(a.head, b.head) <= 3),
      |e AS (SELECT id_a AS a, id_b AS b FROM jp
      |      UNION ALL SELECT id_b, id_a FROM jp),
      |reach AS (
      |  SELECT doc_id AS node, doc_id AS r FROM documents
      |  UNION
      |  SELECT e.a, reach.r FROM reach JOIN e ON reach.node = e.b)
      |SELECT node AS doc_id, min(r) AS cluster_id,
      |       (min(r) = node) AS is_kept
      |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_scan" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_point_lookup" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey = 42 ORDER BY c_custkey""".stripMargin,
    // q_point_lookup_silver reads the engine's sharded+sorted silver
    // copy; matching the base-table lookup exactly IS the layout
    // correctness assertion (pruning is pinned by metrics in
    // PlanAuditSpec).
    "q_point_lookup_silver" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey = 42 ORDER BY c_custkey""".stripMargin,
    // q_zorder_search is served from the Morton-clustered lineitem
    // copy; the oracle is the same 2D box over the base table — the
    // layout may change file IO, never results (skipping pinned by
    // metrics in ZorderSpec).
    "q_zorder_search" -> Zorder.zorderSearchOracle,
    "q_filtered_search" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000.0
        |  AND c_name LIKE 'Customer#00000%'
        |ORDER BY c_custkey""".stripMargin,
    "q_project_nested" ->
      """SELECT event_id, event_type,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "q_drop_cols" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |       l_extendedprice, l_returnflag, l_shipdate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey,
        |  l_suppkey, l_quantity, l_extendedprice, l_returnflag,
        |  l_shipdate""".stripMargin,
    "q_array_filter" ->
      """SELECT doc_id,
        |       len(list_filter(string_split(text, ' '),
        |           w -> w NOT IN ('a', 'the'))) AS n_clean,
        |       array_to_string(list_slice(list_filter(string_split(text, ' '),
        |           w -> w NOT IN ('a', 'the')), 1, 8), ' ') AS head_words
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, CAST(rn AS INTEGER) AS rank, o_orderkey,
        |       o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rank""".stripMargin,
    "q_first_per_key" ->
      """SELECT o_custkey, first_orderkey, first_orderdate FROM (
        |  SELECT o_custkey, o_orderkey AS first_orderkey,
        |         o_orderdate AS first_orderdate,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_count_by_key" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |           AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_null_impute" ->
      """SELECT c_custkey,
        |       coalesce(nullif(trim(c_mktsegment), 'MACHINERY'),
        |                'Not found') AS segment_imputed
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_concat_norm" ->
      """SELECT c_custkey,
        |       trim(concat_ws(' ', c_name,
        |            nullif(c_mktsegment, 'AUTOMOBILE'),
        |            CAST(c_nationkey AS VARCHAR))) AS norm_text
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_string_shape" ->
      """SELECT o_orderkey,
        |       upper(substring(o_orderpriority, 1, 1)) AS prio_code,
        |       strftime(o_orderdate, '%Y%m%d') AS date_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_profile" ->
      """SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |  CAST(min(o_orderkey) AS DOUBLE) AS min_num,
        |  CAST(max(o_orderkey) AS DOUBLE) AS max_num,
        |  CAST(NULL AS VARCHAR) AS min_str,
        |  CAST(NULL AS VARCHAR) AS max_str FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*),
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT),
        |  CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
        |  NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*),
        |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |  NULL, NULL, min(o_orderstatus), max(o_orderstatus) FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*),
        |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  CAST(count(DISTINCT o_totalprice) AS BIGINT),
        |  CAST(min(o_totalprice) AS DOUBLE),
        |  CAST(max(o_totalprice) AS DOUBLE), NULL, NULL FROM orders
        |UNION ALL
        |SELECT 'o_orderdate', count(*),
        |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  CAST(count(DISTINCT o_orderdate) AS BIGINT),
        |  CAST(epoch_us(min(o_orderdate)) AS DOUBLE),
        |  CAST(epoch_us(max(o_orderdate)) AS DOUBLE), NULL, NULL
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |  NULL, NULL, min(o_orderpriority), max(o_orderpriority)
        |FROM orders
        |ORDER BY "column"""".stripMargin,
    // The nested-ingestion oracle reads the SAME fixture files the
    // declared query wrote (deterministic content derived from
    // customer/nation/region) with DuckDB's own declared struct types;
    // the path is keyed by the sf directory name and the t2 contract
    // runs at sf0.01. Spark writes the fixture before the driver's
    // DuckDB pass runs (Verify executes every query first).
    "q_patient_ingest" ->
      """WITH p AS (
        |  SELECT * FROM read_ndjson(
        |    '/tmp/graft_fixtures/patients/sf0.01/part-*.txt',
        |    format='newline_delimited',
        |    columns={resourceType:'VARCHAR', id:'VARCHAR',
        |      identifier:'STRUCT("use" VARCHAR, "type" STRUCT(coding STRUCT(system VARCHAR, code VARCHAR)[]), system VARCHAR, "value" VARCHAR)[]',
        |      active:'BOOLEAN',
        |      name:'STRUCT("use" VARCHAR, family VARCHAR, given VARCHAR[])[]',
        |      gender:'VARCHAR', birthDate:'DATE',
        |      address:'STRUCT("use" VARCHAR, "type" VARCHAR, line VARCHAR[], city VARCHAR, district VARCHAR, state VARCHAR, postalCode VARCHAR)[]',
        |      communication:'STRUCT(language STRUCT(coding STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)[], "text" VARCHAR))[]'})),
        |k AS (
        |  SELECT *,
        |    list_filter(identifier,
        |      x -> NOT contains(coalesce(x.system, ''), 'us-ssn')) AS kept,
        |    coalesce(nullif(address[1].district, ''), 'Not found')
        |      AS district_filled
        |  FROM p)
        |SELECT CAST(split_part(id, '/', 2) AS BIGINT) AS pid,
        |       name[1].family AS family,
        |       name[1].given[1] AS given0,
        |       gender, birthDate AS birth_date, active,
        |       CAST(len(kept) AS INTEGER) AS n_ids_kept,
        |       CAST(len(identifier) - len(kept) AS INTEGER)
        |         AS n_ssn_scrubbed,
        |       kept[1]."value" AS kept_id_value,
        |       district_filled,
        |       trim(concat(address[1].line[1], ' ', address[1].city, ', ',
        |         district_filled, ', ', address[1].state, ' ',
        |         address[1].postalCode)) AS addr_text
        |FROM k ORDER BY pid""".stripMargin,
    "q_observation_flatten" ->
      """WITH o AS (
        |  SELECT * FROM read_ndjson(
        |    '/tmp/graft_fixtures/observations/sf0.01/part-*.txt',
        |    format='newline_delimited',
        |    columns={resourceType:'VARCHAR', id:'VARCHAR', status:'VARCHAR',
        |      code:'STRUCT(coding STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)[], "text" VARCHAR)',
        |      subject:'STRUCT(reference VARCHAR)',
        |      effectiveDateTime:'DATE',
        |      component:'STRUCT(code STRUCT(coding STRUCT(system VARCHAR, code VARCHAR, display VARCHAR)[]), valueQuantity STRUCT("value" DOUBLE, unit VARCHAR, system VARCHAR, code VARCHAR))[]'})),
        |x AS (
        |  SELECT CAST(split_part(id, '/', 2) AS BIGINT) AS obs_id,
        |         subject.reference AS patient_ref,
        |         effectiveDateTime AS eff_date,
        |         code.coding[1].code AS panel_code,
        |         unnest(component) AS c,
        |         generate_subscripts(component, 1) - 1 AS comp_idx
        |  FROM o)
        |SELECT obs_id, patient_ref, eff_date, panel_code,
        |       CAST(comp_idx AS INTEGER) AS comp_idx,
        |       list_filter(c.code.coding,
        |         y -> y.system = 'http://loinc.org')[1].code AS loinc_code,
        |       list_filter(c.code.coding,
        |         y -> y.system = 'http://snomed.info/sct')[1].code
        |         AS snomed_code,
        |       c.valueQuantity."value" AS "value",
        |       c.valueQuantity.unit AS unit
        |FROM x ORDER BY obs_id, comp_idx""".stripMargin,
    // The corrupt-quarantine oracle re-derives the expected rows from
    // the customer table (DuckDB cannot parse the malformed lines, and
    // the corrupt corpus is a deterministic function of it anyway).
    "q_corrupt_quarantine" ->
      """SELECT c_custkey AS sort_key,
        |  CASE WHEN c_custkey % 97 = 3 THEN NULL
        |       ELSE c_custkey END AS pid,
        |  CASE WHEN c_custkey % 97 = 3 THEN NULL
        |       ELSE 'good' END AS status,
        |  (c_custkey % 97 = 3) AS is_corrupt,
        |  CASE WHEN c_custkey % 97 = 3
        |       THEN concat('CORRUPT{"id":', CAST(c_custkey AS VARCHAR))
        |       ELSE NULL END AS raw
        |FROM customer ORDER BY sort_key""".stripMargin,
    "q_child_records" ->
      """SELECT c_custkey, c_name, o_orderkey, o_orderstatus, o_totalprice
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q_parent_lookup" ->
      """SELECT c_custkey, n_name AS code_name, r_name AS parent_name
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "q_child_lookup" ->
      """WITH fc AS (
        |  SELECT n_regionkey, min(n_nationkey) AS child_key,
        |         arg_min(n_name, n_nationkey) AS child_name
        |  FROM nation GROUP BY n_regionkey)
        |SELECT c_custkey, n.n_name AS code_name, fc.child_key, fc.child_name
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN fc ON n.n_regionkey = fc.n_regionkey
        |ORDER BY c_custkey""".stripMargin,
    "q_code_map" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, p_brand AS map_target
        |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin,
    // The oracle uses DuckDB's NATIVE ASOF JOIN — the engine's
    // union-window formulation must reproduce it row-for-row.
    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        |buys AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT b.event_id, b.user_id, b.ts, b.value,
        |       c.ts AS click_ts, c.click_value
        |FROM buys b ASOF JOIN clicks c
        |  ON b.user_id = c.user_id AND b.ts >= c.ts
        |ORDER BY b.event_id""".stripMargin,
    // The oracle joins the RAW parquet tables: the engine's bucketed
    // layout is a physical re-clustering only, so values must match
    // the plain join exactly — the co-location is pinned by plan shape
    // in BucketedSpec, the values by this row.
    // Same raw-parquet oracle posture as q_bucket_join: the bucketed
    // layout must be value-invisible to the per-order rollup.
    "q_bucket_agg" ->
      """SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |           AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin,
    "q_bucket_join" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |           AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // q_bucket_ri: the lineitem→orders RI leg served from the bucketed
    // layout — the oracle is the SAME plain-parquet audit SQL as the
    // corresponding q_ri_audit row (layout value-invisibility, third
    // plan shape: anti-join; exchange-free subtree pinned in
    // BucketedSpec).
    "q_bucket_ri" ->
      """SELECT 'lineitem.l_orderkey->orders' AS relation,
        |  count(*) AS n_child,
        |  CAST(sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_null_fk,
        |  CAST(sum(CASE WHEN l.l_orderkey IS NOT NULL AND p.k IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
        |  CAST(count(DISTINCT CASE WHEN l.l_orderkey IS NOT NULL
        |    AND p.k IS NULL THEN l.l_orderkey END) AS BIGINT)
        |    AS n_orphan_keys
        |FROM lineitem l LEFT JOIN
        |  (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |  ON l.l_orderkey = p.k""".stripMargin,
    // The oracle states the range join DECLARATIVELY (BETWEEN, no
    // bins) — the engine's bin-bucketed equi-join must reproduce the
    // inequality join's pair set exactly (a bin off-by-one or a
    // double-emitted boundary pair fails the hash compare).
    "q_range_join" ->
      """WITH w AS (
        |  SELECT event_id AS win_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) - 300 AS lo,
        |         CAST(floor(epoch(ts)) AS BIGINT) + 300 AS hi
        |  FROM events WHERE event_type = 'error' AND value >= 15.0),
        |p AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS p_ts, value
        |  FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT win_id, count(*) AS n_purchases,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |           AS purchase_value
        |  FROM w JOIN p ON p.p_ts BETWEEN w.lo AND w.hi
        |  GROUP BY win_id)
        |SELECT w.win_id, w.lo, w.hi,
        |       coalesce(m.n_purchases, 0) AS n_purchases, m.purchase_value
        |FROM w LEFT JOIN m USING (win_id)
        |ORDER BY win_id""".stripMargin,
    // Staged-min funnel semantics: clicks count only at-or-after the
    // first view, purchases only at-or-after the first qualified click.
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_type FROM events
        |  WHERE event_type IN ('view', 'click', 'purchase')),
        |v AS (SELECT user_id, min(ts) AS view_ts FROM e
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS click_ts
        |      FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts >= v.view_ts
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
        |      FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
        |      GROUP BY e.user_id),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
        |       CASE WHEN p.purchase_ts IS NOT NULL THEN 3
        |            WHEN c.click_ts IS NOT NULL THEN 2
        |            WHEN v.view_ts IS NOT NULL THEN 1
        |            ELSE 0 END AS stage
        |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |       LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // EP10 — the full composed engagement dataflow: per-user aggregate
    // (cohort/counts/lag-gap session sum) joined with the staged-min
    // funnel, stage coalesced to 0 for funnel-less users.
    "q_pipeline_engagement" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         CAST(ts AS DATE) AS day
        |  FROM events),
        |g AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS ns
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |agg AS (
        |  SELECT e.user_id, min(e.day) AS cohort,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(count(DISTINCT e.day) AS BIGINT) AS active_days
        |  FROM e GROUP BY e.user_id),
        |sess AS (
        |  SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions
        |  FROM g GROUP BY user_id),
        |fe AS (SELECT user_id, ts, event_type FROM e
        |       WHERE event_type IN ('view', 'click', 'purchase')),
        |v AS (SELECT user_id, min(ts) AS view_ts FROM fe
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT fe.user_id, min(fe.ts) AS click_ts
        |      FROM fe JOIN v USING (user_id)
        |      WHERE fe.event_type = 'click' AND fe.ts >= v.view_ts
        |      GROUP BY fe.user_id),
        |p AS (SELECT fe.user_id, min(fe.ts) AS purchase_ts
        |      FROM fe JOIN c USING (user_id)
        |      WHERE fe.event_type = 'purchase' AND fe.ts >= c.click_ts
        |      GROUP BY fe.user_id)
        |SELECT agg.user_id, agg.cohort,
        |       CASE WHEN p.purchase_ts IS NOT NULL THEN 3
        |            WHEN c.click_ts IS NOT NULL THEN 2
        |            WHEN v.view_ts IS NOT NULL THEN 1
        |            ELSE 0 END AS stage,
        |       sess.n_sessions, agg.n_events, agg.active_days
        |FROM agg JOIN sess USING (user_id)
        |  LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |  LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // Batch instantiation of the stream-stream interval join core
    // (Streams.attributionStream shares the identical join).
    "q_click_attribution" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |       p.ts AS purchase_ts, p.value,
        |       c.event_id AS click_id, c.ts AS click_ts
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
        |ORDER BY purchase_id, click_id""".stripMargin,
    // Densified hourly grid: every (hour, type) cell exists, zero or
    // not, each carrying its delta vs the previous hour of its type.
    "q_gap_fill" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT unnest(generate_series((SELECT min(hour) FROM hourly),
        |                                (SELECT max(hour) FROM hourly),
        |                                INTERVAL 1 HOUR)) AS hour),
        |dense AS (
        |  SELECT g.hour, t.event_type,
        |         coalesce(h.cnt, 0) AS n
        |  FROM grid g
        |  CROSS JOIN (SELECT DISTINCT event_type FROM hourly) t
        |  LEFT JOIN hourly h
        |    ON h.hour = g.hour AND h.event_type = t.event_type)
        |SELECT hour, event_type, CAST(n AS BIGINT) AS n,
        |       CAST(n - lag(n) OVER (PARTITION BY event_type
        |                             ORDER BY hour) AS BIGINT) AS delta
        |FROM dense
        |ORDER BY hour, event_type""".stripMargin,
    "q_ri_audit" ->
      """WITH rel AS (
        |  SELECT 'customer.c_nationkey->nation' AS relation,
        |    count(*) AS n_child,
        |    CAST(sum(CASE WHEN c.c_nationkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_null_fk,
        |    CAST(sum(CASE WHEN c.c_nationkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans,
        |    CAST(count(DISTINCT CASE WHEN c.c_nationkey IS NOT NULL
        |      AND p.k IS NULL THEN c.c_nationkey END) AS BIGINT)
        |      AS n_orphan_keys
        |  FROM customer c LEFT JOIN
        |    (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |    ON c.c_nationkey = p.k
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey->orders', count(*),
        |    CAST(sum(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(sum(CASE WHEN l.l_orderkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT CASE WHEN l.l_orderkey IS NOT NULL
        |      AND p.k IS NULL THEN l.l_orderkey END) AS BIGINT)
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |    ON l.l_orderkey = p.k
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part', count(*),
        |    CAST(sum(CASE WHEN l.l_partkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(sum(CASE WHEN l.l_partkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT CASE WHEN l.l_partkey IS NOT NULL
        |      AND p.k IS NULL THEN l.l_partkey END) AS BIGINT)
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT p_partkey AS k FROM part) p
        |    ON l.l_partkey = p.k
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier', count(*),
        |    CAST(sum(CASE WHEN l.l_suppkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(sum(CASE WHEN l.l_suppkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT CASE WHEN l.l_suppkey IS NOT NULL
        |      AND p.k IS NULL THEN l.l_suppkey END) AS BIGINT)
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT s_suppkey AS k FROM supplier) p
        |    ON l.l_suppkey = p.k
        |  UNION ALL
        |  SELECT 'nation.n_regionkey->region', count(*),
        |    CAST(sum(CASE WHEN n.n_regionkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(sum(CASE WHEN n.n_regionkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT CASE WHEN n.n_regionkey IS NOT NULL
        |      AND p.k IS NULL THEN n.n_regionkey END) AS BIGINT)
        |  FROM nation n LEFT JOIN
        |    (SELECT DISTINCT r_regionkey AS k FROM region) p
        |    ON n.n_regionkey = p.k
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer', count(*),
        |    CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    CAST(sum(CASE WHEN o.o_custkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT CASE WHEN o.o_custkey IS NOT NULL
        |      AND p.k IS NULL THEN o.o_custkey END) AS BIGINT)
        |  FROM orders o LEFT JOIN
        |    (SELECT DISTINCT c_custkey AS k FROM customer) p
        |    ON o.o_custkey = p.k)
        |SELECT * FROM rel ORDER BY relation""".stripMargin,
    // The temporal-join oracle: same SCD2 CTE, INTERVAL semantics
    // (from <= ts < to with an open current version) expressed as a
    // union + carry-forward window rather than a range LEFT JOIN.
    // r17: the range-join form was the sf10 sweep's one measured
    // timeout — DuckDB executes the per-user inequality join
    // quadratically within heavy users at 10M events — while this
    // form is a sort + linear scan. They are equivalent because the
    // SCD2 versions of a user tile [effective_from, next change) with
    // no gaps or overlaps: the version in force at probe ts is
    // exactly the LAST version row at or before it (dim rows sort
    // before probes on ties, so a version starting AT the probe's ts
    // wins — `from <= ts`; a zero-length version at the same ts is
    // superseded by its same-ts successor, which the version-ordered
    // carry also picks). Cell-exact-verified against the range-join
    // form at sf0.01 and sf1.
    "q_temporal_join" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type AS status,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events WHERE event_type <> 'purchase'),
        |changes AS (
        |  SELECT * FROM marked WHERE prev IS NULL OR prev <> status),
        |dim AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS BIGINT)
        |      AS version,
        |    status, ts AS effective_from
        |  FROM changes),
        |tagged AS (
        |  SELECT user_id, effective_from AS ts, 0 AS is_probe, version,
        |         NULL::BIGINT AS event_id, NULL::DOUBLE AS "value",
        |         status
        |  FROM dim
        |  UNION ALL
        |  SELECT user_id, ts, 1 AS is_probe, NULL::BIGINT AS version,
        |         event_id, "value", NULL::VARCHAR AS status
        |  FROM events WHERE event_type = 'purchase'),
        |filled AS (
        |  SELECT *,
        |    last_value(version IGNORE NULLS) OVER w AS cur_version,
        |    last_value(CASE WHEN is_probe = 0 THEN status END
        |               IGNORE NULLS) OVER w AS cur_status
        |  FROM tagged
        |  WINDOW w AS (PARTITION BY user_id
        |               ORDER BY ts, is_probe, version
        |               ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND CURRENT ROW))
        |SELECT event_id, user_id, ts, "value",
        |       cur_version AS version, cur_status AS status
        |FROM filled WHERE is_probe = 1
        |ORDER BY event_id""".stripMargin,
    // Outlier mirror notes: DuckDB quantile_cont interpolates
    // lo*(1-frac) + hi*frac where Spark's exact percentile computes
    // lo + frac*(hi-lo) — NOT bit-identical in general (the r12 sf1
    // sweep measured a 1-ULP divergence under dense ties in
    // q_score_deciles). The medians here therefore ALSO spell out
    // Spark's arithmetic over per-group order statistics (n odd: the
    // exact middle; n even: lo + 0.5*(hi-lo)) instead of trusting
    // quantile_cont's agreement on this data; the modified-z
    // expression is left-associated identically.
    // q_outliers_approx / q_score_deciles_approx: no oracle — GK
    // sketch estimates are engine-specific; each is spec-bounded
    // against its exact oracle-green sibling (med/MAD within 2%;
    // >=99% decile-assignment agreement).
    "q_outliers" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, "value" FROM events),
        |med AS (
        |  SELECT event_type,
        |    CASE WHEN n % 2 = 1 THEN ss[(n + 1) // 2]
        |         ELSE ss[n // 2] + 0.5 * (ss[n // 2 + 1] - ss[n // 2])
        |    END AS med
        |  FROM (SELECT event_type, list("value" ORDER BY "value") AS ss,
        |               count(*) AS n FROM ev GROUP BY event_type)),
        |d AS (
        |  SELECT ev.event_id, ev.event_type, ev."value", med.med,
        |         abs(ev."value" - med.med) AS dev
        |  FROM ev JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type,
        |    CASE WHEN n % 2 = 1 THEN ss[(n + 1) // 2]
        |         ELSE ss[n // 2] + 0.5 * (ss[n // 2 + 1] - ss[n // 2])
        |    END AS mad
        |  FROM (SELECT event_type, list(dev ORDER BY dev) AS ss,
        |               count(*) AS n FROM d GROUP BY event_type))
        |SELECT d.event_id, d.event_type, d."value", d.med, mad.mad,
        |  0.6745 * (d."value" - d.med) / mad.mad AS m_score,
        |  abs(0.6745 * (d."value" - d.med) / mad.mad) > 3.5 AS is_outlier
        |FROM d JOIN mad USING (event_type)
        |ORDER BY event_id""".stripMargin,
    "q_scd2_dim" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type AS status,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events),
        |changes AS (
        |  SELECT * FROM marked WHERE prev IS NULL OR prev <> status)
        |SELECT user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS BIGINT)
        |    AS version,
        |  status, ts AS effective_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS effective_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    IS NULL AS is_current
        |FROM changes
        |ORDER BY user_id, version""".stripMargin,
    "q_retention" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM ev GROUP BY user_id)
        |SELECT f.cohort,
        |       CAST(datediff('day', f.cohort, ev.day) AS BIGINT)
        |         AS day_offset,
        |       count(DISTINCT ev.user_id) AS n_users
        |FROM ev JOIN f USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q_anti_missing" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-06-01')
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_exists" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin,
    "q_hierarchy_closure" ->
      """WITH RECURSIVE mf AS (
        |  SELECT DISTINCT CAST(regexp_extract(p_brand, '([0-9]+)', 1)
        |    AS INTEGER) % 5 + 1 AS m
        |  FROM part),
        |edges AS (
        |  SELECT c_name AS child, n_name AS parent
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT n_name, r_name
        |  FROM nation JOIN region ON n_regionkey = r_regionkey
        |  UNION ALL
        |  SELECT r_name, 'WORLD' FROM region
        |  UNION ALL
        |  SELECT child, parent FROM (
        |    SELECT DISTINCT p_brand AS child,
        |      concat('Mfgr#', CAST(CAST(regexp_extract(p_brand,
        |        '([0-9]+)', 1) AS INTEGER) % 5 + 1 AS VARCHAR)) AS parent
        |    FROM part)
        |  UNION ALL
        |  SELECT DISTINCT concat('Mfgr#', CAST(m AS VARCHAR)),
        |    concat('Sector#', CAST((m - 1) % 2 + 1 AS VARCHAR))
        |  FROM mf
        |  UNION ALL
        |  SELECT DISTINCT concat('Sector#',
        |    CAST((m - 1) % 2 + 1 AS VARCHAR)), 'Goods'
        |  FROM mf
        |  UNION ALL
        |  SELECT DISTINCT 'Goods', 'WORLD' FROM part),
        |closure AS (
        |  SELECT child AS descendant, parent AS ancestor, 1 AS depth
        |  FROM edges
        |  UNION ALL
        |  SELECT c.descendant, e.parent, c.depth + 1
        |  FROM closure c JOIN edges e ON c.ancestor = e.child)
        |SELECT descendant, ancestor, CAST(depth AS INTEGER) AS depth
        |FROM closure ORDER BY descendant, depth, ancestor""".stripMargin,
    "q_resource_counts" ->
      """SELECT resource_type, code, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT 'orders' AS resource_type, o_orderstatus AS code FROM orders
        |  UNION ALL
        |  SELECT 'lineitem', l_returnflag FROM lineitem) t
        |GROUP BY resource_type, code
        |ORDER BY resource_type, code""".stripMargin,
    // q_approx_distinct: no oracle — HLL estimates are engine-specific;
    // JoinsSpec bounds the relative error against the exact count.
    // q_profile_approx: no oracle by the same HLL contract —
    // RelationalSpec pins every estimate within ±5% of q_profile's
    // exact (oracle-green) row and pins the no-Expand one-pass plan.
    "q_rollup_counts" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_distinct_exact" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // md5 winnowing ride: same shingling semantics as q_fingerprint,
    // DuckDB-shared hash.
    "q_fingerprint_checked" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id,
        |  CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |       ELSE list_distinct(list_transform(
        |              generate_series(1, len(toks)-2),
        |              i -> toks[i] || ' ' || toks[i+1] || ' ' ||
        |                   toks[i+2]))
        |  END AS sh FROM t)
        |SELECT doc_id,
        |  array_to_string(list_sort(list_transform(sh, x -> md5(x)))[1:4],
        |    '-') AS fingerprint
        |FROM s ORDER BY doc_id""".stripMargin,
    // md5 SimHash ride: same tokenize/vote/tie/bit-order semantics as
    // q_simhash, DuckDB-shared bit planes (kept next to the query).
    "q_simhash_checked" -> TextOps.simhashCheckedOracle,
    // q_simhash_pairs: EXACT (the block-combination pigeonhole is
    // lossless for Hamming <= 3 at every block plan), so the oracle
    // brute-forces the full Hamming sweep over the same md5-plane
    // signatures.
    "q_simhash_pairs" -> TextOps.simhashPairsOracle,
    // q_simhash_incremental: the increment split probes the published
    // rep index and extends the base label map — the result must equal
    // the FULL recompute, so it rides the identical reachability oracle
    "q_simhash_incremental" -> TextOps.simhashClustersOracle,
    // q_simhash_compact: retirement + re-election + re-pairing of the
    // stale-fitted artifacts must equal the same full recompute
    "q_simhash_compact" -> TextOps.simhashClustersOracle,
    // q_simhash_clusters: true reachability over the exact Hamming <= 3
    // pair graph, same recursive pattern as the other dedup families.
    "q_simhash_clusters" -> TextOps.simhashClustersOracle,
    // fixed-merge-list BPE ride: DuckDB replays the delimiter-wrapped
    // replace chain generated from the SAME checkedMerges constant the
    // Spark kernel encodes with (q_bpe_encode itself is rows-only —
    // its merges are trained on the query's own corpus).
    "q_bpe_checked" -> Bpe.checkedOracleSql,
    "q_bpe_vocab" -> Bpe.vocabOracleSql,
    "q_bpe_fertility" -> Bpe.fertilityOracleSql,
    "q_cube_counts" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_pivot_lang" ->
      """SELECT source,
        |  CAST(count(*) FILTER (lang = 'de') AS BIGINT) AS n_de,
        |  CAST(count(*) FILTER (lang = 'en') AS BIGINT) AS n_en,
        |  CAST(count(*) FILTER (lang = 'es') AS BIGINT) AS n_es,
        |  CAST(count(*) FILTER (lang = 'fr') AS BIGINT) AS n_fr,
        |  CAST(count(*) FILTER (lang = 'zh') AS BIGINT) AS n_zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_value_histogram" ->
      """SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_build_struct" ->
      """SELECT c_custkey, to_json(struct_pack(
        |  resourceType := 'Patient',
        |  id := concat('Patient/', CAST(c_custkey AS VARCHAR)),
        |  "text" := struct_pack(
        |    status := 'generated',
        |    div := concat('<div xmlns="http://www.w3.org/1999/xhtml"><p>',
        |                  c_name, '</p></div>')),
        |  code := struct_pack(
        |    coding := list_value(struct_pack(
        |      system := 'http://terminology.example.org/segment',
        |      code := c_mktsegment,
        |      display := concat(upper(substring(c_mktsegment, 1, 1)),
        |                        lower(substring(c_mktsegment, 2, 100))))),
        |    "text" := c_mktsegment),
        |  address := list_value(struct_pack(
        |    "text" := trim(concat_ws(' ', c_name, n_name)),
        |    line := string_split(c_name, '#'),
        |    city := n_name)),
        |  managingOrganization := struct_pack(
        |    reference := concat('Organization/', n_name)),
        |  balance := CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
        |)) AS doc
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,
    "q_struct_patch" ->
      """SELECT c_custkey, to_json(struct_pack(
        |  status := 'final',
        |  meta := struct_pack(versionId := '1',
        |    profile := list_value('http://example.org/profile/patient')),
        |  name := c_name,
        |  segment := c_mktsegment)) AS doc
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_er7_serialize" ->
      """WITH fo AS (
        |  SELECT o_custkey, o_orderkey AS enc_id, o_orderdate AS enc_date,
        |         o_orderpriority AS diag_code
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate, o_orderkey) AS rn FROM orders) t
        |  WHERE rn = 1)
        |SELECT c_custkey, concat_ws(chr(13),
        |  concat_ws('|', 'MSH', '^~\&', 'GRAFT', n_name, 'PRIMARY', 'FAC',
        |    strftime(enc_date, '%Y%m%d%H%M%S'), '', 'ADT^A01',
        |    CAST(c_custkey AS VARCHAR), 'P', '2.5'),
        |  concat_ws('|', 'PID', '1', '', CAST(c_custkey AS VARCHAR), '',
        |    concat_ws('^', replace(c_name, '#', ''), c_mktsegment), '',
        |    strftime(enc_date, '%Y%m%d'),
        |    upper(substring(c_mktsegment, 1, 1))),
        |  concat_ws('|', 'PV1', '1', 'I', n_name, CAST(enc_id AS VARCHAR)),
        |  concat_ws('|', 'DG1', '1', '',
        |    concat_ws('^', diag_code, 'I10'))) AS er7
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN fo ON c_custkey = fo.o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_validate" ->
      """SELECT c_custkey, violation FROM (
        |  SELECT c_custkey, unnest(list_filter([
        |    CASE WHEN c_acctbal < 0 THEN 'negative account balance' END,
        |    CASE WHEN c_mktsegment NOT IN ('AUTOMOBILE', 'BUILDING',
        |      'FURNITURE', 'HOUSEHOLD', 'MACHINERY')
        |      THEN 'unknown market segment' END,
        |    CASE WHEN NOT starts_with(c_name, 'Customer#')
        |      THEN 'bad name format' END,
        |    CASE WHEN c_nationkey < 0 OR c_nationkey > 24
        |      THEN 'nationkey out of range' END],
        |    x -> x IS NOT NULL)) AS violation
        |  FROM customer) t
        |ORDER BY c_custkey, violation""".stripMargin,
    "q_sink_roundtrip" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |ORDER BY s_suppkey""".stripMargin,
    // q_sink_batched roundtrips the same projection through the
    // flaky batched REST-style sink: matching the source table EXACTLY
    // is the exactly-once assertion (no loss, no duplicates on replay).
    "q_sink_batched" ->
      """SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |ORDER BY s_suppkey""".stripMargin,
    "q_pipeline_etl" ->
      """WITH fo AS (
        |  SELECT o_custkey, o_orderkey AS first_orderkey,
        |         o_orderdate AS first_orderdate,
        |         o_orderpriority AS first_priority
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate, o_orderkey) AS rn FROM orders) t
        |  WHERE rn = 1),
        |p AS (
        |  SELECT c_custkey, c_name, c_acctbal, n_name, r_name,
        |         first_orderkey, first_orderdate,
        |         list_filter(string_split(c_name, '#'),
        |           x -> NOT regexp_matches(x, '^[0-9]+$')) AS name_parts,
        |         coalesce(first_priority, 'Not found') AS district
        |  FROM customer
        |  LEFT JOIN fo ON c_custkey = fo.o_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE c_mktsegment = 'BUILDING'),
        |q AS (
        |  SELECT *, array_to_string(name_parts, ' ') AS name_text,
        |         trim(concat_ws(' ', array_to_string(name_parts, ' '),
        |           n_name, district, r_name)) AS addr_text
        |  FROM p)
        |SELECT c_custkey, to_json(struct_pack(
        |  resourceType := 'Patient',
        |  id := concat('Patient/', CAST(c_custkey AS VARCHAR)),
        |  "text" := struct_pack(
        |    status := 'generated',
        |    div := concat('<div xmlns="http://www.w3.org/1999/xhtml"><p>',
        |                  name_text, '</p></div>')),
        |  name := struct_pack("text" := name_text, given := name_parts),
        |  address := struct_pack("text" := addr_text, city := n_name,
        |    district := district, state := r_name),
        |  encounter := struct_pack(
        |    reference := concat('Encounter/',
        |      coalesce(CAST(first_orderkey AS VARCHAR), 'none')),
        |    period := coalesce(strftime(first_orderdate, '%Y%m%d'), 'none'))
        |)) AS doc,
        |CAST(len(list_filter([
        |  CASE WHEN c_acctbal < 0 THEN 'negative account balance' END,
        |  CASE WHEN first_orderkey IS NULL THEN 'no encounters on file' END,
        |  CASE WHEN NOT starts_with(c_name, 'Customer#')
        |    THEN 'bad name format' END],
        |  x -> x IS NOT NULL)) AS INTEGER) AS n_violations
        |FROM q ORDER BY c_custkey""".stripMargin,
    "q_pipeline_caregap" ->
      """WITH recent AS (
        |  SELECT o_custkey, o_orderkey AS enc_key, o_orderdate AS enc_date
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderdate, o_orderkey) AS rn
        |        FROM orders
        |        WHERE o_orderdate >= TIMESTAMP '2000-06-01') t
        |  WHERE rn = 1)
        |SELECT c_custkey,
        |  CASE WHEN enc_key IS NULL THEN 'created' ELSE 'existing' END
        |    AS origin,
        |  to_json(struct_pack(
        |    resourceType := 'Observation',
        |    category := 'vital-signs',
        |    subject := concat('Patient/', CAST(c_custkey AS VARCHAR)),
        |    encounter := CASE WHEN enc_key IS NULL THEN 'synthesized'
        |      ELSE concat('Encounter/', CAST(enc_key AS VARCHAR)) END,
        |    effectiveDate := coalesce(strftime(enc_date, '%Y-%m-%d'),
        |      '1900-01-01'),
        |    component := struct_pack(systolic := '120', diastolic := '80')
        |  )) AS doc
        |FROM customer LEFT JOIN recent ON c_custkey = recent.o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,
    // Sliding windows: each event's two epoch-aligned 1-hour windows =
    // its 30-minute bucket and that bucket shifted back one slide.
    "q_window_sliding" ->
      """SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n
        |FROM (
        |  SELECT date_trunc('hour', ts)
        |         + CASE WHEN extract(minute FROM ts) >= 30
        |                THEN INTERVAL 30 MINUTE
        |                ELSE INTERVAL 0 MINUTE END
        |         - k * INTERVAL 30 MINUTE AS window_start,
        |         event_type
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) off)
        |GROUP BY window_start, event_type
        |ORDER BY window_start, event_type""".stripMargin,
    "q_session_gap" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    // q_dedup_minhash / q_simhash / q_fingerprint: no oracle — xxhash64
    // signatures have no DuckDB dual; rows-only + property tests
    // (TextOpsSpec asserts minhash candidate parity with q_jaccard_pairs).
    // q_token_percentiles IS oracle-checked: at the t2 scale the GK
    // sketch runs in its exact regime (accuracy 10000 ≥ every group
    // size), and Spark's exact-mode percentile shares DuckDB
    // quantile_disc's rank convention (verified on boundary cases);
    // beyond the exact regime the spec's rank-error bound is the
    // contract.
    "q_token_percentiles" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       quantile_disc(n, 0.5) AS p50,
        |       quantile_disc(n, 0.9) AS p90,
        |       quantile_disc(n, 0.99) AS p99
        |FROM (SELECT lang, CAST(len(regexp_extract_all(lower(text),
        |        '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents
        |GROUP BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
        |ORDER BY keep_id""".stripMargin,
    "q_jaccard_pairs" -> jaccardPairsOracle,
    // Forced-layout banded-path rides (r5 verdict item 5): on the test
    // corpora the 16×4 banding geometry finds every J≥0.8 pair
    // (spec-asserted parity with the exact path), so the exact-Jaccard
    // SQL is a valid oracle for BOTH physical verify layouts of the
    // banded scale path — any banded recall miss now fails a hash
    // compare loudly instead of hiding behind a rows-only row.
    "q_dedup_minhash_carried"  -> jaccardPairsOracle,
    "q_dedup_minhash_joinback" -> jaccardPairsOracle,
    // q_dedup_clusters: clusters over the BANDED pair graph; the oracle
    // computes true reachability over the exact-jaccard pairs (equal to
    // the banded pairs on this corpus — parity is also spec-asserted),
    // so both insufficient propagation rounds AND any banded recall
    // miss fail the compare loudly.
    "q_dedup_clusters" -> dedupClustersOracle,
    // q_dedup_incremental: the incremental path's contract is that
    // probing tonight's increment against the base index and extending
    // yesterday's labels equals a FULL recompute — so the oracle is
    // the identical full-corpus reachability SQL; a missed cross pair
    // or a split merged component fails the hash compare loudly.
    "q_dedup_incremental" -> dedupClustersOracle,
    // q_dedup_compact: the base index holds STALE text for the re-crawl
    // subset; after retirement + re-pairing + relabeling the flags must
    // equal a full recompute over the TRUE corpus — the documents table
    // itself — so the same reachability SQL is the oracle.
    "q_dedup_compact" -> dedupClustersOracle,
    // q_pipeline_quality (EP7): the full quality-signal audit in one
    // plan — each stage's parity is pinned standalone, the composed CTE
    // checks flag flow and the gate conjunction.
    "q_pipeline_quality" ->
      """WITH t AS (SELECT doc_id, text, string_split(text,' ') AS w
        |           FROM documents),
        |rl AS (
        |  SELECT doc_id, len(w) AS n_tok,
        |    1 - len(list_distinct(w)) / CAST(len(w) AS DOUBLE)
        |      AS dup_word_frac,
        |    CASE WHEN len(w) >= 2
        |      THEN 1 - len(list_distinct(
        |             list_transform(generate_series(1, len(w)-1),
        |               i -> w[i] || ' ' || w[i+1]))) /
        |           CAST(len(w)-1 AS DOUBLE)
        |      ELSE 0.0 END AS dup_bigram_frac,
        |    CAST(len(regexp_extract_all(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |      + len(regexp_extract_all(text,
        |        '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))
        |      + len(regexp_extract_all(text,
        |        '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS INTEGER) AS n_pii
        |  FROM t),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         CASE WHEN len(w) >= 20
        |           THEN [array_to_string(w[i:i+19],' ')
        |                 for i in range(1, len(w) - 18)]
        |           ELSE [array_to_string(w,' ')] END)) AS s
        |       FROM t),
        |sdf AS (SELECT s, count(*) AS span_df FROM sh GROUP BY s),
        |sp AS (SELECT sh.doc_id,
        |         sum(CASE WHEN sdf.span_df > 1 THEN 1 ELSE 0 END) /
        |           CAST(count(*) AS DOUBLE) AS dup_span_frac
        |       FROM sh JOIN sdf USING (s) GROUP BY sh.doc_id),
        |tok AS (SELECT doc_id, unnest(w) AS tk FROM t),
        |m AS (SELECT tk, count(*) AS cnt FROM tok GROUP BY tk),
        |fq AS (SELECT tok.doc_id,
        |         CAST(sum(m.cnt) AS DOUBLE) / count(*) AS mean_freq,
        |         sum(CASE WHEN m.cnt < 3 THEN 1 ELSE 0 END) /
        |           CAST(count(*) AS DOUBLE) AS rare_frac
        |       FROM tok JOIN m USING (tk) GROUP BY tok.doc_id)
        |SELECT rl.doc_id, rl.n_tok, rl.dup_word_frac, rl.dup_bigram_frac,
        |       rl.n_pii, sp.dup_span_frac, fq.mean_freq, fq.rare_frac,
        |       (rl.dup_word_frac <= 0.7 AND rl.dup_bigram_frac <= 0.2
        |         AND rl.n_pii = 0 AND sp.dup_span_frac <= 0.3
        |         AND fq.rare_frac <= 0.5) AS keep
        |FROM rl JOIN sp USING (doc_id) JOIN fq USING (doc_id)
        |ORDER BY rl.doc_id""".stripMargin,
    // q_pipeline_nightly (EP6): new documents + re-crawls in ONE batch
    // against a base missing tonight's new ids and holding stale text
    // for its re-crawls — the whole composition must equal a full
    // recompute of the true corpus, i.e. the same reachability SQL.
    "q_pipeline_nightly" -> dedupClustersOracle,
    // q_dup_spans: the hash/string duality again — Spark counts span
    // document-frequency over 64-bit shingle hashes, the oracle over
    // the span strings themselves.
    "q_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w
        |           FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         CASE WHEN len(w) >= 20
        |           THEN [array_to_string(w[i:i+19],' ')
        |                 for i in range(1, len(w) - 18)]
        |           ELSE [array_to_string(w,' ')] END)) AS s
        |       FROM t),
        |df AS (SELECT s, count(*) AS span_df FROM sh GROUP BY s),
        |agg AS (SELECT sh.doc_id,
        |          count(*) AS n_spans,
        |          sum(CASE WHEN df.span_df > 1 THEN 1 ELSE 0 END) AS n_dup
        |        FROM sh JOIN df USING (s) GROUP BY sh.doc_id)
        |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
        |       CAST(n_dup AS BIGINT) AS n_dup_spans,
        |       CAST(n_dup AS DOUBLE) / n_spans AS dup_span_frac,
        |       (CAST(n_dup AS DOUBLE) / n_spans <= 0.3) AS keep
        |FROM agg ORDER BY doc_id""".stripMargin,
    // q_boilerplate: top duplicated spans with reconstructed text —
    // the cut is deterministic because the rank order (df desc, then
    // the span's earliest (doc, pos) occurrence) is total; the oracle
    // ranks the same key over span strings.
    "q_boilerplate" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w
        |           FROM documents),
        |ps AS (SELECT doc_id,
        |         unnest(range(1, len(w) - 18)) AS pos,
        |         unnest([array_to_string(w[i:i+19],' ')
        |                 for i in range(1, len(w) - 18)]) AS s
        |       FROM t),
        |pd AS (SELECT s, doc_id, min(pos) AS pos FROM ps
        |       GROUP BY s, doc_id),
        |top AS (SELECT s, span_df, doc_id AS rep_doc, pos AS rep_pos
        |        FROM (SELECT s, doc_id, pos,
        |                count(*) OVER (PARTITION BY s) AS span_df,
        |                row_number() OVER (PARTITION BY s
        |                  ORDER BY doc_id, pos) AS rn
        |              FROM pd)
        |        WHERE rn = 1 AND span_df > 1
        |        ORDER BY span_df DESC, rep_doc, rep_pos LIMIT 20)
        |SELECT s AS span_text, span_df,
        |  CAST(rep_doc AS BIGINT) AS example_doc_id,
        |  CAST(rep_pos - 1 AS BIGINT) AS example_pos
        |FROM top ORDER BY span_df DESC, span_text""".stripMargin,
    // q_span_scrub: the rewrite member of the substring-dedup family —
    // the output is hash-free (counts + rebuilt text), so the oracle
    // recomputes the same scrub from the span STRINGS where Spark keys
    // on 64-bit shingle hashes (the q_dup_spans duality); positional
    // spans exist only for >= 20-token documents (no whole-text
    // fallback — a short document HAS no 20-spans to cut).
    "q_span_scrub" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS w
        |           FROM documents),
        |ps AS (SELECT doc_id,
        |         unnest(range(1, len(w) - 18)) AS pos,
        |         unnest([array_to_string(w[i:i+19],' ')
        |                 for i in range(1, len(w) - 18)]) AS s
        |       FROM t),
        |dup AS (SELECT s FROM (SELECT DISTINCT doc_id, s FROM ps)
        |        GROUP BY s HAVING count(*) > 1),
        |cov AS (SELECT DISTINCT doc_id,
        |          unnest(range(pos, pos + 20)) AS ci
        |        FROM ps WHERE s IN (SELECT s FROM dup)),
        |toki AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS i,
        |           unnest(w) AS tok FROM t),
        |kept AS (SELECT ti.doc_id, ti.i, ti.tok FROM toki ti
        |         LEFT JOIN cov c
        |           ON ti.doc_id = c.doc_id AND ti.i = c.ci
        |         WHERE c.ci IS NULL),
        |ka AS (SELECT doc_id, count(*) AS n_kept,
        |         string_agg(tok, ' ' ORDER BY i) AS txt
        |       FROM kept GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(len(t.w) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(ka.n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(len(t.w) - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
        |  coalesce(ka.txt, '') AS scrubbed_text
        |FROM t LEFT JOIN ka USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // q_pipeline_curation: the composed curation dataflow — near-dup
    // reachability (same CTE core as q_dedup_clusters) joined to the
    // q_text_stats / q_lang_id expressions and thresholded into keep
    // decisions; checks stage COMPOSITION, each stage's own parity is
    // pinned by its standalone query.
    "q_pipeline_curation" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(w) >= 3
        |      THEN [array_to_string(w[i:i+2], ' ')
        |            for i in range(1, len(w) - 1)]
        |      ELSE [array_to_string(w, ' ')] END)) AS s
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
        |        FROM documents) t),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |cp AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT id_a, id_b FROM cp
        |  JOIN sz sa ON sa.doc_id = id_a
        |  JOIN sz sb ON sb.doc_id = id_b
        |  WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.8),
        |e AS (SELECT id_a AS a, id_b AS b FROM jp
        |      UNION ALL SELECT id_b, id_a FROM jp),
        |reach AS (
        |  SELECT doc_id AS node, doc_id AS r FROM documents
        |  UNION
        |  SELECT e.a, reach.r FROM reach JOIN e ON reach.node = e.b),
        |cl AS (
        |  SELECT node AS doc_id, min(r) AS cluster_id,
        |         (min(r) = node) AS near_kept
        |  FROM reach GROUP BY node),
        |st AS (
        |  SELECT doc_id,
        |         len(w) AS n_tokens,
        |         CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr,
        |         CAST(len(list_filter(w,
        |           t -> t IN ('a', 'the', 'and', 'of', 'in')))
        |           AS DOUBLE) / len(w) AS stop_ratio
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w
        |        FROM documents) t),
        |lang AS (
        |  SELECT doc_id,
        |    len(list_filter(w, t -> t IN ('the','a','and','of','is'))) AS s_en,
        |    len(list_filter(w, t -> t IN ('der','die','das','und','ist'))) AS s_de,
        |    len(list_filter(w, t -> t IN ('le','la','et','est','un'))) AS s_fr
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
        |        FROM documents) t)
        |SELECT st.doc_id, cl.cluster_id, cl.near_kept,
        |       st.n_tokens, st.ttr, st.stop_ratio,
        |       (st.n_tokens >= 25 AND st.stop_ratio >= 0.02
        |         AND st.ttr >= 0.3) AS quality_ok,
        |       CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
        |            WHEN s_de >= s_fr THEN 'de'
        |            ELSE 'fr' END AS pred_lang,
        |       (cl.near_kept AND st.n_tokens >= 25
        |         AND st.stop_ratio >= 0.02 AND st.ttr >= 0.3) AS keep
        |FROM st
        |JOIN cl ON cl.doc_id = st.doc_id
        |JOIN lang ON lang.doc_id = st.doc_id
        |ORDER BY st.doc_id""".stripMargin,
    "q_text_stats" ->
      """SELECT doc_id, n_chars_actual, n_tokens, n_distinct,
        |       CAST(n_distinct AS DOUBLE) / n_tokens AS ttr,
        |       CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
        |       CAST(n_chars_actual - (n_tokens - 1) AS DOUBLE) / n_tokens
        |         AS avg_token_len
        |FROM (
        |  SELECT doc_id, length(text) AS n_chars_actual, len(w) AS n_tokens,
        |         len(list_distinct(w)) AS n_distinct,
        |         len(list_filter(w,
        |           t -> t IN ('a', 'the', 'and', 'of', 'in'))) AS n_stop
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w
        |        FROM documents) t) s
        |ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      """SELECT doc_id, score_en, score_de, score_fr,
        |       CASE WHEN score_en >= score_de AND score_en >= score_fr
        |              THEN 'en'
        |            WHEN score_de >= score_fr THEN 'de'
        |            ELSE 'fr' END AS pred_lang
        |FROM (
        |  SELECT doc_id,
        |    len(list_filter(w, t -> t IN ('the','a','and','of','is')))
        |      AS score_en,
        |    len(list_filter(w, t -> t IN ('der','die','das','und','ist')))
        |      AS score_de,
        |    len(list_filter(w, t -> t IN ('le','la','et','est','un')))
        |      AS score_fr
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
        |        FROM documents) t) s
        |ORDER BY doc_id""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |    AS n_bpe_tokens,
        |  CAST(length(text) AS DOUBLE) /
        |    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |    AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_vocab_topk" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin,
    // Exact-regime contract (the GK-percentiles precedent): corpus
    // vocabulary ≪ sketch capacity, so Misra-Gries counters are exact
    // and the oracle's true top-20 is the required answer bit-for-bit.
    // The regime is REAL, not decorative: the r12 sf1 sweep measured
    // this row (and _by_lang) diverging once ScaleGen's token
    // suffixing grew the vocabulary 10× past capacity — the expected
    // MG undercount, recorded as contract-scoped in the sweep artifact;
    // `q_heavy_hitters_verified` (exact at ANY vocabulary) stays green
    // there, which is exactly the job it was added for.
    "q_heavy_hitters" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS est
        |FROM (SELECT unnest(string_split(text, ' ')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY est DESC, token LIMIT 20""".stripMargin,
    // Sketch-blind oracle: the two-pass rectified sketch must produce
    // EXACTLY the set of tokens with share > support — a plain
    // grouped count with a HAVING, no sketch anywhere.
    "q_heavy_hitters_verified" ->
      """WITH ex AS (SELECT unnest(string_split(text, ' ')) AS token
        |            FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM ex),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS n
        |      FROM ex GROUP BY token)
        |SELECT token, n,
        |  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
        |FROM c, tot
        |WHERE CAST(n AS DOUBLE) > 0.005 * CAST(total AS DOUBLE)
        |ORDER BY n DESC, token""".stripMargin,
    "q_heavy_hitters_by_lang" ->
      """WITH t AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS est
        |      FROM t GROUP BY lang, token),
        |r AS (SELECT lang, token, est,
        |             row_number() OVER (PARTITION BY lang
        |               ORDER BY est DESC, token) AS rk
        |      FROM c)
        |SELECT lang, token, est FROM r WHERE rk <= 5
        |ORDER BY lang, est DESC, token""".stripMargin,
    // Rational BM25-style idf: one exact integer-valued product + one
    // IEEE division — bit-identical across engines, unlike ln().
    "q_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |pairs AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM seq WHERE to_type IS NOT NULL
        |  GROUP BY from_type, to_type),
        |tot AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        |  FROM pairs GROUP BY from_type)
        |SELECT p.from_type, p.to_type, CAST(p.n AS BIGINT) AS n,
        |       CAST(p.n AS DOUBLE) / t.n_from AS p
        |FROM pairs p JOIN tot t USING (from_type)
        |ORDER BY p.from_type, p.to_type""".stripMargin,
    // RANGE frame keyed on whole seconds; a RANGE frame is tie-stable
    // (equal-second peers share a frame), so no extra sort keys are
    // needed for determinism — only for output row order.
    "q_rolling_count" ->
      """SELECT event_id, user_id,
        |       CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |       CAST(count(*) OVER (PARTITION BY user_id
        |         ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |         AS BIGINT) AS n_trailing_hour
        |FROM events
        |ORDER BY user_id, s, event_id""".stripMargin,
    // Crawl-delta classes are disjoint mod-11 residues; digests are
    // compared (not text) to mirror the engine's digest-projected join.
    "q_snapshot_diff" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 11 = 7 THEN text || ' [stale]'
        |                  ELSE text END) AS sig
        |  FROM documents WHERE doc_id % 11 <> 3),
        |nxt AS (
        |  SELECT doc_id, md5(text) AS sig
        |  FROM documents WHERE doc_id % 11 <> 5)
        |SELECT COALESCE(b.doc_id, n.doc_id) AS doc_id,
        |       CASE WHEN b.sig IS NULL THEN 'added'
        |            WHEN n.sig IS NULL THEN 'removed'
        |            ELSE 'changed' END AS change
        |FROM base b FULL OUTER JOIN nxt n ON b.doc_id = n.doc_id
        |WHERE b.sig IS DISTINCT FROM n.sig
        |ORDER BY doc_id""".stripMargin,
    // Total (seconds, event_id) ordering inside the rank-limited CTE
    // mirrors the engine's sorted-struct slice exactly.
    "q_user_journey" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id)
        |           AS rk,
        |         count(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM events)
        |SELECT user_id, CAST(max(n_events) AS BIGINT) AS n_events,
        |       string_agg(event_type, '->' ORDER BY rk) AS journey
        |FROM ranked WHERE rk <= 50
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Shares are one IEEE division of exact longs; drift is one
    // subtraction of two such quotients — no FP summation anywhere.
    "q_mix_drift" ->
      """WITH b AS (
        |  SELECT lang, source, count(*) AS n FROM documents
        |  WHERE doc_id % 11 <> 3 GROUP BY lang, source),
        |bs AS (
        |  SELECT lang, source, CAST(n AS BIGINT) AS n_base,
        |    CAST(n AS DOUBLE) / CAST((SELECT sum(n) FROM b) AS DOUBLE)
        |      AS share_base
        |  FROM b),
        |x AS (
        |  SELECT lang, source, count(*) AS n FROM documents
        |  WHERE doc_id % 11 <> 5 GROUP BY lang, source),
        |xs AS (
        |  SELECT lang, source, CAST(n AS BIGINT) AS n_next,
        |    CAST(n AS DOUBLE) / CAST((SELECT sum(n) FROM x) AS DOUBLE)
        |      AS share_next
        |  FROM x)
        |SELECT COALESCE(bs.lang, xs.lang) AS lang,
        |       COALESCE(bs.source, xs.source) AS source,
        |       COALESCE(n_base, 0) AS n_base,
        |       COALESCE(n_next, 0) AS n_next,
        |       COALESCE(share_base, CAST(0.0 AS DOUBLE)) AS share_base,
        |       COALESCE(share_next, CAST(0.0 AS DOUBLE)) AS share_next,
        |       COALESCE(share_next, CAST(0.0 AS DOUBLE)) -
        |         COALESCE(share_base, CAST(0.0 AS DOUBLE)) AS share_drift
        |FROM bs FULL OUTER JOIN xs
        |  ON bs.lang = xs.lang AND bs.source = xs.source
        |ORDER BY lang, source""".stripMargin,
    // Fixed Forgy seeds (vec_id < 3) make the assignment exact; the
    // list_reduce left fold matches the codegen'd dot product bitwise.
    "q_cluster_assign" ->
      """WITH base AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(list_transform(v, x -> x * x),
        |         (a, b) -> a + b)) AS nrm
        |  FROM base),
        |seeds AS (
        |  SELECT vec_id AS seed_id, v AS sv, nrm AS sn
        |  FROM n WHERE vec_id < 3),
        |scored AS (
        |  SELECT x.vec_id, s.seed_id,
        |    list_reduce(list_transform(list_zip(x.v, s.sv),
        |        p -> p[1] * p[2]), (a, b) -> a + b) / (x.nrm * s.sn)
        |      AS sim
        |  FROM n x, seeds s),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY sim DESC, seed_id) AS rk
        |  FROM scored WHERE sim IS NOT NULL)
        |SELECT vec_id, CAST(seed_id AS BIGINT) AS cluster, sim
        |FROM ranked WHERE rk = 1 ORDER BY vec_id""".stripMargin,
    // The oracle is the NAIVE per-lang self-join; the engine's
    // length-bucket candidate pruning must be invisible in the result.
    "q_edit_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, lang, substr(text, 1, 30) AS head,
        |         length(substr(text, 1, 30)) AS len
        |  FROM documents)
        |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |       CAST(levenshtein(a.head, b.head) AS INTEGER) AS dist
        |FROM d a JOIN d b
        |  ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE abs(a.len - b.len) <= 3
        |  AND levenshtein(a.head, b.head) <= 3
        |ORDER BY doc_id_a, doc_id_b""".stripMargin,
    // Min-reachable-id labels over the exact edit-distance pair graph
    // (the dedup-family reachability discipline on a new edge set).
    "q_edit_clusters" -> editClustersOracle,
    // q_edit_incremental: the increment split probes the published base
    // segment index and extends the base label map — the contract is a
    // FULL RECOMPUTE over the whole corpus, so the same reachability
    // SQL checks it (a missed cross pair or a split merged component
    // fails the hash compare loudly).
    "q_edit_incremental" -> editClustersOracle,
    // q_edit_compact: retirement + re-probe of stale-fitted artifacts
    // must land on the true corpus's exact clusters — the same full
    // recompute (a leaked stale pair or an unsplit bridged component
    // fails loudly).
    "q_edit_compact" -> editClustersOracle,
    // The merged snapshot must equal the next crawl exactly — the
    // oracle states the POSTCONDITION, so the diff→batch→merge loop is
    // checked end-to-end rather than fixture-trusted.
    "q_cdc_merge" ->
      """SELECT doc_id, text FROM documents
        |WHERE doc_id % 11 <> 5
        |ORDER BY doc_id""".stripMargin,
    // IVM maintenance identity: the incrementally-refreshed rollup
    // must equal a from-scratch recompute over the next crawl — the
    // oracle IS that recompute (q_cdc_merge's postcondition posture).
    "q_mv_refresh" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |         AS n_tokens
        |FROM documents WHERE doc_id % 11 <> 5
        |GROUP BY source ORDER BY source""".stripMargin,
    // q_pipeline_publish: the oracle reads the SOURCE table — equality
    // against the read-back of the published silver version certifies
    // the land → gate → versioned publish → serve loop end to end (a
    // wrong quarantine returns zero rows, a partial publish a hash
    // mismatch). The failing-gate branch is pinned in SinkSpec.
    "q_pipeline_publish" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       o_orderdate, o_orderpriority
        |FROM orders ORDER BY 1, 2, 3, 4, 5, 6""".stripMargin,
    "q_pipeline_landing" ->
      """WITH nulls AS (
        |  SELECT 'nulls:o_custkey' AS "check",
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS metric, CAST(0.0 AS DOUBLE) AS threshold FROM orders
        |  UNION ALL
        |  SELECT 'nulls:o_orderdate',
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE), CAST(0.0 AS DOUBLE) FROM orders
        |  UNION ALL
        |  SELECT 'nulls:o_orderkey',
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE), CAST(0.0 AS DOUBLE) FROM orders
        |  UNION ALL
        |  SELECT 'nulls:o_orderpriority',
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE), CAST(0.0 AS DOUBLE) FROM orders
        |  UNION ALL
        |  SELECT 'nulls:o_orderstatus',
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE), CAST(0.0 AS DOUBLE) FROM orders
        |  UNION ALL
        |  SELECT 'nulls:o_totalprice',
        |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE), CAST(0.0 AS DOUBLE) FROM orders),
        |orph AS (
        |  SELECT 'orphans:customer.c_nationkey->nation' AS "check",
        |    CAST(sum(CASE WHEN c.c_nationkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS DOUBLE) AS metric, CAST(0.0 AS DOUBLE) AS threshold
        |  FROM customer c LEFT JOIN
        |    (SELECT DISTINCT n_nationkey AS k FROM nation) p
        |    ON c.c_nationkey = p.k
        |  UNION ALL
        |  SELECT 'orphans:lineitem.l_orderkey->orders',
        |    CAST(sum(CASE WHEN l.l_orderkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS DOUBLE), CAST(0.0 AS DOUBLE)
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT o_orderkey AS k FROM orders) p
        |    ON l.l_orderkey = p.k
        |  UNION ALL
        |  SELECT 'orphans:lineitem.l_partkey->part',
        |    CAST(sum(CASE WHEN l.l_partkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS DOUBLE), CAST(0.0 AS DOUBLE)
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT p_partkey AS k FROM part) p
        |    ON l.l_partkey = p.k
        |  UNION ALL
        |  SELECT 'orphans:lineitem.l_suppkey->supplier',
        |    CAST(sum(CASE WHEN l.l_suppkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS DOUBLE), CAST(0.0 AS DOUBLE)
        |  FROM lineitem l LEFT JOIN
        |    (SELECT DISTINCT s_suppkey AS k FROM supplier) p
        |    ON l.l_suppkey = p.k
        |  UNION ALL
        |  SELECT 'orphans:nation.n_regionkey->region',
        |    CAST(sum(CASE WHEN n.n_regionkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS DOUBLE), CAST(0.0 AS DOUBLE)
        |  FROM nation n LEFT JOIN
        |    (SELECT DISTINCT r_regionkey AS k FROM region) p
        |    ON n.n_regionkey = p.k
        |  UNION ALL
        |  SELECT 'orphans:orders.o_custkey->customer',
        |    CAST(sum(CASE WHEN o.o_custkey IS NOT NULL AND p.k IS NULL
        |      THEN 1 ELSE 0 END) AS DOUBLE), CAST(0.0 AS DOUBLE)
        |  FROM orders o LEFT JOIN
        |    (SELECT DISTINCT c_custkey AS k FROM customer) p
        |    ON o.o_custkey = p.k),
        |ev AS (SELECT event_id, event_type, "value" FROM events),
        |med AS (
        |  SELECT event_type,
        |    CASE WHEN n % 2 = 1 THEN ss[(n + 1) // 2]
        |         ELSE ss[n // 2] + 0.5 * (ss[n // 2 + 1] - ss[n // 2])
        |    END AS med
        |  FROM (SELECT event_type, list("value" ORDER BY "value") AS ss,
        |               count(*) AS n FROM ev GROUP BY event_type)),
        |d AS (
        |  SELECT ev.event_type, ev."value", med.med,
        |         abs(ev."value" - med.med) AS dev
        |  FROM ev JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type,
        |    CASE WHEN n % 2 = 1 THEN ss[(n + 1) // 2]
        |         ELSE ss[n // 2] + 0.5 * (ss[n // 2 + 1] - ss[n // 2])
        |    END AS mad
        |  FROM (SELECT event_type, list(dev ORDER BY dev) AS ss,
        |               count(*) AS n FROM d GROUP BY event_type)),
        |rate AS (
        |  SELECT 'outlier_rate:' || f.event_type AS "check",
        |    CAST(sum(CASE WHEN f.is_outlier THEN 1 ELSE 0 END)
        |      AS DOUBLE) / count(*) AS metric, CAST(0.05 AS DOUBLE) AS threshold
        |  FROM (SELECT d.event_type,
        |          abs(0.6745 * (d."value" - d.med) / mad.mad) > 3.5
        |            AS is_outlier
        |        FROM d JOIN mad USING (event_type)) f
        |  GROUP BY f.event_type)
        |SELECT "check", metric, threshold,
        |       metric <= threshold AS pass
        |FROM (SELECT * FROM nulls UNION ALL SELECT * FROM orph
        |      UNION ALL SELECT * FROM rate)
        |ORDER BY "check"""".stripMargin,
    // Decile mirror notes: the ttr score is integer-derived (one exact
    // division) and bucketing is integer sums of identical comparisons.
    "q_score_deciles" ->
      // The cutoffs replicate Spark's exact-percentile arithmetic
      // EXPLICITLY (lo + frac*(hi-lo) over order statistics, pos =
      // (n-1)*p) instead of quantile_cont: DuckDB interpolates
      // lo*(1-frac) + hi*frac, which for lo == hi (tie-dense corpora —
      // the r12 sf1 sweep's finding) rounds one ULP BELOW lo, flipping
      // every tied score across the `>` boundary. The explicit form is
      // the same IEEE ops in the same order as Spark's Percentile, so
      // it is bit-identical at any tie density.
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS score
        |  FROM documents),
        |o AS (SELECT list(score ORDER BY score) AS ss, count(*) AS n
        |      FROM s),
        |c AS (
        |  SELECT [
        |    ss[CAST(floor((n - 1) * (i / 10.0)) AS BIGINT) + 1]
        |      + ((n - 1) * (i / 10.0) - floor((n - 1) * (i / 10.0)))
        |        * (ss[CAST(floor((n - 1) * (i / 10.0)) AS BIGINT) + 2]
        |           - ss[CAST(floor((n - 1) * (i / 10.0)) AS BIGINT) + 1])
        |    for i in generate_series(1, 9)] AS cuts
        |  FROM o)
        |SELECT doc_id, score,
        |  CAST((score > cuts[1])::INT + (score > cuts[2])::INT
        |    + (score > cuts[3])::INT + (score > cuts[4])::INT
        |    + (score > cuts[5])::INT + (score > cuts[6])::INT
        |    + (score > cuts[7])::INT + (score > cuts[8])::INT
        |    + (score > cuts[9])::INT + 1 AS INTEGER) AS decile
        |FROM s CROSS JOIN c ORDER BY doc_id""".stripMargin,
    // BM25 mirror notes: the (1.2 + 1) k1-plus-one factor is written
    // as arithmetic in BOTH engines (IEEE-identical fold; a pre-folded
    // Scala 2.2 could round differently), df/sum_dl are integer sums
    // cast once, and the score's operator chain is left-associated
    // identically on both sides.
    // q_lm_score: the model is the top-10000 (count desc, bigram asc)
    // corpus bigrams — a total order, so both engines cut the SAME
    // K-boundary; per-doc accumulators are exact long sums (order-free)
    // and each score is one IEEE division, so the hash compare is
    // bit-exact.
    // The centroid classifier's oracle retrains the same top-K model
    // and replays the exact-long scoring; the one division per (doc,
    // class) and the (score desc, class desc) argmax order are
    // bit-identical across engines.
    "q_classify_source" ->
      """WITH ex AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |top AS (
        |  SELECT token FROM ex GROUP BY token
        |  ORDER BY count(*) DESC, token LIMIT 2000),
        |model AS (
        |  SELECT token, source AS class, CAST(count(*) AS BIGINT) AS n
        |  FROM ex WHERE token IN (SELECT token FROM top)
        |  GROUP BY token, source),
        |tot AS (
        |  SELECT class, CAST(sum(n) AS BIGINT) AS tot
        |  FROM model GROUP BY class),
        |scored AS (
        |  SELECT e.doc_id, m.class, CAST(sum(m.n) AS BIGINT) AS s
        |  FROM ex e JOIN model m ON e.token = m.token
        |  GROUP BY e.doc_id, m.class),
        |best AS (
        |  SELECT s.doc_id, s.class AS predicted_source,
        |    CAST(s.s AS DOUBLE) / CAST(t.tot AS DOUBLE) AS score
        |  FROM scored s JOIN tot t ON s.class = t.class
        |  QUALIFY row_number() OVER (PARTITION BY s.doc_id
        |    ORDER BY score DESC, s.class DESC) = 1)
        |SELECT d.doc_id,
        |  coalesce(b.predicted_source, 'none') AS predicted_source,
        |  coalesce(b.score, 0.0) AS score,
        |  (coalesce(b.predicted_source, 'none') = d.source) AS hit
        |FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q_lm_score" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, list_transform(generate_series(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i + 1]) AS bgs
        |  FROM toks),
        |ex AS (SELECT doc_id, unnest(bgs) AS bigram FROM bg),
        |counts AS (
        |  SELECT bigram, CAST(count(*) AS BIGINT) AS n
        |  FROM ex GROUP BY bigram),
        |total AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM counts),
        |model AS (
        |  SELECT bigram, n FROM counts
        |  ORDER BY n DESC, bigram LIMIT 10000),
        |scored AS (
        |  SELECT e.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(count(m.n) AS BIGINT) AS n_known,
        |    CAST(coalesce(sum(m.n), 0) AS BIGINT) AS s_known
        |  FROM ex e LEFT JOIN model m ON e.bigram = m.bigram
        |  GROUP BY e.doc_id)
        |SELECT d.doc_id,
        |  coalesce(s.n_bigrams, 0) AS n_bigrams,
        |  coalesce(s.n_known, 0) AS n_known,
        |  coalesce(s.s_known, 0) AS s_known,
        |  CASE WHEN coalesce(s.n_bigrams, 0) = 0 THEN 0.0
        |    ELSE CAST(s.n_known AS DOUBLE) / CAST(s.n_bigrams AS DOUBLE)
        |  END AS coverage,
        |  CASE WHEN coalesce(s.n_bigrams, 0) = 0 THEN 0.0
        |    ELSE CAST(s.s_known AS DOUBLE) /
        |      (CAST(t.big_n AS DOUBLE) * CAST(s.n_bigrams AS DOUBLE))
        |  END AS familiarity
        |FROM documents d
        |LEFT JOIN scored s ON d.doc_id = s.doc_id
        |CROSS JOIN total t
        |ORDER BY d.doc_id""".stripMargin,
    "q_bm25_topk" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    len(string_split(text, ' ')) AS dl,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x = 'spark')) AS tf0,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x = 'vector')) AS tf1,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x = 'hash')) AS tf2
        |  FROM documents),
        |stats AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(dl) AS BIGINT) AS sum_dl,
        |    CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |    CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |    CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |  FROM base)
        |SELECT doc_id, dl,
        |  CAST((tf0 > 0)::INT + (tf1 > 0)::INT + (tf2 > 0)::INT
        |    AS INTEGER) AS n_match,
        |  (n - df0 + 0.5) / (df0 + 0.5)
        |    * (CAST(tf0 AS DOUBLE) * (1.2 + 1))
        |    / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl
        |        / (CAST(sum_dl AS DOUBLE) / n)))
        |  + (n - df1 + 0.5) / (df1 + 0.5)
        |    * (CAST(tf1 AS DOUBLE) * (1.2 + 1))
        |    / (tf1 + 1.2 * (1 - 0.75 + 0.75 * dl
        |        / (CAST(sum_dl AS DOUBLE) / n)))
        |  + (n - df2 + 0.5) / (df2 + 0.5)
        |    * (CAST(tf2 AS DOUBLE) * (1.2 + 1))
        |    / (tf2 + 1.2 * (1 - 0.75 + 0.75 * dl
        |        / (CAST(sum_dl AS DOUBLE) / n))) AS score
        |FROM base CROSS JOIN stats
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "q_tfidf_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf
        |       FROM tok GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (
        |  SELECT doc_id, tf.token AS token, tf, df,
        |    CAST(tf AS DOUBLE) * (n - df + 0.5) / (df + 0.5) AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(tf AS DOUBLE) * (n - df + 0.5) / (df + 0.5)
        |        DESC, tf.token) AS rk
        |  FROM tf JOIN df USING (token) CROSS JOIN n)
        |SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
        |  CAST(df AS BIGINT) AS df, score
        |FROM s WHERE rk <= 5
        |ORDER BY doc_id, score DESC, token""".stripMargin,
    // PMI-style lift: a left-associated multiply/divide chain mirroring
    // the Spark expression exactly (bit-identical IEEE ops, no ln).
    "q_colloc_pmi" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT unnest(t) AS w FROM toks),
        |ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
        |nu AS (SELECT count(*) AS n_uni FROM uni),
        |pairs AS (SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)]))
        |          AS p FROM toks),
        |bcnt AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS c_xy
        |         FROM pairs GROUP BY 1, 2 HAVING count(*) >= 5),
        |nb AS (SELECT count(*) AS n_bi FROM pairs)
        |SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
        |  CAST(c_xy AS DOUBLE) / u1.c / u2.c * n_uni * n_uni / n_bi
        |    AS lift
        |FROM bcnt JOIN ucnt u1 ON w1 = u1.w JOIN ucnt u2 ON w2 = u2.w
        |CROSS JOIN nu CROSS JOIN nb
        |ORDER BY lift DESC, w1, w2 LIMIT 50""".stripMargin,
    // EP9: text quality gate + embedding reachability + quantize range
    // joined on the shared id space.
    "q_pipeline_multimodal" ->
      """WITH RECURSIVE t AS (SELECT doc_id, string_split(text,' ') AS toks
        |                     FROM documents),
        |g AS (SELECT doc_id, len(toks) AS n_tok,
        |        len(list_distinct(toks)) AS n_uniq,
        |        list_transform(generate_series(1, len(toks)-1),
        |          i -> toks[i] || ' ' || toks[i+1]) AS bi
        |      FROM t),
        |txt AS (SELECT doc_id, n_tok,
        |          ((1 - n_uniq / CAST(n_tok AS DOUBLE)) <= 0.7 AND
        |           (CASE WHEN n_tok >= 2
        |             THEN 1 - len(list_distinct(bi)) /
        |                      CAST(len(bi) AS DOUBLE)
        |             ELSE 0.0 END) <= 0.2) AS quality_keep
        |        FROM g),
        |base AS (SELECT vec_id,
        |           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |         FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_reduce(list_transform(v, x -> x * x),
        |          (a, b) -> a + b)) AS nrm
        |      FROM base),
        |un AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u
        |       FROM n),
        |jp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |       FROM un a, un b
        |       WHERE a.vec_id < b.vec_id
        |         AND list_reduce(list_transform(list_zip(a.u, b.u),
        |             p -> p[1] * p[2]), (x, y) -> x + y) >= 0.8),
        |e AS (SELECT id_a AS a, id_b AS b FROM jp
        |      UNION ALL SELECT id_b, id_a FROM jp),
        |reach AS (SELECT vec_id AS node, vec_id AS r FROM embeddings
        |          UNION
        |          SELECT e.a, reach.r FROM reach JOIN e
        |            ON reach.node = e.b),
        |emb AS (SELECT node AS doc_id, min(r) AS embed_cluster,
        |          (min(r) = node) AS embed_kept
        |        FROM reach GROUP BY node),
        |q AS (SELECT vec_id AS doc_id,
        |        CAST(list_min(embedding) AS DOUBLE) AS v_min,
        |        CAST(list_max(embedding) AS DOUBLE) AS v_max
        |      FROM embeddings)
        |SELECT txt.doc_id, CAST(txt.n_tok AS INT) AS n_tok,
        |  txt.quality_keep, emb.embed_cluster, emb.embed_kept,
        |  q.v_min, q.v_max,
        |  (txt.quality_keep AND emb.embed_kept) AS keep
        |FROM txt JOIN emb USING (doc_id) JOIN q USING (doc_id)
        |ORDER BY txt.doc_id""".stripMargin,
    // EP8: cap window -> chunk lateral -> unit key -> pack window, the
    // exact composition of the standalone stages' SQL.
    "q_pipeline_sequence" ->
      """WITH kept AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text, row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id)
        |      AS rk
        |    FROM documents) t WHERE rk <= 10),
        |ch AS (
        |  SELECT doc_id, CAST(s // 24 AS INT) AS chunk_id,
        |    array_to_string(toks[s + 1 : s + 32], ' ') AS chunk_text
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM kept) d,
        |    LATERAL (SELECT unnest(generate_series(0, len(toks) - 1, 24))
        |             AS s) g),
        |u AS (
        |  SELECT doc_id * 256 + chunk_id AS uid,
        |    CAST(len(string_split(chunk_text, ' ')) AS INT) AS n_tok,
        |    substring(md5(CAST(doc_id * 256 + chunk_id AS VARCHAR)), 1, 1)
        |      AS shard
        |  FROM ch),
        |p AS (
        |  SELECT uid, shard, n_tok,
        |    CAST(floor((sum(n_tok) OVER (PARTITION BY shard ORDER BY uid
        |      ROWS UNBOUNDED PRECEDING) - n_tok) / 512.0) AS BIGINT)
        |      AS pack_id
        |  FROM u)
        |SELECT CAST(uid // 256 AS BIGINT) AS doc_id,
        |  CAST(uid % 256 AS INT) AS chunk_id, shard, n_tok, pack_id
        |FROM p ORDER BY doc_id, chunk_id""".stripMargin,
    "q_source_cap" ->
      """SELECT doc_id, source, CAST(rk AS INT) AS rk FROM (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':cap'), doc_id)
        |    AS rk
        |  FROM documents) t
        |WHERE rk <= 10 ORDER BY doc_id""".stripMargin,
    "q_chunk_docs" ->
      """SELECT doc_id, CAST(s // 24 AS INT) AS chunk_id,
        |  array_to_string(toks[s + 1 : s + 32], ' ') AS chunk_text,
        |  CAST(least(len(toks) - s, 32) AS INT) AS n_chunk_tokens
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |      FROM documents) d,
        |  LATERAL (SELECT unnest(generate_series(0, len(toks) - 1, 24))
        |           AS s) g
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q_dedup_embed" ->
      """WITH base AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(list_transform(v, x -> x * x),
        |         (a, b) -> a + b)) AS nrm
        |  FROM base),
        |un AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM n)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_reduce(list_transform(list_zip(a.u, b.u),
        |      p -> p[1] * p[2]), (x, y) -> x + y) AS cosine
        |FROM un a, un b
        |WHERE a.vec_id < b.vec_id
        |  AND list_reduce(list_transform(list_zip(a.u, b.u),
        |      p -> p[1] * p[2]), (x, y) -> x + y) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    // q_ann_ivf: no oracle — approximate by design at nprobe=3; recall
    // vs the exact q_cosine_topk is property-tested in VectorsSpec, and
    // the probe machinery earns its green row through q_ann_ivf_full.
    // q_ann_ivf_pq: no oracle by the same contract (int8-compressed
    // scoring at nprobe=3 is approximate twice over); VectorsSpec pins
    // full-probe recall >= 0.9 against q_ann_ivf_full's oracle-green
    // exact pipeline (isolating quantization loss), exact re-ranked
    // cosines, and DPP + int8-only reading on the codes scan.
    // q_dedup_embed_lsh IS oracle-checked (r8 verdict item 2): the
    // banded output is always a SUBSET of the exact >=0.8-cosine sweep
    // (every candidate is exact-verified — seed-independent,
    // spec-pinned), and on this corpus that exact sweep is EMPTY
    // (planted pairs sit at cosine 0.50-0.60), so set equality holds
    // for ANY plane seed: a spurious banded pair would break the hash
    // compare loudly, and a recall miss is impossible against an empty
    // truth set. The populated-regime recall contract stays in
    // VectorsSpec's planted >=0.9-cosine corpus.
    "q_dedup_embed_lsh" ->
      """WITH base AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(list_transform(v, x -> x * x),
        |         (a, b) -> a + b)) AS nrm
        |  FROM base),
        |un AS (
        |  SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM n)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_reduce(list_transform(list_zip(a.u, b.u),
        |      p -> p[1] * p[2]), (x, y) -> x + y) AS cosine
        |FROM un a, un b
        |WHERE a.vec_id < b.vec_id
        |  AND list_reduce(list_transform(list_zip(a.u, b.u),
        |      p -> p[1] * p[2]), (x, y) -> x + y) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // q_ann_ivf_full: nprobe = nlist makes the probe pipeline exact, so
    // the unit-vector brute-force top-5 SQL is its oracle.
    "q_ann_ivf_full" -> annExactTopkOracle,
    // q_ann_ivf_pq_exact: full probe + corpus-sized shortlist makes the
    // COMPRESSED pipeline exact too (the int8 stage becomes an order
    // hint; the float re-rank decides) — same brute-force oracle, which
    // hash-certifies the codes build, dequant arithmetic, shortlist
    // aggregate, and bucket+id re-rank fetch end to end.
    "q_ann_ivf_pq_exact" -> annExactTopkOracle,
    // q_dedup_embed_clusters IS oracle-checked: the oracle computes true
    // reachability over the EXACT ≥0.8-cosine pair graph, which on this
    // corpus is empty (planted pairs sit at 0.50–0.60) exactly like the
    // banded graph — both paths correctly yield all-kept singletons, and
    // any spurious LSH pair or dropped vector breaks the hash compare.
    // Planted ≥0.9 clusters + union-find parity live in VectorsSpec.
    "q_dedup_embed_clusters" -> embedClustersOracle,
    // q_dedup_embed_incremental: same contract as the text modality's
    // incremental query — probing the increment against the base index
    // and extending the base labels must equal a full recompute, so
    // the oracle is the identical full-corpus reachability SQL.
    "q_dedup_embed_incremental" -> embedClustersOracle,
    // q_dedup_embed_compact: stale-model vectors retired, true vectors
    // re-paired — must equal a full recompute over the true corpus, so
    // the same exact-reachability SQL is the oracle.
    "q_dedup_embed_compact" -> embedClustersOracle,
    // Quantization: float→double widenings are exact; the code map is
    // one exact multiply + one IEEE divide + round — bit-identical.
    "q_quantize_embed" ->
      """SELECT vec_id,
        |  CAST(list_min(embedding) AS DOUBLE) AS v_min,
        |  CAST(list_max(embedding) AS DOUBLE) AS v_max,
        |  array_to_string(list_transform(embedding, x ->
        |    CAST(CASE WHEN list_max(embedding) = list_min(embedding)
        |              THEN 0
        |         ELSE round(((CAST(x AS DOUBLE)
        |                      - CAST(list_min(embedding) AS DOUBLE))
        |                     * 255.0)
        |              / (CAST(list_max(embedding) AS DOUBLE)
        |                 - CAST(list_min(embedding) AS DOUBLE)))
        |         END AS INT)), ',') AS q_codes
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // q_hard_negatives: exact brute-force contrastive negative mining —
    // unit-vector cosines (the bit-identical left-fold dot), label
    // inequality in the pair predicate, (cosine desc, neighbor_id)
    // total order. q_hard_negatives_ivf: no oracle — approximate by
    // design at nprobe=3 (the q_ann_ivf contract applied to mining);
    // the probe plumbing earns its green row through
    // q_hard_negatives_full (nprobe = nlist ⇒ exact), which rides this
    // same SQL.
    "q_hard_negatives" ->
      """WITH base AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, label, v,
        |    sqrt(list_reduce(list_transform(v, x -> x * x),
        |         (a, b) -> a + b)) AS nrm
        |  FROM base),
        |un AS (
        |  SELECT vec_id, label, list_transform(v, x -> x / nrm) AS u
        |  FROM n),
        |scored AS (
        |  SELECT q.vec_id AS q_id, q.label AS q_label,
        |    c.vec_id AS neighbor_id, c.label AS neighbor_label,
        |    list_reduce(list_transform(list_zip(q.u, c.u),
        |        p -> p[1] * p[2]), (x, y) -> x + y) AS cosine
        |  FROM un q, un c
        |  WHERE q.vec_id < 10 AND c.vec_id >= 10
        |    AND c.label <> q.label),
        |ranked AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, q_label, rank, neighbor_id, neighbor_label, cosine
        |FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "q_hard_negatives_full" ->
      """WITH base AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, label, v,
        |    sqrt(list_reduce(list_transform(v, x -> x * x),
        |         (a, b) -> a + b)) AS nrm
        |  FROM base),
        |un AS (
        |  SELECT vec_id, label, list_transform(v, x -> x / nrm) AS u
        |  FROM n),
        |scored AS (
        |  SELECT q.vec_id AS q_id, q.label AS q_label,
        |    c.vec_id AS neighbor_id, c.label AS neighbor_label,
        |    list_reduce(list_transform(list_zip(q.u, c.u),
        |        p -> p[1] * p[2]), (x, y) -> x + y) AS cosine
        |  FROM un q, un c
        |  WHERE q.vec_id < 10 AND c.vec_id >= 10
        |    AND c.label <> q.label),
        |ranked AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, q_label, rank, neighbor_id, neighbor_label, cosine
        |FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "q_cosine_topk" ->
      """WITH base AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, v,
        |    sqrt(list_reduce(list_transform(v, x -> x * x),
        |         (a, b) -> a + b)) AS nrm
        |  FROM base),
        |scored AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
        |    list_reduce(list_transform(list_zip(q.v, c.v),
        |        p -> p[1] * p[2]), (a, b) -> a + b) / (q.nrm * c.nrm)
        |      AS cosine
        |  FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id >= 10),
        |ranked AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id, 'utf8-text' AS format,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |       md5(text) AS content_md5,
        |       CAST(320 + octet_length(encode(text)) % 320 AS INTEGER)
        |         AS probe_width,
        |       CAST(240 + octet_length(encode(text)) % 240 AS INTEGER)
        |         AS probe_height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q_image_meta: the Spark side BUILDS genuine PNG/JPEG header bytes
    // (dimensions from doc_id, big-endian) and PARSES them back with the
    // codegen'd header walker; the oracle recomputes the dimensions
    // independently from the arithmetic, so any offset/endianness/marker
    // bug in the parser breaks the hash compare.
    "q_image_meta" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END
        |         AS format,
        |       CAST(16 + doc_id % 640 AS INTEGER) AS width,
        |       CAST(16 + doc_id % 480 AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q_audio_meta: same roundtrip discipline as q_image_meta for the
    // audio modality — Spark builds genuine little-endian WAV/RIFF
    // containers from doc_id (odd ids carry an odd-sized LIST chunk the
    // walk must word-align past) and parses them back; the oracle
    // recomputes the fields and the floor-division duration directly.
    "q_audio_meta" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         1 + doc_id % 2 AS channels,
        |         8000 * (1 + doc_id % 4) AS sample_rate,
        |         1000 + doc_id % 9000 AS data_size
        |  FROM documents)
        |SELECT doc_id, 'wav' AS format,
        |       CAST(channels AS INTEGER) AS channels,
        |       CAST(sample_rate AS INTEGER) AS sample_rate,
        |       CAST(16 AS INTEGER) AS bits_per_sample,
        |       CAST((data_size * 1000) // (sample_rate * channels * 2)
        |         AS BIGINT) AS duration_ms
        |FROM p ORDER BY doc_id""".stripMargin,
    // q_video_meta: the video modality's roundtrip — Spark builds
    // genuine big-endian MP4 box sequences (ftyp brand by id, a free
    // box the walk must skip on doc_id%3==1, mvhd in v0 OR v1 layout
    // by id parity) and the box walk parses them back; the oracle
    // recomputes brand/timescale/floor-division duration from doc_id.
    "q_video_meta" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'isom'
        |           WHEN 1 THEN 'mp42' ELSE 'avc1' END AS major_brand,
        |         600 * (1 + doc_id % 5) AS ts,
        |         1000 + doc_id % 90000 AS dur
        |  FROM documents)
        |SELECT doc_id, 'mp4' AS format, major_brand,
        |       CAST(ts AS INTEGER) AS timescale,
        |       CAST((dur * 1000) // ts AS BIGINT) AS duration_ms
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_frame_sample" ->
      """SELECT doc_id, CAST(f.frame_idx AS INTEGER) AS frame_idx,
        |       CAST(320 + nb % 320 AS INTEGER) AS width,
        |       CAST(240 + nb % 240 AS INTEGER) AS height,
        |       doc_id * 1000003 + f.frame_idx * 97 AS pixel_hash
        |FROM (SELECT doc_id, octet_length(encode(text)) AS nb
        |      FROM documents) d,
        |     LATERAL (SELECT unnest(range(least(5, nb // 100 + 1)))
        |              AS frame_idx) f
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // M6 — corpus curation. Shared discipline with the Scala side: all
    // assignment decisions (split/sample/shard) come from md5 hex
    // prefixes of stable keys so the oracle — or any non-Spark consumer
    // — reproduces them bit-for-bit.
    "q_train_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'cd'
        |         THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)),1,2) < 'e6'
        |         THEN 'val'
        |       ELSE 'test' END AS split_name
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':' || lang),1,1) <
        |      CASE WHEN lang = 'en' THEN '8' ELSE 'g' END
        |ORDER BY doc_id""".stripMargin,
    // token-proportional weighted sampling: keep <=> u*w_max < w*2^32,
    // exact BIGINT products both sides (no FP anywhere) — Spark's
    // conv(hex,16,10) and DuckDB's ('0x'||hex)::BIGINT read the same
    // 32-bit md5 prefix.
    "q_sample_weighted" ->
      """WITH t AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS weight
        |  FROM documents),
        |m AS (SELECT max(weight) AS max_weight FROM t)
        |SELECT doc_id, weight FROM t, m
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':wsamp'),
        |        1, 8))::BIGINT * max_weight < weight * 4294967296
        |ORDER BY doc_id""".stripMargin,
    // The oracle replays the derandomized draw verbatim and states the
    // sample DECLARATIVELY (row_number over the permutation) — the
    // engine's bounded bottom-k aggregate must reproduce the window
    // formulation's pick set exactly.
    "q_sample_reservoir" ->
      """SELECT lang,
        |  CAST(row_number() OVER (PARTITION BY lang
        |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |      || '#resv'), 1, 8))::BIGINT, doc_id) AS INT) AS rank,
        |  doc_id
        |FROM documents
        |QUALIFY rank <= 20
        |ORDER BY lang, rank""".stripMargin,
    "q_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks
        |           FROM documents),
        |sh AS (SELECT doc_id,
        |         unnest(CASE WHEN len(toks) >= 8
        |           THEN list_transform(generate_series(1, len(toks)-7),
        |                  i -> array_to_string(toks[i:i+7],' '))
        |           ELSE [array_to_string(toks,' ')] END) AS sh
        |       FROM t),
        |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0),
        |hit AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh)
        |        WHERE s.doc_id % 10 <> 0)
        |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
        |FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 10 <> 0 ORDER BY d.doc_id""".stripMargin,
    "q_contamination_report" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks
        |           FROM documents),
        |sh AS (SELECT doc_id,
        |         unnest(CASE WHEN len(toks) >= 8
        |           THEN list_transform(generate_series(1, len(toks)-7),
        |                  i -> array_to_string(toks[i:i+7],' '))
        |           ELSE [array_to_string(toks,' ')] END) AS sh
        |       FROM t),
        |hp AS (SELECT DISTINCT e.doc_id, s.doc_id AS train_id
        |       FROM sh e JOIN sh s USING (sh)
        |       WHERE e.doc_id % 10 = 0 AND s.doc_id % 10 <> 0)
        |SELECT d.doc_id,
        |       CAST(coalesce(h.hits, 0) AS BIGINT) AS n_train_hits
        |FROM documents d LEFT JOIN
        |     (SELECT doc_id, count(*) AS hits FROM hp GROUP BY doc_id) h
        |     ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 10 = 0 ORDER BY d.doc_id""".stripMargin,
    // q_pii_scrub: patterns restricted to Java-regex/RE2-identical
    // constructs; DuckDB regexp_replace needs the 'g' flag to match
    // Spark's replace-all semantics.
    // unicode + whitespace normalization: the JDK (Spark side) and
    // utf8proc (DuckDB nfc_normalize) both implement UAX #15 NFC, so
    // the composed bytes compare directly.
    "q_normalize_text" ->
      """WITH n AS (SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(
        |      lower(nfc_normalize(text)),
        |      '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_raw,
        |  norm_text,
        |  CAST(length(norm_text) AS BIGINT) AS n_chars_norm,
        |  CAST(norm_text <> text AS INTEGER) AS changed
        |FROM n ORDER BY doc_id""".stripMargin,
    "q_pii_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS INTEGER) AS n_ssns,
        |  CAST(len(regexp_extract_all(text,
        |    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS INTEGER) AS n_phones,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '<EMAIL>', 'g'),
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
        |    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')
        |    AS clean_text,
        |  (len(regexp_extract_all(text,
        |     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |   + len(regexp_extract_all(text,
        |     '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))
        |   + len(regexp_extract_all(text,
        |     '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) > 0) AS has_pii
        |FROM documents ORDER BY doc_id""".stripMargin,
    // q_token_freq_score: integer occurrence counts sum exactly in any
    // aggregation order (unlike the float log-prob sums of the
    // published perplexity proxies), so both engines agree bitwise.
    "q_token_freq_score" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |             FROM documents),
        |m AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
        |agg AS (SELECT tok.doc_id, count(*) AS n_tokens,
        |          sum(m.cnt) AS sum_freq,
        |          sum(CASE WHEN m.cnt < 3 THEN 1 ELSE 0 END) AS n_rare
        |        FROM tok JOIN m USING (t) GROUP BY tok.doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(sum_freq AS BIGINT) AS sum_freq,
        |       CAST(sum_freq AS DOUBLE) / n_tokens AS mean_freq,
        |       CAST(n_rare AS DOUBLE) / n_tokens AS rare_frac
        |FROM agg ORDER BY doc_id""".stripMargin,
    // Exact-regime GK boundaries == quantile_disc (the
    // q_token_percentiles rank-convention precedent).
    "q_quality_quartiles" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |             FROM documents),
        |m AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
        |score AS (SELECT tok.doc_id,
        |            CAST(sum(m.cnt) AS DOUBLE) / count(*) AS mean_freq
        |          FROM tok JOIN m USING (t) GROUP BY tok.doc_id),
        |b AS (SELECT quantile_disc(mean_freq, [0.25, 0.5, 0.75]) AS q
        |      FROM score)
        |SELECT doc_id, mean_freq,
        |  CASE WHEN mean_freq <= q[1] THEN 1
        |       WHEN mean_freq <= q[2] THEN 2
        |       WHEN mean_freq <= q[3] THEN 3 ELSE 4 END AS quartile
        |FROM score CROSS JOIN b ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks
        |           FROM documents),
        |g AS (SELECT doc_id, len(toks) AS n_tok,
        |             len(list_distinct(toks)) AS n_uniq,
        |             list_transform(generate_series(1, len(toks)-1),
        |               i -> toks[i] || ' ' || toks[i+1]) AS bi
        |      FROM t),
        |s AS (SELECT doc_id, n_tok,
        |             1 - n_uniq / CAST(n_tok AS DOUBLE) AS dup_word_frac,
        |             CASE WHEN n_tok >= 2
        |               THEN 1 - len(list_distinct(bi)) /
        |                        CAST(len(bi) AS DOUBLE)
        |               ELSE 0.0 END AS dup_bigram_frac
        |      FROM g)
        |SELECT doc_id, n_tok, dup_word_frac, dup_bigram_frac,
        |       (dup_word_frac <= 0.7 AND dup_bigram_frac <= 0.2) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |             substr(md5(CAST(doc_id AS VARCHAR)),1,1) AS shard,
        |             len(string_split(text,' ')) AS n_tok
        |           FROM documents),
        |c AS (SELECT doc_id, shard, n_tok,
        |             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |               ROWS UNBOUNDED PRECEDING) AS cum FROM t)
        |SELECT doc_id, shard, n_tok,
        |       CAST(floor((cum - n_tok)/512.0) AS BIGINT) AS pack_id
        |FROM c ORDER BY shard, doc_id""".stripMargin,
    // EP4 — composed manifest pipeline. Spark windows the dedup flag
    // over xxhash64(normalized text) and joins contamination hits over
    // 8-byte shingle hashes; the oracle uses the strings themselves —
    // the same collision-negligible hash/string duality as
    // q_dedup_exact. The packing CTE packs the kept-train subset then
    // joins back; the Spark plan computes the identical numbers with a
    // conditional running sum inside the existing shard window.
    "q_pipeline_manifest" ->
      """WITH base AS (
        |  SELECT doc_id, text, string_split(text,' ') AS toks
        |  FROM documents WHERE doc_id % 10 <> 0),
        |scored AS (
        |  SELECT doc_id,
        |    len(toks) AS n_tok,
        |    (doc_id = min(doc_id) OVER (
        |       PARTITION BY lower(trim(regexp_replace(text,'\s+',' ','g')))))
        |      AS dedup_keep,
        |    1 - len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE)
        |      AS dwf,
        |    CASE WHEN len(toks) >= 2
        |      THEN 1 - len(list_distinct(
        |             list_transform(generate_series(1, len(toks)-1),
        |               i -> toks[i] || ' ' || toks[i+1]))) /
        |           CAST(len(toks)-1 AS DOUBLE)
        |      ELSE 0.0 END AS dbf
        |  FROM base),
        |sh AS (SELECT doc_id,
        |         unnest(CASE WHEN len(toks) >= 8
        |           THEN list_transform(generate_series(1, len(toks)-7),
        |                  i -> array_to_string(toks[i:i+7],' '))
        |           ELSE [array_to_string(toks,' ')] END) AS sh
        |       FROM (SELECT doc_id, string_split(text,' ') AS toks
        |             FROM documents)),
        |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0),
        |hit AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh)
        |        WHERE s.doc_id % 10 <> 0),
        |flags AS (
        |  SELECT s.doc_id, s.n_tok, s.dedup_keep,
        |    (s.dwf <= 0.7 AND s.dbf <= 0.2) AS quality_keep,
        |    (h.doc_id IS NOT NULL) AS contaminated,
        |    (s.dedup_keep AND s.dwf <= 0.7 AND s.dbf <= 0.2
        |       AND h.doc_id IS NULL) AS keep,
        |    CASE WHEN substr(md5(CAST(s.doc_id AS VARCHAR)),1,2) < 'cd'
        |           THEN 'train'
        |         WHEN substr(md5(CAST(s.doc_id AS VARCHAR)),1,2) < 'e6'
        |           THEN 'val'
        |         ELSE 'test' END AS split_name,
        |    substr(md5(CAST(s.doc_id AS VARCHAR)),1,1) AS shard
        |  FROM scored s LEFT JOIN hit h ON s.doc_id = h.doc_id),
        |packed AS (
        |  SELECT doc_id,
        |    CAST(floor((sum(n_tok) OVER (PARTITION BY shard
        |      ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok) / 512.0)
        |      AS BIGINT) AS pack_id
        |  FROM flags WHERE keep AND split_name = 'train')
        |SELECT f.doc_id, f.n_tok, f.dedup_keep, f.quality_keep,
        |       f.contaminated, f.keep, f.split_name, f.shard, p.pack_id
        |FROM flags f LEFT JOIN packed p ON f.doc_id = p.doc_id
        |ORDER BY f.doc_id""".stripMargin,
    // EP5 — report → weights → repeat plan in one dataflow; the oracle
    // recomputes the same cells, shares, weights, and md5 repeat draws
    // (salt '#mix') at full (lang, source) granularity.
    "q_pipeline_mix" ->
      """WITH c AS (SELECT lang, source,
        |             CAST(sum(len(string_split(text,' '))) AS BIGINT)
        |               AS cell_tokens
        |           FROM documents GROUP BY 1,2),
        |w AS (SELECT lang, source,
        |        CAST(cell_tokens AS DOUBLE) /
        |          CAST(sum(cell_tokens) OVER () AS DOUBLE) AS token_share,
        |        (CAST(sum(cell_tokens) OVER () AS DOUBLE) /
        |          (count(*) OVER ())) / cell_tokens AS weight
        |      FROM c)
        |SELECT d.doc_id, d.lang, d.source, w.token_share, w.weight,
        |  CAST(floor(w.weight) + CASE
        |    WHEN upper(substr(md5(CAST(d.doc_id AS VARCHAR) || '#mix'),
        |           1,4)) <
        |      lpad(to_hex(CAST(floor((w.weight - floor(w.weight)) * 65536)
        |        AS BIGINT)),4,'0')
        |    THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
        |FROM documents d JOIN w USING (lang, source)
        |ORDER BY d.doc_id""".stripMargin,
    "q_corpus_mix" ->
      """WITH g AS (SELECT lang, source, count(*) AS n_docs,
        |             CAST(sum(len(string_split(text,' '))) AS BIGINT)
        |               AS n_tokens
        |           FROM documents GROUP BY 1,2)
        |SELECT lang, source, n_docs, n_tokens,
        |       CAST(n_tokens AS DOUBLE) /
        |         CAST(sum(n_tokens) OVER () AS DOUBLE) AS token_share
        |FROM g ORDER BY lang, source""".stripMargin,
    "q_pack_manifest" ->
      """WITH t AS (SELECT doc_id,
        |             substr(md5(CAST(doc_id AS VARCHAR)),1,1) AS shard,
        |             len(string_split(text,' ')) AS n_tok
        |           FROM documents),
        |c AS (SELECT doc_id, shard, n_tok,
        |             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |               ROWS UNBOUNDED PRECEDING) AS cum FROM t),
        |p AS (SELECT doc_id, shard, n_tok,
        |             CAST(floor((cum - n_tok)/512.0) AS BIGINT) AS pack_id
        |      FROM c)
        |SELECT shard, pack_id, count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |       string_agg(CAST(doc_id AS VARCHAR), '-' ORDER BY doc_id)
        |         AS doc_ids
        |FROM p GROUP BY 1,2 ORDER BY shard, pack_id""".stripMargin,
    // Both engines draw the probabilistic extra repeat by comparing
    // UPPERCASE hex: md5 is lowercase in both, Spark hex() and DuckDB
    // to_hex() are uppercase — the upper() on the md5 prefix keeps the
    // lexical compare a true base-16 compare.
    "q_mix_resample" ->
      """WITH c AS (SELECT lang,
        |             CAST(sum(len(string_split(text,' '))) AS BIGINT)
        |               AS cell_tokens
        |           FROM documents GROUP BY 1),
        |w AS (SELECT lang, cell_tokens,
        |        (CAST(sum(cell_tokens) OVER () AS DOUBLE) /
        |          (count(*) OVER ())) / cell_tokens AS weight FROM c)
        |SELECT d.doc_id, d.lang, w.weight,
        |  CAST(floor(w.weight) + CASE
        |    WHEN upper(substr(md5(CAST(d.doc_id AS VARCHAR) || '#rep'),
        |           1,4)) <
        |      lpad(to_hex(CAST(floor((w.weight - floor(w.weight)) * 65536)
        |        AS BIGINT)),4,'0')
        |    THEN 1 ELSE 0 END AS BIGINT) AS n_repeats
        |FROM documents d JOIN w USING (lang) ORDER BY d.doc_id""".stripMargin,
  )
}
