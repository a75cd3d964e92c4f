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

  test("q_pipeline_manifest flags compose and agree with the standalone stages") {
    import org.apache.spark.sql.functions._
    val rows = Pipelines.qPipelineManifest(spark, sfDir).collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpusSize = docs.filter(col("doc_id") % 10 =!= 0).count()
    assert(rows.length.toLong == corpusSize) // manifest row per non-eval doc
    rows.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[Boolean]("dedup_keep") &&
        r.getAs[Boolean]("quality_keep") && !r.getAs[Boolean]("contaminated")))
      // pack_id present iff the doc lands in the packed train set
      val packed = r.getAs[Boolean]("keep") &&
        r.getAs[String]("split_name") == "train"
      assert(packed == !r.isNullAt(r.fieldIndex("pack_id")))
    }
    // parity with the standalone queries the stages come from
    val contam = graft.operators.Curation.qDecontaminate(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val split = graft.operators.Curation.qTrainSplit(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("contaminated") == contam(id))
      assert(r.getAs[String]("split_name") == split(id))
    }
    // conditional-window packing == packing the kept-train subset
    val keptTrain = rows.filter(r => r.getAs[Boolean]("keep") &&
      r.getAs[String]("split_name") == "train")
    val subsetIds = keptTrain.map(_.getAs[Long]("doc_id")).toSet
    val expected = graft.operators.Curation.packSequences(
      docs.filter(col("doc_id").isin(subsetIds.toSeq: _*)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    keptTrain.foreach(r => assert(
      r.getAs[Long]("pack_id") == expected(r.getAs[Long]("doc_id"))))
    assert(keptTrain.nonEmpty && keptTrain.length < rows.length)
  }

  test("q_pipeline_manifest drops planted duplicate, low-quality, and leaked docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // plant: 10 = eval doc; 11 dup-survivor pair with 21 (same normalized
    // text); 12 low quality (one word repeated); 13 contains an eval
    // 8-gram; 14 clean
    def fill(tag: String) = (1 to 10).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (10L, s"leak1 leak2 leak3 leak4 leak5 leak6 leak7 leak8 ${fill("ev")}"),
      (11L, s"Shared   Doc ${fill("dd")}"),
      (21L, s"shared doc ${fill("dd")}"),
      (12L, ("dup " * 30).trim),
      (13L, s"x leak1 leak2 leak3 leak4 leak5 leak6 leak7 leak8 ${fill("ct")}"),
      (14L, s"clean unique words ${fill("ok")}")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest_fixture").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipelines.qPipelineManifest(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(10L), "eval docs carry no manifest row")
    assert(out(11L).getAs[Boolean]("dedup_keep")) // min doc_id survives
    assert(!out(21L).getAs[Boolean]("dedup_keep") &&
      !out(21L).getAs[Boolean]("keep"))
    assert(!out(12L).getAs[Boolean]("quality_keep") &&
      !out(12L).getAs[Boolean]("keep"))
    assert(out(13L).getAs[Boolean]("contaminated") &&
      !out(13L).getAs[Boolean]("keep"))
    assert(out(14L).getAs[Boolean]("keep"))
  }

  test("q_pipeline_manifest plan: contamination hits broadcast, no sort-merge join") {
    val plan = Pipelines.qPipelineManifest(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "the only join in the manifest plan is the broadcast hit-set flag; " +
        "a sort-merge join means a corpus-scale shuffle crept in")
    // the CORPUS moves through exactly three exchanges — the dedup
    // window (norm-text hash), the shard window, and the output sort;
    // the other two shuffle only benchmark-sized relations (the eval
    // shingle distinct and the hit-set distinct). A sixth exchange
    // means the packing subset-join (or similar) crept back in.
    val exchanges =
      "Exchange (hash|range)partitioning".r.findAllIn(plan).size
    assert(exchanges <= 5, s"expected <=5 shuffle exchanges:\n$plan")
  }

  test("published manifest: split read prunes to the split's directories") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.functions._
    def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case q: QueryStageExec => fileScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(fileScans)
    }
    val tmpPath = java.nio.file.Files.createTempDirectory("graft_manifest_pub")
    try {
      val manifest = Pipelines.qPipelineManifest(spark, sfDir)
      Pipelines.writeManifest(manifest, tmpPath.toString)
      val train = Pipelines.readManifestSplit(spark, tmpPath.toString, "train")
      val rows = train.collect()
      // content round-trips exactly (partition columns come back typed
      // as strings; compare on the stable columns)
      val expected = manifest.filter(col("split_name") === "train")
        .select(col("doc_id"), col("keep"), col("pack_id")).collect()
        .map(r => (r.getLong(0), r.getBoolean(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("keep"),
        if (r.isNullAt(r.fieldIndex("pack_id"))) -1L
        else r.getAs[Long]("pack_id"))).toSet == expected)
      // plan-time directory pruning: the train read touches only the
      // train partition's files
      val scan = fileScans(train.queryExecution.executedPlan).head
      val allFiles = spark.read.parquet(tmpPath.toString).inputFiles.length
      val readFiles = scan.metrics("numFiles").value
      assert(readFiles < allFiles,
        s"split read touched $readFiles of $allFiles files — no pruning")
    } finally graft.sources.TempDirs.deleteTree(tmpPath)
  }

  test("manifest shard width widens packing shards without moving splits") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val narrow = Pipelines.manifestFlags(docs, shardHexLen = 1)
    val wide = Pipelines.manifestFlags(docs, shardHexLen = 2)
    // the declared query IS the 1-hex core
    assert(Pipelines.qPipelineManifest(spark, sfDir).collect()
      .map(_.toSeq).toSeq == narrow.collect().map(_.toSeq).toSeq)
    // 2 hex digits -> up to 256 shards, well past the 16 executors of
    // the narrow layout; every wide shard refines its narrow shard
    val shards = wide.select("shard").distinct().collect()
      .map(_.getString(0))
    assert(shards.length > 16 && shards.forall(_.length == 2))
    val refined = wide.select(col("doc_id"), col("shard"),
        col("split_name"))
      .join(narrow.select(col("doc_id"), col("shard").as("s1"),
        col("split_name").as("sp1")), "doc_id")
    assert(refined.filter(substring(col("shard"), 1, 1) =!= col("s1") ||
      col("split_name") =!= col("sp1")).isEmpty)
  }

  test("q_pipeline_quality composes the standalone quality signals exactly") {
    import org.apache.spark.sql.functions._
    val audit = Pipelines.qPipelineQuality(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val spans = graft.operators.TextOps.qDupSpans(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val freq = graft.operators.TextOps.qTokenFreqScore(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4))))
      .toMap
    val rep = graft.operators.Curation.qRepetition(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val pii = graft.operators.Curation.qPiiScrub(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1) + r.getInt(2) + r.getInt(3))).toMap
    assert(audit.nonEmpty && audit.size == spans.size)
    audit.foreach { case (id, r) =>
      assert(r.getDouble(5) == spans(id), s"span frac drift doc $id")
      assert((r.getDouble(6), r.getDouble(7)) == freq(id))
      assert((r.getDouble(2), r.getDouble(3)) == rep(id))
      assert(r.getInt(4) == pii(id))
      val expectKeep = r.getDouble(2) <= 0.7 && r.getDouble(3) <= 0.2 &&
        r.getInt(4) == 0 && r.getDouble(5) <= 0.3 && r.getDouble(7) <= 0.5
      assert(r.getBoolean(8) == expectKeep, s"keep drift doc $id")
    }
  }

  test("q_pipeline_mix carries the corpus-mix report's shares verbatim") {
    import org.apache.spark.sql.functions._
    val mix = Pipelines.qPipelineMix(spark, sfDir)
    val gotCells = mix.select("lang", "source", "token_share")
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val report = graft.operators.Curation.qCorpusMix(spark, sfDir)
      .select("lang", "source", "token_share").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(gotCells == report)
  }

  test("q_pipeline_mix repeat draws match an independent md5 recompute") {
    import org.apache.spark.sql.functions._
    val rows = Pipelines.qPipelineMix(spark, sfDir).collect()
    // independent driver-side recompute of the epoch plan from raw cells
    val cells = graft.sources.Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source"))
      .agg(sum(size(split(col("text"), " "))).as("t")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val total = cells.values.sum.toDouble
    def weightOf(lang: String, source: String): Double =
      (total / cells.size) / cells((lang, source))
    def md5hex4(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4).toUpperCase
    rows.foreach { r =>
      val (id, lang, source) = (r.getLong(0), r.getString(1), r.getString(2))
      val w = weightOf(lang, source)
      val frac16 = math.floor((w - math.floor(w)) * 65536).toLong
      val draw = md5hex4(s"$id#mix") <
        ("0000" + java.lang.Long.toHexString(frac16).toUpperCase).takeRight(4)
      val expected = math.floor(w).toLong + (if (draw) 1L else 0L)
      assert(r.getLong(5) == expected, s"doc $id: ${r.getLong(5)} != $expected")
      assert(math.abs(r.getDouble(4) - w) < 1e-12)
    }
    // the mixing is non-trivial on this corpus: some docs repeat more
    // than once, some draws differ
    assert(rows.map(_.getLong(5)).distinct.length > 1)
  }

  test("writeManifest rolls files at maxRecordsPerFile within a partition") {
    import org.apache.spark.sql.functions._
    val tmpPath = java.nio.file.Files.createTempDirectory("graft_manifest_roll")
    try {
      val manifest = Pipelines.qPipelineManifest(spark, sfDir)
      Pipelines.writeManifest(manifest, tmpPath.toString,
        maxRecordsPerFile = 3)
      val back = spark.read.parquet(tmpPath.toString)
      assert(back.count() == manifest.count())
      // at 3 records/file some (split, shard) directory must hold
      // several part files — the bound actually rolls
      val filesPerDir = back.select(input_file_name().as("f"),
          col("split_name"), col("shard"))
        .distinct().groupBy("split_name", "shard").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(filesPerDir >= 2,
        s"expected rolled files, max files per partition = $filesPerDir")
    } finally graft.sources.TempDirs.deleteTree(tmpPath)
  }

  test("q_pipeline_multimodal agrees with each modality's standalone query") {
    import graft.operators.{Curation, Joins => _, Vectors}
    val df = Pipelines.qPipelineMultimodal(spark, sfDir).cache()
    assert(df.count() ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
    // embedding flags equal the standalone clustering query
    val gotEmbed = df.select(col("doc_id"), col("embed_cluster"),
      col("embed_kept")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val wantEmbed = Vectors.qDedupEmbedClusters(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("is_kept"))).toSet
    assert(gotEmbed == wantEmbed)
    // quality gate equals the standalone repetition keep
    val gotKeep = df.select("doc_id", "quality_keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val wantKeep = Curation.qRepetition(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(gotKeep == wantKeep)
    // quantization range equals the standalone quantize query
    val gotQ = df.select("doc_id", "v_min", "v_max").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val wantQ = Vectors.qQuantizeEmbed(spark, sfDir)
      .select("vec_id", "v_min", "v_max").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(gotQ == wantQ)
    // the conjunction is exactly the two gates
    df.collect().foreach { r =>
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Boolean]("quality_keep") && r.getAs[Boolean]("embed_kept")))
    }
    df.unpersist()
  }

  test("q_pipeline_sequence composes cap, chunking and packing exactly") {
    import graft.operators.Curation
    val df = Pipelines.qPipelineSequence(spark, sfDir).cache()
    // stage parity 1: the documents entering the pipeline are exactly
    // the standalone source-cap survivors
    val pipeDocs = df.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet
    val capDocs = Curation.qSourceCap(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(pipeDocs == capDocs)
    // stage parity 2: per-document chunk counts equal standalone
    // chunking of the kept documents
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val keptChunks = Curation.chunkDocs(
      docs.filter(col("doc_id").isin(capDocs.toSeq: _*))
        .select(col("doc_id"), col("text")))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pipeChunks = df.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pipeChunks == keptChunks)
    // packing invariant on the composed output: within every shard,
    // pack_id = floor(prefix-sum-before / 512) in unit-key order
    val rows = df.collect().map(r => (r.getAs[String]("shard"),
      r.getAs[Long]("doc_id") * 256 + r.getAs[Int]("chunk_id"),
      r.getAs[Int]("n_tok").toLong, r.getAs[Long]("pack_id")))
    rows.groupBy(_._1).values.foreach { sh =>
      var cum = 0L
      sh.sortBy(_._2).foreach { case (_, _, n, pid) =>
        assert(pid == cum / 512, s"pack id drift at cum=$cum")
        cum += n
      }
    }
    // chunks never exceed the window and cover kept docs fully
    assert(rows.forall(r => r._3 >= 1 && r._3 <= 32))
    df.unpersist()
  }

  test("EP10 engagement pipeline equals its standalone stages") {
    val df = Pipelines.qPipelineEngagement(spark, sfDir)
    val rows = df.collect()
    // stage parity 1: funnel stage equals q_funnel per user (0 for
    // users q_funnel does not cover)
    val funnel = graft.operators.Events.qFunnel(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Int]("stage")).toMap
    rows.foreach { r =>
      assert(r.getAs[Int]("stage") ==
        funnel.getOrElse(r.getAs[Long]("user_id"), 0))
    }
    // stage parity 2: session count equals q_session_gap's sessions
    val sess = graft.operators.Windowed.qSessionGap(spark, sfDir)
      .groupBy("user_id").count().collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") == sess(r.getAs[Long]("user_id")))
    }
    // stage parity 3: cohort equals q_retention's first-touch cohort
    val coh = graft.operators.Events.qRetention(spark, sfDir)
      .filter(col("day_offset") === 0).select("cohort").distinct()
      .collect().map(_.getAs[java.sql.Date](0).toString).toSet
    assert(rows.map(_.getAs[java.sql.Date]("cohort").toString)
      .toSet == coh)
    // every user appears exactly once with consistent counts
    assert(rows.map(_.getAs[Long]("user_id")).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("active_days"))
      assert(r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events"))
    }
  }

  test("EP10 plans two minimal user shuffles and a broadcast assembly") {
    val p = Pipelines.qPipelineEngagement(spark, sfDir)
      .queryExecution.executedPlan.toString
    // one user_id exchange per branch, nothing else hash-shuffles —
    // the aggregates (incl. the countDistinct expansion) all ride
    // their branch's partitioning
    val fresh = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(fresh == 2, s"expected the two branch shuffles, got $fresh:\n" +
      p.take(3000))
    // the funnel branch's event-type filter reaches its scan, so its
    // exchange carries only funnel rows
    assert(p.contains("In(event_type") || p.contains("in(event_type"),
      s"funnel filter not pushed:\n${p.take(3000)}")
    // user-dimension-sized funnel frame broadcasts back; no third
    // shuffle for the assembly join
    assert(p.contains("BroadcastHashJoin"))
  }

  test("EP11 landing gate equals its standalone quality stages") {
    val rows = Pipelines.qPipelineLanding(spark, sfDir).collect()
      .map(r => r.getAs[String]("check") ->
        (r.getAs[Double]("metric"), r.getAs[Double]("threshold"),
          r.getAs[Boolean]("pass"))).toMap
    // null checks mirror the profiling report
    graft.operators.Relational.qProfile(spark, sfDir).collect()
      .foreach { p =>
        val (m, th, pass) = rows(s"nulls:${p.getAs[String]("column")}")
        assert(m == p.getAs[Long]("n_nulls").toDouble && th == 0.0)
        assert(pass == (m <= 0.0))
      }
    // orphan checks mirror the RI audit
    graft.operators.Joins.qRiAudit(spark, sfDir).collect().foreach { a =>
      val (m, _, pass) = rows(s"orphans:${a.getAs[String]("relation")}")
      assert(m == a.getAs[Long]("n_orphans").toDouble)
      assert(pass == (m <= 0.0))
    }
    // outlier rates mirror a recount over the standalone outlier query
    val outl = graft.operators.Events.qOutliers(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Boolean]("is_outlier"))
    outl.groupBy(_._1).foreach { case (t, fs) =>
      val (m, th, pass) = rows(s"outlier_rate:$t")
      assert(m == fs.count(_._2).toDouble / fs.length && th == 0.05)
      assert(pass == (m <= 0.05))
    }
    // the generated data is referentially clean: every gate passes
    // except possibly outlier rates
    assert(rows.filter(_._1.startsWith("nulls:")).values.forall(_._3))
    assert(rows.filter(_._1.startsWith("orphans:")).values.forall(_._3))
    assert(rows.keys.count(_.startsWith("outlier_rate:")) > 0)
    // the gate reads only null counts from the profiling surface, so
    // its plan must NOT pay the exact-distinct Expand (r11 plan trim)
    val q = Pipelines.qPipelineLanding(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Expand"), plan.take(2000))
  }
}
