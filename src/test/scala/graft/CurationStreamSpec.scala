package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Components, Curation, TextOps}
import graft.streaming.Streams

/** The corpus-intake streaming duals: the row-local curation flags and
  * the stream-static near-dup check against the published index must
  * produce, under micro-batched `readStream`, exactly what the batch
  * path produces on the same documents. */
class CurationStreamSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def tmp(tag: String): String =
    Files.createTempDirectory(tag).toString

  private def words(n: Int, seed: Int): Seq[String] =
    (0 until n).map(i => s"w${(i * 31 + seed * 7919) % 100000}")

  private def runStream(transform: DataFrame => DataFrame,
      input: String, out: String): Unit = {
    val q = transform(
      spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", 1).json(input))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", tmp("graft_intake_cp"))
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("streaming curation flags equal the batch flags on the same docs") {
    import spark.implicits._
    val input = tmp("graft_cur_stream_in")
    Seq((1L, "a a a b"), (2L, ("dup " * 30).trim))
      .toDF("doc_id", "text").write.mode("append").json(input)
    Seq((3L, words(40, 3).mkString(" ")), (4L, "solo"))
      .toDF("doc_id", "text").write.mode("append").json(input)
    val out = tmp("graft_cur_stream_out")
    runStream(Streams.curationFlags, input, out)
    val streamed = spark.read.parquet(out)
    val batch = Curation.curationFlags(
      spark.read.schema(docSchema).json(input))
    assert(streamed.count() == 4)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("streaming classifier intake equals the batch scorer; OOV → none") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val modelPath = tmp("graft_clf_model")
    TextOps.publishClassifier(spark, docs, 2000, modelPath)
    // stream a real slice of the corpus plus one all-OOV arrival
    val sample = docs.select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(25).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = tmp("graft_clf_in")
    sample.take(12).toSeq.toDF("doc_id", "text")
      .write.mode("append").json(input)
    (sample.drop(12).toSeq :+ ((999999L, "zzzq qqzz")))
      .toDF("doc_id", "text").write.mode("append").json(input)
    val out = tmp("graft_clf_out")
    runStream(Streams.classifyIntake(spark, _, modelPath), input, out)
    val streamed = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    // the model was fit on the same corpus the batch query fits on, so
    // every corpus doc must score IDENTICALLY (same exact-long sums,
    // same one division, same argmax order)
    val batch = TextOps.qClassifySource(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    sample.foreach { case (id, _) =>
      assert(streamed(id) == batch(id), s"doc $id: " +
        s"stream=${streamed(id)} batch=${batch(id)}")
    }
    // the all-OOV arrival takes the batch's fallback contract
    assert(streamed(999999L) == (("none", 0.0)))
    assert(streamed.size == 26)
  }

  test("chunking streams unchanged: micro-batched chunks equal the batch cut") {
    import spark.implicits._
    // chunkDocs is a row-local expand, so the SAME shared core runs
    // under readStream in append mode with no adaptation
    val input = tmp("graft_chunk_stream_in")
    Seq((1L, words(40, 1).mkString(" ")), (2L, "short doc"))
      .toDF("doc_id", "text").write.mode("append").json(input)
    Seq((3L, words(70, 2).mkString(" ")))
      .toDF("doc_id", "text").write.mode("append").json(input)
    val out = tmp("graft_chunk_stream_out")
    runStream(df => Curation.chunkDocs(df), input, out)
    val streamed = spark.read.parquet(out)
    val batch = Curation.chunkDocs(
      spark.read.schema(docSchema).json(input))
    assert(streamed.count() == batch.count() && streamed.count() > 3)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("quantization streams unchanged over an embedding stream") {
    import spark.implicits._
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val input = tmp("graft_quant_stream_in")
    Seq((1L, Seq(0.1f, -0.4f, 0.9f)), (2L, Seq(0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding").write.mode("append").json(input)
    val out = tmp("graft_quant_stream_out")
    val q = graft.operators.Vectors.quantCodes(
      spark.readStream.schema(vecSchema).json(input))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", tmp("graft_quant_stream_ck"))
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(out)
    val batch = graft.operators.Vectors.quantCodes(
      spark.read.schema(vecSchema).json(input))
    assert(streamed.count() == 2)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("streaming near-dup intake flags arrivals against the published index") {
    import spark.implicits._
    // published base: two long distinctive documents
    val baseA = words(200, 1)
    val baseB = words(200, 2)
    val base = Seq((10L, baseA.mkString(" ")), (20L, baseB.mkString(" ")))
      .toDF("doc_id", "text")
    val staged = TextOps.stageDocs(base)
    // two micro-batches of arrivals: near-dups of each base doc
    // (~5/200 trailing tokens changed, J ≈ 0.93) plus a clean doc
    val input = tmp("graft_intake_in")
    Seq((101L, (baseA.take(195) ++ words(5, 9).map("q" + _)).mkString(" ")),
      (102L, words(200, 7).map("z" + _).mkString(" ")))
      .toDF("doc_id", "text").write.mode("append").json(input)
    Seq((201L, (baseB.take(195) ++ words(5, 11).map("r" + _)).mkString(" ")))
      .toDF("doc_id", "text").write.mode("append").json(input)
    val out = tmp("graft_intake_out")
    runStream(Streams.nearDupIntake(staged, _), input, out)
    val flagged = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"),
        r.getAs[Double]("jaccard")))
    assert(flagged.map(f => (f._1, f._2)).toSet == Set((101L, 10L), (201L, 20L)),
      s"expected exactly the two planted near-dup pairs, got ${flagged.toSeq}")
    assert(flagged.forall(_._3 >= 0.8))
    // micro-batched streaming equals one batch pass over all arrivals
    val batchPairs = TextOps.intakePairs(staged,
      spark.read.schema(docSchema).json(input))
    val streamedDf = spark.read.parquet(out)
    assert(streamedDf.exceptAll(batchPairs).isEmpty &&
      batchPairs.exceptAll(streamedDf).isEmpty)
  }

  test("label extension sink survives a kill + restart; equals batch dual") {
    import spark.implicits._
    // base docs 10 and 20: similar but BELOW the 0.8 threshold (~0.72),
    // so the published base label map is empty and a later BRIDGING
    // arrival must merge their components through star-edge extension
    val a = words(200, 21)
    val b = a.take(170) ++ words(30, 22).map("v" + _)
    val base = Seq((10L, a.mkString(" ")), (20L, b.mkString(" ")))
      .toDF("doc_id", "text")
    val staged = TextOps.stageDocs(base).localCheckpoint(true)
    val labelsRoot = tmp("graft_labels_root")
    Components.publishLabels(spark,
      Components.labelComponents(
        TextOps.pairsCarriedStaged(staged).select(col("id_a"), col("id_b"))),
      labelsRoot, "base")
    assert(Components.currentLabels(spark, labelsRoot).isEmpty)

    val input = tmp("graft_label_in")
    val cp = tmp("graft_label_cp")
    def run(): Unit = {
      val q = Streams.extendLabelsSink(staged, labelsRoot,
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", 1).json(input), cp)
      try q.processAllAvailable() finally q.stop()
    }
    // batch 1: near-dup of base 10 only
    Seq((101L, (a.take(195) ++ words(5, 23).map("q" + _)).mkString(" ")))
      .toDF("doc_id", "text").write.mode("append").json(input)
    run() // then KILLED (stopped) mid-stream
    val afterB1 = Components.currentLabels(spark, labelsRoot).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterB1 == Set((10L, 10L), (101L, 10L)))
    // batch 2 arrives while the query is down: the BRIDGE — within 0.8
    // of BOTH base docs (halfway between their variant tails)
    Seq((301L, (a.take(185) ++ words(15, 22).map("v" + _)).mkString(" ")))
      .toDF("doc_id", "text").write.mode("append").json(input)
    run() // restart from the same checkpoint: processes ONLY batch 2
    val finalLabels = Components.currentLabels(spark, labelsRoot).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the bridge merges {10, 101} and {20} into one min-10 component
    assert(finalLabels ==
      Set((10L, 10L), (20L, 10L), (101L, 10L), (301L, 10L)))
    // batch dual: one extension with ALL arrivals' pairs
    val allPairs = TextOps.intakePairs(staged,
        spark.read.schema(docSchema).json(input))
      .select(col("doc_id").as("id_a"), col("dup_of").as("id_b"))
    val dual = Components.extendLabels(
        spark.read.parquet(s"$labelsRoot/base"), allPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(finalLabels == dual)
    // idempotence (what makes a crash-replayed batch exactly-once):
    // re-extending the final map with the same pairs is a fixed point
    val again = Components.extendLabels(
        Components.currentLabels(spark, labelsRoot), allPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == finalLabels)
  }

  test("streaming simhash intake flags arrivals against the published " +
      "rep index; equals the batch cross probe") {
    import spark.implicits._
    // base: a duplicate group (10, 11 identical) and a distinct doc 20,
    // so the published index holds REPS {10, 20}, not all docs
    val a = words(200, 31).mkString(" ")
    val b = words(200, 32).map("u" + _).mkString(" ")
    val base = Seq((10L, a), (11L, a), (20L, b)).toDF("doc_id", "text")
    val ops = TextOps
    val (_, reps) = ops.simhashCollapse(ops.simhashMd5Halves(base))
    val rp = tmp("graft_si_stream_idx")
    reps.write.mode("overwrite").parquet(rp)
    val bPlan = ops.simhashAutoPlan(reps, 3)
    graft.sources.Markers.write(spark, rp, "_graft_simhash_b",
      bPlan.toString)
    val (keyedReps, bLoaded) = ops.simhashIntakeIndex(spark, rp)
    // two micro-batches: an exact dup of the group (Hamming 0 vs rep
    // 10), an unrelated arrival, then an exact dup of 20
    val input = tmp("graft_si_stream_in")
    Seq((101L, a), (102L, words(200, 33).map("z" + _).mkString(" ")))
      .toDF("doc_id", "text").write.mode("append").json(input)
    Seq((201L, b)).toDF("doc_id", "text").write.mode("append").json(input)
    val out = tmp("graft_si_stream_out")
    runStream(Streams.simhashIntake(keyedReps, bLoaded, _), input, out)
    val flagged = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"),
        r.getAs[Int]("hamming"))).toSet
    assert(flagged == Set((101L, 10L, 0), (201L, 20L, 0)),
      s"expected exactly the planted dup flags, got $flagged")
    // micro-batched streaming equals one batch pass over all arrivals
    val batchPairs = ops.simhashIntakePairs(keyedReps,
      spark.read.schema(docSchema).json(input), bLoaded)
    val streamedDf = spark.read.parquet(out)
    assert(streamedDf.exceptAll(batchPairs).isEmpty &&
      batchPairs.exceptAll(streamedDf).isEmpty)
  }

  test("simhash label sink survives kill+restart; an adversarial " +
      "identical-text mega-batch extends O(k) and exactly-once") {
    import spark.implicits._
    val a = words(200, 41).mkString(" ")
    val b = words(200, 42).map("v" + _).mkString(" ")
    val base = Seq((10L, a), (11L, a), (20L, b)).toDF("doc_id", "text")
    val ops = TextOps
    val (identity, reps) = ops.simhashCollapse(ops.simhashMd5Halves(base))
    val rp = tmp("graft_sl_idx")
    reps.write.mode("overwrite").parquet(rp)
    val bPlan = ops.simhashAutoPlan(reps, 3)
    graft.sources.Markers.write(spark, rp, "_graft_simhash_b",
      bPlan.toString)
    val (keyedReps, bLoaded) = ops.simhashIntakeIndex(spark, rp)
    val labelsRoot = tmp("graft_sl_labels")
    Components.publishLabels(spark,
      Components.labelComponents(identity), labelsRoot, "base")
    val input = tmp("graft_sl_in")
    val cp = tmp("graft_sl_cp")
    def run(): Unit = {
      val q = Streams.simhashLabelsSink(keyedReps, bLoaded, labelsRoot,
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", 1).json(input), cp)
      try q.processAllAvailable() finally q.stop()
    }
    // batch 1: one exact dup of the {10, 11} group
    Seq((101L, a)).toDF("doc_id", "text").write.mode("append").json(input)
    run() // then KILLED (stopped)
    val afterB1 = Components.currentLabels(spark, labelsRoot).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterB1 == Set((10L, 10L), (11L, 10L), (101L, 10L)))
    // batch 2 arrives while the query is down: the ADVERSARIAL shape —
    // 300 IDENTICAL-text arrivals (a boilerplate cluster landing in one
    // trigger); the stream-static probe emits exactly ONE flag per
    // arrival (vs its rep), never the within-batch quadratic pair set
    val mega = (0 until 300).map(i => (5000L + i, b))
    mega.toDF("doc_id", "text").write.mode("append").json(input)
    run() // restart from the checkpoint: processes ONLY batch 2
    val finalLabels = Components.currentLabels(spark, labelsRoot)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantMega = mega.map { case (id, _) => (id, 20L) }.toSet
    assert(finalLabels ==
      afterB1 ++ Set((20L, 20L)) ++ wantMega)
    // batch dual + idempotence (the exactly-once argument): one
    // extension with ALL arrivals' pairs lands on the same map, and
    // re-extending is a fixed point — a crash-replayed batch cannot
    // move the published content
    val allPairs = ops.simhashIntakePairs(keyedReps,
        spark.read.schema(docSchema).json(input), bLoaded)
      .select(col("doc_id").as("id_a"), col("dup_of").as("id_b"))
    val dual = Components.extendLabels(
        spark.read.parquet(s"$labelsRoot/base"), allPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(finalLabels == dual)
    val again = Components.extendLabels(
        Components.currentLabels(spark, labelsRoot), allPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == finalLabels)
  }

  test("streaming edit-distance intake flags arrivals against the " +
      "published segment index; equals the batch cross probe") {
    import spark.implicits._
    // base heads are the first 30 chars; plant one arrival 2 edits off
    // base 10's head, one exact dup of base 20, one unrelated
    val t10 = "abcdefghij klmnopqrst uvwxyz" + " tail " + words(40, 51).mkString(" ")
    val t20 = "zyxwvutsrq ponmlkjihg fedcba" + " tail " + words(40, 52).mkString(" ")
    val base = Seq((10L, t10), (20L, t20)).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val keyed = TextOps.editKeyedHeads(base, 30)
    val ip = tmp("graft_ei_idx")
    TextOps.editBuildRows(keyed, 3)
      .select(col("doc_id"), col("lang"), col("head"), col("len"),
        col("kseg.idx").as("idx"), col("kseg.seg").as("seg"))
      .write.mode("overwrite").parquet(ip)
    val staged = TextOps.editIntakeIndex(spark, ip)
    val input = tmp("graft_ei_in")
    Seq((101L, "abcXefghij klmnopQrst uvwxyz" + " tail etc"),
      (102L, words(40, 53).map("q" + _).mkString(" ")))
      .toDF("doc_id", "text").write.mode("append").json(input)
    Seq((201L, t20)).toDF("doc_id", "text").write.mode("append").json(input)
    val out = tmp("graft_ei_out")
    runStream(df => Streams.editIntake(staged,
      df.withColumn("lang", lit("en"))), input, out)
    val flagged = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"),
        r.getAs[Int]("dist"))).toSet
    assert(flagged == Set((101L, 10L, 2), (201L, 20L, 0)),
      s"expected exactly the planted near-dup flags, got $flagged")
    // micro-batched streaming equals one batch pass over all arrivals
    val batchFlags = TextOps.editCrossFlags(staged,
      TextOps.editKeyedHeads(spark.read.schema(docSchema).json(input)
        .withColumn("lang", lit("en")), 30), 3)
    val streamedDf = spark.read.parquet(out)
    assert(streamedDf.exceptAll(batchFlags).isEmpty &&
      batchFlags.exceptAll(streamedDf).isEmpty)
  }

  test("edit label sink survives kill+restart; an adversarial " +
      "identical-head mega-batch extends O(k) and exactly-once") {
    import spark.implicits._
    val t10 = "abcdefghij klmnopqrst uvwxyz" + " x " + words(40, 61).mkString(" ")
    val t20 = "zyxwvutsrq ponmlkjihg fedcba" + " x " + words(40, 62).mkString(" ")
    val base = Seq((10L, t10), (20L, t20)).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val ip = tmp("graft_el_idx")
    TextOps.editBuildRows(TextOps.editKeyedHeads(base, 30), 3)
      .select(col("doc_id"), col("lang"), col("head"), col("len"),
        col("kseg.idx").as("idx"), col("kseg.seg").as("seg"))
      .write.mode("overwrite").parquet(ip)
    val staged = TextOps.editIntakeIndex(spark, ip)
    val labelsRoot = tmp("graft_el_labels")
    Components.publishLabels(spark,
      Components.labelComponents(
        spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")),
      labelsRoot, "base")
    val input = tmp("graft_el_in")
    val cp = tmp("graft_el_cp")
    def run(): Unit = {
      val q = Streams.editLabelsSink(staged, labelsRoot,
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", 1).json(input)
          .withColumn("lang", lit("en")), cp)
      try q.processAllAvailable() finally q.stop()
    }
    // batch 1: one near-dup of base 10 (2 edits inside the head)
    Seq((101L, "abcXefghij klmnopQrst uvwxyz" + " y"))
      .toDF("doc_id", "text").write.mode("append").json(input)
    run() // then KILLED
    val afterB1 = Components.currentLabels(spark, labelsRoot).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterB1 == Set((10L, 10L), (101L, 10L)))
    // batch 2 while down: 200 arrivals sharing base 20's EXACT head
    // (a re-crawled boilerplate wave) — one flag per arrival, O(k)
    val mega = (0 until 200).map(i => (7000L + i, t20))
    mega.toDF("doc_id", "text").write.mode("append").json(input)
    run() // restart: processes ONLY batch 2
    val finalLabels = Components.currentLabels(spark, labelsRoot)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(finalLabels == afterB1 ++ Set((20L, 20L)) ++
      mega.map { case (id, _) => (id, 20L) }.toSet)
    // batch dual + idempotent re-extension (exactly-once)
    val allPairs = TextOps.editCrossFlags(staged,
        TextOps.editKeyedHeads(spark.read.schema(docSchema).json(input)
          .withColumn("lang", lit("en")), 30), 3)
      .select(col("doc_id").as("id_a"), col("dup_of").as("id_b"))
    val dual = Components.extendLabels(
        spark.read.parquet(s"$labelsRoot/base"), allPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(finalLabels == dual)
    val again = Components.extendLabels(
        Components.currentLabels(spark, labelsRoot), allPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == finalLabels)
  }

  test("streaming IVF intake routes arrivals to fit buckets; probes serve the union") {
    import spark.implicits._
    import graft.operators.Vectors
    def vec(id: Long, c: Int): Seq[Double] =
      (0 until 64).map { j =>
        (if (j == c) 1.0 else 0.0) + 0.05 * math.sin(id * 64.0 + j)
      }
    def unitFrame(rows: Seq[(Long, Seq[Double])]) =
      rows.toDF("vec_id", "embedding")
        .select(col("vec_id"), lit("x").as("label"),
          graft.functions.VectorFunctions.unitv(col("embedding")).as("u"))
    // offline fit on the base corpus (10 clusters × 20 members)
    val baseRows = for { c <- 0 until 10; i <- 0 until 20 }
      yield { val id = 10L + c * 20 + i; (id, vec(id, c)) }
    val baseU = unitFrame(baseRows)
    val cents = Vectors.trainCentroids(baseU, 14, Vectors.ivfIters)
    val baseDir = tmp("graft_ivf_base")
    baseU.withColumn("bucket", Vectors.ivfBucket(cents))
      .write.partitionBy("bucket").mode("overwrite").parquet(baseDir)
    val model = Vectors.IvfModel(14, cents, baseDir)
    // streaming intake of new arrivals against the published model
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("label", StringType),
      StructField("embedding", ArrayType(DoubleType))))
    val (input, cp, intakeDir) =
      (tmp("graft_ivf_in"), tmp("graft_ivf_cp"), tmp("graft_ivf_intake"))
    def run(): Unit = {
      val q = Streams.ivfIntake(intakeDir, cents,
        spark.readStream.schema(embSchema)
          .option("maxFilesPerTrigger", 1).json(input), cp)
      try q.processAllAvailable() finally q.stop()
    }
    def dropVecs(rows: Seq[(Long, Seq[Double])]): Unit =
      rows.map { case (id, e) => (id, "x", e) }
        .toDF("vec_id", "label", "embedding")
        .coalesce(1).write.mode("append").json(input)
    // arrivals are near-copies of each cluster's query vector — both a
    // realistic re-crawl shape and a guarantee they MUST surface in the
    // query's top-5 once the intake layout serves probes
    dropVecs((0 until 10).map(c => (300L + c, vec(c.toLong, c))))
    run() // then KILLED
    // second wave lands while the query is down; includes a zero
    // vector that must quarantine (NULL u) at intake
    dropVecs((0 until 10).map(c => (400L + c, vec(c.toLong, c))) :+
      (999L, Seq.fill(64)(0.0)))
    run() // restart: processes only the second file
    run() // no new data: exactly-once, nothing re-commits
    val intake = spark.read.parquet(intakeDir)
    assert(intake.count() == 20) // 21 arrivals − 1 quarantined zero
    // assignment parity: streamed buckets equal the batch quantizer
    val got = intake.select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = unitFrame((300 until 310).map(i => (i.toLong, vec(i - 300L, i - 300))) ++
        (400 until 410).map(i => (i.toLong, vec(i - 400L, i - 400))))
      .withColumn("bucket", Vectors.ivfBucket(cents))
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)
    // probes over base ∪ intake equal probes over one merged layout
    val mergedDir = tmp("graft_ivf_merged")
    spark.read.parquet(baseDir)
      .select(col("vec_id"), col("label"), col("u"), col("bucket"))
      .unionByName(intake
        .select(col("vec_id"), col("label"), col("u"), col("bucket")))
      .write.partitionBy("bucket").mode("overwrite").parquet(mergedDir)
    val queries = unitFrame((0 until 10).map(c => (c.toLong, vec(c.toLong, c))))
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("q_id"),
      r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"),
      r.getAs[Double]("cosine"))
    val viaUnion = Vectors.probeTopkWithIntake(spark, model, intakeDir,
      queries).collect().map(key).toSeq
    val viaMerged = Vectors.probeTopk(spark,
      Vectors.IvfModel(14, cents, mergedDir), queries)
      .collect().map(key).toSeq
    assert(viaUnion == viaMerged)
    // the intake actually surfaces in probe results: every query's
    // cluster got a 300- and 400-series near neighbor
    val neighbors = viaUnion.groupBy(_._1).view
      .mapValues(_.map(_._3).toSet).toMap
    assert((0L until 10L).forall(q =>
      neighbors(q).exists(_ >= 300L)), neighbors.toString)
  }

  test("streaming compaction sink survives kill + restart: waves " +
      "retire, re-probe, split bridges, and equal the full recompute") {
    import spark.implicits._
    // Seed corpus (minhash family, carried-vs-joinback decided by the
    // fit): docs 1,2 a true near-dup pair; doc 3 unrelated; doc 4's
    // SEED text is a near-dup of 3 (stale crawl) while its TRUE text
    // joins the {1,2} group; doc 5's SEED text bridges INTO doc 1
    // while its TRUE text is unrelated — so wave 1 (doc 4) must retire
    // stale pairs and re-join, and wave 2 (doc 5) must SPLIT a
    // component by retiring a bridge (the failure mode plain label
    // extension cannot express and compaction exists for).
    val a = words(200, 31)
    val c = words(200, 33).map("z" + _)
    def doc(base: Seq[String], keep: Int, seed: Int, tag: String) =
      (base.take(keep) ++ words(200 - keep, seed).map(tag + _))
        .mkString(" ")
    val seedDocs = Seq(
      (1L, a.mkString(" ")),
      (2L, doc(a, 190, 41, "q")),
      (3L, c.mkString(" ")),
      (4L, doc(c, 190, 42, "r")), // stale: near-dup of 3
      (5L, doc(a, 185, 43, "s"))) // stale: near-dup of 1 (bridge-ish)
      .toDF("doc_id", "text")
    val trueDoc4 = doc(a, 188, 44, "t") // true: joins {1,2}
    val trueDoc5 = words(200, 45).map("u" + _).mkString(" ") // unrelated
    val root = tmp("graft_dedup_root")
    TextOps.seedDedupState(spark, seedDocs, root)
    // seed sanity: {1,2,5} one component, {3,4} another
    def labels(): Set[(Long, Long)] =
      spark.read.parquet(root + "/" + graft.sources.Markers.read(
          spark, root, TextOps.dedupCurrentMarker) + "/labels")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels() ==
      Set((1L, 1L), (2L, 1L), (5L, 1L), (3L, 3L), (4L, 3L)))

    val input = tmp("graft_compact_in")
    val cp = tmp("graft_compact_cp")
    def run(): Unit = {
      val q = Streams.dedupCompactSink(root,
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", 1).json(input), cp,
        retainVersions = 2)
      try q.processAllAvailable() finally q.stop()
    }
    // wave 1: doc 4 re-crawled with its true text
    Seq((4L, trueDoc4)).toDF("doc_id", "text")
      .write.mode("append").json(input)
    run() // then KILLED
    assert(labels() == Set((1L, 1L), (2L, 1L), (4L, 1L), (5L, 1L)),
      s"wave 1 must move doc 4 from {3}'s component to {1,2}: ${labels()}")
    // wave 2 arrives while the query is down: doc 5's true text is
    // unrelated — its stale bridge pairs must retire and it becomes a
    // singleton (absent from the sparse label map)
    Seq((5L, trueDoc5)).toDF("doc_id", "text")
      .write.mode("append").json(input)
    run() // restart from the same checkpoint: processes ONLY wave 2
    assert(labels() == Set((1L, 1L), (2L, 1L), (4L, 1L)),
      s"wave 2 must retire doc 5's bridge pairs: ${labels()}")
    // the continuously-maintained artifact equals the FULL RECOMPUTE
    // over the true corpus — the batch compaction's own oracle claim
    val trueCorpus = Seq(
      (1L, a.mkString(" ")), (2L, doc(a, 190, 41, "q")),
      (3L, c.mkString(" ")), (4L, trueDoc4), (5L, trueDoc5))
      .toDF("doc_id", "text")
    val full = Components.labelComponents(
        TextOps.minhashPairs(trueCorpus).select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels() == full)
    // and the published index itself is repaired: re-staging the true
    // corpus from scratch pairs identically to probing the served index
    val served = spark.read.parquet(root + "/" + graft.sources.Markers
      .read(spark, root, TextOps.dedupCurrentMarker) + "/staged")
    val servedPairs = TextOps.pairsJoinBackStaged(served)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val scratchPairs = TextOps.pairsJoinBackStaged(
        TextOps.stageDocs(trueCorpus).localCheckpoint(true))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(servedPairs == scratchPairs && servedPairs.nonEmpty)
  }

  test("simhash streaming compaction survives kill + restart and " +
      "equals the full recompute after every wave") {
    import spark.implicits._
    // exact-duplicate texts pin connectivity through Hamming-0
    // identity stars (immune to blocking subtleties): doc 4's stale
    // text copies doc 3, its true text copies doc 1 — wave 1 must
    // move it. doc 5's stale text copies doc 1 (a member of {1,2}),
    // its true text is unique — wave 2 must retire the stale
    // signature and let it fall out as a singleton.
    val t1 = words(80, 61).mkString(" ")
    val t3 = words(80, 63).map("z" + _).mkString(" ")
    val seedDocs = Seq((1L, t1), (2L, t1), (3L, t3), (4L, t3), (5L, t1))
      .toDF("doc_id", "text")
    val root = tmp("graft_simhash_root")
    TextOps.seedSimhashRoot(spark, seedDocs, root)
    def labels(): Set[(Long, Long)] =
      spark.read.parquet(root + "/" + graft.sources.Markers.read(
          spark, root, TextOps.dedupCurrentMarker) + "/labels")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels() == Set((1L, 1L), (2L, 1L), (5L, 1L), (3L, 3L),
      (4L, 3L)), labels().toString)
    val b = graft.sources.Markers.read(spark, root,
      "_graft_simhash_b").toInt
    def fullRecompute(docs: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long)] = {
      val (identity, reps) =
        TextOps.simhashCollapse(TextOps.simhashMd5Halves(docs))
      Components.labelComponents(identity.unionByName(
          TextOps.simhashSigPairs(reps, b)
            .select(col("doc_id_a").as("id_a"),
              col("doc_id_b").as("id_b"))))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val input = tmp("graft_simhash_in")
    val cp = tmp("graft_simhash_cp")
    def run(): Unit = {
      val q = Streams.simhashCompactSink(root,
        spark.readStream.schema(docSchema)
          .option("maxFilesPerTrigger", 1).json(input), cp,
        retainVersions = 2)
      try q.processAllAvailable() finally q.stop()
    }
    Seq((4L, t1)).toDF("doc_id", "text")
      .write.mode("append").json(input)
    run() // then KILLED
    val afterW1 = Seq((1L, t1), (2L, t1), (3L, t3), (4L, t1), (5L, t1))
      .toDF("doc_id", "text")
    assert(labels() == fullRecompute(afterW1), labels().toString)
    assert(labels().contains((4L, 1L)), "wave 1 must move doc 4")
    // wave 2 lands while the query is down
    val t5true = words(80, 65).map("u" + _).mkString(" ")
    Seq((5L, t5true)).toDF("doc_id", "text")
      .write.mode("append").json(input)
    run() // restart: processes ONLY wave 2
    val trueCorpus = Seq((1L, t1), (2L, t1), (3L, t3), (4L, t1),
      (5L, t5true)).toDF("doc_id", "text")
    assert(labels() == fullRecompute(trueCorpus), labels().toString)
    assert(!labels().exists(_._1 == 5L),
      "wave 2 must retire doc 5's stale duplicate signature")
  }

  test("edit-distance streaming compaction survives kill + restart " +
      "and equals the full recompute after every wave") {
    import spark.implicits._
    val editSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("text", StringType)))
    // heads within edit distance 3 cluster; doc 4's stale head sits
    // near doc 3, its true head near doc 1; doc 5's stale head is a
    // member of {1,2} and its true head is unrelated (bridge retire)
    val seedDocs = Seq(
      (1L, "en", "kilimanjaro base station alpha"),
      (2L, "en", "kilimanjaro base station alphx"),
      (3L, "en", "zephyr quartz voltmeter jungle"),
      (4L, "en", "zephyr quartz voltmeter jungly"),
      (5L, "en", "kilimanjaro base station alphq"))
      .toDF("doc_id", "lang", "text")
    val root = tmp("graft_edit_root")
    TextOps.seedEditRoot(spark, seedDocs, root)
    def labels(): Set[(Long, Long)] =
      spark.read.parquet(root + "/" + graft.sources.Markers.read(
          spark, root, TextOps.dedupCurrentMarker) + "/labels")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels() == Set((1L, 1L), (2L, 1L), (5L, 1L), (3L, 3L),
      (4L, 3L)), labels().toString)
    def fullRecompute(docs: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long)] =
      Components.labelComponents(
          TextOps.editDistancePairs(docs, 30, 3)
            .select(col("doc_id_a").as("id_a"),
              col("doc_id_b").as("id_b")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val input = tmp("graft_edit_in")
    val cp = tmp("graft_edit_cp")
    def run(): Unit = {
      val q = Streams.editCompactSink(root,
        spark.readStream.schema(editSchema)
          .option("maxFilesPerTrigger", 1).json(input), cp,
        retainVersions = 2)
      try q.processAllAvailable() finally q.stop()
    }
    // wave 1: doc 4 re-crawled, new head joins {1,2}
    Seq((4L, "en", "kilimanjaro base station alpha"))
      .toDF("doc_id", "lang", "text").write.mode("append").json(input)
    run() // then KILLED
    val afterW1 = Seq(
      (1L, "en", "kilimanjaro base station alpha"),
      (2L, "en", "kilimanjaro base station alphx"),
      (3L, "en", "zephyr quartz voltmeter jungle"),
      (4L, "en", "kilimanjaro base station alpha"),
      (5L, "en", "kilimanjaro base station alphq"))
      .toDF("doc_id", "lang", "text")
    assert(labels() == fullRecompute(afterW1), labels().toString)
    assert(labels().contains((4L, 1L)), "wave 1 must move doc 4")
    // wave 2 lands while the query is down: doc 5 re-crawled away
    Seq((5L, "en", "totally uncorrelated replacement"))
      .toDF("doc_id", "lang", "text").write.mode("append").json(input)
    run() // restart: processes ONLY wave 2
    val trueCorpus = Seq(
      (1L, "en", "kilimanjaro base station alpha"),
      (2L, "en", "kilimanjaro base station alphx"),
      (3L, "en", "zephyr quartz voltmeter jungle"),
      (4L, "en", "kilimanjaro base station alpha"),
      (5L, "en", "totally uncorrelated replacement"))
      .toDF("doc_id", "lang", "text")
    assert(labels() == fullRecompute(trueCorpus), labels().toString)
    assert(!labels().exists(_._1 == 5L),
      "wave 2 must retire doc 5's stale bridge pairs")
  }

  test("embedding streaming compaction survives kill + restart and " +
      "equals the full recompute after every wave") {
    import spark.implicits._
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def vec(hot: Int, mix: Int = -1, w: Float = 0.0f): Seq[Float] =
      (0 until 64).map(i =>
        if (i == hot) 1.0f else if (i == mix) w else 0.0f)
    // {1,2} a >0.99-cosine pair on axis 0; {3,4} on axis 2 (doc 4
    // stale); doc 5's stale vector rides axis 0 (member of {1,2});
    // wave 1 re-embeds 4 onto axis 0, wave 2 re-embeds 5 onto axis 7
    val seedVecs = Seq(
      (1L, vec(0)), (2L, vec(0, 1, 0.1f)), (3L, vec(2)),
      (4L, vec(2, 3, 0.1f)), (5L, vec(0, 4, 0.1f)))
      .toDF("vec_id", "embedding")
    val root = tmp("graft_embed_root")
    graft.operators.Vectors.seedEmbedRoot(spark, seedVecs, root)
    def labels(): Set[(Long, Long)] =
      spark.read.parquet(root + "/" + graft.sources.Markers.read(
          spark, root, TextOps.dedupCurrentMarker) + "/labels")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labels() == Set((1L, 1L), (2L, 1L), (5L, 1L), (3L, 3L),
      (4L, 3L)), labels().toString)
    def fullRecompute(vecs: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long)] =
      Components.labelComponents(
          graft.operators.Vectors.lshVerifiedPairsOver(vecs)
            .select(col("id_a"), col("id_b")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val input = tmp("graft_embed_in")
    val cp = tmp("graft_embed_cp")
    def run(): Unit = {
      val q = Streams.embedCompactSink(root,
        spark.readStream.schema(vecSchema)
          .option("maxFilesPerTrigger", 1).json(input), cp,
        retainVersions = 2)
      try q.processAllAvailable() finally q.stop()
    }
    Seq((4L, vec(0, 5, 0.1f))).toDF("vec_id", "embedding")
      .write.mode("append").json(input)
    run() // then KILLED
    val afterW1 = Seq((1L, vec(0)), (2L, vec(0, 1, 0.1f)), (3L, vec(2)),
      (4L, vec(0, 5, 0.1f)), (5L, vec(0, 4, 0.1f)))
      .toDF("vec_id", "embedding")
    assert(labels() == fullRecompute(afterW1), labels().toString)
    assert(labels().contains((4L, 1L)), "wave 1 must move vec 4")
    Seq((5L, vec(7))).toDF("vec_id", "embedding")
      .write.mode("append").json(input)
    run() // restart: processes ONLY wave 2
    val trueCorpus = Seq((1L, vec(0)), (2L, vec(0, 1, 0.1f)),
      (3L, vec(2)), (4L, vec(0, 5, 0.1f)), (5L, vec(7)))
      .toDF("vec_id", "embedding")
    assert(labels() == fullRecompute(trueCorpus), labels().toString)
    assert(!labels().exists(_._1 == 5L),
      "wave 2 must retire vec 5's stale pairs")
  }

  test("streaming CDC apply survives a kill + restart; equals the batch merge fold") {
    import spark.implicits._
    val changeSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("op", StringType),
      StructField("text", StringType)))
    val snapRoot = tmp("graft_cdc_snap")
    val input = tmp("graft_cdc_in")
    val cp = tmp("graft_cdc_cp")
    // published base snapshot: docs 1..8
    val base = (1L to 8L).map(i => (i, s"text-$i")).toDF("doc_id", "text")
    Curation.publishSnapshot(spark, base, snapRoot, "base")
    def run(): Unit = {
      val q = Streams.cdcApplySink(snapRoot,
        spark.readStream.schema(changeSchema)
          .option("maxFilesPerTrigger", 1).json(input), cp)
      try q.processAllAvailable() finally q.stop()
    }
    def dropChanges(cs: Seq[(Long, String, Option[String])]): Unit =
      cs.map { case (id, op, t) => (id, op, t.orNull) }
        .toDF("doc_id", "op", "text")
        .coalesce(1).write.mode("append").json(input)
    // batch 1: replace doc 2, delete doc 3, insert doc 100
    dropChanges(Seq((2L, "upsert", Some("text-2-v2")),
      (3L, "delete", None), (100L, "upsert", Some("text-100"))))
    run() // then KILLED (stopped)
    val afterB1 = Curation.currentSnapshot(spark, snapRoot).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(afterB1(2L) == "text-2-v2" && !afterB1.contains(3L) &&
      afterB1(100L) == "text-100" && afterB1.size == 8)
    // batch 2 arrives while the query is down: later-op-wins across
    // batches (doc 100 re-upserted), plus a delete and an insert
    dropChanges(Seq((100L, "upsert", Some("text-100-v2")),
      (1L, "delete", None), (200L, "upsert", Some("text-200"))))
    run() // restart from the same checkpoint: processes ONLY batch 2
    run() // no new data: exactly-once, nothing re-applies
    val got = Curation.currentSnapshot(spark, snapRoot).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = ((4L to 8L).map(i => i -> s"text-$i") ++
      Seq(2L -> "text-2-v2", 100L -> "text-100-v2",
        200L -> "text-200")).toMap
    assert(got == expected)
    // batch dual: the same change files folded sequentially through
    // the SAME core the oracle-green q_cdc_merge declares
    val allFiles = new java.io.File(input).listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.lastModified())
    val dual = allFiles.foldLeft(base) { (snap, f) =>
      Curation.cdcMerge(snap,
        spark.read.schema(changeSchema).json(f.getPath))
    }.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == dual)
    // idempotence (what makes a crash-replayed batch exactly-once):
    // re-merging the final batch onto the final snapshot is a fixed
    // point
    val again = Curation.cdcMerge(
        Curation.currentSnapshot(spark, snapRoot),
        spark.read.schema(changeSchema)
          .json(allFiles.maxBy(_.lastModified()).getPath))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
  }

  test("streaming MV maintenance survives a kill + restart; epoch consistent") {
    import spark.implicits._
    val changeSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("op", StringType),
      StructField("source", StringType),
      StructField("text", StringType)))
    val root = tmp("graft_mv_epoch")
    val input = tmp("graft_mv_in")
    val cp = tmp("graft_mv_cp")
    val base = Seq((1L, "web", "a b"), (2L, "web", "c"),
      (3L, "book", "d e f")).toDF("doc_id", "source", "text")
    Curation.publishEpoch(spark, root, "base", base,
      Curation.sourceRollup(base))
    def run(): Unit = {
      val q = Streams.mvApplySink(root,
        spark.readStream.schema(changeSchema)
          .option("maxFilesPerTrigger", 1).json(input), cp)
      try q.processAllAvailable() finally q.stop()
    }
    def drop(cs: Seq[(Long, String, Option[String], Option[String])]): Unit =
      cs.map { case (id, op, src, t) => (id, op, src.orNull, t.orNull) }
        .toDF("doc_id", "op", "source", "text")
        .coalesce(1).write.mode("append").json(input)
    // batch 1: doc 2 re-crawled LONGER and moved web→book, doc 3
    // deleted (emptying nothing), doc 10 inserted
    drop(Seq((2L, "upsert", Some("book"), Some("c c c")),
      (3L, "delete", None, None),
      (10L, "upsert", Some("web"), Some("x y"))))
    run() // then KILLED (stopped)
    // batch 2 arrives while the query is down: doc 10 re-upserted
    // (later-op-wins across the restart), doc 1 deleted
    drop(Seq((10L, "upsert", Some("web"), Some("x y z")),
      (1L, "delete", None, None)))
    run() // restart from the same checkpoint: processes ONLY batch 2
    run() // no new data: exactly-once, nothing re-applies
    val (snap, mv) = Curation.currentEpoch(spark, root)
    // snapshot dual: fold of the widened merge over the change files
    val allFiles = new java.io.File(input).listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.lastModified())
    def snapKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val dual = allFiles.foldLeft(base) { (s, f) =>
      Curation.cdcMergeDocs(s,
        spark.read.schema(changeSchema).json(f.getPath))
    }
    assert(snapKey(snap) == snapKey(dual))
    assert(snapKey(snap) == Set((2L, "book", "c c c"),
      (10L, "web", "x y z")))
    // the MAINTENANCE IDENTITY at the published epoch: the
    // incrementally-maintained MV equals a from-scratch rollup of the
    // snapshot it shipped with — including the web→book source move
    // landing in both cells
    def mvKey(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"))).toSet
    assert(mvKey(mv) == mvKey(Curation.sourceRollup(snap)))
    assert(mvKey(mv) == Set(("book", 1L, 3L), ("web", 1L, 3L)))
    // replayed-batch fixed point (what makes the single-flip epoch
    // exactly-once when the crash lands AFTER the flip): re-merging +
    // re-refreshing the last batch over the current epoch changes
    // nothing
    val last = spark.read.schema(changeSchema)
      .json(allFiles.maxBy(_.lastModified()).getPath)
    val merged2 = Curation.cdcMergeDocs(snap, last)
    assert(snapKey(merged2) == snapKey(snap))
    val mv2 = Curation.mvRefresh(mv, snap, merged2,
      last.select(col("doc_id")))
    assert(mvKey(mv2) == mvKey(mv))
  }

  test("replay from the post-flip crash window is a no-op, not a wedge") {
    // ADVICE r11 (high): die AFTER publishEpoch's marker flip but
    // BEFORE the streaming checkpoint commits, and the replayed
    // batch's "current" epoch IS its own output directory — re-deriving
    // would read under its own overwrite and wedge the stream on every
    // restart. Reproduce the window faithfully: process a batch, then
    // delete its checkpoint COMMIT file (the crash landed between the
    // artifact flip and the commit), restart, and require the replay to
    // short-circuit on the already-flipped marker.
    import spark.implicits._
    val changeSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("op", StringType),
      StructField("source", StringType),
      StructField("text", StringType)))
    val root = tmp("graft_mv_crash")
    val input = tmp("graft_mv_crash_in")
    val cp = tmp("graft_mv_crash_cp")
    val base = Seq((1L, "web", "a b"), (2L, "book", "c"))
      .toDF("doc_id", "source", "text")
    Curation.publishEpoch(spark, root, "base", base,
      Curation.sourceRollup(base))
    def run(): Unit = {
      val q = Streams.mvApplySink(root,
        spark.readStream.schema(changeSchema)
          .option("maxFilesPerTrigger", 1).json(input), cp,
        retainVersions = 2)
      try q.processAllAvailable() finally q.stop()
    }
    Seq((3L, "web", "x y z")).map { case (id, s, t) =>
      (id, "upsert", s, t) }
      .toDF("doc_id", "op", "source", "text")
      .coalesce(1).write.mode("append").json(input)
    run()
    def snapKey() = Curation.currentEpoch(spark, root)._1.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val published = snapKey()
    assert(published == Set((1L, "web", "a b"), (2L, "book", "c"),
      (3L, "web", "x y z")))
    // simulate the crash window: artifact published (marker = b0),
    // checkpoint commit for batch 0 lost
    val commit = new java.io.File(s"$cp/commits/0")
    assert(commit.exists(), "expected checkpoint commit file")
    assert(commit.delete())
    // the local-FS checksum sidecar would block the recommit rename;
    // a real crash (no file ever written) leaves neither
    new java.io.File(s"$cp/commits/.0.crc").delete()
    run() // replays batch 0: must short-circuit, not wedge or corrupt
    assert(snapKey() == published)
    val (snapAfter, mvAfter) = Curation.currentEpoch(spark, root)
    assert(mvAfter.collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toSet ==
      Curation.sourceRollup(snapAfter).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"))).toSet)
    // retention (retainVersions = 2): after more batches the root
    // holds the current version + at most 2 retired ones — the
    // versions the crash-window replay left behind get collected by a
    // LATER successful publish, so a crash mid-cycle never strands
    // unbounded garbage
    Seq((4L, "book", "p q")).map { case (id, s, t) =>
      (id, "upsert", s, t) }
      .toDF("doc_id", "op", "source", "text")
      .coalesce(1).write.mode("append").json(input)
    run()
    Seq((5L, "web", "r")).map { case (id, s, t) => (id, "upsert", s, t) }
      .toDF("doc_id", "op", "source", "text")
      .coalesce(1).write.mode("append").json(input)
    run()
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs.size <= 3, s"unretired versions: $dirs")
    // versions are bound to the checkpoint's query id (ADVICE r12) —
    // same checkpoint across the restarts here, so batch 2's version
    // carries the one stable qid suffix
    val qid = Streams.checkpointQueryId(spark, cp).take(8)
    assert(dirs.contains(s"b2-$qid"), dirs.toString)
  }

  test("bpe refresh sink: kill + replay never double-folds a delta; " +
      "tokenizer stays the exact full refit") {
    // r12 verdict item 7 — the nightly tokenizer refresh under the
    // streaming posture, with the lifecycle guarantee the CDC/MV sinks
    // have: a checkpoint-replayed batch must NOT re-add its word
    // counts (the fold is NOT idempotent, so the qid-bound version
    // short-circuit carries exactly-once), and the refresh == full
    // refit exactness contract must hold across the crash.
    import spark.implicits._
    import graft.operators.Bpe
    val base = Seq((1L, "the table scan runs"), (2L, "the value table"),
      (3L, "scan the stream")).toDF("doc_id", "text")
    val d1 = (10L to 40L).map(i => (i, "zig zag zig zag zoom"))
    val p = graft.sources.TempDirs.scratchDir("graft_bpe_sink").toString
    Bpe.publishFit(spark, base, p, numMerges = 24)
    val input = tmp("graft_bpe_sink_in")
    val cp = tmp("graft_bpe_sink_cp")
    def run(): Unit = {
      val q = Streams.bpeRefreshSink(p,
        spark.readStream.schema(docSchema).json(input), cp,
        numMerges = 24)
      try q.processAllAvailable() finally q.stop()
    }
    d1.toDF("doc_id", "text").coalesce(1).write.mode("append").json(input)
    run()
    def refit(dfs: org.apache.spark.sql.DataFrame*) = Bpe.trainBpe(
      Bpe.cappedWords(Bpe.wordCounts(dfs.reduce(_ unionByName _))),
      numMerges = 24)
    val wantD1 = refit(base, d1.toDF("doc_id", "text"))
    assert(Bpe.loadTokenizer(spark, p) === wantD1)
    // crash window: batch 0's artifacts are fully published but its
    // checkpoint commit is lost — the replay must fold NOTHING
    val refitsBefore = Bpe.refitInvocations.get()
    val commit = new java.io.File(s"$cp/commits/0")
    assert(commit.exists() && commit.delete())
    new java.io.File(s"$cp/commits/.0.crc").delete()
    run()
    assert(Bpe.loadTokenizer(spark, p) === wantD1,
      "replayed delta was folded twice")
    assert(Bpe.refitInvocations.get() == refitsBefore,
      "replay retrained on an unchanged training set")
    // exact word table: fold happened exactly once
    val words = spark.read.parquet(Bpe.wordsRootOf(p) + "/" +
        graft.sources.Markers.read(spark, Bpe.wordsRootOf(p),
          Bpe.wordsCurrentMarker))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Bpe.wordCounts(base.unionByName(d1.toDF("doc_id", "text")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(words == want)
    // and the stream keeps rolling: a second delta refreshes to the
    // doubly-grown exact refit
    val d2 = (50L to 90L).map(i => (i, "quark boson lepton quark"))
    d2.toDF("doc_id", "text").coalesce(1).write.mode("append").json(input)
    run()
    assert(Bpe.loadTokenizer(spark, p) ===
      refit(base, d1.toDF("doc_id", "text"), d2.toDF("doc_id", "text")))
  }

  test("a fresh checkpoint over a reused root publishes its batch 0 " +
      "despite the prior run's stale marker") {
    // ADVICE r12 (medium): versions keyed on batchId alone survive a
    // checkpoint swap — a reused snapshot root + fresh checkpoint
    // restarts batch ids at 0, and the prior run's `b0…` marker would
    // short-circuit the new batch 0 into silent data loss. The qid-
    // bound version must read the stale marker as foreign and publish.
    import spark.implicits._
    val changeSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("op", StringType),
      StructField("text", StringType)))
    val root = tmp("graft_cdc_stale")
    val base = Seq((1L, "a b")).toDF("doc_id", "text")
    Curation.publishSnapshot(spark, base, root, "base")
    def runOnce(cp: String, input: String): Unit = {
      val q = Streams.cdcApplySink(root,
        spark.readStream.schema(changeSchema).json(input), cp)
      try q.processAllAvailable() finally q.stop()
    }
    val in1 = tmp("graft_cdc_stale_in1")
    Seq((2L, "upsert", "first run")).toDF("doc_id", "op", "text")
      .coalesce(1).write.mode("append").json(in1)
    runOnce(tmp("graft_cdc_stale_cp1"), in1)
    def snapIds() = Curation.currentSnapshot(spark, root).collect()
      .map(_.getLong(0)).toSet
    assert(snapIds() == Set(1L, 2L))
    // second stream instance: FRESH checkpoint, fresh input, same root
    // — its batch 0 must land doc 3 even though a b0-prefixed marker
    // from the first run's batch 0 is current
    assert(graft.sources.Markers.read(spark, root,
      Curation.snapshotCurrentMarker).startsWith("b0-"))
    val in2 = tmp("graft_cdc_stale_in2")
    Seq((3L, "upsert", "second run")).toDF("doc_id", "op", "text")
      .coalesce(1).write.mode("append").json(in2)
    runOnce(tmp("graft_cdc_stale_cp2"), in2)
    assert(snapIds() == Set(1L, 2L, 3L),
      "fresh-checkpoint batch 0 was silently skipped on a stale marker")
  }

  test("a multi-op batch without seq fails loudly; with seq it collapses") {
    import spark.implicits._
    val changeSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("op", StringType),
      StructField("source", StringType),
      StructField("text", StringType)))
    val root = tmp("graft_mv_dup")
    val input = tmp("graft_mv_dup_in")
    val base = Seq((1L, "web", "a b")).toDF("doc_id", "source", "text")
    Curation.publishEpoch(spark, root, "base", base,
      Curation.sourceRollup(base))
    // two ops for doc 5 coalesced into ONE batch (the restart-backlog
    // shape) and no seq column: the sink must refuse — an arbitrary
    // winner would silently double the MV's retract leg
    Seq((5L, "upsert", "web", "x"), (5L, "delete", null, null))
      .toDF("doc_id", "op", "source", "text")
      .coalesce(1).write.mode("append").json(input)
    val q = Streams.mvApplySink(root,
      spark.readStream.schema(changeSchema).json(input),
      tmp("graft_mv_dup_cp"))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    def rootCauses(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: rootCauses(t.getCause)
    assert(rootCauses(err).exists(c =>
      c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("multiple ops")), err.toString)
    // epoch untouched by the failed batch
    assert(Curation.currentEpoch(spark, root)._1.collect()
      .map(_.getLong(0)).toSet == Set(1L))

    // the SAME backlog with a seq column collapses deterministically to
    // last-op-wins: doc 5's delete (seq 2) beats its upsert (seq 1),
    // doc 6 inserts — and the batch applies exactly like the
    // sequential fold of the ops it coalesced
    val seqSchema = changeSchema.add(StructField("seq", LongType))
    val input2 = tmp("graft_mv_seq_in")
    Seq((5L, "upsert", "web", "x", 1L), (5L, "delete", null, null, 2L),
      (6L, "upsert", "book", "y z", 1L))
      .toDF("doc_id", "op", "source", "text", "seq")
      .coalesce(1).write.mode("append").json(input2)
    val q2 = Streams.mvApplySink(root,
      spark.readStream.schema(seqSchema).json(input2),
      tmp("graft_mv_seq_cp"))
    try q2.processAllAvailable() finally q2.stop()
    val (snap, mv) = Curation.currentEpoch(spark, root)
    assert(snap.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet ==
      Set((1L, "web", "a b"), (6L, "book", "y z")))
    // maintenance identity holds through the collapse
    assert(mv.collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toSet ==
      Curation.sourceRollup(snap).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_tokens"))).toSet)
  }
}
