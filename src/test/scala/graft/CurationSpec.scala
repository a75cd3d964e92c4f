package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  // ---------------------------------------------------------------- split

  test("q_train_split covers every document with a stable ~80/10/10 cut") {
    val df = Curation.qTrainSplit(spark, sfDir).cache()
    try {
      val n = docs.count()
      assert(df.count() == n)
      val byName = df.groupBy("split_name").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byName.keySet == Set("train", "val", "test"))
      // md5 prefixes are uniform; 1/256 thresholds put expectations at
      // 80.1/9.8/10.2% — allow a generous binomial tolerance at n=500
      assert(byName("train").toDouble / n > 0.7 &&
        byName("train").toDouble / n < 0.9)
      // deterministic: a second evaluation is identical
      assert(Curation.qTrainSplit(spark, sfDir).exceptAll(df).isEmpty)
    } finally df.unpersist()
  }

  test("train split of a document is independent of the rest of the corpus") {
    // backfill stability: assignments on a half corpus must agree with
    // assignments on the full corpus for the shared documents — i.e. the
    // split is a pure function of doc_id, not of dataset composition
    val full = Curation.trainSplit(docs)
    val half = Curation.trainSplit(docs.filter(col("doc_id") % 2 === 0))
    assert(half.exceptAll(full.filter(col("doc_id") % 2 === 0)).isEmpty)
  }

  // --------------------------------------------------------------- sample

  test("q_sample_stratified halves en and keeps other strata whole") {
    val kept = Curation.qSampleStratified(spark, sfDir)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    base.foreach { case (lang, n) =>
      if (lang == "en") {
        val rate = kept.getOrElse("en", 0L).toDouble / n
        assert(rate > 0.3 && rate < 0.7,
          s"en sampled at $rate, expected ~0.5")
      } else assert(kept.get(lang).contains(n),
        s"non-en stratum $lang must be kept whole")
    }
  }

  test("q_sample_weighted: max-weight docs always kept, rates track " +
      "weights, draw is deterministic and integer-exact") {
    import spark.implicits._
    // synthetic frame with extreme weight separation: weight 1000 docs
    // keep with p = 1 (u < 2^32 always), weight 10 docs at p = 0.01
    val heavy = (0L until 50L).map((_, 1000L))
    val light = (1000L until 6000L).map((_, 10L))
    val frame = (heavy ++ light).toDF("doc_id", "weight")
    val kept = Curation.sampleWeighted(frame)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val keptIds = kept.map(_._1).toSet
    assert(heavy.forall { case (id, _) => keptIds(id) },
      "every maximum-weight doc must be kept (p = 1)")
    val lightKept = kept.count(_._2 == 10L)
    assert(lightKept >= 20 && lightKept <= 120,
      s"weight-10 docs kept $lightKept of 5000, expected ~50 (p = 0.01)")
    // deterministic: re-running draws the identical sample
    val again = Curation.sampleWeighted(frame)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSeq === kept.toSeq)
    // re-salting draws a DIFFERENT (independent) light-doc sample
    val resalted = Curation.sampleWeighted(frame, salt = ":wsamp2")
      .collect().map(_.getLong(0)).toSet
    assert(heavy.forall { case (id, _) => resalted(id) })
    assert(resalted !== keptIds)
    // declared query: kept set is a subset of the corpus and non-empty
    val declared = Curation.qSampleWeighted(spark, sfDir).collect()
    assert(declared.nonEmpty)
    assert(declared.length < docs.count())
  }

  test("q_normalize_text: NFC composes decomposed accents, controls and " +
      "whitespace collapse, and the pass is idempotent") {
    import spark.implicits._
    val rows = Seq(
      (1L, "cafe\u0301 CAFE\u0301"), // combining acute -> precomposed
      (2L, "caf\u00e9"),              // already composed
      (3L, "a\u0001b\tc   d "),      // control char + runs + trailing
      (4L, ""),
      (5L, "plain ascii text"))
      .toDF("doc_id", "text")
    val out = Curation.normalizeText(rows).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) === "caf\u00e9 caf\u00e9")
    assert(out(1L).length === 9) // 2x4 composed chars + space
    assert(out(2L) === "caf\u00e9")
    assert(out(3L) === "a b c d")
    assert(out(4L) === "")
    assert(out(5L) === "plain ascii text")
    // idempotence: normalizing the normalized text is a fixed point
    val again = Curation.normalizeText(
        rows.select(col("doc_id"),
          graft.functions.TextFunctions.nfcNormalize(col("text"))
            .as("text")))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val normed = Curation.normalizeText(rows)
      .select(col("doc_id"), col("norm_text").as("text"))
    val fixed = Curation.normalizeText(normed).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getInt(4))).toList
    fixed.foreach { case (id, t, changed) =>
      assert(t === out(id)); assert(changed === 0)
    }
    assert(again.nonEmpty)
    // declared query runs clean on the corpus (ASCII: changed = 0)
    val declared = Curation.qNormalizeText(spark, sfDir).collect()
    assert(declared.nonEmpty)
    assert(declared.forall(_.getInt(4) === 0))
  }

  test("stratified sample rates are per-stratum thresholds") {
    import spark.implicits._
    val d = (0L until 1000L).map(i =>
      (i, if (i % 2 == 0) "aa" else "bb", s"text $i")).toDF(
      "doc_id", "lang", "text")
    // keep none of aa ('0' threshold), all of bb
    val out = Curation.sampleStratified(d, Map("aa" -> "0"), "g")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("aa") && out("bb") == 500L)
  }

  // -------------------------------------------------------- decontaminate

  test("pii scrub counts and redacts planted emails/ssns/phones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact Jane.Doe+spam@corp-mail.example.org or call 555-867-5309 now"),
      (2L, "ssn on file 123-45-6789 twice 123-45-6789"),
      (3L, "clean document with numbers 12-34 and 1234-5678"),
      (4L, "mixed a@b.co 999-11-2222 and 800-555-1212")).toDF("doc_id", "text")
    val out = graft.operators.Curation.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 1 && out(1L).getInt(3) == 1)
    assert(out(1L).getString(4) ==
      "contact <EMAIL> or call <PHONE> now")
    assert(out(2L).getInt(2) == 2 &&
      out(2L).getString(4) == "ssn on file <SSN> twice <SSN>")
    assert(out(3L).getInt(1) == 0 && out(3L).getInt(2) == 0 &&
      out(3L).getInt(3) == 0 && !out(3L).getBoolean(5))
    assert(out(3L).getString(4) ==
      "clean document with numbers 12-34 and 1234-5678")
    assert(out(4L).getInt(1) == 1 && out(4L).getInt(2) == 1 &&
      out(4L).getInt(3) == 1 && out(4L).getBoolean(5))
    assert(out(4L).getString(4) == "mixed <EMAIL> <SSN> and <PHONE>")
  }

  test("token frequency score separates common-vocab from rare-vocab docs") {
    import spark.implicits._
    // docs 1-3 share one vocabulary; doc 4 is mojibake-like one-offs
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the cat"),
      (3L, "the cat and the dog"),
      (4L, "zxq1 vbn2 qwe3 rty4 uio5 plk6")).toDF("doc_id", "text")
    val out = graft.operators.TextOps.tokenFreqScore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(4))).toList.sortBy(_._1)
    // driver-side recount of the unigram model
    val toks = Seq("the cat sat on the mat", "the dog sat on the cat",
      "the cat and the dog", "zxq1 vbn2 qwe3 rty4 uio5 plk6")
      .flatMap(_.split(" "))
    val cnt = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def expect(text: String) = {
      val ws = text.split(" ").toSeq
      (ws.size.toLong, ws.map(cnt).sum,
        ws.count(cnt(_) < 3).toDouble / ws.size)
    }
    Seq((1L, "the cat sat on the mat"), (2L, "the dog sat on the cat"),
      (3L, "the cat and the dog"),
      (4L, "zxq1 vbn2 qwe3 rty4 uio5 plk6")).foreach { case (id, t) =>
      val (n, s, rf) = expect(t)
      val got = out.find(_._1 == id).get
      assert((got._2, got._3, got._4) == ((n, s, rf)), s"doc $id")
    }
    // the mojibake doc is fully rare; the common docs are not
    assert(out.find(_._1 == 4L).get._4 == 1.0)
    assert(out.find(_._1 == 1L).get._4 <= 0.5)
  }

  test("decontaminate flags 8-gram overlap, not 7-gram overlap") {
    import spark.implicits._
    val run = (s: String) => s.split(" ").toSeq
    val shared8 = "t1 t2 t3 t4 t5 t6 t7 t8"
    val eval = Seq((100L, s"pre $shared8 post")).toDF("doc_id", "text")
    val train = Seq(
      // contains the full shared 8-gram -> contaminated
      (1L, s"x y $shared8 z"),
      // only 7 of the 8 tokens contiguously -> clean
      (2L, "x y t1 t2 t3 t4 t5 t6 t7 q z"),
      (3L, "entirely disjoint tokens only here today")
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("decontaminate matches short eval strings verbatim (guard path)") {
    import spark.implicits._
    val eval = Seq((100L, "short eval probe")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "short eval probe"), // verbatim copy of a sub-8-token doc
      (2L, "short eval probe plus more tokens") // 6 tokens, no verbatim match
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, eval)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false))
  }

  test("decontaminate plan broadcasts both join sides — no corpus shuffle join") {
    val plan = Curation.qDecontaminate(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "eval shingles and hit set must broadcast; a sort-merge join " +
        "here would shuffle the full corpus at scale")
  }

  test("contamination report counts distinct offending train docs per eval doc") {
    import spark.implicits._
    val probe = "p1 p2 p3 p4 p5 p6 p7 p8"
    val eval = Seq(
      (100L, s"$probe tail1 tail2 tail3"),
      (200L, "clean eval doc nothing shared here at all")
    ).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"x $probe y"),          // hits eval 100
      (2L, s"z $probe w"),          // hits eval 100 (second distinct doc)
      (3L, "unrelated words only in this training document")
    ).toDF("doc_id", "text")
    val out = Curation.contaminationReport(train, eval)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 100: two distinct train hits (multiple shared 8-grams per
    // pair must not inflate the count); doc 200 reports zero, not absent
    assert(out == Map(100L -> 2L, 200L -> 0L))
  }

  test("curation ops tolerate degenerate corpora") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    assert(Curation.trainSplit(empty).count() == 0)
    assert(Curation.repetition(empty).count() == 0)
    assert(Curation.packSequences(empty).count() == 0)
    assert(Curation.corpusMix(empty).count() == 0)
    assert(Curation.decontaminate(empty, empty).count() == 0)
    assert(Curation.contaminationReport(empty, empty).count() == 0)
    // whitespace-only and single-char docs flow through every per-row op
    val weird = Seq((1L, ""), (2L, " "), (3L, "x")).toDF("doc_id", "text")
    val rep = Curation.repetition(weird).collect()
    assert(rep.length == 3)
    rep.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("dup_word_frac")))
      assert(r.getDouble(r.fieldIndex("dup_bigram_frac")) == 0.0)
    }
    assert(Curation.packSequences(weird).count() == 3)
    // round-9 ops on the same degenerate corpora
    assert(Curation.chunkDocs(empty).count() == 0)
    assert(Curation.sourceCap(empty).count() == 0)
    assert(Curation.sourceCapPruned(empty).count() == 0)
    assert(graft.operators.TextOps.vocabTopk(empty).count() == 0)
    assert(graft.operators.TextOps.tfidfTopk(empty).count() == 0)
    assert(graft.operators.TextOps.collocPmi(empty).count() == 0)
    assert(Curation.chunkDocs(weird).count() == 3) // one chunk each
    // the whitespace doc splits to two EMPTY tokens -> exactly one
    // (empty, empty) bigram; "" and "x" contribute no pairs
    val weirdPairs = graft.operators.TextOps
      .collocPmi(weird, minCount = 1L).collect()
    assert(weirdPairs.length == 1 &&
      weirdPairs.head.getAs[String]("w1") == "" &&
      weirdPairs.head.getAs[String]("w2") == "")
    // genuinely single-token docs have zero bigrams
    val singles = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    assert(graft.operators.TextOps.collocPmi(singles, minCount = 1L)
      .count() == 0)
    import org.apache.spark.sql.types._
    val emptyVecs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(graft.operators.Vectors.quantizeEmbed(emptyVecs).count() == 0)
  }

  // ----------------------------------------------------------- repetition

  test("repetition fractions match hand-computed fixtures") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a b"),   // 4 tok, 2 uniq -> .5; bigrams (a a, a a, a b) -> 1/3
      (2L, "u v w x"),   // no repetition at all
      (3L, "solo")       // single token: bigram frac defined 0
    ).toDF("doc_id", "text")
    val rows = Curation.repetition(d).collect()
    val byId = rows.map(r => r.getLong(0) ->
      ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(byId(1L)._1 == 4)
    assert(math.abs(byId(1L)._2 - 0.5) < 1e-12)
    assert(math.abs(byId(1L)._3 - (1.0 - 2.0 / 3.0)) < 1e-12)
    assert(!byId(1L)._4) // bigram fraction 1/3 > 0.2 -> filtered out
    assert(byId(2L)._2 == 0.0 && byId(2L)._3 == 0.0 && byId(2L)._4)
    assert(byId(3L)._3 == 0.0 && byId(3L)._4)
  }

  test("repetition and train split stay shuffle-free before the output sort") {
    // per-row claims from the scaladoc: the ONLY exchange in the plan is
    // the range partitioning for the deterministic output ORDER BY
    for (df <- Seq(Curation.qRepetition(spark, sfDir),
        Curation.qTrainSplit(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 1, s"expected only the sort exchange:\n$plan")
    }
  }

  // ------------------------------------------------------------ source cap

  test("q_source_cap keeps at most cap docs per source, hash-ordered") {
    val got = Curation.qSourceCap(spark, sfDir).collect()
    val bySource = got.groupBy(_.getAs[String]("source"))
    bySource.values.foreach { rows =>
      assert(rows.length <= 10)
      assert(rows.map(_.getAs[Int]("rk")).sorted.toSeq ==
        (1 to rows.length).toSeq)
    }
    // every source present in the corpus keeps something
    val srcCount = docs.select("source").distinct().count()
    assert(bySource.size == srcCount)
  }

  test("pruned source cap equals the exact window (real + synthetic corpora)") {
    import spark.implicits._
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("doc_id"),
      r.getAs[String]("source"), r.getAs[Int]("rk"))
    // real corpus: sources at/below margin*cap -> bound 1, trivial path
    assert(Curation.sourceCapPruned(docs).collect().map(key).toSet ==
      Curation.sourceCap(docs).collect().map(key).toSet)
    // synthetic: 4 sources x 500 docs -> bound 40/500, real pruning
    val big = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("s"), (col("id") % 4).cast("string")).as("source"))
    val pruned = Curation.sourceCapPruned(big)
    assert(pruned.collect().map(key).toSet ==
      Curation.sourceCap(big).collect().map(key).toSet)
    // and the prune actually shrank the window input
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ------------------------------------------------------------- chunking

  test("chunk docs matches a driver-side re-chunk exactly") {
    val got = Curation.qChunkDocs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id"),
        r.getAs[String]("chunk_text"), r.getAs[Int]("n_chunk_tokens")))
      .toSet
    val want = docs.select("doc_id", "text").collect().flatMap { r =>
      val toks = r.getAs[String]("text").split(" ", -1)
      (0 until toks.length by 24).zipWithIndex.map { case (s, k) =>
        (r.getAs[Long]("doc_id"), k,
          toks.slice(s, s + 32).mkString(" "),
          math.min(toks.length - s, 32))
      }
    }.toSet
    assert(got == want)
  }

  test("chunks with stride == window reconstruct each document") {
    import spark.implicits._
    val fixture = Seq(
      (1L, Seq.tabulate(70)(i => s"t$i").mkString(" ")),
      (2L, "one two three"),
      (3L, "")).toDF("doc_id", "text")
    val back = Curation.chunkDocs(fixture, window = 32, stride = 32)
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", array_sort(collect_list(
        struct(col("chunk_id"), col("chunk_text")))
        .getField("chunk_text"))).as("joined"))
    // array_sort on (chunk_id, text) structs orders by chunk_id; the
    // extracted texts re-concatenate to the original (no token dropped
    // or doubled when the overlap is zero)
    val got = back.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("joined")).toMap
    assert(got(2L) == "one two three")
    assert(got(3L) == "") // degenerate doc still yields its one chunk
    assert(got(1L) == Seq.tabulate(70)(i => s"t$i").mkString(" "))
  }

  test("chunking stays shuffle-free before the output sort") {
    val plan = Curation.qChunkDocs(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected only the sort exchange:\n$plan")
  }

  // -------------------------------------------------------------- packing

  test("pack ids equal floor(prefix-sum / budget) within each shard") {
    val rows = Curation.qPackSequences(spark, sfDir).collect()
    val byShard = rows.groupBy(_.getString(1))
    assert(byShard.size > 1, "expect multiple shards at sf0.001")
    byShard.foreach { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(3) == cum / 512,
          s"doc ${r.getLong(0)} pack mismatch")
        cum += r.getInt(2)
      }
    }
    assert(rows.map(_.getLong(0)).distinct.length == docs.count())
  }

  test("pack manifest rolls up the packing assignment consistently") {
    val assign = Curation.qPackSequences(spark, sfDir).collect()
    val manifest = Curation.qPackManifest(spark, sfDir).collect()
    val byPack = assign.groupBy(r => (r.getString(1), r.getLong(3)))
    assert(manifest.length == byPack.size)
    manifest.foreach { m =>
      val members = byPack((m.getString(0), m.getLong(1)))
      assert(m.getLong(2) == members.length)
      assert(m.getLong(3) == members.map(_.getInt(2).toLong).sum)
      // member list is doc_id-ordered — the concatenation order a
      // sequence builder relies on
      assert(m.getString(4) ==
        members.map(_.getLong(0)).sorted.mkString("-"))
    }
  }

  test("pack manifest plan: rollup rides the shard partitioning, no sort shuffle") {
    // the rollup must build on the UNSORTED assignment: Spark 4 keeps a
    // global sort under a later aggregate, so composing over the sorted
    // declared query costs a wasted corpus-scale range shuffle (4
    // shuffles instead of <=3: shard window + output sort, with the
    // groupBy riding the shard hash partitioning)
    val plan = Curation.qPackManifest(spark, sfDir)
      .queryExecution.executedPlan.toString
    val shuffles =
      "Exchange (hash|range)partitioning".r.findAllIn(plan).size
    assert(shuffles <= 3, s"expected <=3 shuffle exchanges:\n$plan")
  }

  test("pack assignment within a shard is append-stable under corpus growth") {
    // adding NEW documents with larger ids must not move earlier docs to
    // different packs (ordering is by doc_id, so growth only appends)
    val old = Curation.packSequences(docs.filter(col("doc_id") < 250))
    val grown = Curation.packSequences(docs)
      .filter(col("doc_id") < 250)
    assert(grown.exceptAll(old).isEmpty)
  }

  // ----------------------------------------------------------- resampling

  test("mix resample reweights token mass toward the uniform language target") {
    val df = Curation.qMixResample(spark, sfDir).cache()
    try {
      assert(df.count() == docs.count()) // a repeat count for every doc
      // repeated token mass per language should approach total/n_langs
      val toks = docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tok"))
      val resampled = df.join(toks, "doc_id")
        .groupBy("lang")
        .agg(sum(col("n_repeats") * col("n_tok")).as("mass"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val target = resampled.values.sum.toDouble / resampled.size
      resampled.foreach { case (lang, mass) =>
        assert(math.abs(mass - target) / target < 0.15,
          s"$lang token mass $mass vs uniform target $target")
      }
      // deterministic: the extra-repeat draw is a pure hash function
      assert(Curation.qMixResample(spark, sfDir).exceptAll(df).isEmpty)
    } finally df.unpersist()
  }

  test("mix resample weights and repeat floors match a hand-built corpus") {
    import spark.implicits._
    // aa: 300 tokens, bb: 100 -> total 400, target 200/cell
    // weight(aa) = 200/300 = 2/3 -> repeats in {0, 1}
    // weight(bb) = 200/100 = 2   -> exactly 2 (frac = 0, no extra draw)
    val d = (
      (1 to 3).map(i => (i.toLong, "aa", words100(i))) :+
        (10L, "bb", words100(10))).toDF("doc_id", "lang", "text")
    val out = Curation.mixResample(d).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    out.filter(_._1 < 10L).values.foreach { case (w, n) =>
      assert(math.abs(w - 2.0 / 3.0) < 1e-12 && (n == 0L || n == 1L))
    }
    assert(out(10L) == ((2.0, 2L)))
  }

  private def words100(seed: Int): String =
    (0 until 100).map(i => s"t${seed * 1000 + i}").mkString(" ")

  // -------------------------------------------------------------- mixture

  test("corpus mix shares sum to one and doc counts to the corpus") {
    val df = Curation.qCorpusMix(spark, sfDir).cache()
    try {
      val share = df.agg(sum("token_share")).collect().head.getDouble(0)
      assert(math.abs(share - 1.0) < 1e-9)
      assert(df.agg(sum("n_docs")).collect().head.getLong(0) == docs.count())
      // share ordering consistent with token ordering
      val top = df.orderBy(desc("token_share")).select("n_tokens")
        .first().getLong(0)
      assert(top == df.agg(max("n_tokens")).collect().head.getLong(0))
    } finally df.unpersist()
  }

  // -------------------------------------------------------- snapshot diff

  test("q_snapshot_diff classifies exactly the planted mod-11 residues") {
    val got = Curation.qSnapshotDiff(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("change"))
    // every emitted row's class is forced by its residue; nothing else
    // appears (unchanged documents are dropped)
    got.foreach { case (id, change) =>
      val want = (id % 11) match {
        case 3 => "added"; case 5 => "removed"; case 7 => "changed"
        case other => fail(s"unexpected doc $id (residue $other) emitted")
      }
      assert(change == want, s"doc $id")
    }
    // and every planted document IS emitted (delta is complete)
    val byRes = docs.select("doc_id").collect().map(_.getLong(0))
      .groupBy(_ % 11).view.mapValues(_.length).toMap
    val byChange = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byChange.getOrElse("added", 0) == byRes.getOrElse(3L, 0))
    assert(byChange.getOrElse("removed", 0) == byRes.getOrElse(5L, 0))
    assert(byChange.getOrElse("changed", 0) == byRes.getOrElse(7L, 0))
    assert(got.nonEmpty)
  }

  test("q_cdc_merge reproduces the next crawl exactly from base + delta") {
    val merged = Curation.qCdcMerge(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val next = docs.filter(col("doc_id") % 11 =!= 5)
      .select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    assert(merged.toSeq == next.toSeq)
  }

  test("cdcMerge applies upserts, inserts, and deletes on a planted base") {
    import spark.implicits._
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("doc_id", "text")
    val changes = Seq(
      (2L, "upsert", "two-v2"),   // replace
      (4L, "upsert", "four"),     // insert (no base row)
      (3L, "delete", null)        // remove
    ).toDF("doc_id", "op", "text")
    val got = Curation.cdcMerge(base, changes).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "one", 2L -> "two-v2", 4L -> "four"))
  }

  test("q_mix_drift shares sum to one per snapshot and drift to zero") {
    val rows = Curation.qMixDrift(spark, sfDir).collect()
    val sb = rows.map(_.getAs[Double]("share_base")).sum
    val sn = rows.map(_.getAs[Double]("share_next")).sum
    val sd = rows.map(_.getAs[Double]("share_drift")).sum
    assert(math.abs(sb - 1.0) < 1e-9 && math.abs(sn - 1.0) < 1e-9)
    assert(math.abs(sd) < 1e-9)
    assert(rows.map(_.getAs[Long]("n_base")).sum ==
      docs.filter(col("doc_id") % 11 =!= 3).count())
    assert(rows.map(_.getAs[Long]("n_next")).sum ==
      docs.filter(col("doc_id") % 11 =!= 5).count())
  }

  test("mixDrift keeps cells present in only one snapshot") {
    import spark.implicits._
    val base = Seq(("en", "web", 1L), ("en", "web", 2L), ("de", "web", 3L))
      .toDF("lang", "source", "doc_id")
    val next = Seq(("en", "web", 1L), ("fr", "book", 9L))
      .toDF("lang", "source", "doc_id")
    val got = Curation.mixDrift(base, next).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(6))).toSeq
    assert(got == Seq(
      ("de", "web", 1L, 0L, 0.0 - 1.0 / 3),
      ("en", "web", 2L, 1L, 1.0 / 2 - 2.0 / 3),
      ("fr", "book", 0L, 1L, 1.0 / 2)))
  }

  test("snapshotDiff joins digests, not document text") {
    // both inputs of the full-outer join must be pruned to
    // (doc_id, digest) — the shuffle moves 16-byte digests, never the
    // document bytes
    val qe = Curation.qSnapshotDiff(spark, sfDir).queryExecution
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val joinInputs = j.children.flatMap(_.output).map(_.name)
      assert(!joinInputs.contains("text"),
        s"text column reached the join: $joinInputs")
    }
  }

  test("q_sample_reservoir: exact min(k,n) per stratum, window parity, no sort") {
    import spark.implicits._
    val df = Curation.qSampleReservoir(spark, sfDir).cache()
    try {
      // exact size: min(20, |stratum|) rows per language
      val got = df.groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val sizes = docs.groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == sizes.map { case (l, n) => l -> math.min(20L, n) })
      // pick-set parity with the textbook row_number formulation the
      // oracle also states — the bounded aggregate must be invisible
      val u32 = conv(substring(
        md5(concat(col("doc_id").cast("string"), lit("#resv"))), 1, 8),
        16, 10).cast("long")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("draw"), col("doc_id"))
      val win = docs.select(col("lang"), col("doc_id"), u32.as("draw"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 20)
        .select(col("lang"), col("rank"), col("doc_id"))
      assert(df.collect().toSet == win.collect().toSet)
      // no Window/Sort operator anywhere: the plan is aggregate-only,
      // and the bounded UDAF buffer plans as an ObjectHashAggregate
      // with a map-side partial — ≤ k draws per stratum cross the wire
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), p.take(2000))
      assert(p.contains("ObjectHashAggregate"), p.take(2000))
      assert(p.contains("partial_bottomkdraws") ||
        p.toLowerCase.contains("partial_"), p.take(2000))
      // re-salting draws a DIFFERENT sample (independence smoke)
      val resalted = Curation.sampleReservoir(docs, 20, "#resv2")
        .select(col("lang"), col("doc_id")).collect().toSet
      assert(resalted !=
        df.select(col("lang"), col("doc_id")).collect().toSet)
    } finally df.unpersist()
    // a stratum smaller than k returns whole, ranked densely from 1
    val tiny = Seq((1L, "xx"), (2L, "xx"), (3L, "yy"))
      .toDF("doc_id", "lang")
    val t = Curation.sampleReservoir(tiny, 20).collect()
    assert(t.length == 3)
    assert(t.filter(_.getString(0) == "xx").map(_.getInt(1)).sorted
      .sameElements(Array(1, 2)))
  }

  // ------------------------------------------------------------------ IVM

  test("q_mv_refresh satisfies the maintenance identity mv ⊎ Δ = eval(next)") {
    val out = Curation.qMvRefresh(spark, sfDir).collect().toSeq
    val next = docs.filter(col("doc_id") % 11 =!= 5)
    val direct = Curation.sourceRollup(next)
      .orderBy(col("source")).collect().toSeq
    assert(out == direct)
    assert(out.nonEmpty)
  }

  test("mvRefresh retract/insert algebra: source moves, drops, zero groups") {
    import spark.implicits._
    val base = Seq((1L, "A", "x y"), (2L, "B", "a"), (4L, "B", "k l m"),
      (5L, "C", "zz"))
      .toDF("doc_id", "source", "text")
    // doc 1 moved A→B (text also changed, so the digest delta sees it),
    // doc 2 removed, doc 3 added, doc 4 untouched, doc 5 removed —
    // emptying source C entirely
    val next = Seq((1L, "B", "x y z"), (3L, "A", "p q"), (4L, "B", "k l m"))
      .toDF("doc_id", "source", "text")
    val out = Curation.mvRefresh(Curation.sourceRollup(base), base, next,
      Curation.snapshotDiff(base, next))
    val direct = Curation.sourceRollup(next)
      .orderBy(col("source")).collect().toSeq
    assert(out.collect().toSeq == direct)
    val m = out.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the move decremented A's cell and incremented B's in one refresh
    assert(m("A") == ((1L, 2L)), m.toString) // doc 3 only
    assert(m("B") == ((2L, 6L)), m.toString) // docs 1 + 4
    assert(!m.contains("C"), m.toString) // zero-count group dropped
  }

  test("q_mv_refresh joins carry tokens counts and digests, never text") {
    // the snapshotDiff legs move 16-byte digests and the retract/insert
    // legs move (doc_id, source, token-count) — document text must be
    // reduced BEFORE every join, or the delta joins ship the corpus
    val qe = Curation.qMvRefresh(spark, sfDir).queryExecution
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      val joinInputs = j.children.flatMap(_.output).map(_.name)
      assert(!joinInputs.contains("text"),
        s"text column reached a join: $joinInputs")
    }
  }
  test("collapseOps: randomized backlog == the sequential fold of its ops") {
    import spark.implicits._
    // the restart-backlog contract: a multi-op batch carrying a seq
    // column must apply exactly like the one-op-at-a-time fold of its
    // ops in seq order — swept over randomized op sequences so the
    // last-op-wins total order is derived, not fixture-trusted
    val rnd = new scala.util.Random(20260814)
    (1 to 5).foreach { round =>
      val base = (1L to 12L).map(i =>
        (i, if (i % 2 == 0) "web" else "book", s"t$i"))
        .toDF("doc_id", "source", "text")
      val ops = (1 to 40).map { seq =>
        val id = rnd.nextInt(18).toLong + 1L
        if (rnd.nextInt(4) == 0) (id, "delete", null: String,
          null: String, seq.toLong)
        else (id, "upsert", if (rnd.nextBoolean()) "web" else "book",
          s"v$round-$seq", seq.toLong)
      }
      val batch = ops.toDF("doc_id", "op", "source", "text", "seq")
      def key(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      val collapsed = Curation.cdcMergeDocs(base,
        Curation.collapseOps(batch))
      val folded = ops.sortBy(_._5).foldLeft(base) { (snap, o) =>
        Curation.cdcMergeDocs(snap,
          Seq(o).toDF("doc_id", "op", "source", "text", "seq"))
      }
      assert(key(collapsed) == key(folded), s"round $round")
      // and the collapsed batch is one-op-per-doc by construction
      val c = Curation.collapseOps(batch)
      assert(c.groupBy("doc_id").count()
        .filter(org.apache.spark.sql.functions.col("count") > 1)
        .count() == 0)
    }
  }
}
