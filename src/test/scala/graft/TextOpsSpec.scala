package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

class TextOpsSpec extends SparkTestBase {

  test("dup-span contamination flags cross-document spans only") {
    import spark.implicits._
    def words(tag: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$tag$i")
    val boiler = words("lic", 25) // 25-token shared block -> 6 20-grams
    val docs = Seq(
      // docs 1 and 2 share the boilerplate block inside distinct bodies
      (1L, (boiler ++ words("a", 30)).mkString(" ")),
      (2L, (words("b", 30) ++ boiler).mkString(" ")),
      // doc 3 repeats ITS OWN 25-token phrase twice — internal
      // repetition must NOT count as duplicate spans (per-doc distinct)
      (3L, (words("c", 25) ++ words("c", 25)).mkString(" ")),
      // doc 4 is clean
      (4L, words("d", 40).mkString(" ")),
      // doc 5 is SHORTER than a span: whole text is one span; doc 6 is
      // its exact copy -> both fully contaminated
      (5L, "tiny shared document"),
      (6L, "tiny shared document")).toDF("doc_id", "text")
    val out = TextOps.dupSpans(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    // docs 1/2: 36 distinct 20-grams each (55 tokens), the 6 boiler
    // 20-grams shared -> 6 dup spans, frac 6/36 <= 0.3 -> kept
    assert(out(1L) == ((36L, 6L, true)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((36L, 6L, true)), s"doc2: ${out(2L)}")
    // doc 3: 50 tokens -> 31 positions but only 26 DISTINCT spans
    // (positions 0..25 wrap to repeat); none shared with other docs
    assert(out(3L)._2 == 0L && out(3L)._3, s"doc3: ${out(3L)}")
    assert(out(4L) == ((21L, 0L, true)))
    assert(out(5L) == ((1L, 1L, false)) && out(6L) == ((1L, 1L, false)))
  }

  test("span scrub cuts cross-document spans, keeps unique remainders") {
    import spark.implicits._
    def words(tag: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$tag$i")
    val boiler = words("lic", 25)
    val docs = Seq(
      (1L, (boiler ++ words("a", 30)).mkString(" ")),
      (2L, (words("b", 30) ++ boiler).mkString(" ")),
      // internal repetition only: cross-doc df stays 1, nothing cut
      (3L, (words("c", 25) ++ words("c", 25)).mkString(" ")),
      (4L, words("d", 40).mkString(" ")),
      // shorter than a span: NO positional 20-grams exist, so the
      // scrub leaves exact short duplicates alone — whole-document
      // dedup's jurisdiction, not the span cutter's (deliberately
      // different from dupSpans' whole-text-fallback flagging)
      (5L, "tiny shared document"),
      (6L, "tiny shared document")).toDF("doc_id", "text")
    val out = TextOps.spanScrub(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // the 6 shared 20-grams cover exactly the 25 boilerplate tokens
    assert(out(1L) == ((55L, 30L, 25L, words("a", 30).mkString(" "))))
    assert(out(2L) == ((55L, 30L, 25L, words("b", 30).mkString(" "))))
    assert(out(3L)._3 == 0L && out(3L)._1 == 50L)
    assert(out(4L)._3 == 0L)
    assert(out(5L) == ((3L, 3L, 0L, "tiny shared document")))
    assert(out(6L)._3 == 0L)
  }

  test("span scrub merges overlapping spans and can empty a document") {
    import spark.implicits._
    // two identical 5-token docs under k=3: starts 0,1,2 all dup ->
    // every token covered -> both scrub to empty
    val docs = Seq(
      (1L, "v w x y z"), (2L, "v w x y z"),
      // shares only the TAIL 3-gram "x y z" with them
      (3L, "p q r s x y z")).toDF("doc_id", "text")
    val out = TextOps.spanScrub(docs, k = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((5L, "")) && out(2L) == ((5L, "")))
    assert(out(3L) == ((3L, "p q r s")))
  }

  test("boilerplate report ranks shared spans with reconstructed text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "m0 m1 m2 m3 x0 x1"),
      (2L, "y0 m0 m1 m2 m3"),
      (3L, "z0 z1 z2")).toDF("doc_id", "text")
    val rows = TextOps.boilerplateReport(docs, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // two shared 3-gram shifts of the m-block, reconstructed from the
    // earliest occurrence (doc 1, 0-based positions 0 and 1)
    assert(rows.toSeq == Seq(
      ("m0 m1 m2", 2L, 1L, 0L),
      ("m1 m2 m3", 2L, 1L, 1L)))
  }

  test("scrub kernels: HOF parity, positional/distinct hash agreement") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(200)
    val toks = split(col("text"), " ")
    // positional hashes, made distinct, equal the distinct sketch
    // (same seed, same bytes) wherever the document has >= k tokens
    val k = 5
    val hashAgree = docs.select(
      array_sort(array_distinct(
        TextFunctions.positionalShingleHashes(toks, k))).as("p"),
      array_sort(TextFunctions.shingleHashes(toks, k)).as("d"),
      size(toks).as("n"))
      .filter(col("n") >= k)
    assert(hashAgree.filter(col("p") =!= col("d")).count() == 0)
    // ScrubSpans == interpreted HOF formulation, including overlap,
    // unsorted and OUT-OF-RANGE starts (clipped, never a throw)
    val starts = array(lit(7), lit(3), lit(4), lit(9999), lit(-2))
    val parity = docs.select(
      TextFunctions.scrubSpans(toks, starts, k).as("kernel"),
      filter(toks, (t, i) => !exists(starts,
        s => s <= i && i < s + k)).as("hof"))
    assert(parity.filter(col("kernel") =!= col("hof")).count() == 0)
  }

  test("q_dedup_exact keeps one representative per distinct text") {
    val df = TextOps.qDedupExact(spark, sfDir)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    // total copies account for every document
    assert(df.agg(sum("n_copies")).collect().head.getLong(0) == nDocs)
    // keep_ids are distinct doc ids
    assert(df.select("keep_id").distinct().count() == df.count())
  }

  test("q_dedup_exact collapses synthetic duplicates") {
    import spark.implicits._
    // same normalized text, different ids/whitespace/case
    val docs = Seq(
      (1L, "spark catalyst  engine"), (2L, "Spark Catalyst engine"),
      (3L, "a different doc")).toDF("doc_id", "text")
    val norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
    val out = docs.select(col("doc_id"), xxhash64(norm).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("q_dedup_minhash finds the same near-dup pairs as exact jaccard") {
    val exact = TextOps.qJaccardPairs(spark, sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = TextOps.qDedupMinhash(spark, sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // banded output is exact-verified, so it can never contain a
    // non-near-dup; with 16 bands of 4 rows recall at J>=0.8 is ~0.9998,
    // and on this fixed corpus it is total
    assert(banded == exact)
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
  }

  test("minhash on long documents picks the join-back layout; same pairs") {
    import spark.implicits._
    // ~10k-token documents sit FAR past the carried-payload flip point
    // (joinBackFlipShingles = 25 avg shingles), so the adaptive
    // chooser must route them to the join-back verify — and both
    // layouts must produce identical verified pairs regardless.
    // Docs 1 and 2 differ in 200 of ~10k trailing tokens -> J ~ 0.96;
    // doc 3 shares nothing.
    def words(n: Int, seed: Int): Seq[String] =
      (0 until n).map(i => s"w${(i * 31 + seed * 7919) % 100000}_$i")
    val base = words(10000, 0)
    val docs = Seq(
      (1L, base.mkString(" ")),
      (2L, (base.take(9800) ++ words(200, 9)).mkString(" ")),
      (3L, words(10000, 5).map("z" + _).mkString(" ")))
      .toDF("doc_id", "text")
    assert(TextOps.chooseJoinBack(docs), "long docs must take join-back")
    val banded = TextOps.dedupMinhash(docs).collect()
    assert(banded.length == 1)
    assert((banded.head.getLong(0), banded.head.getLong(1)) == (1L, 2L))
    val j = banded.head.getDouble(2)
    assert(j >= 0.9 && j < 1.0, s"jaccard $j")
    // and the banded jaccard equals the exact postings-list jaccard
    val exact = TextOps.jaccardPairs(docs).collect()
    assert(exact.length == 1 && exact.head.getDouble(2) == j)
    // the carried layout agrees pair-for-pair on the same corpus
    val carried = TextOps.minhashPairsCarried(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val joined = TextOps.minhashPairsJoinBack(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(carried == joined && joined.size == 1)
  }

  test("bytes-model layout flip: driver corpus joins back, tiny docs " +
      "stay carried, and the boundary sits where the model says") {
    import spark.implicits._
    // r15 (r14 verdict item 3): the carried/joinback choice is now an
    // exchange-BYTES model, not the r5 wall-time threshold. The driver
    // corpus (~230 avg shingles) sits far past the 25-shingle flip —
    // r14 measured its carried layout reading 149.3 MB of shuffle
    // where joinback moved 38.3 MB at equal wall time — so the chooser
    // must route it to joinback now; and both layouts must still
    // produce the identical verified pairs.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(TextOps.chooseJoinBack(docs),
      "driver corpus must join back under the bytes model")
    val carried = TextOps.minhashPairsCarried(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val joined = TextOps.minhashPairsJoinBack(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(carried == joined && carried.nonEmpty)
    // genuinely tiny documents (~6 distinct shingles) stay carried:
    // their banded rows are overhead-dominated either way, and carried
    // saves two corpus-keyed stages for <2x the joinback bytes
    val tiny = (0 until 200).map(i =>
      (i.toLong, s"alpha beta gamma delta w$i v${i % 7}"))
      .toDF("doc_id", "text")
    assert(!TextOps.chooseJoinBack(tiny),
      "tiny docs must stay carried under the bytes model")
    // the exposed flip point IS the model's zero crossing: the
    // projected carried bytes equal carriedLatencyFactor x joinback
    // bytes exactly at joinBackFlipShingles. Coefficients are READ
    // from TextOps (ADVICE r15 — they derive from the band/signature
    // config, so a width change re-prices model and spec together);
    // the banded-row shape itself is pinned independently: at the
    // current 16-band config the derived values must price a 16-long
    // bsigs array + (band, bhash) + doc_id per row and an 8 B/shingle
    // ride.
    assert(TextOps.carriedFixedBytes ==
      TextOps.minhashBandCount * (8.0 + 8.0 * TextOps.minhashBandCount
        + 12.0))
    assert(TextOps.carriedBytesPerShingle == 8.0 * TextOps.minhashBandCount)
    assert(TextOps.joinbackFixedBytes == TextOps.carriedFixedBytes + 16.0)
    assert(TextOps.joinbackBytesPerShingle == 16.0)
    val s = TextOps.joinBackFlipShingles
    assert(math.abs(
      (TextOps.carriedFixedBytes + TextOps.carriedBytesPerShingle * s) -
        TextOps.carriedLatencyFactor * (TextOps.joinbackFixedBytes +
          TextOps.joinbackBytesPerShingle * s)) < 1e-6)
    assert(!TextOps.joinBackWinsOnBytes(s - 1) &&
      TextOps.joinBackWinsOnBytes(s + 1))
  }

  test("declared dedup queries serve a fitted index: warm runs never re-fit or sample") {
    // cold call fits at most once per (JVM, dir) — earlier tests may
    // already have warmed it; what matters is the counters FREEZE
    TextOps.qDedupMinhash(spark, sfDir).collect()
    val fits = TextOps.fitInvocations.get()
    val samples = TextOps.samplingActions.get()
    assert(fits >= 1)
    val warm = TextOps.qDedupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    TextOps.qDedupClusters(spark, sfDir).collect()
    assert(TextOps.fitInvocations.get() == fits,
      "warm declared invocation re-fitted the index")
    assert(TextOps.samplingActions.get() == samples,
      "declared dedup query ran a plan-time layout-sampling action")
    // the index-served pairs equal the uncached adaptive core's
    val uncached = TextOps
      .dedupMinhash(spark.read.parquet(s"$sfDir/documents.parquet"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(warm == uncached && warm.nonEmpty)
  }

  test("incremental dedup equals a full recompute on a planted cross-split fixture") {
    import spark.implicits._
    import graft.operators.Components
    // Template T of 40 distinct words; K/L perturb opposite ends so
    // J(K,T)=J(L,T)=34/42≈0.81 (near-dup) but J(K,L)=30/46≈0.65 (not):
    // the new doc J=T BRIDGES two base singletons into one component —
    // the hardest incremental case (merging previously-separate base
    // state), alongside extension, new-only, and untouched clusters.
    val t = (1 to 40).map(i => s"w$i")
    def doc(repl: Map[Int, String]): String =
      t.zipWithIndex.map { case (w, i) => repl.getOrElse(i + 1, w) }
        .mkString(" ")
    def run(prefix: String, n: Int, tail: Seq[String] = Nil): String =
      ((1 to n).map(i => s"$prefix$i") ++ tail).mkString(" ")
    val base = Seq(
      1L  -> doc(Map(1 -> "k1", 2 -> "k2", 3 -> "k3", 4 -> "k4")), // K
      2L  -> doc(Map(37 -> "l1", 38 -> "l2", 39 -> "l3", 40 -> "l4")), // L
      10L -> run("a", 30),                            // A ┐ untouched
      11L -> run("a", 28, Seq("x", "y")),             // B ┘ base cluster
      20L -> run("g", 30),                            // G ┐ extended by
      21L -> run("g", 28, Seq("p", "q")),             // H ┘ increment
      30L -> run("s", 25)                             // old singleton
    ).toDF("doc_id", "text")
    val inc = Seq(
      100L -> doc(Map.empty),                         // J=T bridges K,L
      101L -> run("g", 28, Seq("p", "z")),            // I ~ H
      102L -> run("e", 30),                           // E ┐ new-only
      103L -> run("e", 28, Seq("u", "v")),            // F ┘ cluster
      110L -> run("z", 25)                            // new singleton
    ).toDF("doc_id", "text")
    // yesterday's artifacts: a published base index + its label map
    val idx = TextOps.minhashFit(spark, base, java.nio.file.Files
      .createTempDirectory("graft_inc_base_idx").toString)
    val baseStaged = TextOps.stagedFrame(spark, idx)
    val basePairs =
      if (idx.joinBack) TextOps.pairsJoinBackStaged(baseStaged)
      else TextOps.pairsCarriedStaged(baseStaged)
    val baseLabels = Components.labelComponents(
      basePairs.select(col("id_a"), col("id_b"))).localCheckpoint(true)
    // tonight: stage ONLY the increment, probe, extend
    val newStaged = TextOps.stageDocs(inc).localCheckpoint(true)
    val incPairs = TextOps.incrementPairs(baseStaged, newStaged,
      idx.joinBack)
    val all = base.unionByName(inc)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val incremental = rows(Components.flagCorpus(all, "doc_id",
      Components.extendLabels(baseLabels, incPairs)))
    assert(incremental == rows(TextOps.dedupClusters(all)))
    // and the structure is the one planted, not vacuous agreement
    val m = incremental.map(r => r._1 -> r._2).toMap
    assert(m(1L) == 1L && m(2L) == 1L && m(100L) == 1L) // bridged merge
    assert(m(10L) == 10L && m(11L) == 10L)              // untouched
    assert(m(20L) == 20L && m(21L) == 20L && m(101L) == 20L) // extended
    assert(m(102L) == 102L && m(103L) == 102L)          // new-only
    assert(m(30L) == 30L && m(110L) == 110L)            // singletons
  }

  test("q_dedup_incremental: warm runs never re-fit; probe reads only the index") {
    TextOps.qDedupIncremental(spark, sfDir).collect()
    val fits = TextOps.fitInvocations.get()
    val samples = TextOps.samplingActions.get()
    val warm = TextOps.qDedupIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(TextOps.fitInvocations.get() == fits,
      "warm incremental invocation re-fitted the base state")
    assert(TextOps.samplingActions.get() == samples,
      "incremental query ran a plan-time layout-sampling action")
    // incremental result == full-recompute declared clustering (the
    // oracle contract, asserted engine-side too)
    val full = TextOps.qDedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(warm == full && warm.nonEmpty)
    // scan-path audit: the pair probe's executed plan reads parquet
    // ONLY from published artifacts (base index + increment staging) —
    // never the corpus parquet, so the base is provably not re-shingled
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    // ReusedExchangeExec is a LEAF pointing at another subtree's
    // exchange — without resolving it through `child`, a join side can
    // report zero visible scans and the audit below would silently
    // inspect the wrong join (round-8 review follow-up)
    def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case q: QueryStageExec => fileScans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        fileScans(r.child)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(fileScans)
    }
    val st = TextOps.dedupStateFor(spark, sfDir)
    val newIdx = TextOps.minhashFit(spark,
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(TextOps.isIncrementDoc),
      java.nio.file.Files.createTempDirectory("graft_inc_probe").toString)
    val probe = TextOps.incrementPairs(
      TextOps.stagedFrame(spark, st.index),
      TextOps.stagedFrame(spark, newIdx), st.index.joinBack)
    probe.collect()
    val paths = fileScans(probe.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(paths.nonEmpty)
    assert(paths.forall(p => p.contains(st.index.stagedPath) ||
      p.contains(newIdx.stagedPath)),
      s"probe plan scanned outside the published artifacts: $paths")
    // build-side audit (round-8 review): the cross probe's hash join
    // must BUILD over the increment and stream the corpus-sized index —
    // the inverse OOMs executors at the scale this operator exists for
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    def shjs(p: SparkPlan): Seq[ShuffledHashJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => shjs(a.executedPlan)
      case q: QueryStageExec => shjs(q.plan)
      case j: ShuffledHashJoinExec => j +: j.children.flatMap(shjs)
      case other => other.children.flatMap(shjs)
    }
    val joins = shjs(probe.queryExecution.executedPlan)
    assert(joins.nonEmpty)
    def scansPath(p: SparkPlan, path: String) =
      fileScans(p).exists(_.relation.location.rootPaths
        .exists(_.toString.contains(path)))
    // locate the cross join by the side that CANNOT move: the base
    // index scan (the within self-join never touches it) — then pin
    // the index to the stream side and the increment to the build side
    val cross = joins.filter(j => scansPath(j, st.index.stagedPath))
    assert(cross.nonEmpty, "no join touches the base index — plan shape changed?")
    cross.foreach { j =>
      assert(j.buildSide == BuildRight)
      assert(scansPath(j.left, st.index.stagedPath) &&
        !scansPath(j.right, st.index.stagedPath),
        "cross probe must STREAM the corpus-sized index")
      assert(scansPath(j.right, newIdx.stagedPath),
        "cross probe must BUILD over the increment staging")
    }
  }

  test("minhash index: a persisted fit loads self-contained from its path") {
    import spark.implicits._
    val p = java.nio.file.Files
      .createTempDirectory("graft_idx_load").toString
    val fitted = TextOps.minhashFit(spark,
      spark.read.parquet(s"$sfDir/documents.parquet"), p)
    val loaded = TextOps.loadMinhashIndex(spark, p)
    assert(loaded == fitted) // layout decision survives via the marker
    def pairsOf(i: TextOps.MinHashIndex) = {
      val staged = TextOps.stagedFrame(spark, i)
      (if (i.joinBack) TextOps.pairsJoinBackStaged(staged)
       else TextOps.pairsCarriedStaged(staged))
        .orderBy(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    // pairs served from the loaded artifact equal the declared query's
    val viaLoaded = pairsOf(loaded)
    assert(viaLoaded == TextOps.qDedupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    assert(viaLoaded.nonEmpty)
    // the join-back decision roundtrips too (long docs > 512 shingles)
    val p2 = java.nio.file.Files
      .createTempDirectory("graft_idx_load_jb").toString
    val longDocs = Seq(
      (1L, (1 to 600).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 600).map(i => s"u$i").mkString(" "))).toDF("doc_id", "text")
    val f2 = TextOps.minhashFit(spark, longDocs, p2)
    assert(f2.joinBack && TextOps.loadMinhashIndex(spark, p2).joinBack)
  }

  test("forced-layout rides equal the adaptive declared query (oracle contract)") {
    // q_dedup_minhash_carried / q_dedup_minhash_joinback ride the
    // exact-Jaccard DuckDB oracle; their contract is that BOTH verify
    // layouts over the fitted index produce the adaptive query's pairs
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val adaptive = rows(TextOps.qDedupMinhash(spark, sfDir))
    assert(rows(TextOps.qDedupMinhashCarried(spark, sfDir)) == adaptive)
    assert(rows(TextOps.qDedupMinhashJoinback(spark, sfDir)) == adaptive)
    assert(adaptive.nonEmpty)
  }

  test("minhash candidate generation is sparse (emit-once cost guard)") {
    // the emit-once predicate evaluates interpreted per CANDIDATE row;
    // this pins the sparsity its cost model rides on: candidates stay
    // well under all-pairs on the real corpus
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val n = docs.count()
    val cands = TextOps.minhashCandidates(docs).count()
    assert(cands < n * (n - 1) / 2 / 10,
      s"candidates=$cands vs all pairs=${n * (n - 1) / 2}")
    assert(cands > 0)
  }

  test("q_dedup_clusters labels every doc with its component's min id") {
    val pairs = TextOps.qDedupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = TextOps.qDedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(clusters.size.toLong == nDocs) // every doc labeled
    // driver-side union-find truth over the same pair graph
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    clusters.foreach { case (doc, cl) =>
      assert(cl == find(doc), s"doc $doc: got $cl want ${find(doc)}")
    }
    // keep flags: exactly one representative per cluster, and both
    // ends of every pair share a cluster
    val kept = TextOps.qDedupClusters(spark, sfDir).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(kept == clusters.values.toSet)
    pairs.foreach { case (a, b) => assert(clusters(a) == clusters(b)) }
  }

  test("dedup clustering converges on a diameter-9 drift chain") {
    import spark.implicits._
    // 10 documents drifting 10 words per step over a 190-word unique
    // vocabulary: adjacent docs share 90 contiguous words (3-gram
    // jaccard ~0.81 >= 0.8), distance-2 docs only 80 (~0.66 < 0.8) —
    // a PATH graph of diameter 9. Plain neighbor-only propagation
    // needs 9 rounds; the alternating star rounds must still collapse
    // the whole chain to one cluster.
    val words = (0 until 190).map(k => f"w$k%03d")
    val docs = (0 until 10).map { i =>
      (i.toLong, words.slice(i * 10, i * 10 + 100).mkString(" "))
    }.toDF("doc_id", "text")
    // the pair graph really is the adjacent-only path
    val pairs = TextOps.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 9L).map(i => (i, i + 1)).toSet, pairs)
    val clusters = TextOps.dedupClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(clusters.forall(_._2 == 0L),
      s"chain not fully collapsed: ${clusters.mkString(",")}")
    assert(clusters.count(_._3) == 1)
  }

  test("q_token_percentiles ranks match driver-side exact quantiles") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "text").collect()
    val pat = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9 ]")
    def nTokens(t: String): Int = {
      val m = pat.matcher(t.toLowerCase)
      var n = 0
      while (m.find()) n += 1
      n
    }
    val byLang = docs.groupBy(_.getString(0)).view
      .mapValues(_.map(r => nTokens(r.getString(1))).sorted).toMap
    val got = graft.operators.TextOps.qTokenPercentiles(spark, sfDir)
      .collect()
    assert(got.map(_.getString(0)).toSet == byLang.keySet)
    got.foreach { r =>
      val vals = byLang(r.getString(0))
      assert(r.getLong(1) == vals.length.toLong)
      // sketch estimates must sit at (approximately) the right rank:
      // |rank(est)/n - p| bounded by the sketch accuracy + discreteness
      Seq(2 -> 0.5, 3 -> 0.9, 4 -> 0.99).foreach { case (i, p) =>
        val est = r.getInt(i)
        assert(vals.contains(est), s"p$p estimate $est not a data value")
        val lo = vals.count(_ < est).toDouble / vals.length
        val hi = vals.count(_ <= est).toDouble / vals.length
        val tol = 0.02 + 1.0 / vals.length
        assert(p >= lo - tol && p <= hi + tol,
          s"lang ${r.getString(0)} p$p: est=$est rank=[$lo,$hi]")
      }
      assert(r.getInt(2) <= r.getInt(3) && r.getInt(3) <= r.getInt(4))
    }
  }

  test("q_jaccard_pairs values are valid jaccards above threshold") {
    val rows = TextOps.qJaccardPairs(spark, sfDir).collect()
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.8 && j <= 1.0)
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
    }
  }

  test("q_text_stats ratios are consistent") {
    val rows = TextOps.qTextStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_distinct") <= r.getAs[Int]("n_tokens"))
      val ttr = r.getAs[Double]("ttr")
      assert(ttr > 0 && ttr <= 1.0)
      val sr = r.getAs[Double]("stop_ratio")
      assert(sr >= 0 && sr <= 1.0)
      assert(r.getAs[Double]("avg_token_len") > 0)
    }
  }

  test("checked fingerprint rides the same winnowing as the declared query") {
    // different hash, same shingle machinery: per doc the two queries
    // must take min(4, #distinct shingles) components
    def parts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("fingerprint").split("-").length).toMap
    val declared = parts(TextOps.qFingerprint(spark, sfDir))
    val checked = parts(TextOps.qFingerprintChecked(spark, sfDir))
    assert(declared == checked)
    // and the md5 components are well-formed 32-hex strings
    TextOps.qFingerprintChecked(spark, sfDir).collect().take(5).foreach {
      r => r.getAs[String]("fingerprint").split("-").foreach(h =>
        assert(h.matches("[0-9a-f]{32}")))
    }
  }

  test("q_quality_quartiles buckets by exact rank quartiles") {
    val rows = TextOps.qQualityQuartiles(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("mean_freq"),
        r.getAs[Int]("quartile")))
    assert(rows.length == 500)
    // independent check: sort by score; each bucket's scores must all
    // be <= the next bucket's (bucketing respects the global order)
    val byQ = rows.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byQ.keySet == Set(1, 2, 3, 4))
    for (q <- 1 to 3)
      assert(byQ(q).max <= byQ(q + 1).min,
        s"quartile $q overlaps ${q + 1}")
    // bucket mass stays a quarter each, up to boundary ties (the exact
    // rank CONVENTION is the oracle's job — quantile_disc equality)
    for (q <- 1 to 4) {
      val n = byQ(q).length
      assert(n >= 100 && n <= 150, s"quartile $q holds $n of 500")
    }
    // equal scores never straddle a bucket boundary
    rows.groupBy(_._2).values.foreach { same =>
      assert(same.map(_._3).distinct.length == 1)
    }
  }

  test("q_vocab_topk matches a driver-side full recount") {
    val got = TextOps.qVocabTopk(spark, sfDir).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt")))
    // independent recount over the raw text, same top-100 cut
    val counts = scala.collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect()
      .foreach(_.getAs[String]("text").split(" ", -1)
        .foreach(t => counts(t) = counts.getOrElse(t, 0L) + 1))
    val want = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(100)
    assert(got.toSeq == want)
  }

  test("vocab top-k cut is by count then token, and k binds") {
    import spark.implicits._
    val fixture = Seq((1L, "b b b a a c c z"), (2L, "a z"))
      .toDF("doc_id", "text")
    val top3 = TextOps.vocabTopk(fixture, k = 3).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt")))
    // a=3, b=3, c=2, z=2 -> ties broken by token text at both ranks
    assert(top3.toSeq == Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("vocab plan: partial aggregate before the shuffle, top-k not a global sort") {
    val df = TextOps.qVocabTopk(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // map-side combine: a partial_count aggregate must sit under the
    // exchange, and the limit must run as TakeOrderedAndProject rather
    // than a full Sort of the vocabulary
    assert(plan.contains("partial_count"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q_tfidf_topk matches a driver-side recompute bit-for-bit") {
    val got = TextOps.qTfidfTopk(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("token"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Double]("score")))
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val n = texts.length.toLong
    val tf = texts.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity).map { case (tok, hits) =>
        (id, tok, hits.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (tok, rs) => tok -> rs.length.toLong }
    val want = tf.groupBy(_._1).toSeq.flatMap { case (id, rs) =>
      rs.map { case (_, tok, f) =>
        val d = df(tok)
        (id, tok, f, d, f.toDouble * (n - d + 0.5) / (d + 0.5))
      }.sortBy { case (_, tok, _, _, s) => (-s, tok) }.take(5)
    }.sortBy { case (id, tok, _, _, s) => (id, -s, tok) }
    assert(got.toSeq == want) // exact, scores included: same IEEE ops
  }

  test("tfidf plan: one corpus shuffle, df and n broadcast back") {
    val q = TextOps.qTfidfTopk(spark, sfDir)
    q.collect() // finalize AQE on THIS QueryExecution (write spawns its own)
    val plan = q.queryExecution.executedPlan.toString
    // the doc_id repartition serves the tf aggregate AND the window
    // (subset rule): neither the (doc_id, token) grouping nor the
    // doc_id window plans an exchange of its own, and the df branch's
    // identical repartition collapses to a ReusedExchange at runtime —
    // leaving that one corpus shuffle plus the vocabulary-sized token
    // exchange
    assert(!"hashpartitioning\\(doc_id[^)]*token".r.findFirstIn(plan)
      .isDefined, s"tf aggregate planned its own exchange:\n$plan")
    assert(!("hashpartitioning\\(doc_id[^)]*ENSURE_REQUIREMENTS".r
      .findFirstIn(plan).isDefined),
      s"window planned its own doc_id exchange:\n$plan")
    val corpusEx =
      "Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).size
    assert(corpusEx <= 1 || plan.contains("ReusedExchange"),
      s"df branch re-shuffled the corpus instead of reusing:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan) // df joins broadcast
    assert(plan.contains("BroadcastNestedLoopJoin"), plan) // 1-row n
  }

  test("q_colloc_pmi matches a driver-side recompute bit-for-bit") {
    val got = TextOps.qCollocPmi(spark, sfDir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c_xy"), r.getAs[Double]("lift")))
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getAs[String]("text"))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    var nUni = 0L; var nBi = 0L
    texts.foreach { t =>
      val w = t.split(" ", -1)
      w.foreach { x => uni(x) = uni.getOrElse(x, 0L) + 1; nUni += 1 }
      w.sliding(2).foreach {
        case Array(a, b) =>
          big((a, b)) = big.getOrElse((a, b), 0L) + 1; nBi += 1
        case _ => ()
      }
    }
    val want = big.toSeq.collect { case ((a, b), c) if c >= 5 =>
      // the exact op chain of the query: /, /, *, *, / left to right
      (a, b, c, c.toDouble / uni(a) / uni(b) * nUni * nUni / nBi)
    }.sortBy { case (a, b, _, s) => (-s, a, b) }.take(50)
    assert(got.toSeq == want)
  }

  test("colloc bigrams: single-token docs contribute nothing, pairs span no doc boundary") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "x"), (2L, "a b a b a b a b a b"), (3L, "b a")
    ).toDF("doc_id", "text")
    val got = TextOps.collocPmi(fixture, k = 10, minCount = 1L).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c_xy"))).toSet
    // doc 2: 5x (a,b) + 4x (b,a); doc 3: 1x (b,a); doc 1: none; and no
    // phantom (x,a)/(b,x) pairs across document boundaries
    assert(got.map(p => (p._1, p._2) -> p._3).toMap ==
      Map(("a", "b") -> 5L, ("b", "a") -> 5L))
  }

  test("q_lang_id picks the argmax with deterministic ties") {
    val rows = TextOps.qLangId(spark, sfDir).collect()
    rows.foreach { r =>
      val (en, de, fr) = (r.getAs[Int]("score_en"),
        r.getAs[Int]("score_de"), r.getAs[Int]("score_fr"))
      val pred = r.getAs[String]("pred_lang")
      val best = math.max(en, math.max(de, fr))
      val expected = if (en == best) "en" else if (de == best) "de" else "fr"
      assert(pred == expected)
    }
  }

  test("q_simhash signatures are 64-bit and close for near-dups") {
    val sig = TextOps.qSimhash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    sig.values.foreach(s => assert(s.length == 64 &&
      s.forall(c => c == '0' || c == '1')))
    def hamming(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    // near-dup pairs (exact jaccard >= 0.8) must be within small hamming
    val pairs = TextOps.qJaccardPairs(spark, sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(hamming(sig(a), sig(b)) <= 16,
        s"near-dup pair ($a,$b) hamming ${hamming(sig(a), sig(b))}")
    }
    // ...and clearly closer than the average unrelated pair (~32)
    val nearAvg = pairs.map { case (a, b) => hamming(sig(a), sig(b)) }
      .sum.toDouble / pairs.length
    val ids = sig.keys.toSeq.sorted
    val farAvg = ids.take(30).zip(ids.reverse.take(30))
      .filterNot(p => pairs.contains(p))
      .map { case (a, b) => hamming(sig(a), sig(b)) }
    assert(farAvg.nonEmpty &&
      nearAvg < farAvg.sum.toDouble / farAvg.size)
  }

  test("q_simhash_checked matches a driver-side md5 recompute") {
    val got = TextOps.qSimhashChecked(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.size == docs.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String = {
      md.reset()
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    docs.foreach { case (id, text) =>
      val cnt = new Array[Int](64)
      // split(" ", -1) mirrors Spark's split default (trailing empties kept)
      text.split(" ", -1).foreach { tok =>
        val h = md5hex(tok)
        val hi = java.lang.Long.parseLong(h.substring(0, 8), 16)
        val lo = java.lang.Long.parseLong(h.substring(8, 16), 16)
        (0 until 64).foreach { b =>
          val bit = if (b >= 32) (hi >>> (b - 32)) & 1L else (lo >>> b) & 1L
          if (bit == 1L) cnt(b) += 1 else cnt(b) -= 1
        }
      }
      val want = (63 to 0 by -1).map(b => if (cnt(b) > 0) '1' else '0').mkString
      assert(got(id) == want, s"doc $id")
    }
  }

  test("q_fingerprint is deterministic and shaped") {
    val a = TextOps.qFingerprint(spark, sfDir).collect()
    val b = TextOps.qFingerprint(spark, sfDir).collect()
    assert(a.sameElements(b))
    a.foreach { r =>
      val parts = r.getString(1).split("-")
      assert(parts.length <= 4 && parts.nonEmpty)
      parts.foreach(p => assert(p.matches("[0-9a-f]{16}")))
    }
  }

  test("q_token_count segmentations are consistent") {
    val rows = TextOps.qTokenCount(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ws = r.getAs[Int]("n_ws_tokens")
      val bpe = r.getAs[Int]("n_bpe_tokens")
      // space-free lowercase word corpus: every ws token is a letter run,
      // so the BPE-ish segmentation can only split further, never merge
      assert(bpe >= ws)
      assert(r.getAs[Double]("chars_per_token") > 0)
    }
  }

  test("fused text expressions are bit-identical to the xxhash64 built-in") {
    import spark.implicits._
    val docs = Seq("a b c d e", "one two", "x", "repeat repeat repeat x y",
      "ä ö ü ß unicode tokens here").toDF("text")
    val w = split(lower(col("text")), " ")
    val n = size(w)
    // round-2 HOF formulation of the shingle hashes
    val shOld = when(n >= 3,
      array_distinct(transform(
        arrays_zip(slice(w, lit(1), n - 2), slice(w, lit(2), n - 2),
          slice(w, lit(3), n - 2)),
        t => concat_ws(" ", t("0"), t("1"), t("2")))))
      .otherwise(array_distinct(array(concat_ws(" ", w))))
    docs.select(
      graft.functions.TextFunctions.shingleHashes(w, 3).as("fused"),
      transform(shOld, x => xxhash64(x)).as("hof"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      }
    // simhash votes use the same per-token hash as xxhash64(token)
    val tokenHashes = docs.select(col("text"),
      transform(w, t => xxhash64(t)).as("th")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    docs.select(col("text"),
      graft.functions.TextFunctions.simhash64(w).as("sig")).collect()
      .foreach { r =>
        val cnt = new Array[Int](64)
        tokenHashes(r.getString(0)).foreach { h =>
          (0 until 64).foreach { b =>
            if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
          }
        }
        val want = (63 to 0 by -1)
          .map(b => if (cnt(b) > 0) '1' else '0').mkString
        assert(r.getString(1) == want, r.getString(0))
      }
  }

  test("q_heavy_hitters is exact below capacity and matches the recount") {
    val got = TextOps.qHeavyHitters(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t")).collect()
      .map(_.getString(0)).groupBy(identity)
      .map { case (t, ts) => (t, ts.length.toLong) }.toSeq
      .sortBy { case (t, n) => (-n, t) }.take(20)
    assert(got.toSeq == want)
  }

  test("Misra-Gries under capacity pressure keeps both published bounds") {
    import spark.implicits._
    // 3 hot tokens (600 each) + 120 cold singleton tokens, capacity 16:
    // decrements MUST fire, hot tokens MUST survive
    val toks = (Seq.fill(600)(Seq("hot_a", "hot_b", "hot_c")).flatten ++
      (0 until 120).map(i => s"cold_$i")).mkString(" ")
    val docs = Seq((1L, toks)).toDF("doc_id", "text")
    val n = 3 * 600 + 120
    val cap = 16
    val summary = TextOps.heavyHitters(docs, capacity = cap, k = 1000)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val truth = Map("hot_a" -> 600L, "hot_b" -> 600L, "hot_c" -> 600L)
      .withDefaultValue(1L)
    assert(summary.length <= cap)
    summary.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t overcounted") // lower-bound property
      assert(truth(t) - est <= n / (cap + 1), s"$t undercount too large")
    }
    // guaranteed presence: true count > N/(capacity+1)
    Seq("hot_a", "hot_b", "hot_c").foreach { t =>
      assert(summary.exists(_._1 == t), s"$t missing from summary")
    }
  }

  test("q_heavy_hitters_by_lang cuts per-group top-5 exactly") {
    val got = TextOps.qHeavyHittersByLang(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val counts = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .groupBy("lang", "t").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = counts.groupBy(_._1).toSeq.flatMap { case (_, ts) =>
      ts.sortBy { case (_, t, n) => (-n, t) }.take(5)
    }.sortBy { case (l, t, n) => (l, -n, t) }
    assert(got.toSeq == want)
    assert(got.map(_._1).distinct.length > 1) // several languages cut
  }

  test("heavy-hitter summaries are partitioning-independent when exact") {
    import spark.implicits._
    val docs = (0 until 64).map(i => (i.toLong, s"tok_${i % 7} shared"))
      .toDF("doc_id", "text")
    val a = TextOps.heavyHitters(docs.repartition(1), capacity = 32)
      .collect().toSeq
    val b = TextOps.heavyHitters(docs.repartition(13), capacity = 32)
      .collect().toSeq
    assert(a == b)
  }

  test("q_score_deciles matches a driver-side exact-percentile recompute") {
    val got = TextOps.qScoreDeciles(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Int]("decile")))
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val scores = texts.map { case (id, t) =>
      val w = t.split(" ", -1)
      id -> (w.distinct.length.toDouble / w.length)
    }
    // Spark's exact percentile interpolation (the outlier-spec rule)
    def pct(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted
      val rank = p * (s.length - 1)
      val lo = rank.toInt
      if (lo + 1 >= s.length) s(lo)
      else s(lo) + (s(lo + 1) - s(lo)) * (rank - lo)
    }
    val cuts = (1 to 9).map(i => pct(scores.map(_._2).toSeq, i / 10.0))
    val want = scores.map { case (id, sc) =>
      (id, sc, 1 + cuts.count(sc > _))
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // all ten buckets exist on the generated corpus and assignment is
    // monotone in score
    assert(got.map(_._3).distinct.sorted.toSeq == (1 to 10))
    val byScore = got.sortBy(_._2)
    byScore.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3)
      case _ =>
    }
  }

  test("q_lm_score matches a driver-side bigram-model recompute") {
    val got = TextOps.qLmScore(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("n_known"), r.getAs[Long]("s_known"),
        r.getAs[Double]("coverage"), r.getAs[Double]("familiarity")))
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def bigrams(t: String): Seq[String] = {
      val w = t.split(" ", -1)
      if (w.length < 2) Seq.empty
      else w.init.zip(w.tail).map { case (a, b) => s"$a $b" }.toSeq
    }
    val all = texts.flatMap { case (_, t) => bigrams(t) }
    val counts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val model = counts.toSeq.sortBy { case (b, n) => (-n, b) }
      .take(10000).toMap
    val bigNTotal = counts.values.sum
    val want = texts.map { case (id, t) =>
      val bs = bigrams(t)
      val known = bs.filter(model.contains)
      val s = known.map(model).sum
      val n = bs.length.toLong
      val cov = if (n == 0) 0.0 else known.length.toDouble / n.toDouble
      val fam = if (n == 0) 0.0
        else s.toDouble / (bigNTotal.toDouble * n.toDouble)
      (id, n, known.length.toLong, s, cov, fam)
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    // the score family actually discriminates on the generated corpus
    assert(got.map(_._6).distinct.length > 1)
  }

  test("lm score fixture: familiarity ranks repeated text above rare text; ties and short docs") {
    import spark.implicits._
    val fx = Seq(
      (1L, "a b a b a b"), // bigrams: a-b x3, b-a x2 — all in-model
      (2L, "x y"),         // one rare bigram, out of a k=2 model
      (3L, "z"))           // single token: zero bigrams
      .toDF("doc_id", "text")
    val rows = TextOps.lmScore(fx, 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_known"),
          r.getAs[Long]("s_known"), r.getAs[Double]("coverage"),
          r.getAs[Double]("familiarity"))).toMap
    // model (k=2, count desc / bigram asc): {"a b" -> 3, "b a" -> 2};
    // corpus total N = 6
    assert(rows(1L) == ((5L, 5L, 13L, 1.0, 13.0 / (6.0 * 5.0))))
    assert(rows(2L) == ((1L, 0L, 0L, 0.0, 0.0)))
    assert(rows(3L) == ((0L, 0L, 0L, 0.0, 0.0)))
    // K-boundary tie: with k=3 the tied count-1 bigrams cut on the
    // bigram's ascending order — "x y" enters, "x z" stays out
    val fx2 = fx.union(Seq((4L, "x z")).toDF("doc_id", "text"))
    val r2 = TextOps.lmScore(fx2, 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_known")).toMap
    assert(r2(2L) == 1L && r2(4L) == 0L)
  }

  test("lm score plan: published-model serve, broadcast probe; fit " +
      "runs once and the artifact matches the inline fit") {
    // r16: the declared query serves the PUBLISHED bigram model — the
    // fit's TakeOrderedAndProject no longer appears in the per-query
    // plan (it ran once, at publish). Warm plan: parquet model scan
    // broadcast into the scoring join, nothing else.
    val q = TextOps.qLmScore(spark, sfDir)
    q.collect()
    val fits = TextOps.lmFitInvocations.get()
    val q2 = TextOps.qLmScore(spark, sfDir)
    q2.collect()
    assert(TextOps.lmFitInvocations.get() == fits,
      "LM model fit re-ran on a warm query")
    val plan = q2.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // scoring probes the broadcast model — the corpus-side join never
    // shuffles on bigram; the K-cut sort is NOT in the serving plan
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // and the served scores equal the inline-fit formulation (the
    // oracle's shape) bit-for-bit
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(key(q2) == key(TextOps.lmScore(
      graft.sources.Tables.documents(spark, sfDir), 10000)))
  }

  test("classifier serve: fit runs once; served scores equal the " +
      "inline-fit formulation") {
    TextOps.qClassifySource(spark, sfDir).collect()
    val fits = TextOps.classifierFitInvocations.get()
    val served = TextOps.qClassifySource(spark, sfDir)
    val rows = served.collect()
    assert(TextOps.classifierFitInvocations.get() == fits,
      "classifier fit re-ran on a warm query")
    def key(rs: Array[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    assert(key(rows) == key(TextOps.classifySource(
      graft.sources.Tables.documents(spark, sfDir), 2000).collect()))
  }

  test("q_score_deciles_approx: >=99% agreement with exact, all buckets, sorted cuts") {
    val exact = TextOps.qScoreDeciles(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("decile")).toMap
    val approx = TextOps.qScoreDecilesApprox(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Int]("decile")))
    assert(approx.length == exact.size)
    // GK rank error can move only boundary documents, and only into an
    // adjacent decile
    val agree = approx.count { case (id, _, d) => exact(id) == d }
    assert(agree.toDouble / approx.length >= 0.99,
      s"agreement ${agree.toDouble / approx.length}")
    approx.foreach { case (id, _, d) =>
      assert(math.abs(exact(id) - d) <= 1, s"doc $id: $d vs ${exact(id)}")
    }
    assert(approx.map(_._3).distinct.sorted.toSeq == (1 to 10))
    val byScore = approx.sortBy(_._2)
    byScore.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3)
      case _ =>
    }
  }

  test("score deciles plan: no corpus shuffle, cutoffs broadcast back") {
    val q = TextOps.qScoreDeciles(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the only exchange is the 9-cut aggregate's SinglePartition
    // gather; bucketing is row-local against the broadcast cuts (the
    // anti-pattern would be a global-sort ntile window)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q_edit_pairs equals a driver-side brute-force distance scan") {
    val got = TextOps.qEditPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"),
        r.getAs[Int]("dist"))).toSeq
    val heads = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        substring(col("text"), 1, 30).as("head"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("head")))
    def lev(s: String, t: String): Int = {
      val d = Array.tabulate(s.length + 1, t.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to s.length; j <- 1 to t.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
      d(s.length)(t.length)
    }
    val want = (for {
      a <- heads; b <- heads
      if a._2 == b._2 && a._1 < b._1
      dist = lev(a._3, b._3) if dist <= 3
    } yield (a._1, b._1, dist)).sortBy(p => (p._1, p._2)).toSeq
    assert(got == want)
    assert(want.nonEmpty) // the corpus really has near-miss heads
  }

  test("q_edit_clusters labels match a driver-side union-find over the pairs") {
    val pairs = TextOps.qEditPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // compress fully, then min-id per component
    val want = ids.map(i => (i, find(i))).toMap
    val got = TextOps.qEditClusters(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Boolean]("is_kept")))
    assert(got.length == ids.length)
    got.foreach { case (id, cl, kept) =>
      assert(cl == want(id), s"doc $id")
      assert(kept == (cl == id))
    }
    assert(got.exists(!_._3)) // the corpus really has dropped dups
  }

  test("editDistancePairs emits each qualifying pair exactly once") {
    import spark.implicits._
    // equal heads (multi-segment matches must dedup to one pair),
    // insert-shifted segments, a length-gap-pruned pair, a cross-lang
    // pair, and shorts-channel strings below the d+1 partition floor
    val docs = Seq(
      (1L, "en", "abcd"),     // len 4: one 1-char segment per slot
      (2L, "en", "abcd"),     // dist 0: all four segments match
      (3L, "en", "abcdefg"),  // dist 3 to abcd (shifted segments)
      (4L, "en", "abcdefgh"), // dist 1 to abcdefg; len-gap 4 to abcd
                              // => pruned before any DP
      (5L, "de", "abcd"),     // other lang: never paired
      (6L, "en", "ab"),       // shorts channel (len <= d)
      (7L, "en", "ba")        // dist 2 to "ab"; dist 3 to "abcd"
    ).toDF("doc_id", "lang", "text")
    val got = TextOps.editDistancePairs(docs, 30, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 2L, 0), (1L, 3L, 3), (1L, 6L, 2), (1L, 7L, 3),
      (2L, 3L, 3), (2L, 6L, 2), (2L, 7L, 3), (3L, 4L, 1), (6L, 7L, 2)))
  }

  test("hot-cell salting is invisible in the pair set: a saturated " +
      "segment cell equals brute force") {
    import spark.implicits._
    // r16 (found by the sf10 sweep): a corpus whose heads share a
    // segment value floods one (lang, kseg) cell past editSaltCap —
    // the join then salts that cell (build rows replicate, probe rows
    // hash to one salt) so its DP spreads across tasks. The pair set
    // must be IDENTICAL to an unsalted brute-force DP sweep: 300 docs
    // share the idx-0 segment "commonaa" (> cap 256), tails make some
    // pairs near (ed <= 3) and most far.
    val rnd = new scala.util.Random(20260816)
    val docs = (0 until 300).map { i =>
      val tail = (0 until 12)
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      (i.toLong, "en", s"commonaacommonbbcommoncc$tail")
    }.toDF("doc_id", "lang", "text")
    assert(graft.operators.TextOps.editSaltCap < 300)
    val got = TextOps.editDistancePairs(docs, 30, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val heads = docs.collect()
      .map(r => r.getLong(0) -> r.getString(2).take(30))
    def ed(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i =>
        Array.tabulate(b.length + 1)(j => if (i == 0) j
          else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val want = (for {
      (ia, ha) <- heads; (ib, hb) <- heads if ia < ib
      d = ed(ha, hb) if d <= 3
    } yield (ia, ib, d)).toSet
    assert(got == want,
      s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty, "vacuous fixture: no near pairs")
  }

  test("multi-match probe window is lossless on randomized corpora") {
    import spark.implicits._
    // the r11 window tightening (|x| + |Δ−x| ≤ d, first-match |Δ−x| ≤
    // d−i, end-truncation dropping) is derived, not copied — sweep it
    // against brute force over dense random corpora: a tiny alphabet
    // maximizes near-pair density and string lengths 0..12 cross every
    // regime (shorts ≤ d, 1-char segments, uneven segment splits)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val rnd = new scala.util.Random(20260814)
    (1 to 3).foreach { round =>
      val docs = (1 to 40).map { i =>
        val len = rnd.nextInt(13)
        (i.toLong, "en",
          (1 to len).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString)
      }
      val got = TextOps.editDistancePairs(
          docs.toDF("doc_id", "lang", "text"), 30, 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (ia, _, ta) <- docs; (ib, _, tb) <- docs if ia < ib
        d = lev(ta, tb) if d <= 3
      } yield (ia, ib, d)).toSet
      assert(got == want,
        s"round $round: missing=${want -- got} spurious=${got -- want}")
    }
  }

  test("lm score is partitioning-independent (order-free long accumulators)") {
    import spark.implicits._
    val fx = (1L to 30L).map(i =>
      (i, (1 to (i % 7).toInt + 1).map(j => s"w${(i + j) % 9}").mkString(" ")))
      .toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("s_known"),
        r.getAs[Double]("coverage"), r.getAs[Double]("familiarity"))).toSeq
    val one = key(TextOps.lmScore(fx.coalesce(1), 5))
    val many = key(TextOps.lmScore(fx.repartition(7), 5))
    assert(one == many)
  }

  test("edit-join shorts channel exposes degenerate corpora, silent on healthy ones") {
    import spark.implicits._
    // the real corpus has no near-empty heads: the metric is empty
    assert(TextOps.editShortsHotCells(
      graft.sources.Tables.documents(spark, sfDir), 30, 3).collect().isEmpty)
    // a near-empty-document corpus overfills the (lang, short) cell and
    // the accounting names it with its size, per lang
    val degenerate = (1 to 70).map(i => (i.toLong, "xx", "ab")) ++
      (1 to 10).map(i => (100L + i, "yy", "cd")) // below cap: silent
    val docs = degenerate.toDF("doc_id", "lang", "text")
    val hot = TextOps.editShortsHotCells(docs, 30, 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(hot == Seq(("xx", "short", 70L)))
  }

  test("shorts-channel cap: O(k) star candidates, clusters stay exact") {
    import spark.implicits._
    // a pure near-empty-document cell above the cap: 100 EMPTY heads in
    // one lang — the one population whose pairs can meet ONLY in the
    // shorts cell (every normal segment is empty and filtered), so the
    // emission count isolates the cap. Every pair is within d=3 by
    // construction (ed of two strings never exceeds the longer length).
    val shorts = (1 to 100).map(i => (i.toLong, "xx", ""))
    val docs = (shorts ++ Seq(
      (200L, "xx", "abcdefgh"),      // len 8 > 2d: outside the channel
      (201L, "en", ""), (202L, "en", "") // healthy-sized cell
    )).toDF("doc_id", "lang", "text")
    // UNCAPPED (cap above the cell): the exact all-pairs emission
    val unc = graft.operators.TextOps
      .editDistancePairs(docs, 30, 3, shortsCap = 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unc.count(p => p._1 <= 100 && p._2 <= 100) == 100 * 99 / 2)
    // CAPPED (default cap 64 < 100): the hot cell star-reduces to the
    // min-id build row — O(k) candidates, every one DP-surviving
    val capped = graft.operators.TextOps
      .editDistancePairs(docs, 30, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cellPairs = capped.filter(p => p._1 <= 100 && p._2 <= 100)
    assert(cellPairs == (2 to 100).map(j => (1L, j.toLong)).toSet,
      s"expected a pure star on doc 1, got ${cellPairs.size} pairs")
    // the below-cap lang is untouched: exact pair, both paths
    assert(capped.contains((201L, 202L)) && unc.contains((201L, 202L)))
    // CLUSTERS stay exact through the cap: the star edges all survive
    // the DP (ed ≤ max len ≤ d), so the capped component equals the
    // uncapped/brute-force component exactly
    def clusters(pairs: Set[(Long, Long)]) = {
      val labeled = graft.operators.Components.labelComponents(
        pairs.toSeq.toDF("id_a", "id_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      docs.select("doc_id").collect().map(_.getLong(0))
        .map(id => id -> labeled.getOrElse(id, id)).toMap
    }
    assert(clusters(capped) == clusters(unc))
    // and the hot-cell metric names exactly the capped cell
    val hot = graft.operators.TextOps.editShortsHotCells(docs, 30, 3)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(hot == Seq(("xx", 100L)))
  }

  test("simhash block join is lossless vs brute-force Hamming; exact family") {
    import spark.implicits._
    // randomized corpora with planted near-dups (a dup with one token
    // changed flips few signature bits): the block-combination
    // pigeonhole join must return EXACTLY the brute-force Hamming <= 3
    // sweep — for EVERY block plan the adaptive rule can pick (B=4 is
    // what fixture-sized n selects; 5/6/8 are the log₂(n)-scaled
    // plans, exercised here by forcing the plan)
    val rnd = new scala.util.Random(20260814)
    (1 to 3).foreach { round =>
      val base = (1 to 60).map { i =>
        (i.toLong, (1 to 30).map(_ => s"w${rnd.nextInt(300)}").mkString(" "))
      }
      val dups = (1 to 12).map { j =>
        val (src, t) = base(rnd.nextInt(60))
        (1000L + j, t.split(" ").updated(rnd.nextInt(30), s"q$j")
          .mkString(" ") + (if (j % 3 == 0) "" else ""))
      }
      val docs = (base ++ dups).toDF("doc_id", "text")
      val sigs = graft.operators.TextOps.simhashMd5Halves(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = (for {
        (ia, ha, la) <- sigs; (ib, hb, lb) <- sigs if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) +
          java.lang.Long.bitCount(la ^ lb) if d <= 3
      } yield (ia, ib, d)).toSet
      assert(want.nonEmpty, s"round $round planted no near pairs")
      val auto = graft.operators.TextOps.simhashPairs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(auto == want,
        s"round $round auto: missing=${want -- auto} spurious=${auto -- want}")
      Seq(5, 6, 8).foreach { b =>
        val got = graft.operators.TextOps.simhashPairsPlanned(docs, b)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(got == want,
          s"round $round B=$b: missing=${want -- got} spurious=${got -- want}")
      }
    }
    // the adaptive rule itself: key bits track log₂ n
    assert(graft.operators.TextOps.simhashBlockPlan(1000L) == 4)
    assert(graft.operators.TextOps.simhashBlockPlan(50000L) == 5)
    assert(graft.operators.TextOps.simhashBlockPlan(10000000L) == 6)
    assert(graft.operators.TextOps.simhashBlockPlan(1000000000L) == 8)
    // and every plan's widths tile the 64 bits exactly
    Seq(4, 5, 6, 8).foreach { b =>
      assert(graft.operators.TextOps.simhashBlockWidths(b).sum == 64)
      assert(graft.operators.TextOps.simhashCombos(b).size ==
        (b * (b - 1) * (b - 2)) / 6)
    }
  }

  test("simhash clusters: a 120-identical-doc mega-cluster costs O(k) " +
      "edges and no pair-level shuffle work") {
    import spark.implicits._
    // r12 verdict item 1c — the clusters consumer must not pay the
    // clique's O(k²): identical signatures collapse to identity stars
    // BEFORE the block join, so the banded side sees one row per
    // distinct signature and the emitted edge set is linear
    val k = 120
    val cluster = (0 until k).map(i =>
      (i.toLong, "boilerplate cookie banner accept terms privacy " +
        "policy contact about careers sitemap all rights reserved"))
    val fillers = (0 until 8).map(i =>
      (1000L + i, (0 until 40).map(j => s"w${i * 977 + j * 31}_$j")
        .mkString(" ")))
    val docs = (cluster ++ fillers).toDF("doc_id", "text")
    val edges = graft.operators.TextOps.simhashClusterEdges(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.length == edges.toSet.size, "duplicate edges")
    val clusterEdges = edges.filter(e => e._1 < 1000L && e._2 < 1000L)
    // exactly the k-1 identity star edges — not C(k,2) pairs
    assert(clusterEdges.toSet ==
      (1 until k).map(i => (i.toLong, 0L)).toSet,
      s"expected ${k - 1} identity edges, got ${clusterEdges.length}")
    // and the distinct-signature banded side carries no hot bucket —
    // the identity collapse already absorbed the duplication mass
    // (correlated-corpus hot buckets are a different phenomenon the
    // edge builder documents; this fixture has none)
    val sig = graft.operators.TextOps.simhashMd5Halves(docs)
    val reps = sig.groupBy(col("sig_hi"), col("sig_lo"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("sig_hi"), col("sig_lo"))
    val banded = graft.operators.TextOps.simhashKeyed(reps, 4)
    assert(graft.operators.BandedJoins
      .hotBuckets(banded, "band", "key").count() == 0)
    // cluster answer stays exactly right
    val got = graft.operators.Components.flagCorpus(docs, "doc_id",
        graft.operators.Components.labelComponents(
          graft.operators.TextOps.simhashClusterEdges(docs)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    (0 until k).foreach { i =>
      assert(got(i) == ((i.toLong, 0L, i == 0)), s"doc $i: ${got(i)}")
    }
    fillers.indices.foreach { i =>
      assert(got(k + i) == ((1000L + i, 1000L + i, true)))
    }
  }

  test("EditFirstMatch finds a witness for every true pair and the " +
      "emit-once joins stay exact (randomized)") {
    import spark.implicits._
    // expression-level completeness mirror: any pair within the length
    // gate at ed <= 3 must have a first-match key (the same
    // multi-match-aware window theorem the join relies on); pairs
    // outside the gate return -99
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    val rnd = new scala.util.Random(20260817)
    val fm = graft.functions.EditFirstMatch(
      org.apache.spark.sql.catalyst.expressions.Literal("x"),
      org.apache.spark.sql.catalyst.expressions.Literal("y"), 3)
    def firstMatch(a: String, b: String): Int = fm.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    var truePairs = 0
    (1 to 4000).foreach { _ =>
      def s(): String = (0 until rnd.nextInt(10))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val (a, b) = (s(), s())
      val m = firstMatch(a, b)
      if (math.abs(a.length - b.length) > 3)
        assert(m == -99, s"('$a','$b') outside gate but matched $m")
      else if (lev(a, b) <= 3) {
        assert(m != -99, s"true pair ('$a','$b') found no witness")
        truePairs += 1
      }
    }
    assert(truePairs > 500, s"vacuous sweep: only $truePairs true pairs")
  }

  test("fused EditProbeKeys equals the HOF window enumeration: same " +
      "key set, same first-occurrence order (randomized heads)") {
    import spark.implicits._
    // r15: the probe rows run the codegen'd expression; the HOF chain
    // is retained as the specification formulation. Any divergence
    // (a missed window, a duplicate key, a reordered array) changes
    // the candidate stream, so this pins full equality — including
    // empty heads (shorts only), shorts-boundary lengths, and heads
    // longer than every assumed-length window.
    val rnd = new scala.util.Random(20260816)
    val heads = (Seq("", "a", "ab", "abc", "abcdef") ++
      (1 to 300).map(_ => (0 until rnd.nextInt(40))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString))
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val keyed = heads.toDF("doc_id", "head")
      .withColumn("len", length(col("head")))
    val fused = keyed.select(col("doc_id"),
      graft.functions.TextFunctions.editProbeKeys(col("head"), 3)
        .as("keys"))
    val hof = keyed.select(col("doc_id"),
      array_distinct(filter(
        graft.operators.TextOps.editProbeKeysHof(3),
        s => length(s.getField("seg")) > 0)).as("keys"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(s => (s.getInt(0), s.getString(1), s.getInt(2)))
          .toList).toMap
    val (f, h) = (rows(fused), rows(hof))
    assert(f == h, heads.collectFirst {
      case (id, head) if f(id) != h(id) =>
        s"head '$head': fused=${f(id)} hof=${h(id)}"
    }.getOrElse(""))
    assert(f.values.map(_.size).sum > 3000, "vacuous sweep")
  }

  test("EditEmitAt is decision-identical to idx == EditFirstMatch " +
      "over randomized heads and every key index (incl. out-of-range)") {
    // r15: the joins moved from `kseg.idx === firstMatch(a, b)` to the
    // join-aware EditEmitAt (probes the colliding window first, scans
    // only strictly-earlier windows). Emit decisions must be identical
    // bit-for-bit across the whole input space: in-gate, out-of-gate,
    // shorts-regime, and garbage idx values the SQL surface can feed.
    val rnd = new scala.util.Random(20260815)
    val lit = org.apache.spark.sql.catalyst.expressions.Literal("x")
    val d = 3
    val fm = graft.functions.EditFirstMatch(lit, lit, d)
    val ea = graft.functions.EditEmitAt(lit, lit, lit, d)
    def u(s: String) =
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
    var emits = 0
    (1 to 4000).foreach { _ =>
      def s(): String = (0 until rnd.nextInt(12))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val (a, b) = (s(), s())
      val first = fm.compute(u(a), u(b))
      (-2 to d + 2).foreach { i =>
        val want = first == i
        assert(ea.compute(u(a), u(b), i) == want,
          s"('$a','$b') idx=$i: firstMatch=$first")
        if (want) emits += 1
      }
      // ADVICE r15: pin the ONE documented deviation — at the
      // no-witness sentinel idx = -99 the old equality predicate
      // returned TRUE when firstMatch is also -99, while EditEmitAt
      // returns FALSE for every out-of-range idx. The joins never
      // feed -99; this makes the intentional divergence load-bearing
      // instead of implicit.
      assert(!ea.compute(u(a), u(b), -99),
        s"('$a','$b'): idx=-99 must never emit (firstMatch=$first)")
    }
    assert(emits > 500, s"vacuous sweep: only $emits emitting rows")
  }

  test("edit-distance cross PassJoin is complete: one-directional " +
      "base-build/increment-probe finds every boundary pair") {
    import spark.implicits._
    // randomized base/increment splits with planted cross-boundary
    // near-pairs at every length regime the join routes differently
    // (normal segments, shorts build <= d, probe <= 2d, length drift
    // +-d): the cross join over the base BUILD rows must recover
    // exactly the cross slice of the self-join over the union
    val rnd = new scala.util.Random(20260815)
    (1 to 3).foreach { round =>
      def txt(n: Int) =
        (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val base = (1 to 40).map(i => (i.toLong, "en", txt(6 + rnd.nextInt(24))))
      val inc = (1 to 25).map { j =>
        val id = 1000L + j
        if (j % 3 == 0) {
          // mutate a base head by <= 3 edits
          val t = base(rnd.nextInt(40))._3.toCharArray
          (0 until 1 + rnd.nextInt(3)).foreach { _ =>
            t(rnd.nextInt(t.length)) = ('a' + rnd.nextInt(4)).toChar }
          (id, "en", new String(t))
        } else if (j % 7 == 0) (id, "en", txt(1 + rnd.nextInt(6)))
        else (id, "en", txt(6 + rnd.nextInt(24)))
      }
      val baseDf = base.toDF("doc_id", "lang", "text")
      val incDf = inc.toDF("doc_id", "lang", "text")
      val all = baseDf.unionByName(incDf)
      val want = graft.operators.TextOps.editDistancePairs(all, 30, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .filter(p => p._1 < 1000L != p._2 < 1000L).toSet
      val buildRows = graft.operators.TextOps.editBuildRows(
        graft.operators.TextOps.editKeyedHeads(baseDf, 30), 3)
      val got = graft.operators.TextOps.editCrossPairs(buildRows,
          graft.operators.TextOps.editKeyedHeads(incDf, 30), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(got == want,
        s"round $round: missing=${want -- got} spurious=${got -- want}")
    }
  }

  test("capped shorts cell: the pair stream is star-shaped around the " +
      "elected min on both emit predicates (load-bearing narrowing)") {
    import spark.implicits._
    // ADVICE r14: above the shorts cap, a pair of two non-min shorts
    // docs surfaces through NO channel — their shorts keys were
    // star-reduced away and their 1-char segment-key rows are routed
    // to the shorts channel by the emit predicate. That narrowing is
    // the documented star contract; this spec makes it load-bearing by
    // pinning the exact pair stream on a capped cell under BOTH the
    // r14 first-match-equality filter and the r15 join-aware EditEmitAt.
    val shorts = (1 to 12).map(i =>
      (i.toLong, "en", ('a' + (i % 5)).toChar.toString * (1 + i % 3)))
    val longs = Seq((100L, "en", "completely different long text body"),
      (101L, "en", "another unrelated long document text"))
    val docs = (shorts ++ longs).toDF("doc_id", "lang", "text")
    val star = (2 to 12).map(i => (1L, i.toLong)).toSet
    val newPath = graft.operators.TextOps
      .editDistancePairs(docs, 30, 3, shortsCap = 8)
      .select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(newPath == star,
      s"EditEmitAt path: missing=${star -- newPath} extra=${newPath -- star}")
    // the r14 predicate (idx equality against the full first-match
    // scan) over the same capped build/probe rows
    val keyed = graft.operators.TextOps.editKeyedHeads(docs, 30)
    val oldPath = graft.operators.TextOps
      .editBuildRows(keyed, 3, shortsCap = 8).as("a")
      .join(graft.operators.TextOps.editProbeRows(keyed, 3).as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.kseg") === col("b.kseg") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(col("a.len") - col("b.len")) <= 3)
      .filter(col("a.kseg.idx") === graft.functions.TextFunctions
        .editFirstMatch(col("a.head"), col("b.head"), 3))
      .filter(levenshtein(col("a.head"), col("b.head")) <= 3)
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(oldPath == star,
      s"first-match path: missing=${star -- oldPath} extra=${oldPath -- star}")
  }

  test("compact re-elects the shorts channel when the capped cell's " +
      "elected min is itself re-crawled") {
    import spark.implicits._
    // ADVICE r14 (qEditCompact loss mode): fit star-reduces the capped
    // shorts cell to its min-id row; if THAT doc is in the re-crawl
    // subset, plain retirement empties the channel and the retained
    // cell members splinter. The re-election + star repair must make
    // compact equal the full recompute on exactly this fixture.
    val trueDocs = ((1 to 12).map(i =>
      (i.toLong, "en", if (i == 1) "xy"
        else ('a' + (i % 5)).toChar.toString * (1 + i % 3))) ++ Seq(
      (100L, "en", "the quick brown fox jumps over the lazy dog tail"),
      (101L, "en", "the quick brown fox jumps over the hazy dog tail")))
      .toDF("doc_id", "lang", "text")
    val recrawl = col("doc_id").isin(1L, 101L)
    // stale fit: doc 1 had DIFFERENT short text (still len <= d, so it
    // wins the fit-time shorts election), doc 101 a stale marker head
    val stale = trueDocs.withColumn("text",
      when(col("doc_id") === 1L, lit("ab"))
        .when(col("doc_id") === 101L,
          concat(lit("legacyrev stale marker "), col("text")))
        .otherwise(col("text")))
    val st = graft.operators.TextOps.editCompactFit(stale, 3,
      shortsCap = 8)
    // non-vacuity: the fit elected doc 1 as the ONLY shorts row, so
    // retiring the re-crawl set leaves the channel empty
    val shortRows = spark.read.parquet(st.indexPath)
      .filter(col("idx") === -1).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(shortRows == Set(1L),
      s"fixture must star-reduce to doc 1's shorts row, got $shortRows")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val compact = rows(graft.operators.TextOps.editCompactLabels(
      spark, st, trueDocs, recrawl, 3))
    val full = rows(graft.operators.Components.flagCorpus(trueDocs,
      "doc_id", graft.operators.Components.labelComponents(
        graft.operators.TextOps.editDistancePairs(trueDocs, 30, 3,
          shortsCap = 8).select(col("doc_id_a").as("id_a"),
          col("doc_id_b").as("id_b")))))
    assert(compact == full,
      s"compact=${compact.filter(t => t._1 != t._2 || !t._3)} " +
        s"full=${full.filter(t => t._1 != t._2 || !t._3)}")
    // and the repair actually connected the cell: docs 1..12 share one
    // component labeled by the min id
    assert(compact.filter(_._1 <= 12).map(_._2).toSet == Set(1L))
  }

  test("compact (d,2d]-probe sliver: a re-crawled head reaches a " +
      "star-reduced non-min member the shorts channel cannot route") {
    import spark.implicits._
    // ADVICE r15 (the residual loss mode after re-election): the
    // emit-once shorts gate routes every (build <= d, probe <= 2d)
    // pair through the BUILD doc's shorts row, which star reduction
    // removed for non-min members — so a re-crawled head of length in
    // (d, 2d] within d of a retained non-min member but NOT of the
    // min splinters under compact while the full recompute connects
    // it through the reverse build direction. editShortsSliverEdges
    // must close exactly this mode.
    val cell = (1 to 12).map(i => (i.toLong, "en",
      if (i == 1) "zzz" // fit-time min (min_by doc_id) — ed to the
      // probe "aaaa" is 4 > d, so the shorts channel CANNOT route it
      else ('a' + (i % 5)).toChar.toString * (1 + i % 3)))
    val trueDocs = (cell ++ Seq(
      (50L, "en", "aaaa"), // re-crawl: len 4 in (d, 2d], ed 1 to the
      // retained non-min member "aaa" (doc 5)
      (100L, "en", "the quick brown fox jumps over the lazy dog")))
      .toDF("doc_id", "lang", "text")
    val recrawl = col("doc_id") === 50L
    val stale = trueDocs.withColumn("text",
      when(recrawl, lit("wholly unrelated stale placeholder body"))
        .otherwise(col("text")))
    val st = graft.operators.TextOps.editCompactFit(stale, 3,
      shortsCap = 8)
    // non-vacuity: the cell tripped the cap (only doc 1 keeps the
    // shorts row) and the retained min survives retirement, so the
    // r15 re-election path never fires — the sliver is the only
    // channel that can connect doc 50
    val shortRows = spark.read.parquet(st.indexPath)
      .filter(col("idx") === -1).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(shortRows == Set(1L))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val compact = rows(graft.operators.TextOps.editCompactLabels(
      spark, st, trueDocs, recrawl, 3))
    // comparator: the UNCAPPED recompute (cap never trips -> exact
    // PassJoin truth). Legal here because every (d, 2d] doc in the
    // fixture is re-crawled — the capped base self-join's own star
    // scope has nothing to hide.
    val full = rows(graft.operators.Components.flagCorpus(trueDocs,
      "doc_id", graft.operators.Components.labelComponents(
        graft.operators.TextOps.editDistancePairs(trueDocs, 30, 3,
          shortsCap = 1000).select(col("doc_id_a").as("id_a"),
          col("doc_id_b").as("id_b")))))
    assert(compact == full,
      s"compact=${compact.filter(t => t._1 != t._2 || !t._3)} " +
        s"full=${full.filter(t => t._1 != t._2 || !t._3)}")
    // and the probe genuinely joined the cell component
    assert(compact.find(_._1 == 50L).map(_._2).contains(1L))
  }

  test("incremental (d,2d]-probe sliver: an increment head reaches a " +
      "star-reduced non-min member of the capped base cell") {
    import spark.implicits._
    // same loss mode as the compact sliver spec, through the nightly
    // increment assembly: the base fit star-reduced its capped cell,
    // and the increment doc's only true partner is a non-min member
    val base = ((1 to 12).map(i => (i.toLong, "en",
      if (i == 1) "zzz"
      else ('a' + (i % 5)).toChar.toString * (1 + i % 3))) ++ Seq(
      (100L, "en", "the quick brown fox jumps over the lazy dog")))
      .toDF("doc_id", "lang", "text")
    val st = graft.operators.TextOps.fitEditState(spark, base,
      "graft_edit_sliver_inc", shortsCap = 8)
    val docs = base.unionByName(
      Seq((50L, "en", "aaaa")).toDF("doc_id", "lang", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val inc = rows(graft.operators.TextOps.editIncrementalLabels(
      spark, st, docs, col("doc_id") === 50L, 3))
    val full = rows(graft.operators.Components.flagCorpus(docs,
      "doc_id", graft.operators.Components.labelComponents(
        graft.operators.TextOps.editDistancePairs(docs, 30, 3,
          shortsCap = 1000).select(col("doc_id_a").as("id_a"),
          col("doc_id_b").as("id_b")))))
    assert(inc == full,
      s"inc=${inc.filter(t => t._1 != t._2 || !t._3)} " +
        s"full=${full.filter(t => t._1 != t._2 || !t._3)}")
    assert(inc.find(_._1 == 50L).map(_._2).contains(1L))
  }

  test("length-keyed candidate cells: a shared-segment cell across " +
      "mixed head lengths splits below the salt cap; pairs stay exact") {
    import spark.implicits._
    // r17 (r16 verdict item 2, PVLDB'11 §4's length-segmented index):
    // the candidate key carries the build length, so a cell that is
    // hot under (lang, idx, seg) alone splits by length. Fixture: 600
    // docs share their first 7 chars at head lengths 26..29 (floor
    // boundaries put the idx-0 segment at chars 0..6 for lengths
    // 26/27 and 0..7 for 28/29, so the CONTENT key alone pools each
    // boundary class into one 300-row cell > editSaltCap) — with blen
    // in the key each length's 150 rows sit far below the cap.
    // Lengths stay under prefixLen = 30: a longer fixture would CLIP
    // and collapse the length diversity this spec exists to exercise. ScaleGen corpora are length-
    // UNIFORM (every sf10 head is exactly 30 chars — measured), so
    // this split never fires there; this fixture is the length-diverse
    // regime the key exists for.
    val rnd = new scala.util.Random(20260818)
    val docs = (0 until 600).map { i =>
      val len = 26 + i % 4
      val tail = (0 until (len - 7))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      (i.toLong, "en", s"commona$tail")
    }.toDF("doc_id", "lang", "text")
    val keyed = graft.operators.TextOps.editKeyedHeads(docs, 30)
    val build = graft.operators.TextOps.editBuildRows(keyed, 3)
    // content-only pooling (the pre-r17 key) would salt this cell
    val contentOnly = build
      .groupBy(col("lang"), col("kseg.idx"), col("kseg.seg"))
      .count().filter(col("count") >
        graft.operators.TextOps.editSaltCap)
    assert(!contentOnly.isEmpty, "fixture failed to pool a hot cell")
    // the length-keyed cells all sit below the cap
    val hot = graft.operators.TextOps.editHotCells(build).collect()
    assert(hot.isEmpty,
      s"length-keyed cells still hot: ${hot.mkString("; ")}")
    // and the pair set is exact against brute force
    val got = graft.operators.TextOps.editDistancePairs(docs, 30, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def ed(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i =>
        Array.tabulate(b.length + 1)(j => if (i == 0) j
          else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val heads = docs.collect()
      .map(r => r.getLong(0) -> r.getString(2).take(30))
    val want = (for {
      (ia, ha) <- heads; (ib, hb) <- heads
      if ia < ib && ed(ha, hb) <= 3
    } yield (ia, ib)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty, "vacuous fixture: no near pairs")
  }

  test("published hot-cell sidecar: a saturated base salts the warm " +
      "cross probe from the fit-time set, labels equal full recompute") {
    import spark.implicits._
    // r17 (r16 verdict "what's wrong" #2): the fit publishes the
    // PassJoin hot-cell set inside the index directory, so warm
    // incremental/compact queries salt from a KB sidecar instead of
    // re-aggregating the corpus-sized index per call. This fixture
    // SATURATES a cell (300 same-length heads sharing every segment
    // prefix region > editSaltCap) so the published set is non-empty
    // and genuinely drives the salted join; the increment mutates one
    // member's tail so a true cross pair exists through the hot cell.
    val rnd = new scala.util.Random(20260817)
    val base = (0 until 300).map { i =>
      val tail = (0 until 12)
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      (i.toLong, "en", s"commonaacommonbbcommoncc$tail")
    }.toDF("doc_id", "lang", "text")
    val st = graft.operators.TextOps.fitEditState(spark, base,
      "graft_edit_hotset_spec")
    assert(st.hotCount > 0, "fixture failed to saturate any cell")
    val sidecar = spark.read.parquet(st.indexPath + "/" +
      graft.operators.TextOps.editHotSetDirName)
    assert(sidecar.count() == st.hotCount)
    // the index read itself must NOT see the sidecar rows
    val idxCols = spark.read.parquet(st.indexPath).columns.toSet
    assert(idxCols == Set("doc_id", "lang", "head", "len", "idx", "seg"),
      idxCols.toString)
    val incText = base.collect()
      .find(_.getLong(0) == 7L).get.getString(2).dropRight(1) + "z"
    val docs = base.unionByName(
      Seq((1000L, "en", incText)).toDF("doc_id", "lang", "text"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val inc = rows(graft.operators.TextOps.editIncrementalLabels(
      spark, st, docs, col("doc_id") === 1000L, 3))
    val full = rows(graft.operators.Components.flagCorpus(docs,
      "doc_id", graft.operators.Components.labelComponents(
        graft.operators.TextOps.editDistancePairs(docs, 30, 3)
          .select(col("doc_id_a").as("id_a"),
            col("doc_id_b").as("id_b")))))
    assert(inc == full)
    // the increment doc genuinely clustered through the hot cell
    assert(inc.find(_._1 == 1000L).exists(t => t._2 != 1000L || t._3))
    // and a healthy fit publishes an EMPTY set that short-circuits
    val cold = graft.operators.TextOps.fitEditState(spark,
      Seq((1L, "en", "alpha beta"), (2L, "en", "gamma delta"))
        .toDF("doc_id", "lang", "text"), "graft_edit_coldset_spec")
    assert(cold.hotCount == 0L)
  }

  test("edit incremental and compact equal the full recompute; fits " +
      "run once and the compact fixture is genuinely stale") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val full = key(graft.operators.TextOps.qEditClusters(spark, sfDir))
    val inc = key(graft.operators.TextOps.qEditIncremental(spark, sfDir))
    assert(inc == full, "edit incremental diverged from full recompute")
    val fitsAfter = graft.operators.TextOps.editFitInvocations.get()
    key(graft.operators.TextOps.qEditIncremental(spark, sfDir))
    assert(graft.operators.TextOps.editFitInvocations.get() == fitsAfter,
      "edit base fit re-ran on a warm query")
    assert(key(graft.operators.TextOps.qEditCompact(spark, sfDir))
      == full, "edit compaction diverged from full recompute")
    // non-vacuity: the compact index holds STALE heads for re-crawled
    // ids (the prepended marker moved them), so retirement + re-probe
    // actually repaired something
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val recHeads = graft.operators.TextOps.editKeyedHeads(
        docs.filter(graft.operators.TextOps.isRecrawlDoc), 30)
      .select("doc_id", "head").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(recHeads.nonEmpty)
    // every stale head in the published index opens with the per-doc
    // hash digits (r16 marker — digits never open a true head on the
    // alphabetic corpus), so NO re-crawled head equals its true head
    assert(recHeads.values.forall(h => !h.headOption.exists(_.isDigit)),
      "true heads unexpectedly open with the stale marker's digits")
    // and the published index genuinely holds marked heads for them
    val staleHeads = spark.read.parquet(
        graft.operators.TextOps.editCompactStateFor(spark, sfDir)
          .indexPath)
      .select("doc_id", "head").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(recHeads.keys.forall(id =>
      staleHeads.get(id).forall(_.headOption.exists(_.isDigit))),
      "stale index heads missing the per-doc digit marker")
  }

  test("row-local md5 simhash signer is bit-identical to the vote " +
      "aggregation; empty token arrays mirror the explode drop") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "sig_hi", "sig_lo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(key(graft.operators.TextOps.simhashRowSigs(docs)) ==
      key(graft.operators.TextOps.simhashMd5Halves(docs)),
      "row-local signer diverged from the aggregate form on the corpus")
    // degenerate shapes: single token, repeated token occurrences
    // (votes accumulate per OCCURRENCE), unicode
    val edge = Seq((1L, "solo"), (2L, "a a a b"), (3L, "naïve café 漢字"))
      .toDF("doc_id", "text")
    assert(key(graft.operators.TextOps.simhashRowSigs(edge)) ==
      key(graft.operators.TextOps.simhashMd5Halves(edge)))
    // an EMPTY token array returns NULL and the row drops — the
    // aggregate form's explode emits no row for it
    val withEmpty = Seq(4L).toDF("doc_id")
      .withColumn("toks", array().cast("array<string>"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.simhashMd5Sig(col("toks")).as("s"))
    assert(withEmpty.filter(col("s").isNotNull).count() == 0)
  }

  test("simhash intake pairs equal the brute-force cross Hamming sweep " +
      "over (arrivals x published reps)") {
    import spark.implicits._
    // base corpus with duplicate texts (so reps != docs), arrivals
    // containing exact dups, near-variants, and unrelated docs
    val rnd = new scala.util.Random(20260816)
    def txt(seed: Int) = (0 until 60)
      .map(i => s"w${(i * 31 + seed * 7919) % 4000}").mkString(" ")
    val base = (1 to 50).map(i =>
      (i.toLong, if (i % 5 == 0) txt(1) else txt(i)))
      .toDF("doc_id", "text")
    val arrivals = (1 to 30).map { j =>
      val id = 1000L + j
      if (j % 3 == 0) (id, txt(rnd.nextInt(50) + 1)) // exact dup of a base
      else if (j % 3 == 1) (id, txt(200 + j)) // unrelated
      else (id, txt(rnd.nextInt(50) + 1) + s" extra${j}") // 1-token drift
    }.toDF("doc_id", "text")
    val ops = graft.operators.TextOps
    val (_, reps) = ops.simhashCollapse(ops.simhashMd5Halves(base))
    val rp = java.nio.file.Files.createTempDirectory("graft_si_idx").toString
    reps.write.mode("overwrite").parquet(rp)
    val b = ops.simhashAutoPlan(reps, 50)
    graft.sources.Markers.write(spark, rp, "_graft_simhash_b", b.toString)
    val (keyedReps, bLoaded) = ops.simhashIntakeIndex(spark, rp)
    assert(bLoaded == b)
    val got = ops.simhashIntakePairs(keyedReps, arrivals, bLoaded)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // truth: every (arrival, rep) pair within Hamming 3
    val repSigs = reps.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val arrSigs = ops.simhashMd5Halves(arrivals).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (aid, ahi, alo) <- arrSigs
      (rid, rhi, rlo) <- repSigs
      h = java.lang.Long.bitCount(ahi ^ rhi) +
        java.lang.Long.bitCount(alo ^ rlo)
      if h <= 3
    } yield (aid, rid, h)).toSet
    assert(got == want,
      s"missing=${want -- got} spurious=${got -- want}")
    assert(want.nonEmpty, "vacuous fixture: no cross pair planted")
  }

  test("simhash block plan widens on MEASURED hot distinct-sig buckets " +
      "and keeps the count-derived plan on healthy corpora") {
    import spark.implicits._
    // r13 verdict item 1: the adversarial sweep measured correlated
    // corpora keeping hot distinct-sig buckets at the count-chosen B
    // and proved widening kills them losslessly (239→26→1→0 as B grows
    // 4→8); the fit now APPLIES that remedy. Fixture: 100 distinct
    // signatures agreeing on their entire hi word — at the
    // count-derived B=4 every hi-only combination key holds all 100
    // reps in one bucket (so does B=5's {hi,hi} combo); B=6 is the
    // first plan whose every combination key reaches varying bits
    val correlated = (0 until 100).map(i =>
        (i.toLong, 0L, (i.toLong * 2654435761L) & 0xFFFFFFFFL))
      .toDF("doc_id", "sig_hi", "sig_lo")
    assert(TextOps.simhashBlockPlan(100L) == 4)
    val chosen = TextOps.simhashAutoPlan(correlated, 100L)
    assert(chosen == 6, s"expected auto-widen to B=6, got $chosen")
    assert(graft.operators.BandedJoins.hotBuckets(
      TextOps.simhashKeyed(correlated, chosen), "band", "key").isEmpty,
      "the chosen plan still carries hot buckets")
    // healthy: signatures spread over the full 64 bits keep the
    // count-derived plan — no widening without a measured reason
    val healthy = (0 until 100).map { i =>
        val h = i.toLong * -7046029254386353131L
        (i.toLong, h >>> 32, h & 0xFFFFFFFFL)
      }.toDF("doc_id", "sig_hi", "sig_lo")
    assert(TextOps.simhashAutoPlan(healthy, 100L) == 4)
    // and the widest plan is the honest floor: a frame hot at EVERY
    // plan still terminates at B=8 (the loud-marker regime)
    val degenerate = (0 until 200).map(i => (i.toLong, 0L, (i % 2).toLong))
      .toDF("doc_id", "sig_hi", "sig_lo")
    assert(TextOps.simhashAutoPlan(degenerate, 200L) == 8)
  }

  test("simhash block plan STOPS widening when the residual hot mass " +
      "is marginal (the sf1 regime: one slow bucket beats 2.8x tables)") {
    import spark.implicits._
    // r15: the r14 any-hot-bucket rule widened sf1 to B=8 (56 tables)
    // to delete ONE residual bucket, making q_simhash_pairs 2-3 s
    // slower than the bucket it saved. The marginal-cost rule widens
    // only while hot candidate mass x cost factor exceeds the next
    // plan's extra keyed rows. Fixture: 3800 well-spread sigs plus 70
    // sharing one 16-bit block value — one hot bucket at B=4 whose
    // C(70,2) x 4 = 9660 candidate mass is under the (10-4) x 3870
    // marginal fan-out of B=5, so the count-derived plan STAYS.
    val spread = (0 until 3800).map { i =>
      val h = (i + 10).toLong * -7046029254386353131L
      (i.toLong, h >>> 32, h & 0xFFFFFFFFL)
    }
    // shared block 0 (top 16 bits of the 32-bit hi half), varying
    // everywhere else
    val hot = (0 until 70).map { i =>
      val h = (i + 7).toLong * 2654435761L
      (9000L + i, (0xABCDL << 16) | (h & 0xFFFFL),
        (h * 17) & 0xFFFFFFFFL)
    }
    val sigs = (spread ++ hot).toDF("doc_id", "sig_hi", "sig_lo")
    assert(TextOps.simhashBlockPlan(3870L) == 4)
    val hotAt4 = graft.operators.BandedJoins.hotBuckets(
      TextOps.simhashKeyed(sigs, 4), "band", "key").count()
    assert(hotAt4 >= 1, "fixture must keep a hot bucket at B=4")
    assert(TextOps.simhashAutoPlan(sigs, 3870L) == 4,
      "marginal residual mass must not buy a 2.5x-fan-out widening")
  }

  test("simhash nightly members collapse duplicate-heavy batches: " +
      "identity stars + rep-only joins, exact labels") {
    import spark.implicits._
    // ADVICE r13: a boilerplate cluster arriving in ONE increment batch
    // fed k per-document signatures into the within self-join — O(k²)
    // candidates. The collapse emits k−1 identity edges + joins only
    // distinct-sig reps, and the labels cannot change (Hamming-0 stars
    // preserve connectivity exactly)
    val k = 80
    val dup = (0 until k).map(i => (100L + i, 7L, 42L))
    val rest = (0 until 6).map { i =>
      val h = (i + 1).toLong * -7046029254386353131L
      (i.toLong, h >>> 32, h & 0xFFFFFFFFL)
    }
    val sig = (dup ++ rest).toDF("doc_id", "sig_hi", "sig_lo")
    val (identity, reps) = TextOps.simhashCollapse(sig)
    assert(identity.count() == (k - 1).toLong,
      "identity stars must absorb the duplication mass")
    assert(reps.count() == 7L)
    val collapsed = identity.unionByName(
      TextOps.simhashSigPairs(reps, 4)
        .select(col("doc_id_a").as("id_a"), col("doc_id_b").as("id_b")))
    // edge volume is linear in the clique, not quadratic
    assert(collapsed.count() < 2L * (k + 6),
      "collapsed edge set is not linear in the batch")
    // exactness: labels over collapsed edges == labels over the full
    // per-document pair join
    val naive = TextOps.simhashSigPairs(sig, 4)
      .select(col("doc_id_a").as("id_a"), col("doc_id_b").as("id_b"))
    def labels(e: org.apache.spark.sql.DataFrame) =
      graft.operators.Components.flagCorpus(
          sig.select(col("doc_id")), "doc_id",
          graft.operators.Components.labelComponents(e))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(labels(collapsed) == labels(naive))
  }

  test("simhash incremental equals the full recompute; the base fit " +
      "runs once across invocations") {
    // the family's nightly member (r13): the increment probes the
    // published rep index and extends the base label map — the result
    // must be INDISTINGUISHABLE from recomputing the clusters over the
    // whole corpus (the same contract q_dedup_incremental carries, and
    // the same recursive-reachability oracle checks it at sf0.01)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val full = key(graft.operators.TextOps.qSimhashClusters(spark, sfDir))
    val fitsBefore = graft.operators.TextOps.simhashFitInvocations.get()
    val inc = key(graft.operators.TextOps.qSimhashIncremental(spark, sfDir))
    assert(inc == full, "incremental path diverged from full recompute")
    // a second invocation serves from the published artifacts — the
    // base corpus is never re-signed (the minhash fitInvocations pin)
    key(graft.operators.TextOps.qSimhashIncremental(spark, sfDir))
    assert(graft.operators.TextOps.simhashFitInvocations.get() <=
      fitsBefore + 1, "base simhash fit re-ran on a warm query")
  }

  test("simhash compaction repairs the stale-fitted artifacts to the " +
      "exact full recompute; the fixture is genuinely stale") {
    import spark.implicits._
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val full = key(graft.operators.TextOps.qSimhashClusters(spark, sfDir))
    assert(key(graft.operators.TextOps.qSimhashCompact(spark, sfDir))
      == full, "compaction diverged from the full recompute")
    // r13 verdict item 8: the stale-corpus sign + sig-pair build is a
    // FIT cost — a warm declared query must serve from the published
    // artifacts without re-fitting (the incremental member's
    // fitInvocations discipline, extended to compaction)
    val fitsAfterFirst =
      graft.operators.TextOps.simhashCompactFitInvocations.get()
    key(graft.operators.TextOps.qSimhashCompact(spark, sfDir))
    assert(graft.operators.TextOps.simhashCompactFitInvocations.get()
      == fitsAfterFirst, "compact fit re-ran on a warm query")
    // non-vacuity: the published sig table really carries STALE
    // signatures for the re-crawl subset (otherwise retirement +
    // re-pairing tested nothing)
    val st = graft.operators.TextOps.simhashCompactStateFor(spark, sfDir)
    val trueSigs = graft.operators.TextOps.simhashMd5Halves(
        graft.sources.Tables.documents(spark, sfDir)
          .filter(graft.operators.TextOps.isRecrawlDoc))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val staleSigs = spark.read.parquet(st.sigsPath)
      .filter(graft.operators.TextOps.isRecrawlDoc)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(trueSigs.nonEmpty && trueSigs.keySet == staleSigs.keySet)
    assert(trueSigs.exists { case (id, s) => staleSigs(id) != s },
      "stale fixture did not move any re-crawled signature")
  }

  test("heavyHittersVerified is exact beyond the sketch's exact regime") {
    import spark.implicits._
    // vocabulary (902) ≫ capacity (1/support = 10) — the regime where
    // the RAW summary's counts are undercounts and its tail is noise;
    // the rectified two-pass result must still be the exact answer
    val words = Seq.fill(300)("HOT") ++ Seq.fill(200)("WARM") ++
      (1 to 900).map(i => s"t$i")
    val docs = words.grouped(50).zipWithIndex
      .map { case (w, i) => (i.toLong, w.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextOps.heavyHittersVerified(df, 0.1).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    // N = 1400, threshold 140: exactly the two planted heavies, with
    // EXACT counts (a raw MG summary would undercount)
    assert(run(docs) == Seq(("HOT", 300L), ("WARM", 200L)))
    // partitioning-invariant (mergeable-summary property end-to-end)
    assert(run(docs.repartition(7)) == Seq(("HOT", 300L), ("WARM", 200L)))
  }

  test("classifySource learns a separable vocabulary; fallback + coverage") {
    import spark.implicits._
    // planted separable classes: webby docs use {cat, dog}, booky docs
    // {alpha, beta}; one contested doc leans booky; one doc is all-OOV
    // (model cap 4 keeps only the four class tokens: 'rare'/'zzz'
    // appear once each and lose the (count desc, token asc) cut)
    val fx = Seq(
      (1L, "web", "cat dog cat dog cat"),
      (2L, "web", "dog cat dog"),
      (3L, "book", "alpha beta alpha beta"),
      (4L, "book", "beta alpha beta"),
      (5L, "web", "alpha beta alpha rare"),
      (6L, "book", "zzz")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.classifySource(fx, 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // every doc appears exactly once
    assert(out.keySet == (1L to 6L).toSet)
    // clean class docs classify to their own source
    assert(out(1L)._1 == "web" && out(1L)._3)
    assert(out(2L)._1 == "web" && out(2L)._3)
    assert(out(3L)._1 == "book" && out(3L)._3)
    assert(out(4L)._1 == "book" && out(4L)._3)
    // the contested doc's tokens are all booky: predicted book, hit=false
    assert(out(5L)._1 == "book" && !out(5L)._3)
    // the all-OOV doc falls back to "none" at score 0
    assert(out(6L) == (("none", 0.0, false)))
    // scores are positive for every matched doc
    assert((1L to 5L).forall(out(_)._2 > 0.0))
  }

  test("q_classify_source covers every document; scoring probes broadcast") {
    val df = TextOps.qClassifySource(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    // the model/tot sides reach the scoring joins as broadcasts — the
    // corpus is never the build side of anything
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    val rows = df.collect()
    assert(rows.length ==
      spark.read.parquet(s"$sfDir/documents.parquet").count())
    assert(rows.forall(_.getString(1) != null))
  }
}
