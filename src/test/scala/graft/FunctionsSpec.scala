package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftExtensions

/** SQL surface of the custom expressions: after registration the SQL
  * names must resolve to the same Catalyst expressions the DataFrame
  * API uses and agree with the built-in formulations.
  */
class FunctionsSpec extends SparkTestBase {

  test("registered SQL functions evaluate the custom expressions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D, 3.0D),
        |                 array(4.0D, 5.0D, 6.0D)) AS d,
        |       graft_unit(array(3.0D, 4.0D)) AS u,
        |       graft_unit(array(0.0D, 0.0D)) AS z,
        |       graft_simhash64(array('a', 'b', 'a')) AS sh,
        |       graft_shingle_hashes(array('a','b','c','d'), 3) AS sg
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 32.0)
    assert(r.getSeq[Double](1) == Seq(0.6, 0.8))
    assert(r.isNullAt(2))
    assert(r.getString(3).length == 64 &&
      r.getString(3).forall(c => c == '0' || c == '1'))
    // 2 distinct 3-gram shingles of 4 tokens, hash-equal to xxhash64
    val want = spark.sql(
      "SELECT array(xxhash64('a b c'), xxhash64('b c d'))")
      .collect().head.getSeq[Long](0)
    assert(r.getSeq[Long](4) == want)
    // the banding surface resolves too and agrees with the DataFrame API
    val b = spark.sql(
      """SELECT graft_minhash_bands(
        |         graft_shingle_hashes(array('a','b','c','d'), 3), 64, 16
        |       ) AS bands,
        |       graft_earlier_band_collision(
        |         array(1L, 2L, 3L), array(9L, 2L, 9L), 2) AS hit,
        |       graft_earlier_band_collision(
        |         array(1L, 2L, 3L), array(9L, 2L, 9L), 1) AS miss
        |""".stripMargin).collect().head
    assert(b.getSeq[Long](0).length == 16)
    assert(b.getBoolean(1) && !b.getBoolean(2))
    // null slots never collide (SQL-surface nullable arrays; reading
    // them as 0 would fabricate collisions)
    val nn = spark.sql(
      """SELECT graft_earlier_band_collision(
        |  array(CAST(NULL AS BIGINT), 2L),
        |  array(CAST(NULL AS BIGINT), 9L), 2) AS c""".stripMargin)
      .collect().head
    assert(!nn.getBoolean(0))
  }

  test("EarlierBandCollision decides identically to the HOF formulation") {
    import spark.implicits._
    // random signature pairs with planted collisions at varied indices:
    // the fused predicate must agree with the prefix-slice HOF form for
    // every (pair, band) combination
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(16)
      val a = Seq.fill(n)(rnd.nextLong())
      val b = a.zipWithIndex.map { case (v, j) =>
        if (rnd.nextInt(4) == 0) v else rnd.nextLong() + j }
      (i.toLong, a, b, rnd.nextInt(n + 1))
    }
    val df = rows.toDF("id", "a", "b", "band")
    val got = df.select(col("id"),
      graft.functions.TextFunctions
        .earlierBandCollision(col("a"), col("b"), col("band")).as("fused"),
      exists(zip_with(slice(col("a"), lit(1), col("band")),
          slice(col("b"), lit(1), col("band")), (x, y) => x === y),
        x => x).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2), s"row ${r.getLong(0)}")
    }
    // and both decisions occur in the sample
    assert(got.exists(_.getBoolean(1)) && got.exists(!_.getBoolean(1)))
  }

  test("EarlierBandCollision: mismatched lengths and band > length (full SQL input space)") {
    import spark.implicits._
    // ADVICE r6: the engine's banded paths always produce equal-length
    // signature arrays with band < length, but the registered SQL
    // surface accepts anything — pin the semantics on the full input
    // space against a driver-side oracle: collision iff some index
    // j < min(band, |a|, |b|) has a(j) == b(j), always BOOLEAN.
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map { i =>
      val na = 1 + rnd.nextInt(16)
      val nb = 1 + rnd.nextInt(16) // independent → usually mismatched
      val a = Seq.fill(na)(rnd.nextLong())
      val b = (0 until nb).map(j =>
        if (j < na && rnd.nextInt(4) == 0) a(j)
        else rnd.nextLong() - j).toSeq
      (i.toLong, a, b, rnd.nextInt(20)) // band 0..19 can exceed both
    }
    val want = rows.map { case (id, a, b, band) =>
      id -> (0 until math.min(band, math.min(a.length, b.length)))
        .exists(j => a(j) == b(j))
    }.toMap
    val got = rows.toDF("id", "a", "b", "band")
      .select(col("id"), graft.functions.TextFunctions
        .earlierBandCollision(col("a"), col("b"), col("band")).as("c"))
      .collect()
    got.foreach { r =>
      assert(!r.isNullAt(1), s"row ${r.getLong(0)} returned NULL")
      assert(r.getBoolean(1) == want(r.getLong(0)), s"row ${r.getLong(0)}")
    }
    assert(got.exists(_.getBoolean(1)) && got.exists(!_.getBoolean(1)))
    // documented divergence from the HOF formulation: zip_with
    // NULL-pads the shorter side, so on mismatched lengths the
    // exists(zip_with(...)) form can yield NULL where the fused
    // predicate clamps to the shared prefix and stays false
    val div = Seq((Seq(1L, 2L, 3L), Seq(9L, 8L, 7L, 6L, 5L), 5))
      .toDF("a", "b", "band")
      .select(graft.functions.TextFunctions
        .earlierBandCollision(col("a"), col("b"), col("band")).as("fused"),
        exists(zip_with(slice(col("a"), lit(1), col("band")),
          slice(col("b"), lit(1), col("band")), (x, y) => x === y),
          x => x).as("hof"))
      .collect().head
    assert(!div.getBoolean(0) && div.isNullAt(1))
  }

  test("SQL graft_dot agrees with the DataFrame-side cosine computation") {
    GraftExtensions.register(spark)
    val ds = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(5)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.unitv(col("embedding")).as("u"))
    ds.createOrReplaceTempView("emb_unit")
    val sqlDots = spark.sql(
      """SELECT a.vec_id ia, b.vec_id ib, graft_dot(a.u, b.u) d
        |FROM emb_unit a JOIN emb_unit b ON a.vec_id < b.vec_id
        |ORDER BY ia, ib""".stripMargin).collect()
    val dfDots = ds.as("a").join(ds.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        graft.functions.VectorFunctions.dotp(col("a.u"), col("b.u")))
      .orderBy(col("a.vec_id"), col("b.vec_id")).collect()
    assert(sqlDots.map(_.getDouble(2)).toSeq ==
      dfDots.map(_.getDouble(2)).toSeq)
  }

  test("dimension mismatches fail loudly instead of truncating") {
    // ADVICE r3: a mis-dimensioned embedding must raise, not silently
    // produce a plausible score from the truncated prefix
    GraftExtensions.register(spark)
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).toSeq
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(1.0D))").collect()
    }
    assert(chain(e1).exists(_.contains("dimension mismatch")), chain(e1))
    import spark.implicits._
    val bad = Seq((1L, Seq.fill(8)(1.0))).toDF("vec_id", "u")
    val e2 = intercept[Exception] {
      bad.select(graft.functions.VectorFunctions.lshBandSigs(col("u"),
        Seq.fill(16)(Seq.fill(64)(0.5)), 8)).collect()
    }
    assert(chain(e2).exists(_.contains("dimension mismatch")), chain(e2))
    val e3 = intercept[Exception] {
      bad.select(graft.functions.VectorFunctions.topDotIdx(col("u"),
        Seq.fill(4)(Seq.fill(64)(0.5)), 2)).collect()
    }
    assert(chain(e3).exists(_.contains("dimension mismatch")), chain(e3))
  }

  test("MisraGries property: no false negatives above N/(cap+1), any split") {
    // load-bearing for q_heavy_hitters_verified's oracle row: the
    // candidate pass must NEVER drop an item whose true count exceeds
    // N/(capacity+1), under arbitrary partition splits and merge
    // orders. Exercised directly on the Aggregator (reduce + merge),
    // 200 random Zipf-ish streams with fixed seeds.
    for (seed <- 0 until 200) {
      val rnd = new scala.util.Random(seed)
      val capacity = 1 + rnd.nextInt(12)
      val n = 50 + rnd.nextInt(950)
      // skewed universe: item i drawn with weight ~ 1/(i+1)
      val universe = 1 + rnd.nextInt(40)
      val weights = (0 until universe).map(i => 1.0 / (i + 1))
      val cum = weights.scanLeft(0.0)(_ + _).tail
      val total = cum.last
      val stream = Seq.fill(n) {
        val u = rnd.nextDouble() * total
        s"w${cum.indexWhere(u <= _)}"
      }
      // split into random partitions, reduce each, merge in random order
      val agg = new graft.functions.MisraGries(capacity)
      val parts = stream.grouped(1 + rnd.nextInt(n)).toSeq
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).reduce(agg.merge)
      val survivors = agg.finish(merged).map(_.token).toSet
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      val threshold = n.toDouble / (capacity + 1)
      val mustSurvive = exact.collect {
        case (t, c) if c > threshold => t
      }.toSet
      assert(mustSurvive.subsetOf(survivors),
        s"seed=$seed cap=$capacity n=$n missing=" +
          (mustSurvive -- survivors))
      // undercount bound: est ≥ true − N/(cap+1)
      agg.finish(merged).foreach { h =>
        assert(h.est >= exact(h.token) - threshold - 1e-9,
          s"seed=$seed ${h.token}: est=${h.est} true=${exact(h.token)}")
      }
    }
  }
  test("ClassifyScore: plan size is O(1) in model size; argmax order kept") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the ADVICE-r11 claim behind the reference-object serving kernel:
    // a typedlit-map formulation grows the analyzed plan linearly with
    // vocabulary x classes; the kernel must NOT — a 30k-entry model's
    // plan string stays the size of a 3-entry model's
    def model(v: Int): Seq[(String, Map[String, Long], Long)] = {
      val a = (0 until v).map(i => s"a$i" -> (i % 7 + 1).toLong).toMap
      val b = (0 until v).map(i => s"b$i" -> (i % 5 + 1).toLong).toMap
      Seq(("alpha", a, a.values.sum), ("beta", b, b.values.sum))
    }
    val docs = Seq((1L, "a0 a1 b0"), (2L, "b0 b1 b2"), (3L, "zzz"))
      .toDF("doc_id", "text")
    def planOf(v: Int) = docs.select(col("doc_id"),
        graft.functions.TextFunctions.classifyScore(
          split(col("text"), " "), model(v)).as("r"))
      .queryExecution.optimizedPlan.toString
    val small = planOf(3).length
    val large = planOf(30000).length
    assert(large <= small + 64,
      s"plan grew with model size: $small -> $large chars")
    // and the large model still scores correctly, with the batch
    // scorer's argmax/tie/fallback semantics
    val got = docs.select(col("doc_id"),
        graft.functions.TextFunctions.classifyScore(
          split(col("text"), " "), model(30000)).as("r"))
      .select(col("doc_id"), col("r.predicted"), col("r.score"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == "alpha" && got(2L) == "beta" && got(3L) == "none")
    // greatest(struct) tie order: equal scores pick the
    // lexicographically larger class
    val tie = Seq(("x", Map("t" -> 1L), 2L), ("y", Map("t" -> 1L), 2L))
    val t = Seq((1L, "t")).toDF("doc_id", "text")
      .select(graft.functions.TextFunctions.classifyScore(
        split(col("text"), " "), tie).as("r"))
      .select(col("r.predicted")).head().getString(0)
    assert(t == "y")
  }

  test("ClassifyScore: struct tie order beyond the BMP; zero totals " +
      "rejected at plan build") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ADVICE r12: the kernel's class sort must be UTF8String BINARY
    // order (what greatest(struct(score, class)) compares), not Java's
    // UTF-16 code-unit order. U+FFFD (EF BF BD) vs U+1F600 (F0 9F 98
    // 80): Java sorts the emoji LOWER (its lead surrogate 0xD83D <
    // 0xFFFD); UTF-8 bytes sort it HIGHER (F0 > EF) — a tie must go to
    // the emoji, exactly as the batch struct comparison does.
    val bmp = "\uFFFD"
    val emoji = new String(Character.toChars(0x1F600))
    val tie = Seq((bmp, Map("t" -> 1L), 2L), (emoji, Map("t" -> 1L), 2L))
    val doc = Seq((1L, "t")).toDF("doc_id", "text")
    val kernel = doc.select(graft.functions.TextFunctions.classifyScore(
        split(col("text"), " "), tie).as("r"))
      .select(col("r.predicted")).head().getString(0)
    // the batch semantics this kernel claims verbatim, evaluated by
    // Spark itself: greatest over (score, class) structs
    val batch = doc.select(greatest(
        struct(lit(0.5).as("score"), lit(bmp).as("c")),
        struct(lit(0.5).as("score"), lit(emoji).as("c"))).as("g"))
      .select(col("g.c")).head().getString(0)
    assert(batch == emoji, "fixture assumption: struct order is UTF-8")
    assert(kernel == batch,
      s"kernel tie order diverged from greatest(struct): $kernel")
    // zero class total => 0/0 = NaN scores, which the two orders rank
    // differently — the expression must refuse the model loudly
    val err = intercept[IllegalArgumentException] {
      doc.select(graft.functions.TextFunctions.classifyScore(
        split(col("text"), " "),
        Seq(("a", Map("t" -> 1L), 2L), ("broken", Map.empty[String, Long], 0L))))
    }
    assert(err.getMessage.contains("total"))
  }
}
