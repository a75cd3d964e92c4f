package graft

import org.apache.spark.sql.functions._

import graft.operators.{BandedJoins, Components, TextOps, Vectors}

/** The hot-bucket guard (r8 verdict item 1): a planted mega-cluster of
  * k identical documents/vectors must emit O(k) star edges through the
  * banded joins — not O(k²) pairs on one skewed (band, bucket) key —
  * while the cluster labeling stays exactly right (star edges preserve
  * connectivity, and verification passes on them since identical
  * members have similarity 1).
  */
class HotBucketSpec extends SparkTestBase {

  private val k = 120 // > BandedJoins.defaultHotBucketCap = 64

  /** k identical documents (ids 0..k-1) plus mutually-dissimilar
    * fillers (ids 1000+) including one small exact-dup pair that must
    * stay on the normal all-pairs path. */
  private def megaDocs = {
    import spark.implicits._
    val cluster = (0 until k).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog " +
        "and then runs far away into the deep green forest tonight"))
    val fillers = (0 until 8).map(i =>
      (1000L + i, (0 until 40).map(j => s"w${i * 977 + j * 31}_$j")
        .mkString(" ")))
    val smallDup = Seq((2000L, "alpha beta gamma delta epsilon zeta " +
      "eta theta iota kappa lambda mu"),
      (2001L, "alpha beta gamma delta epsilon zeta " +
        "eta theta iota kappa lambda mu"))
    (cluster ++ fillers ++ smallDup).toDF("doc_id", "text")
  }

  test("mega-cluster emits O(k) star candidates, not O(k^2) pairs") {
    val cands = TextOps.minhashCandidates(megaDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // no duplicate emissions across the normal and star paths
    assert(cands.length == cands.toSet.size, "duplicate candidate pairs")
    val clusterCands = cands.filter(_._1 < 1000L)
    // star reduction: every non-min member pairs with doc 0 exactly once
    assert(clusterCands.toSet ==
      (1 until k).map(i => (0L, i.toLong)).toSet,
      s"expected ${k - 1} star edges, got ${clusterCands.length}")
    // the small identical pair is below the cap -> normal path keeps it
    assert(cands.contains((2000L, 2001L)))
  }

  test("hotBuckets frame reports the oversized buckets loudly") {
    val banded = TextOps.stageDocs(megaDocs)
      .select(posexplode(col("bsigs")).as(Seq("band", "bhash")))
    // identical docs share a bucket in every one of the 16 bands
    assert(BandedJoins.hotBuckets(banded, "band", "bhash").count() == 16)
    // a healthy corpus has none (sf0.1 max observed bucket is 4)
    val healthy = TextOps.stageDocs(
        graft.sources.Tables.documents(spark, sfDir))
      .select(posexplode(col("bsigs")).as(Seq("band", "bhash")))
    assert(BandedJoins.hotBuckets(healthy, "band", "bhash").count() == 0)
  }

  test("clusters over the star-reduced graph are exactly right") {
    val flags = TextOps.dedupClusters(megaDocs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    (0 until k).foreach { i =>
      assert(flags(i.toLong) == ((0L, i == 0)), s"doc $i: ${flags(i.toLong)}")
    }
    (0 until 8).foreach { i =>
      assert(flags(1000L + i) == ((1000L + i, true)))
    }
    assert(flags(2000L) == ((2000L, true)) && flags(2001L) == ((2000L, false)))
  }

  test("incremental probe of a hot base bucket emits O(increment) edges") {
    val docs = megaDocs
    val isInc = col("doc_id") >= 80L && col("doc_id") < k.toLong
    val baseStaged = TextOps.stageDocs(docs.filter(!isInc))
      .localCheckpoint(true)
    val newStaged = TextOps.stageDocs(docs.filter(isInc))
      .localCheckpoint(true)
    val inc = TextOps.incrementPairs(baseStaged, newStaged,
      joinBack = false).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(inc.length == inc.toSet.size, "duplicate incremental pairs")
    // cross edges: each of the 40 increment members meets ONLY the hot
    // base bucket's min (doc 0); within edges: the 40-member increment
    // bucket sits under the cap, so its self-join stays all-pairs
    val cross = inc.filter(_._1 < 80L)
    assert(cross.toSet == (80 until k).map(i => (0L, i.toLong)).toSet,
      s"expected 40 star cross edges, got ${cross.length}")
    assert(inc.count(p => p._1 >= 80L) == 40 * 39 / 2)
    // and extending the base labels with the star-reduced increment
    // pairs equals a full recompute of the cluster flags
    val baseLabels = Components.labelComponents(
      TextOps.pairsCarriedStaged(baseStaged)
        .select(col("id_a"), col("id_b")))
    val incPairs = TextOps.incrementPairs(baseStaged, newStaged,
      joinBack = false)
    val extended = Components.flagCorpus(docs, "doc_id",
      Components.extendLabels(baseLabels, incPairs)).collect()
    val full = TextOps.dedupClusters(docs).collect()
    assert(extended.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("fit publishes the hot set inside the index; probes serve from it") {
    val path = graft.sources.TempDirs
      .scratchDir("graft_hotset_fit").toString
    val idx = TextOps.minhashFit(spark, megaDocs, path)
    // the marker carries the count, the artifact holds the buckets, and
    // the underscore prefix keeps it invisible to the index read
    assert(graft.sources.Markers
      .read(spark, path, "_graft_hot_buckets") == "16")
    val hotSet = BandedJoins.loadHotSet(spark, path)
    assert(hotSet.count() == 16)
    assert(!TextOps.stagedFrame(spark, idx).columns.contains("hot_band"))
    assert(TextOps.stagedFrame(spark, idx).count() == k + 10)
    // a probe with the published set star-reduces identically to the
    // inline-counting path
    val served = TextOps.pairsCarriedStaged(
        TextOps.stagedFrame(spark, idx), Some(hotSet))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = TextOps.pairsCarriedStaged(TextOps.stagedFrame(spark, idx))
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == inline)
    assert(served.count(_._1 < 1000L) == k - 1)
  }

  test("served probes skip the per-query bucket-count aggregation") {
    // wall-clock at sf0.1 is noise-dominated on this box; the
    // deterministic evidence that fit-time hot-set serving removed the
    // guard's steady-state cost is the PLAN: an index-served probe has
    // exactly the verify/minRows aggregates, no bucket-COUNT aggregate
    // (the inline path has one more hash aggregate pair over the
    // banded relation)
    def nAggs(df: org.apache.spark.sql.DataFrame): Int =
      "HashAggregate".r.findAllIn(
        df.queryExecution.executedPlan.toString).length
    val path = graft.sources.TempDirs
      .scratchDir("graft_hotset_plan").toString
    val idx = TextOps.minhashFit(spark, megaDocs, path)
    val staged = TextOps.stagedFrame(spark, idx)
    val hot = BandedJoins.loadHotSet(spark, path)
    val served = nAggs(TextOps.pairsCarriedStaged(staged, Some(hot)))
    val inline = nAggs(TextOps.pairsCarriedStaged(staged))
    assert(served < inline,
      s"served plan has $served aggregates, inline $inline — " +
        "hot-set serving did not remove the per-query count")
  }

  test("embedding mega-cluster star-reduces and clusters exactly") {
    import spark.implicits._
    def unit(v: Array[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n).toSeq
    }
    val same = unit(Array.tabulate(64)(j => math.sin(j * 13.7)))
    // fillers are basis vectors: mutually orthogonal, and cosine vs the
    // cluster direction is one component of a unit 64-dim vector (≤0.2)
    val rows = (0 until k).map(i => (i.toLong, same)) ++
      (0 until 6).map(i => (1000L + i,
        Array.tabulate(64)(j => if (j == i * 9) 1.0 else 0.0).toSeq))
    val u = rows.toDF("vec_id", "u")
    val cands = Vectors.lshCandidates(u).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.length == cands.toSet.size)
    val clusterCands = cands.filter(_._1 < 1000L)
    assert(clusterCands.toSet ==
      (1 until k).map(i => (0L, i.toLong)).toSet,
      s"expected ${k - 1} star edges, got ${clusterCands.length}")
    val flags = Vectors.embedClusters(u).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    (0 until k).foreach { i =>
      assert(flags(i.toLong) == ((0L, i == 0)))
    }
    (0 until 6).foreach { i =>
      assert(flags(1000L + i) == ((1000L + i, true)))
    }
  }
}
