package graft

import graft.operators.TextOps

/** BM25 ranked retrieval (q_bm25_topk): bit-for-bit recompute against a
  * driver-side Okapi implementation with the SAME IEEE operation order,
  * fixture semantics (zero-match docs, tie-breaks), and the zero-shuffle
  * plan contract.
  */
class RetrievalSpec extends SparkTestBase {

  /** Driver-side Okapi BM25 mirroring bm25Topk's exact IEEE op chain:
    * rational idf, (k1 + 1.0) folded by the same double addition,
    * left-associated per-term sum. */
  private def bm25Local(texts: Seq[(Long, String)], query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, k: Int = 10)
      : Seq[(Long, Int, Int, Double)] = {
    val toks = texts.map { case (id, t) => (id, t.split(" ", -1)) }
    val n = toks.length.toLong
    val sumDl = toks.map(_._2.length.toLong).sum
    val avgdl = sumDl.toDouble / n
    val df = query.map(q => toks.count(_._2.contains(q)).toLong)
    toks.map { case (id, ts) =>
      val dl = ts.length
      val scores = query.zipWithIndex.map { case (q, i) =>
        val tf = ts.count(_ == q)
        (n - df(i) + 0.5) / (df(i) + 0.5) *
          (tf.toDouble * (k1 + 1.0)) /
          (tf + k1 * (1.0 - b + b * dl / avgdl))
      }
      val nMatch = query.count(q => ts.contains(q))
      (id, dl, nMatch, scores.reduceLeft(_ + _))
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(k)
  }

  test("q_bm25_topk matches a driver-side Okapi recompute bit-for-bit") {
    val got = TextOps.qBm25Topk(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("dl"),
        r.getAs[Int]("n_match"), r.getAs[Double]("score")))
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val want = bm25Local(texts.toSeq, Seq("spark", "vector", "hash"))
    assert(got.toSeq == want) // exact doubles: same IEEE ops both sides
  }

  test("zero-match docs score exactly 0.0 and rank by doc_id") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "spark spark is neat"),
      (2L, "nothing relevant here at all"),
      (3L, "also nothing"),
      (4L, "vector hash spark")).toDF("doc_id", "text")
    val rows = TextOps.bm25Topk(fixture, Seq("spark", "vector", "hash"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_match"),
        r.getAs[Double]("score")))
    // every doc ranks (no match-filter); zero-match docs land at the
    // bottom with an exact 0.0 (0-numerator, never NaN), tie-broken
    // by doc_id
    assert(rows.map(_._1).toSeq == Seq(4L, 1L, 2L, 3L))
    assert(rows.filter(_._2 == 0).map(_._3).forall(_ == 0.0))
    assert(rows.take(2).forall(_._3 > 0.0))
  }

  test("longer documents with equal tf score lower (length normalization)") {
    import spark.implicits._
    val pad = Seq.fill(40)("filler").mkString(" ")
    val fixture = Seq(
      (1L, "spark ok"),
      (2L, s"spark $pad")).toDF("doc_id", "text")
    val rows = TextOps.bm25Topk(fixture, Seq("spark")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L), rows.toSeq)
    assert(rows(0)._2 > rows(1)._2)
  }

  test("bm25 plan: zero data shuffles, broadcast stats, heap top-k") {
    val q = TextOps.qBm25Topk(spark, sfDir)
    q.collect() // finalize AQE on this QueryExecution
    val plan = q.queryExecution.executedPlan.toString
    // the ONLY exchange is the 1-row statistics aggregate's
    // SinglePartition gather — no hash repartition of the corpus ever
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // the stats row joins back broadcast (1-row nested loop), and the
    // top-k runs as per-partition heaps, not a global sort
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
