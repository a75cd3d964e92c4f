package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Embedding similarity search over the `embeddings` table (64-dim
  * float vectors) — the north-star similarity-search extension
  * (BASELINE.json; SURVEY.md §2.10).
  *
  * The dot product / norm are higher-order `aggregate(zip_with(...))`
  * folds over the vector cast to double — built-in, codegen'd, and
  * bit-reproducible: float×float products are exact in double and both
  * engines fold left-to-right, so the DuckDB oracle (`list_reduce`)
  * matches the cosine to the last bit.
  *
  * Scale design: [[qCosineTopk]] is the exact brute-force baseline —
  * each partition of the corpus scores a *broadcast* query set and only
  * top-k survivors reach the per-query merge, but the scan is O(corpus ×
  * queries) and is not the 100 TB plan. [[qAnnIvf]] is: an IVF-style
  * coarse quantizer (centroid per partition label) prunes the corpus to
  * one probe bucket per query, so the scored fraction is ~1/nlist; the
  * property test measures its recall against the brute-force truth.
  */
object Vectors {

  private def dvec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Dot product as `aggregate(zip_with(...))`. Measured on the 2M-pair
    * sf0.1 sweep this HOF loop is ~4× FASTER than a flat 64-term
    * `element_at` expression tree (10 s vs 40 s): the flat tree lands in
    * the broadcast-loop join's interpreted predicate path, while the HOF
    * evaluates as one tight specialized loop. Left fold from 0.0 matches
    * DuckDB's `list_reduce` bitwise.
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  /** Normalize any (vec_id, label, embedding) frame into the internal
    * (vec_id, label, v: array<double>, nrm) shape. */
  private[graft] def prep(vectors: DataFrame): DataFrame =
    vectors
      .select(col("vec_id"), col("label"), dvec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  private def base(spark: SparkSession, dir: String): DataFrame =
    prep(Tables.embeddings(spark, dir))

  /** Brute-force cosine top-5 neighbors for each query vector
    * (vec_id < 10) against the rest of the corpus. Exact — the ANN
    * baseline and the DuckDB oracle query. The query side is broadcast;
    * ranking is a per-query window with a deterministic (cosine desc,
    * neighbor_id) order.
    */
  def qCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
    val q = b.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = b.filter(col("vec_id") >= 10)
      .crossJoin(broadcast(q))
      .withColumn("cosine",
        dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF-style approximate nearest neighbors: the coarse quantizer is a
    * centroid per `label` partition (computed distributedly:
    * posexplode → per-dimension mean → reassembled in index order); each
    * query probes only its nearest centroid's bucket (nprobe=1), then
    * exact cosine top-5 within the bucket.
    *
    * At 100 TB the corpus side stays partitioned by bucket (write-time
    * `partitionBy(bucket)` would make the probe a partition-pruned scan);
    * the centroid table is nlist rows — always broadcast. Declared
    * rows-only: the probe choice is exact arithmetic but the query is
    * approximate by design. Recall is property-tested on a synthetic
    * *clustered* corpus (≥0.9); on the driver's corpus the vectors are
    * near-orthogonal noise (intra/inter-label mean cosine 0.0016/0.0003),
    * so no bucketing scheme can beat the ~1/nlist random baseline there —
    * the test asserts shape and single-bucket probing instead.
    */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame =
    ivfTopk(base(spark, dir))

  /** Embedding-cosine near-duplicate pairs — the fifth dedup flavor
    * (exact all-pairs baseline): every (a < b) pair with cosine ≥ 0.5
    * (the testdata plants exactly one such pair; the background maximum
    * for its near-orthogonal noise is ~0.4).
    *
    * Scale posture: the corpus side streams against a broadcast copy —
    * correct only while one side fits executors; at 100 TB the pair
    * generation moves to LSH buckets (sign-bit hyperplane signatures,
    * same banded-join shape as [[graft.operators.TextOps.qDedupMinhash]])
    * and this exact query remains the verification oracle for bucketed
    * candidates.
    */
  def qDedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    val u = unit(spark, dir)
    // the corpus parquet is one small file and AQE coalesces tiny
    // shuffles to one partition — which would run the O(n²) broadcast
    // loop single-threaded. An explicit numbered repartition survives
    // AQE and spreads the stream side across every core.
    val a = u.select(col("vec_id").as("id_a"), col("u").as("ua"))
      .repartition(spark.sparkContext.defaultParallelism)
    val c = u.select(col("vec_id").as("id_b"), col("u").as("ub"))
    a.crossJoin(broadcast(c))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("ua"), col("ub")))
      .filter(col("cosine") >= 0.5)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Unit-normalized vectors: the per-vector division happens once here
    * instead of once per scored pair. The trivial `groupBy(pk).first`
    * aggregate is a deliberate optimization barrier: without it,
    * CollapseProject re-inlines the cast→norm→divide chain into the
    * pair-join condition and the whole normalization re-runs per scored
    * pair (measured 2× on the sf0.1 all-pairs sweep). After the
    * aggregate, downstream plans reference plain attributes.
    */
  private def unit(spark: SparkSession, dir: String): DataFrame = {
    val b = base(spark, dir)
    b.select(col("vec_id"), col("label"),
      transform(col("v"), x => x / col("nrm")).as("u"))
      .groupBy(col("vec_id"))
      .agg(first(col("label")).as("label"), first(col("u")).as("u"))
  }

  /** LSH-bucketed embedding near-dup — the scale path for
    * [[qDedupEmbed]] (same exact-baseline / banded-scale pairing as the
    * MinHash pair in TextOps): 64 deterministic random-hyperplane sign
    * bits per vector, packed into 16 bands of 4 bits; vectors sharing a
    * band bucket become candidates via an equi-join, then the exact
    * cosine is recomputed on candidates only and thresholded at 0.5.
    * For cosine θ the per-band collision rate is (1-θ/π)⁴; OR-ing 16
    * bands catches a 0.51-cosine pair with p≈0.97 while scoring a tiny
    * fraction of the n² pairs. Declared rows-only (approximate recall by
    * design); property-tested against the exact sweep.
    */
  def qDedupEmbedLsh(spark: SparkSession, dir: String): DataFrame = {
    val nPlanes = 64
    val bandSz  = 4
    val rnd = new scala.util.Random(42)
    val planes = Seq.tabulate(nPlanes)(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian())))
    val planesDf = broadcast(spark.createDataFrame(planes)
      .toDF("plane_id", "pvec"))
    val u = unit(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
    // one row per (vector, plane): sign bit of the projection
    val bits = u.crossJoin(planesDf)
      .select(col("vec_id"),
        (col("plane_id") / bandSz).cast("int").as("band"),
        (pow(lit(2.0), (col("plane_id") % bandSz).cast("double"))
          .cast("int") *
          when(dot(col("u"), col("pvec")) > 0, 1).otherwise(0)).as("bitval"))
    val banded = bits.groupBy(col("vec_id"), col("band"))
      .agg(sum(col("bitval")).as("band_sig"))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_sig") === col("y.band_sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .distinct()
    cand
      .join(u.select(col("vec_id").as("id_a"), col("u").as("ua")), "id_a")
      .join(u.select(col("vec_id").as("id_b"), col("u").as("ub")), "id_b")
      .withColumn("cosine", dot(col("ua"), col("ub")))
      .filter(col("cosine") >= 0.5)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Core IVF pipeline over any (vec_id, label, v, nrm) frame; rows with
    * vec_id < 10 are the query set. Exposed for property tests. */
  private[graft] def ivfTopk(b: DataFrame): DataFrame = {
    val centroids = b
      .select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos")).agg(avg(col("col")).as("m"))
      .groupBy(col("label"))
      .agg(collect_list(struct(col("pos"), col("m"))).as("cl"))
      .select(col("label").as("c_label"),
        transform(array_sort(col("cl")), s => s("m")).as("cv"))
      .withColumn("c_nrm", norm(col("cv")))
    val q = b.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"))
    // nearest centroid per query: min over (negative cosine, label)
    val probe = q.crossJoin(broadcast(centroids))
      .withColumn("ncos",
        -dot(col("qv"), col("cv")) / (col("qn") * col("c_nrm")))
      .groupBy(col("q_id")).agg(min(struct(col("ncos"), col("c_label"))).as("p"))
      .select(col("q_id"), col("p.c_label").as("probe_label"))
    val qp = q.join(probe, "q_id")
    val scored = b.filter(col("vec_id") >= 10)
      .join(broadcast(qp), col("label") === col("probe_label"))
      .withColumn("cosine",
        dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("probe_label"), col("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }
}
