package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Vectors

/** Measured ANN recall@k vs probe width at the ScaleGen 10x scale
  * (r12 verdict item 5). One number would mislead here: the sf1
  * corpus is DELIBERATELY structure-free (near-orthogonal noise, the
  * documented `qAnnIvf` regime — intra/inter-label mean cosines are
  * within noise of each other), and IVF recall on isotropic data is
  * ~the probed corpus fraction by construction — no bucketing of
  * directionless vectors can beat it (this is the published IVF
  * contract, not an implementation defect; the ≥0.9 fixture spec runs
  * on a CLUSTERED corpus, where the probed buckets are where the
  * neighbors actually live). So this probe commits the whole
  * recall-vs-nprobe CURVE against the exact full-probe truth set:
  * recall must track nprobe/nlist on this corpus (the theory line) and
  * reach 1.0 at nprobe = nlist (the exact-ride identity) — both
  * measurable claims a single recall number cannot carry.
  */
object RecallProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val model = Vectors.ivfFit(spark, dir)
    val queries = Vectors.unit(spark, dir).filter(col("vec_id") < 10)
      .localCheckpoint(true)
    def topSets(nprobe: Int): Map[Long, Set[Long]] =
      Vectors.probeTopk(spark, model, queries, nprobe = nprobe)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val exact = topSets(model.nlist)
    val curve = Seq(3, 8, 16, 32, 64, model.nlist).distinct.map { np =>
      // the nlist point IS the truth set — reuse it instead of paying
      // the full probe (the run's costliest scan) a second time
      val got = if (np == model.nlist) exact else topSets(np)
      val recall = exact.keys.toSeq.map(q =>
        got.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble /
          exact(q).size).sum / exact.size
      f"""{"nprobe":$np,"fraction":${np.toDouble / model.nlist}%.4f,"recall":$recall%.4f}"""
    }
    println(s"""{"sf":"$dir","nlist":${model.nlist},"k":5,"queries":${exact.size},"curve":[${curve.mkString(",")}]}""")
    spark.stop()
  }
}
