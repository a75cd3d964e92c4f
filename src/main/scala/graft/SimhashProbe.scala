package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builder diagnostic: phase timings + chosen block plan of the
  * SimHash pair path at a given sf directory (used to attribute sf1
  * movement between the signature aggregation, the plan probe, and
  * the block join). */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    (1 to 2).foreach { round =>
      println(s"[probe] --- round $round ---")
      val sig = t("simhashMd5Halves + checkpoint") {
        graft.operators.TextOps.simhashMd5Halves(docs)
          .localCheckpoint(true)
      }
      val n = t("sig.count")(sig.count())
      val dsig = t("distinct sigs + checkpoint") {
        sig.select(col("sig_hi"), col("sig_lo")).distinct()
          .withColumn("doc_id", lit(0L)).localCheckpoint(true)
      }
      println(s"[probe] n=$n distinct=${dsig.count()}")
      val b = t("simhashAutoPlan") {
        graft.operators.TextOps.simhashAutoPlan(dsig, n)
      }
      println(s"[probe] count-derived B=" +
        graft.operators.TextOps.simhashBlockPlan(n) + s" chosen B=$b")
      Seq(4, 5, 6).foreach { bb =>
        val hot = graft.operators.BandedJoins.hotBuckets(
          graft.operators.TextOps.simhashKeyed(dsig, bb), "band", "key")
          .count()
        println(s"[probe] hot buckets at B=$bb: $hot")
      }
      val pairs = t("simhashSigPairs join + count") {
        graft.operators.TextOps.simhashSigPairs(sig, b).count()
      }
      println(s"[probe] pairs=$pairs")
    }
    spark.stop()
  }
}
