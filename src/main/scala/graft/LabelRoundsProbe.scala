package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Components, TextOps}
import graft.sources.Tables

/** Labeling-round probe (r16, r15 verdict item 1's third deliverable):
  * the alternating large-star/small-star propagation's round count is
  * the one scale claim the per-round bench artifacts cannot surface —
  * wall seconds hide whether convergence stayed O(log² n)-flat or
  * started creeping with corpus size. This main FORCES the distributed
  * alternation (`localMaxEdges = 0` disables the driver fast path) on
  * the two dedup pair graphs whose topology the corpus controls — the
  * MinHash near-dup graph and the SimHash Hamming graph — and prints
  * one JSON line with rounds + graph sizes per family, runnable at any
  * scale directory. The committed reading rule: rounds at sf10 must
  * match rounds at sf1 (the bound depends on component TOPOLOGY, not
  * corpus size — ScaleGen's inflation model replicates cluster shapes,
  * so a creeping round count would mean the propagation itself, not
  * the data, regressed).
  */
object LabelRoundsProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)

    def probe(name: String, pairs: org.apache.spark.sql.DataFrame)
      : String = {
      val edges = pairs.localCheckpoint(true)
      val nEdges = edges.count()
      val (labels, rounds) =
        Components.labelComponentsCounted(edges, localMaxEdges = 0)
      val nNodes = labels.count()
      s""""$name":{"rounds":$rounds,"edges":$nEdges,"nodes":$nNodes}"""
    }

    val minhash = probe("minhash",
      TextOps.minhashPairs(docs).select(col("id_a"), col("id_b")))
    val simhash = probe("simhash", TextOps.simhashClusterEdges(docs))
    println(s"""{"metric":"label_rounds","sf":"$dir",$minhash,$simhash}""")
    spark.stop()
  }
}
