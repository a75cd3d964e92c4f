package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sources.Tables

/** PassJoin cell-mass probe (r17 — the r16 verdict's item-2 done
  * criterion asked for Σ n² "measured smaller", not just faster): the
  * structural quantity behind the edit family's scale ceiling is the
  * candidate mass Σ over join cells of |build rows| × |probe key rows|
  * — it is what the shuffle ships and what the banded DP walks, and it
  * is the number that grows ~quadratically once content saturates:
  * under this probe's content keying, 113.8 k (sf0.1) → 3.59 M (sf1) →
  * 303.2 M (sf10), 84× for the second 10× of data
  * (`EDIT_CELLS_r17.json` — the committed artifact this main
  * produces; the r16 sweep's in-flight estimate of the same effect,
  * "88 k → 2.6 M → 202 M", used the pre-probe counting, before the
  * probe-key dedup rules here were fixed as THE definition). This main
  * computes that mass over a scale directory's `documents` under BOTH
  * keyings of the SAME exploded row sets:
  *
  *   - `content` — cells keyed (lang, idx, seg), the pre-r17 index
  *     (probe keys deduped row-locally by content, exactly as the old
  *     enumeration emitted them; build rows project `blen` away, which
  *     is per-row constant and so drops nothing);
  *   - `length` — cells keyed (lang, idx, seg, blen), the PVLDB'11 §4
  *     length-segmented index as shipped, with the `_graft_lens`
  *     population prune applied to the probe side first (the shipped
  *     plan's map-side kill of dead assumed-length keys).
  *
  * Reported per keying: Σ mass, the max single cell's mass (the
  * one-task DP tail the r16 sweep hit), and cell count; plus the raw
  * vs pruned probe-row counts (what the lens prune kills before the
  * exchange). Salting is deliberately OUT of scope — it redistributes
  * a cell's mass across tasks without changing it; this probe measures
  * the mass itself. Pair-emission predicates (id ordering, emit-once,
  * |Δlen| ≤ d) are also pre-filter here on both keyings equally: the
  * mass is the join's input cost, not the output size.
  */
object EditCellsProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/tmp/sf10")
    val d = args.lift(1).map(_.toInt).getOrElse(3)
    val prefixLen = 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_PROBE_NOCACHE (r18): at sf100 the exploded row sets
    // reach 315M rows — localCheckpointing them needs ~50 GB of
    // storage spill and starves the aggregates (measured OOM at 96g).
    // The flag trades recomputation of the enumeration per action for
    // a streaming footprint; results are identical (the probe is a
    // deterministic function of the corpus).
    val noCache = sys.env.get("SPARK_GRAFT_PROBE_NOCACHE").contains("1")
    def pin(df: DataFrame): DataFrame =
      if (noCache) df else df.localCheckpoint(true)
    val keyed = TextOps.editKeyedHeads(Tables.documents(spark, dir),
      prefixLen)
    val build = pin(TextOps.editBuildRows(keyed, d))
    val probeRaw = pin(TextOps.editProbeRows(keyed, d))
    // the shipped plan's probe-key prune: broadcast semi-join against
    // the build side's distinct (lang, blen) population
    val probePruned = pin(probeRaw.join(
      broadcast(TextOps.editBuildLens(build)),
      col("lang") === col("l_lang") &&
        col("kseg.blen") === col("l_blen"), "left_semi"))

    def mass(b: DataFrame, p: DataFrame, keys: Seq[String]): String = {
      val bn = b.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("bn"))
      val pn = p.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("pn"))
      val row = bn.join(pn, keys, "inner")
        .agg(sum(col("bn") * col("pn")).as("mass"),
          max(col("bn") * col("pn")).as("max_cell"),
          count(lit(1)).as("cells"))
        .collect()(0) // one-row aggregate
      s"""{"mass":${row.getLong(0)},"max_cell":${row.getLong(1)},""" +
        s""""cells":${row.getLong(2)}}"""
    }

    val flatten2 = (df: DataFrame) => df.select(col("lang"),
      col("kseg.idx").as("idx"), col("kseg.seg").as("seg"),
      col("kseg.blen").as("blen"), col("doc_id"))
    val b2 = flatten2(build)
    val pRaw2 = flatten2(probeRaw)
    val pPr2 = flatten2(probePruned)
    // content keying: dedup probe keys row-locally by content, as the
    // pre-r17 enumeration emitted them (build needs no dedup — blen is
    // constant per build row)
    val pContent = pRaw2.dropDuplicates("doc_id", "lang", "idx", "seg")

    val contentMass = mass(b2, pContent, Seq("lang", "idx", "seg"))
    val lengthMass = mass(b2, pPr2, Seq("lang", "idx", "seg", "blen"))
    val counts =
      s""""build_rows":${b2.count()},"probe_rows_raw":${pRaw2.count()},""" +
        s""""probe_rows_pruned":${pPr2.count()},""" +
        s""""probe_rows_content":${pContent.count()}"""
    println(s"""{"metric":"edit_cell_mass","sf":"$dir","d":$d,""" +
      s""""prefix_len":$prefixLen,$counts,""" +
      s""""content_key":$contentMass,"length_key":$lengthMass}""")
    spark.stop()
  }
}
