package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge

/** SQL surface for the engine's custom expressions — the
  * `SparkSessionExtensions` registration point (design tier (c)):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *   SELECT graft_dot(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * or, for a session someone else built (the driver's),
  * [[GraftExtensions.register]] installs the same functions as temp
  * functions at runtime. Either way the SQL names resolve to the exact
  * Catalyst expressions the DataFrame API uses — codegen'd, no UDF
  * indirection.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, usage, builder) =>
      // the full ctor is the only non-deprecated one; unused doc
      // fields stay empty (group/since have no meaning here)
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", null, name, usage, "", "",
          "", "", "", "", "scala_udf"),
        builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case _ => throw new IllegalArgumentException(s"$what must be an int literal")
  }

  /** (name, usage, builder) for every SQL-exposed custom expression. */
  private[graft] val all: Seq[(String, String,
    Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      "graft_dot(a, b) - dot product of two array<double> vectors",
      es => DotProduct(es(0), es(1))),
    ("graft_unit",
      "graft_unit(v) - unit-normalize array<float|double> (NULL for zero)",
      es => NormalizeVector(es(0))),
    ("graft_simhash64",
      "graft_simhash64(tokens) - 64-bit simhash bitstring of array<string>",
      es => SimHash64(es(0))),
    ("graft_simhash_md5",
      "graft_simhash_md5(tokens) - md5-plane simhash halves " +
        "struct(sig_hi, sig_lo) of array<string> (NULL on empty)",
      es => SimhashMd5Sig(es(0))),
    ("graft_shingle_hashes",
      "graft_shingle_hashes(tokens, k) - distinct xxhash64 word k-gram shingles",
      es => ShingleHashes(es(0), intLit(es(1), "k"))),
    ("graft_minhash_bands",
      "graft_minhash_bands(shash, nHashes, bands) - LSH band hashes of " +
        "a MinHash signature (array<long>, one per band)",
      es => MinHashBandHashes(es(0), intLit(es(1), "nHashes"),
        intLit(es(2), "bands"))),
    ("graft_earlier_band_collision",
      "graft_earlier_band_collision(a, b, band) - TRUE iff a band index " +
        "below `band` holds equal hashes in both signatures (emit-once)",
      es => EarlierBandCollision(es(0), es(1), es(2))),
    ("graft_edit_first_match",
      "graft_edit_first_match(build, probe, d) - first PassJoin key " +
        "index (-1 shorts, -99 none) at which the head pair collides",
      es => EditFirstMatch(es(0), es(1), intLit(es(2), "d"))),
    ("graft_edit_emit_at",
      "graft_edit_emit_at(build, probe, idx, d) - TRUE iff idx is the " +
        "pair's first-matching PassJoin key (join-aware emit-once)",
      es => EditEmitAt(es(0), es(1), es(2), intLit(es(3), "d"))),
    ("graft_edit_probe_keys",
      "graft_edit_probe_keys(head, d) - distinct PassJoin probe keys " +
        "(idx, seg) under the multi-match-aware window, shorts included",
      es => EditProbeKeys(es(0), intLit(es(1), "d"))))

  /** Install the same functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      ColumnBridge.registerTempFunction(spark, name, builder)
    }
}
