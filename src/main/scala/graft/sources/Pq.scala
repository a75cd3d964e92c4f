package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-cached parquet reads for published artifacts (r19
  * optimization round — the [[Tables]] cache generalized): every bare
  * `spark.read.parquet` runs a driver-side footer-inference job at
  * DataFrame construction (~20–45 ms), and the warm lifecycle queries
  * (compact / incremental / nightly, model probes, silver readers) pay
  * it for each published index / pairs / model path they open — up to
  * 8 such jobs per invocation. Artifact schemas are fixed by their
  * writers for a JVM's lifetime (versioned dirs are written once;
  * republished roots keep their schema), so the first read's inferred
  * schema is handed to every later read of the same path. Metadata
  * caching only — the planned scan, pruning and DPP are byte-identical
  * to the inferred-schema read; never data or results.
  */
object Pq {
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  def read(spark: SparkSession, path: String): DataFrame = {
    val known = schemaCache.get(path)
    if (known != null) spark.read.schema(known).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, df.schema)
      df
    }
  }
}
