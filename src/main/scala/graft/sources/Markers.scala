package graft.sources

import org.apache.spark.sql.SparkSession

/** Tiny metadata markers written INSIDE a parquet artifact directory
  * (`_graft_shards`, `_graft_layout`, …) — one implementation of the
  * write/read idiom instead of a hand-rolled copy per artifact
  * (round-8 review). Uses the Hadoop FileSystem API, not java.nio, so
  * hdfs:// and s3a:// artifact paths work exactly like local ones —
  * the cluster-scale story depends on it; parquet readers skip
  * underscore-prefixed files, so the marker never pollutes the scan.
  */
object Markers {

  def write(spark: SparkSession, dir: String, name: String,
    value: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(dir, name)
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(marker, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }

  def read(spark: SparkSession, dir: String, name: String): String = {
    val marker = new org.apache.hadoop.fs.Path(dir, name)
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(marker)
    try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
  }

  /** [[read]] that treats an absent marker as None instead of an IO
    * error — the probe the streaming sinks use to ask "did a crashed
    * predecessor already publish this version?" without requiring the
    * root to be initialized first. */
  def readOption(spark: SparkSession, dir: String,
    name: String): Option[String] = {
    val marker = new org.apache.hadoop.fs.Path(dir, name)
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(marker)) None else Some(read(spark, dir, name))
  }
}
