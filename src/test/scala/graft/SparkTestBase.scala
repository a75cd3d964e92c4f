package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites: one JVM-wide SparkSession (Spark's
  * getOrCreate makes this safe across suites), small shuffle partition
  * count for local runs, UTC like the driver.
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // pinned for ShuffleBytesSpec's absolute byte bounds (ADVICE
      // r15): a Spark-default change to exchange compression would
      // otherwise shift measured shuffle-read bytes under flat claims
      .config("spark.shuffle.compress", "true")
      .config("spark.io.compression.codec", "lz4")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
