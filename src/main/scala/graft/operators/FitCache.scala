package graft.operators

import org.apache.spark.sql.SparkSession

/** One fitted artifact per (JVM, key) — the shared fit-once cache
  * behind the silver point layout, the MinHash index, and the
  * incremental-dedup base state (round-8 review: three verbatim copies
  * of this machinery had accumulated, and every copy repeats the
  * subtle parts).
  *
  * The subtle parts, once:
  *   - the map holds a LAZY holder, not the build itself —
  *     `computeIfAbsent` mapping functions run under the bin lock, and
  *     a multi-second fit there would block unrelated map access; the
  *     `lazy val` still guarantees exactly-one build per key,
  *     serialized on the holder, outside the map lock;
  *   - the holder RELEASES its captured session once the build
  *     completes (ADVICE r5): the holder lives for the JVM, the
  *     session need not;
  *   - a FAILED build is removed from the cache so it cannot poison it
  *     with a dead captured session — the next caller retries with its
  *     own live session.
  *
  * CONTRACT (ADVICE r5): the source data behind `key` is immutable for
  * the JVM's lifetime — an in-process rewrite would keep serving the
  * stale artifact. That matches the testdata dirs (driver-written,
  * read-only) and the production posture (artifacts are rebuilt by the
  * job that rewrites the source, not by readers).
  */
private[graft] final class FitCache[T](build: (SparkSession, String) => T) {

  private final class Holder(spark0: SparkSession, key: String) {
    private var spark: SparkSession = spark0
    lazy val value: T = {
      val s = spark
      val v = build(s, key)
      spark = null
      v
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Holder]()

  def get(spark: SparkSession, key: String): T = {
    val holder = cache.computeIfAbsent(key, k => new Holder(spark, k))
    try holder.value
    catch { case e: Throwable => cache.remove(key, holder); throw e }
  }
}
