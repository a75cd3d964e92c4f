package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement main (r19, guide §1): for each named
  * declared query, dump `.explain("formatted")` to a file (the committed
  * plan evidence under plans/rNN/) and, optionally, run the query warm
  * through the noop sink with a job/stage listener so per-stage wall
  * time, task counts and shuffle bytes attribute the query's cost to
  * operators — the local stand-in for the Spark UI's stage page, which
  * is disabled in the bench session.
  *
  * Usage:
  *   runMain graft.PlanProbe <sfDir> <outDir> [--run N] q1 q2 ...
  *
  * Dumps <outDir>/<query>.txt (plan) and, with --run, prints one line
  * per job/stage to stdout, tagged [stage]. Matches the bench session's
  * config (shuffle.partitions = cpus, UTC, nanosAsLong) so plans are
  * the bench's plans.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val (runPasses, names0) = args.drop(2).toList match {
      case "--run" :: n :: rest => (n.toInt, rest)
      case rest => (0, rest)
    }
    val names = if (names0.isEmpty || names0 == List("all"))
      SparkEntry.queries.keys.toSeq.sorted else names0
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    // stage-level attribution: name, wall ms, tasks, input/shuffle bytes
    case class St(name: String, ms: Long, tasks: Int,
      input: Long, sr: Long, sw: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
          val i = sc.stageInfo
          val m = i.taskMetrics
          val ms = (for {a <- i.completionTime; b <- i.submissionTime}
            yield a - b).getOrElse(-1L)
          if (m != null) stages.add(St(i.name.takeWhile(_ != '\n'), ms,
            i.numTasks, m.inputMetrics.bytesRead,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten))
        }
      })

    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n.txt"), plan)
      if (runPasses > 0) {
        // warm-up (absorbs fits/JIT), then timed passes with listener
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (1 to runPasses).foreach { p =>
          stages.clear()
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200) // let listener events drain
          println(f"[query] $n pass=$p sec=$sec%.3f")
          import scala.jdk.CollectionConverters._
          stages.asScala.toSeq.sortBy(-_.ms).foreach { s =>
            println(f"[stage] $n pass=$p ms=${s.ms}%5d tasks=${s.tasks}%3d " +
              f"in=${s.input}%9d sr=${s.sr}%9d sw=${s.sw}%9d ${s.name}")
          }
        }
      }
    }
    spark.stop()
  }
}
