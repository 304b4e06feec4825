package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmark harness (NOT part of the driver contract — Bench.scala is
  * frozen): replays selected driver queries under the exact per-query-phase
  * session config of [[Bench]] (same master, shuffle partitions, AQE
  * coalescing ON) with warm + min-of-N, for isolated before/after evidence
  * in OPTIMIZATION_r07.md. A count() action matches Bench's timing action.
  *
  * Usage: runMain graft.BenchExtra <runs> <query> [query ...]
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString).toInt
    val runs = args(0).toInt
    val names = args.drop(1).toSeq
    val shm = java.nio.file.Paths.get("/dev/shm")
    val localDir =
      if (java.nio.file.Files.isWritable(shm)) "/dev/shm/graft-bench"
      else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // CPU sentinel bracketing (same reduction as Bench.sentinelSec) so a
    // neighbour-load window is visible in this harness's output too
    def sentinel(): Double =
      time { spark.range(0, 1L << 31, 1, 32).selectExpr("sum(id % 1000003)").head() }
    println(f"sentinel_pre=${sentinel()}%.2f")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val samples = (1 to runs).map(_ => time { fn(spark, sfDir).count() })
      println(f"$n%-28s min=${samples.min}%.2f samples=" +
        samples.map(s => f"$s%.2f").mkString(","))
    }
    println(f"sentinel_post=${sentinel()}%.2f")
    spark.stop()
  }
}
