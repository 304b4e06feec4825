package graft

import graft.cells.CellScheme
import graft.geom.Extent
import graft.ingest.Workloads
import graft.join.SpatialJoins
import org.apache.spark.sql.SparkSession

/** Plan-tuning harness (not part of the driver contract): times plan variants
  * on the headline workload to pick the flagship configuration.
  */
object Tune {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus.toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ext = Extent(0, 10001, 0, 10001)
    val a = Workloads.uniformPoints(spark, n, 789, parts = 2 * cpus).cache()
    val b = Workloads.uniformPolygons(spark, n, 123, parts = 2 * cpus).cache()
    println(s"gen: ${a.count()} x ${b.count()}")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   results=$r")
    }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (dur > 0.2)
          println(f"    stage ${si.stageId}%3d ${si.name.take(30)}%-30s tasks=${si.numTasks}%4d wall=$dur%6.2f s")
      }
    })
    val s16 = CellScheme.forSize(ext, n, targetPerCell = 16, maxN = 8192)
    t("warmup")(SpatialJoins.gridJoin(a, b, s16).count())
    for (round <- 1 to 3)
      t(s"smj tpc=16 r$round cores=$cpus")(SpatialJoins.gridJoin(a, b, s16).count())
    spark.stop()
  }
}
