package graft

import graft.join.SpatialJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The storage-side scale path: when both inputs are PERSISTED bucketed by
  * cell id (the Iceberg/warehouse layout a 100 TB deployment would use),
  * the PBSM equi-join runs with ZERO shuffle — Spark co-locates bucketed
  * scans, so the only data movement left is the scan itself. This spec
  * proves the plan shape (no shuffle exchange) and that the result set is
  * unchanged from the shuffle path.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cell-bucketed tables join with no shuffle exchange, same pair set") {
    import spark.implicits._
    val ext = graft.geom.Extent(0, 100, 0, 100)
    val s = graft.cells.CellScheme(ext, 16, 16)
    val rnd = new scala.util.Random(7)
    def mk(n: Int, off: Long) = (0 until n).map { i =>
      val x = rnd.nextDouble() * 95; val y = rnd.nextDouble() * 95
      graft.geom.Geom(off + i, x, x + rnd.nextDouble() * 4, y, y + rnd.nextDouble() * 4)
    }.toDS()
    val a = mk(500, 0); val b = mk(500, 10000)

    val want = SpatialJoins.gridJoin(a, b, s)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // persist the REPLICATED frames bucketed by cell — the layout a
    // warehouse would maintain for its spatial tables
    // explicit per-table paths — the session's warehouse dir is static conf
    val wh = java.nio.file.Files.createTempDirectory("bucketed").toString
    def persistBucketed(ds: org.apache.spark.sql.Dataset[graft.geom.Geom],
                        p: String, name: String): Unit =
      SpatialJoins.withCells(
          ds.toDF(s"${p}_id", s"${p}_xmin", s"${p}_xmax", s"${p}_ymin", s"${p}_ymax"), s, p)
        .write.mode("overwrite").bucketBy(8, "cell").sortBy("cell")
        .option("path", s"$wh/$name").saveAsTable(name)
    persistBucketed(a, "a", "bucketed_a")
    persistBucketed(b, "b", "bucketed_b")

    // force the sort-merge path: at test sizes the planner would broadcast
    // the tiny side (which also avoids a shuffle but proves nothing about
    // the bucketed layout a 100 TB table relies on)
    val prevBt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAbt = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prevBt)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
    val ac = spark.table("bucketed_a")
    val bc = spark.table("bucketed_b").withColumnRenamed("cell", "b_cell")
    val joined = ac.join(bc,
        col("cell") === col("b_cell") && SpatialJoins.intersectPred &&
          SpatialJoins.cellOfCol(s, greatest(col("a_xmin"), col("b_xmin")),
            greatest(col("a_ymin"), col("b_ymin"))) === col("cell"))
      .select(col("a_id"), col("b_id"))

    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"bucketed join must not shuffle:\n$phys")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBt)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAbt)
      spark.sql("DROP TABLE IF EXISTS bucketed_a")
      spark.sql("DROP TABLE IF EXISTS bucketed_b")
    }
  }

  test("driver query spatial_bucketed_join is Exchange-free and matches gridJoin") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/part.parquet").exists())
    val joined = SparkEntry.queries("spatial_bucketed_join")(spark, dir)
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"bucketed driver query must not shuffle:\n$phys")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = SpatialJoins.gridJoin(
        graft.api.Derived.partRects.load(spark, dir),
        graft.api.Derived.ordersRects.load(spark, dir), SparkEntry.grid)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
  }
}
