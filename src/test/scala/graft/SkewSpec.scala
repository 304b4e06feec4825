package graft

import graft.cells.CellScheme
import graft.geom.{Extent, Geom}
import graft.ingest.Workloads
import graft.join.SpatialJoins
import graft.skew.{AdaptiveCells, AdaptiveScheme}
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("adaptive scheme: exactly-once ownership on hot-cell boundaries") {
    val base = CellScheme(Extent(0, 100, 0, 100), 4, 4)
    val scheme = AdaptiveScheme(base, Map(0L -> 3, 5L -> 2))
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 3000) {
      def g() = {
        val x = rnd.nextDouble() * 100; val y = rnd.nextDouble() * 100
        Geom(rnd.nextLong(), x, x + rnd.nextDouble() * 30, y, y + rnd.nextDouble() * 30)
      }
      val a = g(); val b = g()
      if (a.intersects(b)) {
        val owners = (scheme.keysOf(a).toSet intersect scheme.keysOf(b).toSet)
          .count(k => scheme.owns(k, a, b))
        assert(owners == 1, s"$a x $b")
      }
    }
  }

  test("gridJoinAdaptive == oracle on skewed gaussian workload, splits trigger") {
    val a = Workloads.gaussianPolygons(spark, 4000, seed = 1, mapEdge = 1000.0, meanEdge = 8.0)
    val b = Workloads.gaussianPolygons(spark, 4000, seed = 2, mapEdge = 1000.0, meanEdge = 8.0)
    val ext = Extent(0, 1012, 0, 1012)
    val base = CellScheme(ext, 8, 8)
    val planned = AdaptiveCells.plan(a, b, base, budgetPairs = 10000)
    assert(planned.splits.nonEmpty, "expected hot cells on a gaussian mixture")
    val got = pairs(SpatialJoins.gridJoinAdaptive(a, b, base, budgetPairs = 10000))
    val want = pairs(SpatialJoins.broadcastNL(a, b))
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("sample-based split planning stays oracle-equal (correctness never depends on estimates)") {
    val a = Workloads.gaussianPolygons(spark, 3000, seed = 5, mapEdge = 1000.0, meanEdge = 8.0)
    val b = Workloads.gaussianPolygons(spark, 3000, seed = 6, mapEdge = 1000.0, meanEdge = 8.0)
    val base = CellScheme(Extent(0, 1012, 0, 1012), 8, 8)
    val scheme = AdaptiveCells.plan(a, b, base, budgetPairs = 10000, sampleFraction = 0.1)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def rep(ds: org.apache.spark.sql.Dataset[Geom]) =
      ds.flatMap(g => scheme.keysOf(g).map(k => (k, g)))
    val got = rep(a).toDF("k", "a").join(rep(b).toDF("k2", "b"), col("k") === col("k2"))
      .as[(Long, Geom, Long, Geom)]
      .flatMap { case (k, ga, _, gb) =>
        if (ga.intersects(gb) && scheme.owns(k, ga, gb)) Some((ga.id, gb.id)) else None }
      .collect().toSet
    val want = pairs(SpatialJoins.broadcastNL(a, b))
    assert(got == want)
  }
}
