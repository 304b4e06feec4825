package graft

import graft.cells.CellScheme
import graft.geom.Extent
import graft.ingest.Workloads
import graft.join.SpatialJoins
import org.scalatest.funsuite.AnyFunSuite

/** Golden result counts from the reference's published run JSONs
  * (`spatial-join-baseline/cpp_scripts/CPU_perf_16_threads.json`, identical
  * across CPU sync traversal and FPGA at every PE count — see BASELINE.md).
  * These anchor our engine to the reference's exact MBR-intersect semantics
  * including the float32 `%.2f` round-trip.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // objects span [0, 10001] after the +1.0 edge; grid over the data extent
  private val ext = Extent(0.0, 10001.0, 0.0, 10001.0)

  test("golden: Uniform PP 100K x 100K = 378") {
    val a = Workloads.uniformPolygons(spark, 100000, 123)
    val b = Workloads.uniformPolygons(spark, 100000, 456)
    val s = CellScheme(ext, 128, 128)
    assert(SpatialJoins.gridJoin(a, b, s).count() == 378L)
  }

  test("golden: Uniform PIP 100K x 100K = 97 (generic AND point-specialized plan)") {
    val p = Workloads.uniformPoints(spark, 100000, 789)
    val b = Workloads.uniformPolygons(spark, 100000, 123)
    val s = CellScheme(ext, 128, 128)
    assert(SpatialJoins.gridJoin(p, b, s).count() == 97L)
    assert(SpatialJoins.gridJoinPIP(p, b, s).count() == 97L)
  }

  test("golden: asymmetric Uniform PIP 100K x 1M = 1,059") {
    val p = Workloads.uniformPoints(spark, 100000, 789)
    val b = Workloads.uniformPolygons(spark, 1000000, 123)
    val s = CellScheme(ext, 256, 256)
    assert(SpatialJoins.gridJoin(p, b, s).count() == 1059L)
  }

  test("golden grid, all ≤1M combos: PP 100K×1M / PIP+PP 1M×100K / PIP+PP 1M×1M") {
    // the published 9-combo golden table (BASELINE.md): every combo whose
    // sides fit unit-test runtime is asserted here; the 10M-side combos are
    // checked by the bench against the same table while its cached 10M
    // inputs exist (reported as golden-grid MATCH/WARN lines in BENCH)
    val s = CellScheme(ext, 256, 256)
    val p1m = Workloads.uniformPoints(spark, 1000000, 789)
    val a100k = Workloads.uniformPolygons(spark, 100000, 123)
    val b100k = Workloads.uniformPolygons(spark, 100000, 456)
    val a1m = Workloads.uniformPolygons(spark, 1000000, 123).cache()
    val b1m = Workloads.uniformPolygons(spark, 1000000, 456).cache()
    assert(SpatialJoins.gridJoin(a100k, b1m, s).count() == 4069L)   // PP 100K×1M
    assert(SpatialJoins.gridJoin(p1m, a100k, s).count() == 1007L)   // PIP 1M×100K
    assert(SpatialJoins.gridJoinPIP(p1m, a100k, s).count() == 1007L) // same, PIP plan
    assert(SpatialJoins.gridJoin(a1m, b100k, s).count() == 4071L)   // PP 1M×100K
    assert(SpatialJoins.gridJoin(p1m, a1m, s).count() == 10132L)    // PIP 1M×1M
    assert(SpatialJoins.gridJoin(a1m, b1m, s).count() == 40428L)    // PP 1M×1M
    a1m.unpersist(); b1m.unpersist()
  }

  test("golden: tile-join microbench counts (tile 64: 145 @ map 10, 550 @ map 5, 0 @ map 10000)") {
    // reference `cpp/tile_join_microbench.cpp:55,104` reads the FIRST
    // tile_size=64 objects of each generated 1000-object file (seeds
    // 123/456, obj edge 1.0 — `data_gen/README.md` "Tile-level Join
    // Microbenchmark Dataset" publishes the three counts)
    def tileCount(mapEdge: Double): Long = {
      val a = Workloads.uniformPolygons(spark, 1000, 123, mapEdge = mapEdge)
        .filter((g: graft.geom.Geom) => g.id < 64)
      val b = Workloads.uniformPolygons(spark, 1000, 456, mapEdge = mapEdge)
        .filter((g: graft.geom.Geom) => g.id < 64)
      SpatialJoins.broadcastNL(a, b).count()
    }
    assert(tileCount(10.0) == 145L)
    assert(tileCount(5.0) == 550L)
    assert(tileCount(10000.0) == 0L)
  }

  test("golden counts agree across physical plans (sweep, stripes)") {
    val a = Workloads.uniformPolygons(spark, 100000, 123)
    val b = Workloads.uniformPolygons(spark, 100000, 456)
    assert(SpatialJoins.gridJoinSweep(a, b, CellScheme(ext, 64, 64)).count() == 378L)
    assert(SpatialJoins.stripesJoin(a, b, ext, 512).count() == 378L)
  }
}
