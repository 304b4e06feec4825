package graft.ops

import graft.cells.CellScheme
import graft.geom.Geom
import graft.join.SpatialJoins
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Raster ↔ vector operators over the engine's cell grid (the raster's pixel
  * lattice IS the cell scheme, so raster/vector conversions compose with the
  * spatial joins without re-partitioning).
  *
  *  - [[rasterize]]: vector MBRs → per-cell coverage raster (cell, cx, cy,
  *    value) — one shuffle on the cell id.
  *  - [[vectorize]]: raster cells above a threshold → vector rectangles (the
  *    cell boxes), ready to re-enter any spatial join.
  *  - [[zonalStats]]: the raster↔vector join — aggregate raster values per
  *    vector zone by joining pixel centers into zone rectangles (the standard
  *    zonal-statistics operation, here a plain cell-equi-join since pixels
  *    are their own cells).
  */
object Raster {

  /** Burn vector MBRs into the grid: value = number of covering geometries
    * per cell (coverage-count raster).
    */
  def rasterize(ds: Dataset[Geom], s: CellScheme): DataFrame =
    SpatialJoins.withCells(
        ds.toDF("a_id", "a_xmin", "a_xmax", "a_ymin", "a_ymax"), s, "a")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("value"))
      .select(col("cell"), (col("cell") % s.nx).as("cx"),
        expr(s"cell DIV ${s.nx}").as("cy"), col("value"))

  /** Cells with `value >= threshold` back to vector space as their cell
    * rectangles (id = cell id).
    */
  def vectorize(raster: DataFrame, s: CellScheme, threshold: Long): Dataset[Geom] = {
    import raster.sparkSession.implicits._
    raster.filter(col("value") >= threshold)
      .select(col("cell").as("id"),
        (lit(s.extent.xmin) + col("cx") * s.cellW).as("xmin"),
        (lit(s.extent.xmin) + (col("cx") + 1) * s.cellW).as("xmax"),
        (lit(s.extent.ymin) + col("cy") * s.cellH).as("ymin"),
        (lit(s.extent.ymin) + (col("cy") + 1) * s.cellH).as("ymax"))
      .as[Geom]
  }

  /** Focal (neighborhood) aggregation: for every occupied cell, the sum of
    * raster values over its 3×3 neighborhood (edge cells see their clipped
    * neighborhood — standard focal-sum semantics on a finite grid). Shape:
    * each cell CONTRIBUTES itself to 9 neighbor keys (one explode), then one
    * equi-join-free groupBy on the neighbor key — shuffle ∝ 9·occupied
    * cells, never the full lattice. Output keeps only occupied target cells
    * (the sparse-raster convention used throughout).
    */
  def focalSum(raster: DataFrame, s: CellScheme): DataFrame = {
    val offs = array((for (dy <- -1 to 1; dx <- -1 to 1)
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val contrib = raster.select(col("cx"), col("cy"), col("value"), explode(offs).as("o"))
      .select((col("cx") + col("o.dx")).as("tx"), (col("cy") + col("o.dy")).as("ty"),
        col("value"))
      .filter(col("tx") >= 0 && col("tx") < s.nx && col("ty") >= 0 && col("ty") < s.ny)
      .groupBy(col("tx"), col("ty"))
      .agg(sum(col("value")).as("focal_sum"))
    raster.select(col("cell"), col("cx"), col("cy"))
      .join(contrib, col("cx") === col("tx") && col("cy") === col("ty"))
      .select(col("cell"), col("cx"), col("cy"),
        col("focal_sum").cast("long").as("focal_sum"))
  }

  /** Zonal statistics: per vector zone, the sum/count of raster values whose
    * pixel center falls inside the zone (inclusive bounds). Pixel centers are
    * deterministic (`cell center = lo + (c + 0.5)·len`), so the DuckDB oracle
    * replays the same arithmetic.
    */
  def zonalStats(raster: DataFrame, zones: Dataset[Geom], s: CellScheme): DataFrame = {
    val px = lit(s.extent.xmin) + (col("cx") + lit(0.5)) * s.cellW
    val py = lit(s.extent.ymin) + (col("cy") + lit(0.5)) * s.cellH
    val pixels = raster.select(col("cell"), col("value"), px.as("px"), py.as("py"))
    // a zone containing a pixel's center overlaps the pixel's cell, so the
    // pixel's own cell id equi-joins against the zone replication set — no
    // θ-join, no dedup needed (a zone appears once per cell)
    val zc = SpatialJoins.withCells(
        zones.toDF("zone_id", "b_xmin", "b_xmax", "b_ymin", "b_ymax"), s, "b")
      .withColumnRenamed("cell", "b_cell")
    pixels.join(zc,
        col("cell") === col("b_cell") &&
        col("px") >= col("b_xmin") && col("px") <= col("b_xmax") &&
        col("py") >= col("b_ymin") && col("py") <= col("b_ymax"))
      .groupBy(col("zone_id"))
      .agg(count(lit(1)).as("n_pixels"), sum(col("value")).as("total"))
  }
}
