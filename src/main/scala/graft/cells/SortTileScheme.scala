package graft.cells

import graft.geom.{Extent, Geom}
import org.apache.spark.sql.Dataset

/** Sort-tile partitioning (the reference's SpatialSpark STP method,
  * `spark_scripts/PartitionedSpatialJoin.scala:151-165`): tile boundaries
  * come from the DATA, not a uniform lattice — a sample is cut into `sx`
  * vertical slabs at x-quantiles, and each slab is cut independently at its
  * own y-quantiles, so every tile holds ~the same number of sampled objects
  * even under heavy spatial skew. The classic STR-flavored alternative to
  * uniform grids and to reactive hot-cell splitting ([[graft.skew.AdaptiveCells]]).
  *
  * The scheme is a small broadcastable value (sx + sx·sy doubles); cell
  * lookups are binary searches over the boundary arrays. Exactly-once output
  * uses the same reference-point ownership rule as every other scheme here —
  * a correct partitioner never changes the pair set, which is exactly how the
  * driver oracle checks it (plain intersect SQL, boundaries never replayed).
  *
  * Tile id layout: `slab * sy + tile` (row-major within slab).
  */
final case class SortTileScheme(extent: Extent, xBounds: Array[Double],
                                yBounds: Array[Array[Double]]) {
  require(yBounds.length == xBounds.length + 1, "one y-boundary vector per slab")
  require(yBounds.forall(_.length == yBounds(0).length),
    "ragged y-boundaries would collide tile ids across slabs (cell = slab*sy + tile)")
  val sx: Int = xBounds.length + 1
  val sy: Int = yBounds(0).length + 1

  /** Index of v in a sorted boundary array: #bounds ≤ v (half-open cells,
    * clamped by construction — index ∈ [0, bounds.length]).
    */
  @inline private def slot(bounds: Array[Double], v: Double): Int = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  @inline def slabOf(x: Double): Int = slot(xBounds, x)
  @inline def tileOf(slab: Int, y: Double): Int = slot(yBounds(slab), y)

  /** Unique owning tile of a point. */
  def cellOf(x: Double, y: Double): Long = {
    val s = slabOf(x)
    s.toLong * sy + tileOf(s, y)
  }

  /** All tiles overlapped by an MBR (per-slab y-ranges differ — the
    * replication loop is per slab, unlike the uniform grid's rectangle).
    */
  def cellsOf(g: Geom): Seq[Long] = {
    val s0 = slabOf(g.xmin); val s1 = slabOf(g.xmax)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var s = s0
    while (s <= s1) {
      val t0 = tileOf(s, g.ymin); val t1 = tileOf(s, g.ymax)
      var t = t0
      while (t <= t1) { out += s.toLong * sy + t; t += 1 }
      s += 1
    }
    out.toSeq
  }
}

/** Shared bounded-uniform center sampling for the data-driven schemes: the
  * fraction is sized from a count so the expected sample fits `maxSample` —
  * `sample(f).head(max)` would keep the FIRST partitions' rows and bias the
  * boundaries spatially on range-partitioned/clustered inputs (exactly the
  * skew these schemes exist to absorb).
  */
private[cells] object SchemeSampling {
  def centers(a: Dataset[Geom], b: Dataset[Geom], maxSample: Int,
              seed: Long): Array[(Double, Double)] = {
    import a.sparkSession.implicits._
    val u = a.unionByName(b)
    // Row count from Catalyst plan statistics — ZERO jobs (the r4 version ran
    // a full `u.count()` before sampling: a complete read of both inputs at
    // 100× scale just to size a boundary sample). A small estimate is
    // CONFIRMED by a bounded count (`limit(4·maxSample+1).count()` reads at
    // most that many rows however large the input — the intersectJoin
    // pattern); a large estimate only needs to be large, not exact: the
    // fraction is a sampling heuristic and the boundaries are a performance
    // choice, never a correctness input (reference-point ownership dedups
    // identically under any boundaries).
    val est = math.max(1.0, graft.join.SpatialJoins.estRowsFromStats(a) +
      graft.join.SpatialJoins.estRowsFromStats(b))
    val cap = 4L * maxSample + 1
    val n =
      if (est > 4.0 * maxSample) est
      else {
        val bounded = math.max(1L, u.limit(cap.toInt).count())
        // a SATURATED bounded count means the stats estimate lied small and
        // the true size is unknown — sizing the fraction from the cap would
        // oversample and re-introduce the first-partitions head() bias (the
        // exact failure mode this sampler exists to avoid). Only in that
        // contradiction case pay one exact count; the common paths (stats
        // large, or genuinely small input) never scan fully.
        if (bounded >= cap) math.max(1L, u.count()).toDouble else bounded.toDouble
      }
    val fraction = math.min(1.0, 1.2 * maxSample / n)
    // head() keeps 4× headroom over the expected sample so a stats
    // UNDER-estimate (compressed column-pruned scans) must be off by >3× of
    // the 1.2× margin before the first-partitions bias can appear; a bigger
    // sample than maxSample only sharpens the quantile cuts.
    u.sample(fraction, seed)
      .select((($"xmin" + $"xmax") / 2).as[Double], (($"ymin" + $"ymax") / 2).as[Double])
      .head(4 * maxSample)
  }
}

object SortTileScheme {
  /** Build boundaries from a bounded uniform sample of both inputs: sort the
    * sampled x centers, cut into sx equal-count slabs; within each slab sort
    * the y centers and cut into sy tiles (`SortTilePartition`'s shape). The
    * sample is collected — it is bounded (`maxSample`) and the scheme must be
    * a broadcastable value anyway.
    */
  def build(a: Dataset[Geom], b: Dataset[Geom], extent: Extent, sx: Int, sy: Int,
            maxSample: Int = 100000, seed: Long = 17L): SortTileScheme = {
    val pts = SchemeSampling.centers(a, b, maxSample, seed)
    if (pts.isEmpty)
      return SortTileScheme(extent, Array.tabulate(sx - 1)(i =>
          extent.xmin + (i + 1) * extent.width / sx),
        Array.fill(sx)(Array.tabulate(sy - 1)(j => extent.ymin + (j + 1) * extent.height / sy)))
    val xs = pts.map(_._1).sorted
    def cuts(sorted: Array[Double], n: Int): Array[Double] =
      Array.tabulate(n - 1) { i =>
        sorted(math.min(sorted.length - 1, ((i + 1).toLong * sorted.length / n).toInt))
      }
    val xb = cuts(xs, sx)
    // per-slab y cuts from the same sample
    val bySlab = Array.fill(sx)(scala.collection.mutable.ArrayBuffer.empty[Double])
    val probe = SortTileScheme(extent, xb, Array.fill(sx)(Array.empty[Double]))
    pts.foreach { case (x, y) => bySlab(probe.slabOf(x)) += y }
    val yb = bySlab.map { ys =>
      if (ys.isEmpty) Array.tabulate(sy - 1)(j => extent.ymin + (j + 1) * extent.height / sy)
      else cuts(ys.toArray.sorted, sy)
    }
    SortTileScheme(extent, xb, yb)
  }
}
