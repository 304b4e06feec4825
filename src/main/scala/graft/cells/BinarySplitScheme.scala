package graft.cells

import graft.geom.{Extent, Geom}
import org.apache.spark.sql.Dataset

/** Binary-split partitioning (the reference's SpatialSpark BSP method,
  * `spark_scripts/PartitionedSpatialJoin.scala:166-175`): a kd-tree built by
  * recursively splitting the extent at the sampled MEDIAN of the longer
  * axis, `depth` levels → `2^depth` leaves with ~equal sampled load. The
  * third partitioner family next to the uniform grid (FGP) and sort-tile
  * (STP) — unlike STP the splits adapt PER SUBTREE, so elongated skew
  * (rivers, coastlines) gets axis-appropriate cuts at every level.
  *
  * Packed as three parallel arrays (implicit heap layout, node i's children
  * at 2i+1/2i+2): a broadcastable value, O(depth) point lookups. Ownership
  * is the engine-wide reference-point rule, so the pair set is identical to
  * every other scheme — and that is exactly what the driver oracle checks.
  */
final case class BinarySplitScheme(extent: Extent, depth: Int,
                                   splitAxisX: Array[Boolean], splitAt: Array[Double]) {
  require(splitAxisX.length == (1 << depth) - 1 && splitAt.length == splitAxisX.length)

  def numLeaves: Int = 1 << depth

  /** Unique owning leaf of a point (half-open: >= split goes right). */
  def cellOf(x: Double, y: Double): Long = {
    var node = 0
    var level = 0
    while (level < depth) {
      val right = if (splitAxisX(node)) x >= splitAt(node) else y >= splitAt(node)
      node = 2 * node + 1 + (if (right) 1 else 0)
      level += 1
    }
    (node - (numLeaves - 1)).toLong
  }

  /** All leaves overlapped by an MBR — stack descent pruning by the split. */
  def cellsOf(g: Geom): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    def walk(node: Int, level: Int): Unit =
      if (level == depth) out += (node - (numLeaves - 1)).toLong
      else {
        val s = splitAt(node)
        val (lo, hi) = if (splitAxisX(node)) (g.xmin, g.xmax) else (g.ymin, g.ymax)
        if (lo < s) walk(2 * node + 1, level + 1)
        if (hi >= s) walk(2 * node + 2, level + 1)
      }
    walk(0, 0)
    out.toSeq
  }
}

object BinarySplitScheme {
  /** Build from a bounded sample of both inputs' centers: at each node split
    * the current point set at the median of its wider spread axis.
    */
  def build(a: Dataset[Geom], b: Dataset[Geom], extent: Extent, depth: Int,
            maxSample: Int = 100000, seed: Long = 19L): BinarySplitScheme = {
    val pts = SchemeSampling.centers(a, b, maxSample, seed)
    val nNodes = (1 << depth) - 1
    val axisX = new Array[Boolean](nNodes)
    val at = new Array[Double](nNodes)
    def median(vs: Array[Double]): Double = {
      val s = vs.sorted; s(s.length / 2)
    }
    def fill(node: Int, level: Int, ps: Array[(Double, Double)],
             ext: Extent): Unit = if (level < depth) {
      val useX = ext.width >= ext.height
      axisX(node) = useX
      val s =
        if (ps.isEmpty) (if (useX) (ext.xmin + ext.xmax) else (ext.ymin + ext.ymax)) / 2
        else median(ps.map(p => if (useX) p._1 else p._2))
      at(node) = s
      val (l, r) = ps.partition(p => (if (useX) p._1 else p._2) < s)
      val (le, re) =
        if (useX) (Extent(ext.xmin, s, ext.ymin, ext.ymax), Extent(s, ext.xmax, ext.ymin, ext.ymax))
        else (Extent(ext.xmin, ext.xmax, ext.ymin, s), Extent(ext.xmin, ext.xmax, s, ext.ymax))
      fill(2 * node + 1, level + 1, l, le)
      fill(2 * node + 2, level + 1, r, re)
    }
    fill(0, 0, pts, extent)
    BinarySplitScheme(extent, depth, axisX, at)
  }
}
