package graft.ingest

import graft.geom.Geom
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic, distributed spatial-workload generators.
  *
  * `uniformPolygons` / `uniformPoints` mirror the reference generator
  * `spatial-join-baseline/data_gen/data_gen.py:43-123` exactly: MT19937 stream
  * seeded `seed` for x and `seed + 1` for y, `value * map_edge_len`, written
  * as `%.2f` text and re-parsed as float32 (the `%.2f` round-trip uses
  * HALF_EVEN like CPython, not Java's HALF_UP). This reproduces the published
  * golden counts (e.g. Uniform PP 100K×100K = 378, see BASELINE.md).
  *
  * Generation is distributed: MT19937 has no cheap jump-ahead, so each task
  * re-runs the stream and skips to its slice — O(n) integer draws per task,
  * ~10 ns each, which at 10 M rows × 32 tasks is ~3 s and zero driver memory.
  * At true cluster scale the same pattern holds (skips are embarrassingly
  * parallel and CPU-trivial compared to the join itself).
  */
object Workloads {

  /** `%.2f` text → float32 parse round-trip with CPython's HALF_EVEN. */
  def roundTrip2f(v: Double): Double = {
    val bd = new java.math.BigDecimal(v).setScale(2, java.math.RoundingMode.HALF_EVEN)
    java.lang.Float.parseFloat(bd.toPlainString).toDouble
  }

  /** One generated slice: ids [lo, hi), x-stream skipped to lo, y-stream too. */
  private def slice(seed: Long, lo: Long, hi: Long, mapEdge: Double,
                    objEdge: Double, point: Boolean): Iterator[Geom] = {
    val gx = new MT19937(seed)
    val gy = new MT19937(seed + 1)
    var i = 0L
    while (i < lo) { gx.nextDouble(); gy.nextDouble(); i += 1 }
    new Iterator[Geom] {
      private var id = lo
      def hasNext: Boolean = id < hi
      def next(): Geom = {
        val xl = gx.nextDouble() * mapEdge
        val yl = gy.nextDouble() * mapEdge
        val g =
          if (point) Geom.point(id, roundTrip2f(xl), roundTrip2f(yl))
          else Geom(id, roundTrip2f(xl), roundTrip2f(xl + objEdge),
                        roundTrip2f(yl), roundTrip2f(yl + objEdge))
        id += 1
        g
      }
    }
  }

  private def generate(spark: SparkSession, n: Long, seed: Long, mapEdge: Double,
                       objEdge: Double, point: Boolean, parts: Int): Dataset[Geom] = {
    import spark.implicits._
    // clamp in Long space first: n/1024 overflows Int for n > ~2.2e12 and
    // would silently collapse generation to one partition
    val p = math.min(parts.toLong, math.max(1L, n / 1024L)).toInt
    spark.range(0, p, 1, p).flatMap { t =>
      val lo = n * t / p
      val hi = n * (t + 1) / p
      slice(seed, lo, hi, mapEdge, objEdge, point)
    }
  }

  /** Uniform rectangles: `x_low = rand()*mapEdge`, `x_high = x_low + objEdge`
    * (reference seeds: file 0 → 123, file 1 → 456).
    */
  def uniformPolygons(spark: SparkSession, n: Long, seed: Long,
                      mapEdge: Double = 10000.0, objEdge: Double = 1.0,
                      parts: Int = 32): Dataset[Geom] =
    generate(spark, n, seed, mapEdge, objEdge, point = false, parts)

  /** Uniform points (degenerate rectangles; reference seed 789). */
  def uniformPoints(spark: SparkSession, n: Long, seed: Long,
                    mapEdge: Double = 10000.0, parts: Int = 32): Dataset[Geom] =
    generate(spark, n, seed, mapEdge, 0.0, point = true, parts)

  /** Deterministic synthetic web-text corpus for dedup benchmarks: `n` docs
    * of 0.5–1.5×`tokensPerDoc` tokens drawn from a `vocab`-word vocabulary
    * (SplittableRandom per doc id — distributed, jump-free, restart-stable);
    * every `dupEvery`-th doc is a near-duplicate of its predecessor (one
    * marker token appended → Jaccard ≈ |S|/(|S|+3) ≫ 1/2), giving
    * minhash/jaccard detectors planted positives at any scale.
    */
  def syntheticDocs(spark: SparkSession, n: Long, tokensPerDoc: Int = 120,
                    vocab: Int = 30000, dupEvery: Int = 50,
                    parts: Int = 64): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val p = math.min(parts.toLong, math.max(1L, n / 1024L)).toInt
    spark.range(0, p, 1, p).flatMap { t =>
      val lo = n * t / p; val hi = n * (t + 1) / p
      (lo until hi).iterator.map { id =>
        val srcId = if (dupEvery > 0 && id % dupEvery == dupEvery - 1) id - 1 else id
        // seed must be FULLY MIXED (murmur3 fmix64): SplittableRandom's state
        // advances by the golden-ratio gamma, so seeding with id*gamma makes
        // every doc a shifted window of ONE global stream — i.e. every doc a
        // near-dup of its neighbours (observed: 30M "duplicate" pairs/1M docs)
        var s = srcId + 7L
        s ^= s >>> 33; s *= 0xff51afd7ed558ccdL
        s ^= s >>> 33; s *= 0xc4ceb9fe1a85ec53L
        s ^= s >>> 33
        val r = new java.util.SplittableRandom(s)
        val nt = tokensPerDoc / 2 + r.nextInt(tokensPerDoc)
        val sb = new java.lang.StringBuilder(nt * 7)
        var i = 0
        while (i < nt) {
          if (i > 0) sb.append(' ')
          sb.append('w'); sb.append(r.nextInt(vocab)); i += 1
        }
        // alternate planted EXACT copies (for exact dedup) and near-dups
        // (one marker token appended — for jaccard/minhash/simhash)
        if (srcId != id && (id / dupEvery) % 2 == 0) sb.append(" dupmark")
        (id, sb.toString)
      }
    }.toDF("doc_id", "text")
  }

  /** Hot-corner workload — the adaptive-split join's motivating regime (the
    * reference's quadtree budget rule exists because per-cell |A|·|B|
    * explodes, `partition_multi.hpp:106-189`): `hotFrac` of the rows land
    * uniformly in a TINY `hotW`-sided box (far smaller than any sane global
    * grid cell, so one cell swallows them all), the rest uniformly over the
    * map. A plain grid serializes the hot cell into one task; salting splits
    * only one side's rows, so per-bucket work stays |A|·|B|/salt; adaptive
    * splitting shrinks BOTH sides per subcell — the only strategy whose
    * per-task work drops quadratically. Deterministic (fmix64-seeded
    * SplittableRandom per id) and distributed, like every generator here.
    */
  def hotspotPolygons(spark: SparkSession, n: Long, seed: Long,
                      mapEdge: Double = 10000.0, hotFrac: Double = 0.5,
                      hotX: Double = 1000.0, hotY: Double = 1000.0,
                      hotW: Double = 4.0, meanEdge: Double = 0.04,
                      parts: Int = 32): Dataset[Geom] = {
    import spark.implicits._
    val p = math.min(parts.toLong, math.max(1L, n / 1024L)).toInt
    val hotPermil = math.round(hotFrac * 1000.0)
    spark.range(0, p, 1, p).flatMap { t =>
      val lo = n * t / p
      val hi = n * (t + 1) / p
      (lo until hi).iterator.map { id =>
        var s = seed ^ (id * 0x9e3779b97f4a7c15L)
        s ^= s >>> 33; s *= 0xff51afd7ed558ccdL
        s ^= s >>> 33; s *= 0xc4ceb9fe1a85ec53L
        s ^= s >>> 33
        val r = new java.util.SplittableRandom(s)
        val hot = r.nextInt(1000) < hotPermil
        val (x0, y0, w) = if (hot) (hotX, hotY, hotW) else (0.0, 0.0, mapEdge)
        val xl = x0 + r.nextDouble() * w
        val yl = y0 + r.nextDouble() * w
        val e = meanEdge * (0.25 + 1.5 * r.nextDouble())
        Geom(id, xl, xl + e, yl, yl + e)
      }
    }
  }

  /** Skewed "OSM-like" workload: gaussian cluster mixture with variable edge
    * lengths (the reference's gaussian generator is
    * `spatial-join-on-FPGA-PBSM/scripts/nontree_data_gen/data_gen.py:56-66`,
    * mean 5000 / stddev 1000, clipped). No golden counts exist for this shape;
    * tests assert oracle-equality only. Seeded and distributed (a
    * SplittableRandom per row id — jump-free determinism).
    */
  def gaussianPolygons(spark: SparkSession, n: Long, seed: Long,
                       mapEdge: Double = 10000.0, meanEdge: Double = 1.0,
                       clusters: Int = 8, parts: Int = 32): Dataset[Geom] = {
    import spark.implicits._
    val p = math.min(parts.toLong, math.max(1L, n / 1024L)).toInt
    spark.range(0, p, 1, p).flatMap { t =>
      val lo = n * t / p
      val hi = n * (t + 1) / p
      (lo until hi).iterator.map { id =>
        // fmix64 the seed (see syntheticDocs): id*gamma seeding makes row
        // streams shifted windows of one global SplittableRandom sequence
        var s = seed ^ (id * 0x9e3779b97f4a7c15L)
        s ^= s >>> 33; s *= 0xff51afd7ed558ccdL
        s ^= s >>> 33; s *= 0xc4ceb9fe1a85ec53L
        s ^= s >>> 33
        val r = new java.util.SplittableRandom(s)
        val c = r.nextInt(clusters)
        val cr = new java.util.SplittableRandom(seed * 31 + c)
        val cx = cr.nextDouble() * mapEdge
        val cy = cr.nextDouble() * mapEdge
        val sd = mapEdge / 40.0
        def clip(v: Double) = math.max(0.0, math.min(mapEdge, v))
        val xl = clip(cx + r.nextGaussian() * sd)
        val yl = clip(cy + r.nextGaussian() * sd)
        val e  = meanEdge * (0.25 + 1.5 * r.nextDouble())
        Geom(id, roundTrip2f(xl), roundTrip2f(xl + e), roundTrip2f(yl), roundTrip2f(yl + e))
      }
    }
  }
}
