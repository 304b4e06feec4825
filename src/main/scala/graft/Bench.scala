package graft

import graft.cells.CellScheme
import graft.geom.Extent
import graft.ingest.Workloads
import graft.join.SpatialJoins
import org.apache.spark.sql.SparkSession

/** Benchmark main. Emits ONE JSON line:
  * `{"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *   "throughput":{...},"scaling":{...}}`
  *
  * Headline metric (BASELINE.md north): spatial-join throughput in joined
  * input rows/s and result rows/s on the reference's Uniform PIP/PP workload
  * shapes, plus the two-cluster-size scaling protocol — the identical job at
  * `local[N]` and `local[4N]` (sandbox stand-in for N vs 4N executors),
  * reporting efficiency = (t_N / t_4N) / 4. Also writes BENCH/BASELINE.md.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    // RAM-backed shuffle dirs: a single sandbox disk is shared across all
    // "executors"; on a real cluster each node has its own NVMe, so the
    // per-node-scratch assumption is emulated with /dev/shm (documented in
    // BENCH/BASELINE.md). Falls back to the default /tmp when unavailable.
    val shm = java.nio.file.Paths.get("/dev/shm")
    val localDir =
      if (java.nio.file.Files.isWritable(shm)) "/dev/shm/graft-bench"
      else System.getProperty("java.io.tmpdir")
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", math.max(cores, 8).toString)
      // AQE on for runtime skew-join splitting, but partition coalescing off:
      // at bench row widths it coalesces 32 partitions into ~3 and serializes
      // the join (measured 1.5-2x slower at 2M-10M rows).
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[T](f: => T): (Double, T) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  /** One headline measurement set: Uniform PIP and Uniform PP at n×n
    * (reference headline shapes), runs INTERLEAVED (pip, pp, pip, pp, …) so a
    * transient neighbour-load spike on this shared sandbox cannot sink one
    * workload's whole sample; min is the statistic that reflects the engine
    * (identical runs vary 2-5×; the reference used means of 3 on a dedicated
    * box). Returns (genSec, pipSamples, pipResults, ppSamples, ppResults).
    */
  private def headline(spark: SparkSession, n: Long, runs: Int)
      : (Double, Seq[Double], Long, Seq[Double], Long) = {
    val ext = Extent(0, 10001, 0, 10001)
    val s = CellScheme.forSize(ext, n, targetPerCell = 16, maxN = 8192)
    val pts = Workloads.uniformPoints(spark, n, 789, parts = 64).cache()
    val p0 = Workloads.uniformPolygons(spark, n, 123, parts = 64).cache()
    val p1 = Workloads.uniformPolygons(spark, n, 456, parts = 64).cache()
    val (tGen, _) = time { pts.count(); p0.count(); p1.count() }
    def pip() = time { SpatialJoins.gridJoin(pts, p0, s).count() }
    def pp()  = time { SpatialJoins.gridJoin(p0, p1, s).count() }
    pip(); pp() // warm-up: codegen + JIT + page cache
    val measured = (1 to runs).map(_ => (pip(), pp()))
    pts.unpersist(); p0.unpersist(); p1.unpersist()
    (tGen, measured.map(_._1._1), measured.head._1._2,
           measured.map(_._2._1), measured.head._2._2)
  }

  /** Dense-cell evidence (reference J2): the declarative grid join's
    * per-cell loop is quadratic in cell population, the cogroup path's
    * STR-indexed loop is not — measured at targetPerCell=2048 where the two
    * plans diverge (they agree at the flagship's tpc=16).
    */
  private def denseCell(spark: SparkSession, n: Long): (Double, Double, Long, Boolean) = {
    val ext = Extent(0, 10001, 0, 10001)
    val s = CellScheme.forSize(ext, n, targetPerCell = 2048, maxN = 8192)
    val a = Workloads.uniformPoints(spark, n, 789, parts = 64).cache()
    val b = Workloads.uniformPolygons(spark, n, 123, parts = 64).cache()
    a.count(); b.count()
    def g() = time { SpatialJoins.gridJoin(a, b, s).count() }
    def w() = time { SpatialJoins.gridJoinSweep(a, b, s).count() }
    g(); w() // warm-up
    val (gs, gr) = g(); val (ws, wr) = w()
    // a divergence is REPORTED (dense_counts_match), never thrown — this
    // bench runs once per round and an abort would zero the whole artifact
    a.unpersist(); b.unpersist()
    (gs, ws, gr, gr == wr)
  }

  /** Skewed gaussian workload through all four partitioner families —
    * adaptive-split grid (the headline skew number), plain grid, sort-tile
    * (STP), binary-split (BSP). Same protocol as the headline: one warm pass
    * of EVERY variant first (no family absorbs codegen/JIT for the others),
    * then interleaved min-of-2. A count divergence is REPORTED (countsMatch
    * flag), never thrown — this bench runs once per round and an abort would
    * zero the whole artifact.
    */
  private def headlineSkew(spark: SparkSession, n: Long)
      : (Double, Long, Double, Double, Double, Boolean) = {
    val ext = Extent(0, 10003, 0, 10003)
    val a = Workloads.gaussianPolygons(spark, n, seed = 1, meanEdge = 2.0, parts = 64).cache()
    val b = Workloads.gaussianPolygons(spark, n, seed = 2, meanEdge = 2.0, parts = 64).cache()
    a.count(); b.count()
    val base = CellScheme.forSize(ext, n, targetPerCell = 256, maxN = 2048)
    val stpScheme = graft.cells.SortTileScheme.build(a, b, ext, 24, 24)
    val bspScheme = graft.cells.BinarySplitScheme.build(a, b, ext, 9)
    def adaptive() = time { SpatialJoins.gridJoinAdaptive(a, b, base, budgetPairs = 1L << 22).count() }
    def grid() = time { SpatialJoins.gridJoin(a, b, base).count() }
    def stp() = time { SpatialJoins.sortTileJoin(a, b, stpScheme).count() }
    def bsp() = time { SpatialJoins.binarySplitJoin(a, b, bspScheme).count() }
    val variants = Seq(adaptive _, grid _, stp _, bsp _)
    variants.foreach(_.apply()) // warm every family before timing any
    val rounds = Seq.fill(2)(variants.map(_.apply()))
    def best(i: Int) = rounds.map(_(i)._1).min
    val counts = rounds.head.map(_._2)
    val countsMatch = counts.forall(_ == counts.head)
    a.unpersist(); b.unpersist()
    (best(0), counts.head, best(1), best(2), best(3), countsMatch)
  }

  private def jArr(xs: Seq[Double]): String = xs.mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString).toInt
    val benchN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "10000000").toLong

    // ---- phase 1: per-query timings at full parallelism -------------------
    var spark = session(cpus)
    spark.range(1000).count() // session warm-up outside any timer
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec, ok) = time {
        try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      }
      name -> (if (ok) sec else -1.0)
    }

    // ---- phase 2: headline throughput at full cores ------------------------
    // interleaved min-of-5: the driver runs this bench exactly once, so the
    // statistic itself must absorb the sandbox's 2-5× neighbour-load noise
    val (tGenBig, pipBig, resBig, ppBig, resPP) = headline(spark, benchN, runs = 5)
    val (tSkew, resSkew, tSkewGrid, tSkewStp, tSkewBsp, skewCountsMatch) =
      headlineSkew(spark, math.max(benchN / 5, 100000L))
    val (tDenseDecl, tDenseStr, resDense, denseCountsMatch) =
      denseCell(spark, math.max(benchN / 5, 100000L))
    spark.stop()
    val tJoinBig = pipBig.min
    val tPP = ppBig.min

    // ---- phase 3: two-cluster-size protocol, N=2 vs 4N=8 cores -------------
    // (per-core memory bandwidth stays constant in this band on the sandbox
    // VM; 8→32 saturates the VM's memory bus, which a real cluster — where
    // bandwidth scales with nodes — does not. Both pairs are reported.)
    val nSmall = 2; val nMid = math.min(4 * nSmall, cpus)
    spark = session(nMid)
    spark.range(1000).count()
    val (_, pipMid, resMid, _, _) = headline(spark, benchN, runs = 4)
    spark.stop()
    spark = session(nSmall)
    spark.range(1000).count()
    val (_, pipSmall, resSmall, _, _) = headline(spark, benchN, runs = 3)
    spark.stop()
    val tJoinMid = pipMid.min
    val tJoinSmall = pipSmall.min

    require(resBig == resSmall && resBig == resMid,
      s"scaling runs disagree: $resBig / $resMid / $resSmall")
    val eff = (tJoinSmall / tJoinMid) / (nMid.toDouble / nSmall)
    val effWide = (tJoinMid / tJoinBig) / (cpus.toDouble / nMid)
    val rowsPerSec = 2.0 * benchN / tJoinBig

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + tJoinBig + tGenBig + tJoinSmall + tJoinMid
    val throughput =
      s"""{"workload":"uniform_pip_${benchN}x$benchN","join_sec":$tJoinBig,""" +
      s""""join_samples":${jArr(pipBig)},"gen_sec":$tGenBig,"results":$resBig,""" +
      s""""input_rows_per_sec":$rowsPerSec,""" +
      s""""pp_join_sec":$tPP,"pp_samples":${jArr(ppBig)},"pp_results":$resPP,""" +
      s""""pp_result_rows_per_sec":${resPP / tPP},""" +
      s""""skew_join_sec":$tSkew,"skew_results":$resSkew,""" +
      s""""skew_grid_sec":$tSkewGrid,"skew_stp_sec":$tSkewStp,"skew_bsp_sec":$tSkewBsp,""" +
      s""""skew_counts_match":$skewCountsMatch,""" +
      s""""dense_decl_sec":$tDenseDecl,"dense_str_sec":$tDenseStr,"dense_results":$resDense,""" +
      s""""dense_counts_match":$denseCountsMatch}"""
    val scaling =
      s"""{"cores_n":$nSmall,"cores_4n":$nMid,"join_sec_n":$tJoinSmall,""" +
      s""""join_sec_4n":$tJoinMid,"samples_n":${jArr(pipSmall)},"samples_4n":${jArr(pipMid)},""" +
      s""""speedup":${tJoinSmall / tJoinMid},"efficiency":$eff,""" +
      s""""cores_full":$cpus,"join_sec_full":$tJoinBig,"efficiency_4n_to_full":$effWide}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","throughput":$throughput,"scaling":$scaling}""")

    // ---- BENCH/BASELINE.md -------------------------------------------------
    // golden Uniform PIP counts published in the reference (BASELINE.md)
    val goldenPip = Map(100000L -> 97L, 1000000L -> 10132L, 10000000L -> 1021602L)
    val goldenNote = goldenPip.get(benchN) match {
      case Some(g) if g == resBig =>
        s"Result count $resBig MATCHES the reference's golden count."
      case Some(g) =>
        s"WARNING: result count $resBig != reference golden $g."
      case None =>
        s"(no published golden count at n=$benchN; result count $resBig.)"
    }
    val md =
      s"""# BENCH — measured on this machine (local mode)
         |
         |Headline: Uniform PIP ${benchN}×$benchN (reference workload shape,
         |seeds 789/123), grid PBSM join, join phase only (inputs cached),
         |best of 5 runs interleaved with the PP workload after a warm-up run
         |(identical runs vary 2-5× with neighbour load on this shared
         |sandbox; min reflects the engine — all samples are in the JSON).
         |PIP samples: ${pipBig.map(t => f"$t%.2f").mkString(", ")} s.
         |$goldenNote
         |
         || quantity | value |
         ||---|---|
         || join time @ local[$cpus] | ${f"$tJoinBig%.3f"} s |
         || join time @ local[$nMid] | ${f"$tJoinMid%.3f"} s |
         || join time @ local[$nSmall] | ${f"$tJoinSmall%.3f"} s |
         || results | $resBig |
         || joined input rows/s @ local[$cpus] | ${f"${rowsPerSec / 1e6}%.2f"} M |
         || Uniform PP ${benchN}×$benchN join / results | ${f"$tPP%.3f"} s / $resPP (${f"${resPP / tPP / 1e6}%.2f"} M results/s) |
         || Gaussian (OSM-like) PP ${math.max(benchN / 5, 100000L)}×same, adaptive join | ${f"$tSkew%.3f"} s / $resSkew results |
         || same skew via plain grid / sort-tile (STP) / binary-split (BSP) | ${f"$tSkewGrid%.2f"} / ${f"$tSkewStp%.2f"} / ${f"$tSkewBsp%.2f"} s (counts match: $skewCountsMatch; warmed, interleaved min-of-2; STP/BSP scheme build excluded, adaptive's planning pass included) |
         || Dense cells (tpc=2048): declarative vs cogroup+STR | ${f"$tDenseDecl%.2f"} s vs ${f"$tDenseStr%.2f"} s (same $resDense results) |
         || N→4N scaling (local[$nSmall]→local[$nMid]) | ${f"${tJoinSmall / tJoinMid}%.2f"}× (ideal 4×), efficiency ${f"$eff%.2f"} |
         || 4N→full (local[$nMid]→local[$cpus]) | efficiency ${f"$effWide%.2f"} |
         |
         |Reference anchor (BASELINE.md): CPU 16-thread Uniform PIP 10M×10M ≈
         |13.2 M joined-input rows/s join-only (plus ≈9 s of STR index builds
         |not charged); its own 1→16-thread scaling efficiency is 0.65.
         |
         |Protocol notes (per the sandbox two-cluster-size rule): the identical
         |job runs at local[$nSmall] and local[$nMid] on the same input —
         |the N vs 4N executor stand-in. Shuffle scratch is RAM-backed
         |(/dev/shm) because this VM has one shared disk, whereas cluster
         |nodes bring their own scratch; CPU is the scaled resource. The
         |$nMid→$cpus-core pair is additionally reported: it saturates the
         |VM's single memory bus (a one-box artifact — on a real cluster
         |memory bandwidth scales with node count).
         |""".stripMargin
    try {
      val dir = java.nio.file.Paths.get("BENCH")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("BASELINE.md"), md)
    } catch { case _: Throwable => () }
  }
}
