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
    if (args.contains("pip")) {
      // point-specialized PIP plan vs the generic replicate+own plan
      val s16 = CellScheme.forSize(ext, n, targetPerCell = 16, maxN = 8192)
      t("warmup generic")(SpatialJoins.gridJoin(a, b, s16).count())
      t("warmup pip")(SpatialJoins.gridJoinPIP(a, b, s16).count())
      for (round <- 1 to 4) {
        t(s"generic r$round")(SpatialJoins.gridJoin(a, b, s16).count())
        t(s"pip r$round")(SpatialJoins.gridJoinPIP(a, b, s16).count())
      }
      spark.stop(); return
    }
    if (args.contains("adaptplan")) {
      // adaptive insurance-premium decomposition on the even-density
      // OSM-PP-class workload: planning pass alone vs sweep vs adaptive
      import graft.join.SpatialJoins
      val ext2 = Extent(0, 10003, 0, 10003)
      val ga = Workloads.gaussianPolygons(spark, n, 1, meanEdge = 8.0, parts = 64).cache()
      val gb = Workloads.gaussianPolygons(spark, n, 2, meanEdge = 8.0, parts = 64).cache()
      println(s"gen: ${ga.count()} x ${gb.count()}")
      val scheme = CellScheme.forSize(ext2, n, targetPerCell = 512, maxN = 1024)
      t("sweep warm")(SpatialJoins.gridJoinSweep(ga, gb, scheme).count())
      for (i <- 1 to 2) {
        t(s"plan only $i")({
          graft.skew.AdaptiveCells.plan(ga, gb, scheme, budgetPairs = 1L << 22,
            sampleFraction = 0.02).splits.size.toLong })
        t(s"sweep $i")(SpatialJoins.gridJoinSweep(ga, gb, scheme).count())
        t(s"adaptive $i")(SpatialJoins.gridJoinAdaptive(ga, gb, scheme,
          budgetPairs = 1L << 22, planSampleFraction = 0.02).count())
      }
      spark.stop(); return
    }
    if (args.contains("neardup")) {
      // prefilter payoff check: single- vs multi-probe at the bench corpus
      // shape (the r5 artifact's 12.4× multi-probe premium was almost all
      // wide-array attach over random band collisions)
      import org.apache.spark.sql.functions._
      val dim = 64
      def u(seed: org.apache.spark.sql.Column) =
        (pmod(xxhash64(seed), lit(2001L)) - lit(1000L)).cast("double") / 1000.0
      val base = spark.range(100000L).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), j => u(col("id") * dim + j)).as("embedding"))
      val emb = graft.ops.Similarity.withPlantedDups(base)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"vectors: ${emb.count()}")
      for (i <- 1 to 2) {
        t(s"neardup single $i")(graft.ops.Similarity.lshNearDupPairs(emb, 950, dim).count())
        t(s"neardup multi $i")(
          graft.ops.Similarity.lshNearDupPairs(emb, 950, dim, multiProbe = true).count())
      }
      spark.stop(); return
    }
    if (args.contains("jacprefix")) {
      // prefix-Jaccard fixed overhead at oracle sizes (r5 verdict item 4:
      // target ≤1.5× the plain shingle join on the sf0.1 documents table)
      a.unpersist(); b.unpersist()
      val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      println(s"docs: ${docs.count()}")
      for (i <- 1 to 3) {
        t(s"plain  $i")(graft.ops.Dedup.jaccardPairs(docs, 3, 1, 2).count())
        t(s"prefix $i")(graft.ops.Dedup.jaccardPairsPrefix(docs, 3, 1, 2).count())
      }
      spark.stop(); return
    }
    if (args.contains("bucketed")) {
      // S3 payoff check: build-once cell-bucketed layout vs per-run shuffle
      // join — the lakehouse answer to the reference's tree_A.bin persistence
      import org.apache.spark.sql.functions.{col, greatest}
      println(s"gen: ${a.count()} x ${b.count()}")
      val s16 = CellScheme.forSize(ext, n, targetPerCell = 16, maxN = 8192)
      t("oneoff gridJoin warm")(SpatialJoins.gridJoin(a, b, s16).count())
      t("oneoff gridJoin")(SpatialJoins.gridJoin(a, b, s16).count())
      val wh = "/dev/shm/graft-tune-bucketed"
      def persist(ds: org.apache.spark.sql.Dataset[graft.geom.Geom],
                  p: String, name: String): Unit =
        SpatialJoins.withCells(
            ds.toDF(s"${p}_id", s"${p}_xmin", s"${p}_xmax", s"${p}_ymin", s"${p}_ymax"),
            s16, p)
          .repartition(64, col("cell"))
          .write.mode("overwrite").bucketBy(64, "cell").sortBy("cell")
          .option("path", s"$wh/$name").saveAsTable(name)
      t("build bucketed a")({ persist(a, "a", "tune_bkt_a"); 0L })
      t("build bucketed b")({ persist(b, "b", "tune_bkt_b"); 0L })
      def bktJoin() = {
        val ac = spark.table("tune_bkt_a")
        val bc = spark.table("tune_bkt_b").withColumnRenamed("cell", "b_cell")
        ac.hint("merge").join(bc,
            col("cell") === col("b_cell") && SpatialJoins.intersectPred &&
              SpatialJoins.cellOfCol(s16, greatest(col("a_xmin"), col("b_xmin")),
                greatest(col("a_ymin"), col("b_ymin"))) === col("cell"))
          .count()
      }
      t("bucketed join warm")(bktJoin())
      t("bucketed join")(bktJoin())
      spark.stop(); return
    }
    if (args.contains("hotspot")) {
      // adaptive's winning regime: one cell at ~60,000x the pair budget
      a.unpersist(); b.unpersist()
      val hext = Extent(0, 10003, 0, 10003)
      val extraArgs = args.drop(args.indexOf("hotspot") + 1).flatMap(_.toDoubleOption)
      val hf = extraArgs.headOption.getOrElse(0.15)
      val me = extraArgs.drop(1).headOption.getOrElse(5.0)
      val hw = extraArgs.drop(2).headOption.getOrElse(100.0)
      val ha = Workloads.hotspotPolygons(spark, n, seed = 31, mapEdge = 10000.0,
        hotFrac = hf, hotX = 990, hotY = 990, hotW = hw, meanEdge = me, parts = 2 * cpus).cache()
      val hb = Workloads.hotspotPolygons(spark, n, seed = 32, mapEdge = 10000.0,
        hotFrac = hf, hotX = 990, hotY = 990, hotW = hw, meanEdge = me, parts = 2 * cpus).cache()
      println(s"gen: ${ha.count()} x ${hb.count()}")
      val base = CellScheme.forSize(hext, n, targetPerCell = 256, maxN = 2048)
      println(s"base grid ${base.nx}x${base.ny} cellW=${base.cellW}")
      t("adaptive warm")(SpatialJoins.gridJoinAdaptive(ha, hb, base, budgetPairs = 1L << 22).count())
      t("adaptive")(SpatialJoins.gridJoinAdaptive(ha, hb, base, budgetPairs = 1L << 22).count())
      t("grid sweep warm")(SpatialJoins.gridJoinSweep(ha, hb, base).count())
      t("grid sweep")(SpatialJoins.gridJoinSweep(ha, hb, base).count())
      t("salted x32 warm")(SpatialJoins.gridJoinSalted(ha, hb, base, salt = 32).count())
      t("salted x32")(SpatialJoins.gridJoinSalted(ha, hb, base, salt = 32).count())
      spark.stop(); return
    }
    if (args.contains("plan")) {
      // isolate the adaptive PLANNING premium on the even-density OSM-PP
      // workload (r5 verdict item 3: adaptive = sweep plan + planning pass,
      // and the pass alone costs ~1.8 s of a 3.4 s join)
      a.unpersist(); b.unpersist()
      val dext = Extent(0, 10003, 0, 10003)
      val ga = Workloads.gaussianPolygons(spark, n, 1, meanEdge = 8.0, parts = 2 * cpus).cache()
      val gb = Workloads.gaussianPolygons(spark, n, 2, meanEdge = 8.0, parts = 2 * cpus).cache()
      println(s"gen: ${ga.count()} x ${gb.count()}")
      val base = CellScheme.forSize(dext, n, targetPerCell = 512, maxN = 1024)
      println(s"base grid ${base.nx}x${base.ny} cells=${base.numCells}")
      t("sweep warm")(SpatialJoins.gridJoinSweep(ga, gb, base).count())
      t("sweep")(SpatialJoins.gridJoinSweep(ga, gb, base).count())
      for (i <- 1 to 3)
        t(s"plan only sf=0.02 #$i")(graft.skew.AdaptiveCells
          .plan(ga, gb, base, 1L << 22, sampleFraction = 0.02).splits.size.toLong)
      t("adaptive warm")(SpatialJoins.gridJoinAdaptive(ga, gb, base, 1L << 22,
        planSampleFraction = 0.02).count())
      t("adaptive")(SpatialJoins.gridJoinAdaptive(ga, gb, base, 1L << 22,
        planSampleFraction = 0.02).count())
      spark.stop(); return
    }
    if (args.contains("ivf")) {
      a.unpersist(); b.unpersist()
      import org.apache.spark.sql.functions._
      val dim = 64
      def u(seed: org.apache.spark.sql.Column) =
        (pmod(xxhash64(seed), lit(2001L)) - lit(1000L)).cast("double") / 1000.0
      val emb = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => u(pmod(col("id"), lit(1000L)) * dim + j) + u(col("id") * dim + j + lit(7919L)) * 0.05)
          .as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"emb: ${emb.count()}")
      val t0 = System.nanoTime()
      val cents = graft.ops.Similarity.ivfTrainCentroids(emb, 1024, 2)
      println(f"train: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val lists = graft.ops.Similarity.ivfLists(emb, cents)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("ivf index build")(lists.count())
      val q2k = emb.filter(col("vec_id") < 2000)
      t("ivf 2000q warm")(graft.ops.Similarity.ivfTopKWithLists(q2k, 10, cents, 16, lists).count())
      t("ivf 2000q")(graft.ops.Similarity.ivfTopKWithLists(q2k, 10, cents, 16, lists).count())
      spark.stop(); return
    }
    if (args.contains("prefix")) {
      a.unpersist(); b.unpersist()
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
      println(s"docs=${docs.count()}")
      t("plain join warm")(graft.ops.Dedup.jaccardPairs(docs, 3, 1, 2).count())
      t("plain join")(graft.ops.Dedup.jaccardPairs(docs, 3, 1, 2).count())
      t("prefix full warm")(graft.ops.Dedup.jaccardPairsPrefix(docs, 3, 1, 2).count())
      t("prefix full")(graft.ops.Dedup.jaccardPairsPrefix(docs, 3, 1, 2).count())
      // phase split: shingles alone / candidates alone / verify on top
      val shArr = graft.ops.Dedup.shingleFrame(docs, 3, "doc_id", "text")
        .filter(size(col("shs")) > 0).cache()
      t("shingle pass")(shArr.count())
      // the SHIPPED prefix plan (one aggregation, local array_sort + slice) —
      // call it, don't re-implement it, so this timing can't drift from the
      // plan the product runs
      val prefix = graft.ops.Dedup.prefixFrame(shArr, 1, 2)
      t("prefix phase")(prefix.count())
      val cand = prefix.toDF("a_id", "a_n", "a_pos", "sh")
        .join(prefix.toDF("b_id", "b_n", "b_pos", "sh_b"),
          col("sh") === col("sh_b") && col("a_id") < col("b_id") &&
            col("a_n") * 1 <= col("b_n") * 2 && col("b_n") * 1 <= col("a_n") * 2 &&
            least(col("a_n") - col("a_pos"), col("b_n") - col("b_pos")) * 3 >=
              col("a_n") + col("b_n"))
        .select(col("a_id"), col("b_id")).distinct().cache()
      t("cand phase (cached)")(cand.count())
      t("verify phase")(graft.ops.Dedup.verifyJaccard(cand, shArr, 1, 2, broadcastIds = true).count())
      spark.stop(); return
    }
    if (args.contains("stripes")) {
      println(s"gen: ${a.count()} x ${b.count()}")
      val scheme = CellScheme.stripesY(ext, 10000)
      t("stripes sweep warm")(SpatialJoins.gridJoinSweep(a, b, scheme).count())
      t("stripes sweep")(SpatialJoins.gridJoinSweep(a, b, scheme).count())
      t("stripes sweep x")(SpatialJoins.gridJoinSweep(a, b, CellScheme.stripesX(ext, 10000)).count())
      spark.stop(); return
    }
    if (args.contains("stripes1k")) {
      // the reference's TUNED stripe count for Uniform PIP (1,000 stripes,
      // published best-direction 1.773 s) — the one headline row outside the
      // 2× rule in r6. Interleaved with the 10k-stripe config; min-of-2.
      println(s"gen: ${a.count()} x ${b.count()}")
      val s1k = CellScheme.stripesY(ext, 1000)
      val s10k = CellScheme.stripesY(ext, 10000)
      t("stripes1k warm")(SpatialJoins.gridJoinSweep(a, b, s1k).count())
      t("stripes10k warm")(SpatialJoins.gridJoinSweep(a, b, s10k).count())
      for (i <- 1 to 2) {
        t(s"stripes1k $i")(SpatialJoins.gridJoinSweep(a, b, s1k).count())
        t(s"stripes10k $i")(SpatialJoins.gridJoinSweep(a, b, s10k).count())
      }
      spark.stop(); return
    }
    if (args.contains("knn")) {
      // A/B evidence for the r4 verdict item 7: the ring-expansion loop with
      // the replicated b-side cached + pre-partitioned per scheme (reuse) vs
      // rebuilt and re-shuffled every round (rebuild, the r4 behavior).
      // Shuffle bytes collapse under reuse because round ≥ 2 reads the cached
      // HashPartitioning(b_cell) frame exchange-free.
      a.unpersist(); b.unpersist()
      val q = Workloads.uniformPoints(spark, n / 10, 555, parts = 2 * cpus).cache()
      val corpus = Workloads.uniformPoints(spark, n, 789, parts = 2 * cpus)
      println(s"knn queries=${q.count()}")
      val shuffled = new java.util.concurrent.atomic.AtomicLong(0L)
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shuffled.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten); ()
        }
      })
      for (reuse <- Seq(true, false, true, false)) {
        shuffled.set(0L)
        val t0 = System.nanoTime()
        val (df, rounds) = SpatialJoins.knnJoinWithRounds(q, corpus, ext, 3,
          reuseBRep = reuse)
        val rows = df.count()
        val sec = (System.nanoTime() - t0) / 1e9 // BEFORE the drain sleep
        Thread.sleep(1500) // drain the listener bus (outside the timer)
        println(f"knn reuseBRep=$reuse%-5s $sec%7.2f s " +
          f"rows=$rows rounds=$rounds shuffleMB=${shuffled.get / 1e6}%.1f")
      }
      spark.stop(); return
    }
    if (args.contains("dedup")) {
      a.unpersist(); b.unpersist()
      val docs = Workloads.syntheticDocs(spark, n, parts = 2 * cpus).cache()
      println(s"docs=${docs.count()} bytes=${docs.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(org.apache.spark.sql.functions.col("text")))).head().getLong(0)}")
      t("exact dedup")(graft.ops.Dedup.exactDedup(docs).count())
      t("exact dedup warm")(graft.ops.Dedup.exactDedup(docs).count())
      import org.apache.spark.sql.functions.{col, size, sum}
      val sh = graft.ops.Dedup.shingleFrame(docs, 3, "doc_id", "text", useHash60 = true)
        .filter(size(col("shs")) > 0)
      t("shingle pass")(sh.agg(sum(size(col("shs")))).head().getLong(0))
      val perms = graft.ops.Dedup.minhashPerms(64)
      val sig = sh.select(col("id"), graft.functions.MinHashSig(col("shs"),
        perms.map(_._1), perms.map(_._2), graft.ops.Dedup.MinHashP).as("sig"))
      t("shingle+sig pass")(sig.agg(sum(size(col("sig")))).head().getLong(0))
      t("candidates")(graft.ops.Dedup.minhashCandidates(docs, 3, 64, 16).count())
      t("minhash pairs")(graft.ops.Dedup.minhashDedupPairs(docs).count())
      t("minhash pairs warm")(graft.ops.Dedup.minhashDedupPairs(docs).count())
      spark.stop(); return
    }
    if (args.contains("dense")) {
      // calibrate the output-heavy (OSM-PP-class) gaussian workload: find the
      // meanEdge whose pair count extrapolates to >=100M at 10M x 10M
      a.unpersist(); b.unpersist()
      val dext = Extent(0, 10003, 0, 10003)
      val edges = args.drop(args.indexOf("dense") + 1).flatMap(_.toDoubleOption)
      for (me <- if (edges.nonEmpty) edges.toSeq else Seq(4.0, 6.0, 8.0)) {
        val ga = Workloads.gaussianPolygons(spark, n, 1, meanEdge = me, parts = 2 * cpus).cache()
        val gb = Workloads.gaussianPolygons(spark, n, 2, meanEdge = me, parts = 2 * cpus).cache()
        ga.count(); gb.count()
        val base = CellScheme.forSize(dext, n, targetPerCell = 256, maxN = 2048)
        t(s"dense meanEdge=$me adaptive warm")(
          SpatialJoins.gridJoinAdaptive(ga, gb, base, budgetPairs = 1L << 22).count())
        t(s"dense meanEdge=$me adaptive")(
          SpatialJoins.gridJoinAdaptive(ga, gb, base, budgetPairs = 1L << 22).count())
        t(s"dense meanEdge=$me adaptive b24")(
          SpatialJoins.gridJoinAdaptive(ga, gb, base, budgetPairs = 1L << 24).count())
        val base512 = CellScheme.forSize(dext, n, targetPerCell = 512, maxN = 1024)
        t(s"dense meanEdge=$me adaptive tpc512 b24")(
          SpatialJoins.gridJoinAdaptive(ga, gb, base512, budgetPairs = 1L << 24).count())
        t(s"dense meanEdge=$me bsp")(
          SpatialJoins.binarySplitJoin(ga, gb, dext, 9).count())
        t(s"dense meanEdge=$me bsp warm")(
          SpatialJoins.binarySplitJoin(ga, gb, dext, 9).count())
        t(s"dense meanEdge=$me sweep tpc512")(
          SpatialJoins.gridJoinSweep(ga, gb, base512).count())
        ga.unpersist(); gb.unpersist()
      }
      spark.stop(); return
    }
    val s16 = CellScheme.forSize(ext, n, targetPerCell = 16, maxN = 8192)
    t("warmup")(SpatialJoins.gridJoin(a, b, s16).count())
    t("warmup hash")(SpatialJoins.gridJoinHinted(a, b, s16, "shuffle_hash").count())
    // interleaved so a neighbour-load spike cannot sink one variant's sample
    for (round <- 1 to 4) {
      t(s"smj tpc=16 r$round cores=$cpus")(SpatialJoins.gridJoin(a, b, s16).count())
      t(s"shuffle_hash tpc=16 r$round")(
        SpatialJoins.gridJoinHinted(a, b, s16, "shuffle_hash").count())
    }
    for (tpc <- Seq(64, 256, 1024)) {
      val sc = CellScheme.forSize(ext, n, targetPerCell = tpc, maxN = 8192)
      t(s"rsort sweep tpc=$tpc warm")(SpatialJoins.gridJoinSweep(a, b, sc).count())
      t(s"rsort sweep tpc=$tpc")(SpatialJoins.gridJoinSweep(a, b, sc).count())
    }
    spark.stop()
  }
}
