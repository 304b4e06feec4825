package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r2 verdict item 3: the 4×16-bit SimHash banding was a quadratic cliff at
  * web scale (candidates ~n²/2¹⁶ per band). The Manku choose-3-of-6 block
  * scheme keeps pigeonhole completeness for Hamming ≤ 3 with ~32-bit keys.
  * These specs lock (a) completeness vs brute force and (b) sub-n² candidate
  * growth on a 10⁶-fingerprint random corpus.
  */
class MankuSimhashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Manku banding is pigeonhole-complete for Hamming <= 3 (vs brute force)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val base = (0 until 3000).map(i => (i.toLong, rnd.nextLong()))
    // planted near-dups: <=3 random bit flips of every 10th fingerprint
    val planted = base.filter(_._1 % 10 == 0).map { case (id, f) =>
      var g = f
      (0 until 1 + rnd.nextInt(3)).foreach(_ => g ^= 1L << rnd.nextInt(64))
      (id + 100000L, g)
    }
    val all = base ++ planted
    val got = Dedup.simhashCandidates(all.toDF("id", "f"))
      .filter(bit_count(col("a_f").bitwiseXOR(col("b_f"))) <= 3)
      .select("a_id", "b_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (i, fi) <- all; (j, fj) <- all
      if i < j && java.lang.Long.bitCount(fi ^ fj) <= 3
    } yield (i, j)).toSet
    assert(got == want && want.nonEmpty, s"missed ${(want -- got).take(5)}")
  }

  test("minhash verify attaches shingle arrays via BROADCAST semi-join (corpus arrays never shuffle)") {
    import spark.implicits._
    // the pipeline entry points now return an eagerly-materialized
    // localCheckpoint (leak fix — the caller can't see the join plan any
    // more), so assert on the verify phase's OWN plan: the candidate-id
    // reduction must be a broadcast join so the full corpus's
    // O(tokens)-sized shingle arrays stay out of every Exchange
    val docs = graft.ingest.Workloads.syntheticDocs(spark, 2000)
    val shArr = Dedup.shingleFrame(docs, 3, "doc_id", "text", useHash60 = true)
      .filter(size(col("shs")) > 0)
    val cand = Dedup.minhashCandidates(docs, 3, 64, 16)
    val plan = Dedup.verifyJaccard(cand, shArr, 1, 2, broadcastIds = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(4000))
    // and the end-to-end pipeline still finds the planted duplicate pairs
    val pairs = Dedup.minhashDedupPairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.exists { case (a, b) => b - a == 1 && b % 50 == 49 })
  }

  test("candidate volume is sub-quadratic on a 10^6 random-fingerprint corpus") {
    // expected collisions ~ 20 * (n choose 2) / 2^32 ≈ 2.3e3 at n = 10^6;
    // the r2-era 4×16-bit banding would give ~4 * (n²/2) / 2^16 ≈ 3.1e7.
    val fps = spark.range(1000000L).select(col("id"), xxhash64(col("id")).as("f"))
    val cands = Dedup.simhashCandidates(fps).count()
    assert(cands < 1000000L, s"candidate count $cands is not sub-quadratic")
    assert(cands > 0L) // sanity: the join is actually producing collisions
  }
}
