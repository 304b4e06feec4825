package graft

import graft.ops.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** The size-routed Jaccard entry point must be a pure STRATEGY choice:
  * either branch, forced via the threshold, emits the identical pair set.
  */
class DedupRoutingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("jaccardPairsAuto: both routes emit the identical pair set") {
    val docs = graft.ingest.Workloads.syntheticDocs(spark, 2000, tokensPerDoc = 30)
    def pairs(thresholdBytes: Long) =
      Dedup.jaccardPairsAuto(docs, 3, 1, 2, prefixBytesThreshold = thresholdBytes)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaPlain = pairs(Long.MaxValue) // stats can never exceed -> plain
    val viaPrefix = pairs(0L)           // always exceeds -> PPJoin prefix
    assert(viaPlain == viaPrefix && viaPlain.nonEmpty)
  }
}
