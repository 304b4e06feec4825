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

  test("prefix pipeline plans no Window operator (rank is fused into the aggregation)") {
    // the r5 form ranked prefixes with row_number().over(Window.partitionBy(id))
    // — an exchange + full partition sort that dominated the standalone entry
    // point at oracle sizes. The fused form must keep the whole prefix
    // computation window-free at ANY size (it is the scale route's plan too).
    // NOTE: assert on prefixFrame's OWN plan — jaccardPairsPrefix returns a
    // localCheckpoint()ed frame whose lineage is truncated to a LogicalRDD,
    // so a check there would pass vacuously no matter how the prefix ranks
    import org.apache.spark.sql.functions.{col, size}
    val docs = graft.ingest.Workloads.syntheticDocs(spark, 500, tokensPerDoc = 20)
    val shArr = Dedup.shingleFrame(docs, 3, "doc_id", "text")
      .filter(size(col("shs")) > 0)
    val plan = Dedup.prefixFrame(shArr, 1, 2).queryExecution.optimizedPlan
    val hasWindow = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.nonEmpty
    assert(!hasWindow, "prefix pipeline regressed to a window rank")
    // and the fused form agrees with a literal window-rank reference on the
    // same shingle frame (content check, not just plan shape)
    import org.apache.spark.sql.functions._
    val sh = shArr.select(col("id"), explode(col("shs")).as("sh"))
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("df"), col("sh"))
    val ref = sh.join(freq, "sh")
      .withColumn("pos", row_number().over(w))
      .join(shArr.select(col("id"), size(col("shs")).cast("long").as("n")), "id")
      .filter(col("pos") <= col("n") - floor((col("n") * 1 + 2 - 1) / 2).cast("long") + 1)
      .select(col("id"), col("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.prefixFrame(shArr, 1, 2)
      .select(col("id"), col("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == ref && got.nonEmpty)
  }

  test("verify phase broadcasts the candidate-id set (arrays never shuffle corpus-wide)") {
    import org.apache.spark.sql.functions._
    val docs = graft.ingest.Workloads.syntheticDocs(spark, 3000, tokensPerDoc = 30)
    val shArr = Dedup.shingleFrame(docs, 3, "doc_id", "text", useHash60 = true)
      .filter(size(col("shs")) > 0)
    // a handful of candidate pairs against a 3000-doc corpus — the regime
    // the broadcast semi-join-reduce exists for
    val cand = docs.select(col("doc_id").as("a_id"), (col("doc_id") + 1).as("b_id"))
      .filter(col("a_id") % 50 === 49 - 1)
    val reduced = Dedup.verifyJaccard(cand, shArr, 1, 2, broadcastIds = true)
    val phys = reduced.queryExecution.executedPlan.toString
    // the id semi-join that prunes the array frame must be a broadcast join
    assert(phys.contains("BroadcastHashJoin") || phys.contains("BroadcastExchange"), phys)
    // and the reduced plan must emit the identical verified pair set as the
    // full-corpus attach
    val full = Dedup.verifyJaccard(cand, shArr, 1, 2, broadcastIds = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = reduced.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == full && got.nonEmpty)
  }

  test("duplicateSpanPairs == brute force (incl. <l-token docs); maxDf drops only boilerplate-only pairs") {
    import spark.implicits._
    val l = 4
    val boiler = "all rights reserved worldwide"     // exactly l tokens, in many docs
    val quote = "the quick brown fox jumps the lazy dog"
    val docsSeq = Seq(
      (0L, s"alpha beta $quote gamma delta"),
      (1L, s"unrelated prefix $quote and a suffix here"),        // shares quote spans with 0
      (2L, s"$boiler opening words only"),
      (3L, s"closing words too $boiler"),                         // shares ONLY boilerplate with 2
      (4L, s"start $boiler middle $quote end words"),             // shares boiler AND quote spans
      (5L, "too short"),                                          // < l tokens
      (6L, "completely distinct content with no shared span at all"),
      // a vertical tab INSIDE a token: RE2's \s (the tokenizer of the native
      // candidate pass, the verify, and the DuckDB oracle) does NOT split on
      // \x0B — Java's \s would, yielding different span counts
      (7L, "A B fusedtoken C D E F tail1"),
      (8L, "head A B fusedtoken C D E F"))
    val docs = docsSeq.toDF("doc_id", "text")
    def grams(s: String): Set[String] = {
      val t = s.trim.split("[ \t\n\f\r]+") // RE2 \s, NOT Java \s
      if (t.length < l) Set.empty else t.sliding(l).map(_.mkString(" ")).toSet
    }
    val want = (for {
      (ai, at) <- docsSeq; (bi, bt) <- docsSeq if ai < bi
      n = (grams(at) intersect grams(bt)).size if n >= 1
    } yield (ai, bi, n.toLong)).toSet
    val got = Dedup.duplicateSpanPairs(docs, l).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && want.exists(_._3 > 1))
    // boilerplate cap: every gram of `boiler`-only overlap occurs in docs
    // 2, 3, 4 (df = 3) -> maxDf = 2 drops the (2,3) and (2,4)/(3,4)
    // boilerplate-only CANDIDATES; pairs that also share a rarer span keep
    // their FULL exact n_spans (the verify counts boilerplate too)
    val capped = Dedup.duplicateSpanPairs(docs, l, maxDf = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val boilerOnly = want.filter { case (a, b, _) =>
      (grams(docsSeq(a.toInt)._2) intersect grams(docsSeq(b.toInt)._2))
        .forall(g => docsSeq.count(d => grams(d._2).contains(g)) > 2)
    }
    assert(capped == want -- boilerOnly && boilerOnly.nonEmpty)
  }

  test("nearDupPairsAuto: exact and LSH routes agree on a planted corpus") {
    import org.apache.spark.sql.functions._
    import graft.ops.Similarity
    // clustered corpus + planted perturbation dups — the LSH route's recall
    // at cosine ~0.9998 is 1-6e-14, so any disagreement is a routing bug,
    // not banding noise
    val dim = 16
    def u(seed: org.apache.spark.sql.Column) =
      (pmod(xxhash64(seed), lit(2001L)) - lit(1000L)).cast("double") / 1000.0
    val base = spark.range(300).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => u(pmod(col("id"), lit(20L)) * dim + j) + u(col("id") * dim + j + lit(7919L)) * 0.02)
        .as("embedding"))
    val embs = Similarity.withPlantedDups(base)
    def pairs(thresholdBytes: Long) =
      Similarity.nearDupPairsAuto(embs, 950, dim, bands = 16, rowsPerBand = 12,
          exactBytesThreshold = thresholdBytes)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaExact = pairs(Long.MaxValue) // stats can never exceed -> exact n²
    val viaLsh = pairs(0L)              // always exceeds -> LSH-banded
    assert(viaExact == viaLsh && viaExact.nonEmpty)
  }
}
