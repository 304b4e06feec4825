package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native centroid expressions must agree with a plain Scala
  * re-computation of the same quantized arithmetic (argmax dot, ties →
  * smaller centroid id) — the property that lets the DuckDB oracle replay
  * IVF assignment as `sum(e.x * c.x)` + `row_number`.
  */
class CentroidOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q(v: Double): Long = graft.functions.QuantizedDot.q(v * 1000.0)

  test("BestCentroid / CentroidDots == reference Scala computation") {
    val dim = 8
    val rnd = new scala.util.Random(5)
    val cents: Array[Array[Long]] =
      Array.fill(6)(Array.fill(dim)(rnd.nextInt(2001) - 1000L))
    val vecs: Seq[(Long, Seq[Double])] =
      (0 until 200).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    import spark.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val flat = cents.flatten.toSeq
    val got = df.select(col("vec_id"),
        graft.functions.BestCentroid(col("embedding"), flat, dim).as("best"),
        graft.functions.CentroidDots(col("embedding"), flat, dim).as("dots"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2)))
    val byId = vecs.toMap
    got.foreach { case (id, best, dots) =>
      val qv = byId(id).map(q).toArray
      val want = cents.map(c => c.indices.map(j => qv(j) * c(j)).sum)
      assert(dots.toSeq == want.toSeq, s"dots mismatch for vec $id")
      // argmax with ties -> smaller id
      val wantBest = want.zipWithIndex.maxBy { case (d, k) => (d, -k) }._2
      assert(best == wantBest, s"best mismatch for vec $id")
    }
  }

  test("ties break toward the smaller centroid id") {
    val dim = 2
    // two identical centroids -> every vector ties; argmax must pick id 0
    val cents: Array[Array[Long]] = Array(Array(500L, -500L), Array(500L, -500L))
    import spark.implicits._
    val df = Seq((1L, Seq(0.3, 0.7)), (2L, Seq(-0.2, 0.9))).toDF("vec_id", "embedding")
    val got = df.select(
        graft.functions.BestCentroid(col("embedding"), cents.flatten.toSeq, dim))
      .collect().map(_.getInt(0))
    assert(got.forall(_ == 0))
  }
}
