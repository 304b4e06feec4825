package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Dot products are computed in a quantized integer domain
  * (`round(v*1000)` per component) so results are order-independent and
  * bit-identical across Spark and the DuckDB oracle — float sums are
  * order-nondeterministic under parallel aggregation, integers are not.
  * For ranking purposes the quantization is monotone enough at the synthetic
  * data's scale (and is itself part of the operator's contract).
  */
object Similarity {

  /** Integer-quantized vector: round(v * 1000) per element. */
  def quantized(vec: Column): Column =
    transform(vec, v => round(v.cast("double") * 1000).cast("long"))

  /** Dot product in the quantized domain — a native codegen'd expression
    * (see [[graft.functions.QuantizedDot]]; ~100× cheaper than the
    * aggregate/zip_with higher-order chain on the n² hot path).
    */
  def qdot(a: Column, b: Column): Column = graft.functions.QuantizedDot(a, b)

  /** Brute-force top-k by quantized dot product (ties → smaller corpus id).
    * The baseline ANN plan: broadcast the query set, score the whole corpus
    * in one codegen'd pass, per-query top-k via window.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val scored = broadcast(q).crossJoin(c)
      .select(col("q_id"), col("c_id"), qdot(col("q_emb"), col("c_emb")).as("dot"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("dot").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("dot"), col("rank").cast("long").as("rank"))
  }

  /** DuckDB oracle for [[bruteForceTopK]] over the `embeddings` table with
    * queries = `vec_id < nQueries`. `dim` must match the table's vector width.
    */
  def bruteForceTopKSql(nQueries: Int, k: Int, dim: Int): String =
    s"""WITH qv AS (
       |  SELECT e.vec_id, i, CAST(round(e.embedding[i] * 1000) AS BIGINT) AS x
       |  FROM embeddings e, range(1, ${dim + 1}) r(i) WHERE e.vec_id < $nQueries
       |), cv AS (
       |  SELECT e.vec_id, i, CAST(round(e.embedding[i] * 1000) AS BIGINT) AS x
       |  FROM embeddings e, range(1, ${dim + 1}) r(i)
       |), dots AS (
       |  SELECT qv.vec_id AS q_id, cv.vec_id AS c_id,
       |         CAST(sum(qv.x * cv.x) AS BIGINT) AS dot
       |  FROM qv JOIN cv USING (i) GROUP BY 1, 2
       |)
       |SELECT q_id, c_id, dot, rank FROM (
       |  SELECT q_id, c_id, dot,
       |         row_number() OVER (PARTITION BY q_id ORDER BY dot DESC, c_id) AS rank
       |  FROM dots
       |) WHERE rank <= $k""".stripMargin.replace("\n", " ")

  /** LSH-bucketed ANN (the 100 TB path): random-hyperplane signature
    * (`numPlanes` sign bits from seeded pseudo-random hyperplanes), candidates
    * = corpus rows sharing a signature band with the query, re-ranked exactly
    * within the candidate set. Recall < 1 by design; the scale win is that the
    * corpus is bucketed once (one shuffle) and each query probes only its
    * buckets instead of scanning the corpus.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              numPlanes: Int = 16, bands: Int = 4, seed: Long = 7L): DataFrame = {
    require(numPlanes % bands == 0)
    val rowsPerBand = numPlanes / bands
    val rnd = new scala.util.Random(seed)
    // deterministic hyperplanes, quantized to integers for engine parity
    val planes = Array.fill(numPlanes, dim)(rnd.nextInt(2001) - 1000)
    def signBits(emb: Column): Column = {
      val q = quantized(emb)
      val bits = planes.map { pl =>
        val dot = aggregate(zip_with(q,
          array(pl.map(w => lit(w.toLong)): _*), (x, y) => x * y), lit(0L), (a, v) => a + v)
        when(dot >= 0, lit(1L)).otherwise(lit(0L))
      }
      bits.zipWithIndex.map { case (b, i) => shiftleft(b, i) }.reduce(_ bitwiseOR _)
    }
    def banded(df: DataFrame, idName: String): DataFrame =
      df.select(col("vec_id").as(idName), col("embedding").as(s"${idName}_emb"),
          signBits(col("embedding")).as("sig"))
        .select(col(idName), col(s"${idName}_emb"),
          explode(array((0 until bands).map(bi => struct(lit(bi).as("band"),
            shiftrightunsigned(col("sig"), bi * rowsPerBand)
              .bitwiseAND(lit((1L << rowsPerBand) - 1)).as("piece"))): _*)).as("bp"))
        .select(col(idName), col(s"${idName}_emb"),
          col("bp.band").as("band"), col("bp.piece").as("piece"))
    val qb = banded(queries, "q_id")
    val cb = banded(corpus, "c_id")
    val cand = qb.join(cb, Seq("band", "piece"))
      .select(col("q_id"), col("c_id"), col("q_id_emb"), col("c_id_emb")).distinct()
    val scored = cand.select(col("q_id"), col("c_id"),
      qdot(col("q_id_emb"), col("c_id_emb")).as("dot"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("dot").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("dot"), col("rank").cast("long").as("rank"))
  }

  /** Exact embedding-cosine near-duplicate pairs: normalized quantized dot ≥
    * threshold (in millionths, integer compare via cross-multiplication of
    * squared dot vs squared norms — no floats anywhere).
    * dot²·10⁶ ≥ t²·|a|²·|b|²  (guarded on dot ≥ 0), t in thousandths.
    */
  def cosineNearDupPairs(embs: DataFrame, tMilli: Int): DataFrame = {
    val withNorm = embs.select(col("vec_id"), col("embedding"),
      qdot(col("embedding"), col("embedding")).as("n2"))
    val a = withNorm.toDF("a_id", "a_q", "a_n2")
    val b = withNorm.toDF("b_id", "b_q", "b_n2")
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("dot", qdot(col("a_q"), col("b_q")))
      // compare in BigDecimal space: dot² * 10⁶ vs t² * n2a * n2b (can exceed int64)
      .filter(col("dot") >= 0 &&
        col("dot").cast("decimal(38,0)") * col("dot") * lit(1000000L) >=
          lit(tMilli.toLong * tMilli) * col("a_n2").cast("decimal(38,0)") * col("b_n2"))
      .select(col("a_id"), col("b_id"))
  }

  /** DuckDB oracle for [[cosineNearDupPairs]] (HUGEINT keeps the squared
    * comparison exact).
    */
  def cosineNearDupSql(tMilli: Int, dim: Int): String =
    s"""WITH ev AS (
       |  SELECT vec_id, i, CAST(round(embedding[i] * 1000) AS BIGINT) AS x
       |  FROM embeddings, range(1, ${dim + 1}) r(i)
       |), n2 AS (
       |  SELECT vec_id, sum(x * x) AS n2 FROM ev GROUP BY 1
       |), dots AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, sum(a.x * b.x) AS dot
       |  FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2
       |)
       |SELECT a_id, b_id FROM dots
       |  JOIN n2 na ON na.vec_id = a_id JOIN n2 nb ON nb.vec_id = b_id
       | WHERE dot >= 0
       |   AND CAST(dot AS HUGEINT) * dot * 1000000 >=
       |       CAST(${tMilli.toLong * tMilli} AS HUGEINT) * na.n2 * nb.n2""".stripMargin.replace("\n", " ")
}
