package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native centroid scoring for the IVF coarse quantizer: one tight primitive
  * loop over a flattened `nCentroids × dim` centroid table held as a plan
  * constant — corpus-to-list assignment is a pure scan projection (no
  * crossJoin, no window, no shuffle). The declarative form (`greatest` over
  * nCentroids `struct(QuantizedDot, -k)` columns) re-read the embedding array
  * and re-quantized it once PER CENTROID and fell out of whole-stage codegen
  * at realistic centroid counts — measured 118 s per 1M-row training pass at
  * 64 centroids vs ~2 s for this expression.
  *
  * Centroids are quantized longs (thousandths); the dot against a quantized
  * input vector is `Σ round(vᵢ·1000)·cᵢ` — exactly what the DuckDB oracle
  * replays as `sum(e.x * c.x)`.
  */
object CentroidOps {
  /** All nCentroids dots of `emb` against the flattened table. */
  def dots(emb: ArrayData, cents: Array[Long], dim: Int,
           floats: Boolean): Array[Long] = {
    val n = emb.numElements()
    require(n == dim, s"embedding dim $n != expected $dim")
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      require(!emb.isNullAt(i),
        s"null element at $i: embedding vectors must be dense (containsNull=false)")
      val v = if (floats) emb.getFloat(i).toDouble else emb.getDouble(i)
      q(i) = QuantizedDot.q(v * 1000.0)
      i += 1
    }
    val nc = cents.length / dim
    val out = new Array[Long](nc)
    var k = 0
    while (k < nc) {
      var dot = 0L
      var j = 0
      val base = k * dim
      while (j < dim) { dot += q(j) * cents(base + j); j += 1 }
      out(k) = dot
      k += 1
    }
    out
  }

  def dotsArray(emb: ArrayData, cents: Array[Long], dim: Int,
                floats: Boolean): ArrayData =
    new GenericArrayData(dots(emb, cents, dim, floats))

  /** Argmax-dot centroid id, ties → smaller id. */
  def best(emb: ArrayData, cents: Array[Long], dim: Int, floats: Boolean): Int = {
    val ds = dots(emb, cents, dim, floats)
    var bestK = 0
    var k = 1
    while (k < ds.length) {
      if (ds(k) > ds(bestK)) bestK = k
      k += 1
    }
    bestK
  }
}

/** `array<long>` of the input vector's dot against every centroid. */
case class CentroidDotsExpr(child: Expression, cents: Seq[Long], dim: Int)
    extends UnaryExpression {
  require(cents.length % dim == 0, "centroid table must be whole rows")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val centsArr = cents.toArray

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any =
    CentroidOps.dotsArray(v.asInstanceOf[ArrayData], centsArr, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", centsArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CentroidOps.dotsArray($c, $cRef, $dim, $isFloat)")
  }

  override protected def withNewChildInternal(c: Expression): CentroidDotsExpr =
    copy(child = c)
}

object CentroidDots {
  def apply(emb: Column, cents: Seq[Long], dim: Int): Column =
    Bridge.column(CentroidDotsExpr(Bridge.expression(emb), cents, dim))
}

/** Argmax-dot centroid id (`int`), ties → smaller id. */
case class BestCentroidExpr(child: Expression, cents: Seq[Long], dim: Int)
    extends UnaryExpression {
  require(cents.length % dim == 0, "centroid table must be whole rows")
  override def dataType: DataType = IntegerType

  @transient private lazy val centsArr = cents.toArray

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(v: Any): Any =
    CentroidOps.best(v.asInstanceOf[ArrayData], centsArr, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", centsArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CentroidOps.best($c, $cRef, $dim, $isFloat)")
  }

  override protected def withNewChildInternal(c: Expression): BestCentroidExpr =
    copy(child = c)
}

object BestCentroid {
  def apply(emb: Column, cents: Seq[Long], dim: Int): Column =
    Bridge.column(BestCentroidExpr(Bridge.expression(emb), cents, dim))
}
