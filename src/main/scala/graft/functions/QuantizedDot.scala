package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer-quantized dot product of two float/double vectors:
  * `Σ round(aᵢ·1000) · round(bᵢ·1000)` with HALF_UP-away-from-zero rounding —
  * the exact arithmetic the DuckDB oracle replays (`round(x*1000)::BIGINT`),
  * order-independent and engine-exact.
  *
  * A native expression with `doGenCode` (tight primitive loop over ArrayData)
  * replacing the `aggregate(zip_with(...))` higher-order chain, which
  * allocates an intermediate array per row pair (~15 µs/pair measured → this
  * is ~100× cheaper on the similarity hot paths).
  */
object QuantizedDot {
  /** round-half-away-from-zero, matching Spark's and DuckDB's `round`. */
  @inline def q(v: Double): Long =
    if (v < 0) -math.floor(-v + 0.5).toLong else math.floor(v + 0.5).toLong

  /** Static entry point shared by eval and generated code. */
  def dot(a: ArrayData, b: ArrayData, floats: Boolean): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    if (floats) {
      while (i < n) { acc += q(a.getFloat(i) * 1000.0) * q(b.getFloat(i) * 1000.0); i += 1 }
    } else {
      while (i < n) { acc += q(a.getDouble(i) * 1000.0) * q(b.getDouble(i) * 1000.0); i += 1 }
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(QuantizedDotExpr(Bridge.expression(a), Bridge.expression(b)))
}

case class QuantizedDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  private def isFloatArray: Boolean = left.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantizedDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloatArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.QuantizedDot.dot($a, $b, $isFloatArray)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDotExpr =
    copy(left = l, right = r)
}
