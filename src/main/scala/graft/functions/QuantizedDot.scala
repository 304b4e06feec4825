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
  /** round-half-away-from-zero, matching Spark's and DuckDB's `round`.
    * `floor(v + 0.5)` alone is wrong for doubles just under a .5 boundary
    * (e.g. 0.49999999999999994 + 0.5 rounds UP to 1.0 in binary); the
    * correction branch restores decimal HALF_UP without BigDecimal cost.
    */
  @inline def q(v: Double): Long = {
    val a = math.abs(v)
    val fl = math.floor(a)
    // a - fl is exact; rint is correctly rounded with no addition error
    // (floor(a + 0.5) is wrong for doubles just under a .5 boundary)
    val r = if (a - fl == 0.5) fl + 1.0 else math.rint(a)
    if (v < 0) -r.toLong else r.toLong
  }

  /** Static entry point shared by eval and generated code. Element widths are
    * resolved per side (mixed float/double pairs are fine); unequal lengths
    * are rejected rather than silently truncated.
    */
  def dot(a: ArrayData, b: ArrayData, aFloats: Boolean, bFloats: Boolean): Long = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vector length mismatch: $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      // a null element read via getFloat/getDouble would silently be 0/garbage
      require(!a.isNullAt(i) && !b.isNullAt(i),
        s"null element at $i: embedding vectors must be dense (containsNull=false)")
      val x = if (aFloats) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloats) b.getFloat(i).toDouble else b.getDouble(i)
      acc += q(x * 1000.0) * q(y * 1000.0)
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(QuantizedDotExpr(Bridge.expression(a), Bridge.expression(b)))
}

case class QuantizedDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantizedDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.QuantizedDot.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizedDotExpr =
    copy(left = l, right = r)
}
