package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.Bridge

/** `st_intersects(axmin, axmax, aymin, aymax, bxmin, bxmax, bymin, bymax)` —
  * the reference's inclusive MBR intersect (`cpp/Region.h:59-66`) as a
  * Catalyst predicate. Evaluable anywhere (falls back to a
  * broadcast-nested-loop plan if unoptimized); [[graft.plans.SpatialJoinRule]]
  * recognizes it inside an inner-join condition and rewrites the join into
  * the PBSM cell-partitioned equi-join.
  */
case class STIntersects(children: Seq[Expression]) extends Predicate with CodegenFallback {
  require(children.length == 8, "st_intersects takes 8 coordinate arguments")

  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val v = new Array[Double](8)
    var i = 0
    while (i < 8) {
      val e = children(i).eval(input)
      if (e == null) return null
      v(i) = e match {
        case d: Double => d
        case f: Float => f.toDouble
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number => n.doubleValue()
      }
      i += 1
    }
    // a.xmin <= b.xmax && a.xmax >= b.xmin && a.ymin <= b.ymax && a.ymax >= b.ymin
    v(0) <= v(5) && v(1) >= v(4) && v(2) <= v(7) && v(3) >= v(6)
  }

  override def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): STIntersects =
    copy(children = newChildren)
}

object STIntersects {
  def apply(cols: Column*): Column =
    Bridge.column(STIntersects(cols.map(Bridge.expression)))
}
