package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge

/** The SpatialSpark-style predicate family as SQL functions (reference
  * surface `SpatialJoinApp.scala:128-136`): each is evaluable anywhere
  * (CodegenFallback row predicate), and [[graft.plans.SpatialJoinRule]]
  * recognizes any of them inside an inner-join condition and rewrites the
  * join into the PBSM cell equi-join with the predicate as refinement.
  */
private[functions] trait STCoordPredicate extends Predicate with CodegenFallback {
  def coordCount: Int
  override def nullable: Boolean = children.exists(_.nullable)

  protected def evalCoords(input: InternalRow): Array[Double] = {
    val v = new Array[Double](coordCount)
    var i = 0
    while (i < coordCount) {
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
    v
  }
}

/** `st_within(a..., b...)`: a's MBR inside b's (inclusive). */
case class STWithin(children: Seq[Expression]) extends STCoordPredicate {
  require(children.length == 8, "st_within takes 8 coordinate arguments")
  override def coordCount: Int = 8
  override def eval(input: InternalRow): Any = {
    val v = evalCoords(input); if (v == null) return null
    v(0) >= v(4) && v(1) <= v(5) && v(2) >= v(6) && v(3) <= v(7)
  }
  override def withNewChildrenInternal(c: IndexedSeq[Expression]): STWithin = copy(children = c)
}

/** `st_contains(a..., b...)`: b's MBR inside a's (inclusive). */
case class STContains(children: Seq[Expression]) extends STCoordPredicate {
  require(children.length == 8, "st_contains takes 8 coordinate arguments")
  override def coordCount: Int = 8
  override def eval(input: InternalRow): Any = {
    val v = evalCoords(input); if (v == null) return null
    v(4) >= v(0) && v(5) <= v(1) && v(6) >= v(2) && v(7) <= v(3)
  }
  override def withNewChildrenInternal(c: IndexedSeq[Expression]): STContains = copy(children = c)
}

/** `st_dwithin(a..., b..., r)`: MBR min-distance ≤ r (the reference's
  * `withind`). `r` must be a literal for the join rewrite to fire.
  */
case class STDWithin(children: Seq[Expression]) extends STCoordPredicate {
  require(children.length == 9, "st_dwithin takes 8 coordinates + radius")
  override def coordCount: Int = 8
  override def eval(input: InternalRow): Any = {
    val v = evalCoords(input); if (v == null) return null
    val rv = children(8).eval(input)
    if (rv == null) return null
    val r = rv match {
      case d: Double => d
      case f: Float => f.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
    }
    val dx = math.max(math.max(v(4) - v(1), v(0) - v(5)), 0.0)
    val dy = math.max(math.max(v(6) - v(3), v(2) - v(7)), 0.0)
    math.sqrt(dx * dx + dy * dy) <= r
  }
  override def withNewChildrenInternal(c: IndexedSeq[Expression]): STDWithin = copy(children = c)
}

object STPredicates {
  def stWithin(cols: Column*): Column = Bridge.column(STWithin(cols.map(Bridge.expression)))
  def stContains(cols: Column*): Column = Bridge.column(STContains(cols.map(Bridge.expression)))
  def stDWithin(cols: Column*): Column = Bridge.column(STDWithin(cols.map(Bridge.expression)))
}
