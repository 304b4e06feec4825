package graft.plans

import graft.cells.CellScheme
import graft.functions.STIntersects
import graft.geom.Extent
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrites
  * `a JOIN b ON st_intersects(ax0, ax1, ay0, ay1, bx0, bx1, by0, by1) [AND …]`
  * — which Catalyst would otherwise plan as a broadcast-nested-loop /
  * cartesian θ-join — into the PBSM cell plan: both sides are exploded into
  * grid cells (`Generate(Explode(Sequence(...)))`), equi-joined on the cell
  * id, re-filtered with the intersect predicate, and deduplicated with the
  * reference-point ownership test. Identical semantics, shuffle-partitioned
  * execution.
  *
  * The grid is a *fixed global scheme* (the H3/S2-style index of this engine)
  * read from session conf:
  *   `spark.graft.extent = "xmin,xmax,ymin,ymax"` (default 0,10000,0,10000)
  *   `spark.graft.grid.n = <cells per axis>`       (default 128)
  */
object SpatialJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ExtentKey = "spark.graft.extent"
  val GridKey = "spark.graft.grid.n"

  private def scheme: CellScheme = {
    val c = SparkSession.active.conf
    val ext = c.get(ExtentKey, "0,10000,0,10000").split(',').map(_.trim.toDouble)
    val n = c.get(GridKey, "128").toInt
    CellScheme(Extent(ext(0), ext(1), ext(2), ext(3)), n, n)
  }

  private def lit(d: Double): Expression = Literal(d)
  private def litL(l: Long): Expression = Literal(l)

  /** least(greatest(floor((v - lo) / len), 0), n-1) — must mirror
    * `SpatialJoins.cellCoord` / `CellScheme.cellX`.
    */
  private def cellCoord(v: Expression, lo: Double, len: Double, n: Int): Expression =
    Least(Seq(Greatest(Seq(Floor(Divide(Subtract(v, lit(lo)), lit(len))), litL(0L))), litL(n - 1L)))

  private def cellOf(s: CellScheme, x: Expression, y: Expression): Expression =
    Add(Multiply(cellCoord(y, s.extent.ymin, s.cellH, s.ny), litL(s.nx.toLong)),
        cellCoord(x, s.extent.xmin, s.cellW, s.nx))

  /** Explode a side into its overlapped cells; returns (plan, cellAttr). */
  private def withCells(s: CellScheme, child: LogicalPlan,
                        x0: Expression, x1: Expression,
                        y0: Expression, y1: Expression): (LogicalPlan, Attribute) = {
    val cy = AttributeReference("__graft_cy", LongType)()
    val cx = AttributeReference("__graft_cx", LongType)()
    val tz = Some(conf.sessionLocalTimeZone)
    val genY = Generate(
      Explode(Sequence(cellCoord(y0, s.extent.ymin, s.cellH, s.ny),
                       cellCoord(y1, s.extent.ymin, s.cellH, s.ny), None, tz)),
      Nil, outer = false, None, Seq(cy), child)
    val genX = Generate(
      Explode(Sequence(cellCoord(x0, s.extent.xmin, s.cellW, s.nx),
                       cellCoord(x1, s.extent.xmin, s.cellW, s.nx), None, tz)),
      Nil, outer = false, None, Seq(cx), genY)
    val cell = Alias(Add(Multiply(cy, litL(s.nx.toLong)), cx), "__graft_cell")()
    (Project(child.output :+ cell, genX), cell.toAttribute)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      conjuncts.collectFirst { case st: STIntersects => st: STIntersects } match {
        case Some(st: STIntersects) =>
          val rest = conjuncts.filterNot(_ eq st)
          val args = st.children
          val firstLeft = args.take(4).forall(_.references.subsetOf(left.outputSet)) &&
            args.drop(4).forall(_.references.subsetOf(right.outputSet))
          val firstRight = args.take(4).forall(_.references.subsetOf(right.outputSet)) &&
            args.drop(4).forall(_.references.subsetOf(left.outputSet))
          if (!firstLeft && !firstRight) j
          else {
            val (la, ra) = if (firstLeft) (args.take(4), args.drop(4)) else (args.drop(4), args.take(4))
            // post-analysis: no implicit casts are inserted for us — coerce
            // non-double coordinate expressions (FLOAT/DECIMAL columns) here
            def dbl(e: Expression): Expression =
              if (e.dataType == org.apache.spark.sql.types.DoubleType) e
              else Cast(e, org.apache.spark.sql.types.DoubleType)
            val Seq(ax0, ax1, ay0, ay1) = la.map(dbl)
            val Seq(bx0, bx1, by0, by1) = ra.map(dbl)
            val s = scheme
            val (lp, lcell) = withCells(s, left, ax0, ax1, ay0, ay1)
            val (rp, rcell) = withCells(s, right, bx0, bx1, by0, by1)
            val intersect = And(And(LessThanOrEqual(ax0, bx1), GreaterThanOrEqual(ax1, bx0)),
                                And(LessThanOrEqual(ay0, by1), GreaterThanOrEqual(ay1, by0)))
            val owns = EqualTo(
              cellOf(s, Greatest(Seq(ax0, bx0)), Greatest(Seq(ay0, by0))), lcell)
            val newCond = (Seq(EqualTo(lcell, rcell), intersect, owns) ++ rest).reduce(And)
            Project(j.output, Join(lp, rp, Inner, Some(newCond), hint))
          }
        case None => j
      }
  }
}

/** Installs the graft SQL surface on an existing session (idempotent):
  * `st_intersects` + the spatial-join rewrite rule. Also usable through
  * `SparkSessionExtensions` at session build time via [[GraftExtensions]].
  */
object GraftSql {
  def install(spark: SparkSession): SparkSession = {
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "st_intersects", exprs => STIntersects(exprs))
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(
      spark, "simhash64", exprs => graft.functions.SimHash64(exprs.head))
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(SpatialJoinRule))
      spark.experimental.extraOptimizations = extra :+ SpatialJoinRule
    spark
  }
}

/** `SparkSession.builder().withExtensions(new GraftExtensions)` — the
  * canonical extension entry point for cluster deployments
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SpatialJoinRule)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("st_intersects"),
      new ExpressionInfo(classOf[STIntersects].getName, "st_intersects"),
      (exprs: Seq[Expression]) => STIntersects(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => graft.functions.SimHash64(exprs.head)))
  }
}
