package graft.api

import graft.geom.Geom
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic spatial inputs derived from the driver's TPC-H-ish parquet
  * tables, used by the oracle-checked `SparkEntry.queries`.
  *
  * The derivation is pure int64 arithmetic followed by one exact-IEEE division,
  * so Spark and DuckDB compute bit-identical doubles; the oracle SQL is
  * *generated from the same spec* (single source of truth — no drift).
  *
  * Coordinates land in [0, 10000) — the reference's canonical map extent
  * (`data_gen/data_gen.py --map_edge_len 10000.0`).
  */
final case class RectSpec(table: String, key: String, mx: Long, my: Long,
                          point: Boolean, skew: Boolean = false) {
  // x = ((key*mx) % 100000) / 100.0   ∈ [0, 1000)
  // skew: x ← x²/1000 (density ∝ 1/√x — a hot corner, exercising the
  //       adaptive splitter); same single-op IEEE arithmetic in both engines
  // w = 1 + (key % 97) / 10.0         (rect edge 1.0 .. 10.6; 0 for points)
  def sqlSelect: String = {
    val x0 = s"((($key * $mx) % 100000) / 100.0)"
    val y0 = s"((($key * $my) % 100000) / 100.0)"
    val x = if (skew) s"($x0 * $x0 / 1000)" else x0
    val y = if (skew) s"($y0 * $y0 / 1000)" else y0
    val (xmax, ymax) =
      if (point) (x, y)
      else (s"$x + 1 + ($key % 97) / 10.0", s"$y + 1 + ($key % 89) / 10.0")
    s"SELECT $key AS id, $x AS xmin, $xmax AS xmax, $y AS ymin, $ymax AS ymax FROM $table"
  }

  def load(spark: SparkSession, dir: String): Dataset[Geom] = {
    import spark.implicits._
    val k = col(key).cast("long")
    val x0 = (k * lit(mx)) % lit(100000L) / lit(100.0)
    val y0 = (k * lit(my)) % lit(100000L) / lit(100.0)
    val x = if (skew) x0 * x0 / lit(1000) else x0
    val y = if (skew) y0 * y0 / lit(1000) else y0
    val (xmax, ymax) =
      if (point) (x, y)
      else (x + lit(1) + (k % lit(97L)) / lit(10.0),
            y + lit(1) + (k % lit(89L)) / lit(10.0))
    spark.read.parquet(s"$dir/$table.parquet")
      .select(k.as("id"), x.as("xmin"), xmax.as("xmax"), y.as("ymin"), ymax.as("ymax"))
      .as[Geom]
  }
}

object Derived {
  // multipliers: odd constants (Knuth 2654435761 and friends) — decorrelated axes
  val partRects      = RectSpec("part",     "p_partkey",  2654435761L, 2246822519L, point = false)
  val ordersRects    = RectSpec("orders",   "o_orderkey", 3266489917L, 668265263L,  point = false)
  val supplierRects  = RectSpec("supplier", "s_suppkey",  2654435761L, 3266489917L, point = false)
  val customerPoints = RectSpec("customer", "c_custkey",  2246822519L, 2654435761L, point = true)
  val orderPoints    = RectSpec("orders",   "o_orderkey", 2654435761L, 2246822519L, point = true)
  // hot-corner variants for the adaptive-refinement path
  val partRectsSkew   = RectSpec("part",   "p_partkey",  2654435761L, 2246822519L, point = false, skew = true)
  val ordersRectsSkew = RectSpec("orders", "o_orderkey", 3266489917L, 668265263L,  point = false, skew = true)

  /** The reference's intersect predicate as SQL text (inclusive bounds,
    * `cpp/Region.h:59-66`), over tables aliased `a` and `b`.
    */
  val intersectSql =
    "a.xmin <= b.xmax AND a.xmax >= b.xmin AND a.ymin <= b.ymax AND a.ymax >= b.ymin"

  /** Full oracle for a spatial join between two derived inputs. */
  def joinOracle(a: RectSpec, b: RectSpec): String =
    s"SELECT a.id AS a_id, b.id AS b_id FROM (${a.sqlSelect}) a " +
      s"JOIN (${b.sqlSelect}) b ON $intersectSql"
}
