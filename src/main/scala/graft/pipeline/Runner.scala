package graft.pipeline

import graft.cells.CellScheme
import graft.geom.Geom
import graft.join.SpatialJoins
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end web-page pipeline with snapshot checkpoints and per-cell
  * metrics — the engine's production shape per the north rule:
  *
  *   pages → (1) ingest snapshot → (2) geocoded-skeleton snapshot →
  *   (3) join-result snapshot → (4) per-cell metrics snapshot
  *
  * Every stage is a committed Parquet snapshot with a manifest (lineage to
  * input snapshot ids, per-partition row counts); a restarted run resumes at
  * the first missing stage ([[Snapshots.getOrCompute]]). The heavy payload
  * (`html`, `text`) never enters the join shuffle — stage 2 carries only the
  * skeleton; the payload is re-attached from stage 1 at the end by id, which
  * also proves the byte-identical-text invariant (md5 witness columns).
  */
final class Runner(spark: SparkSession, snapshotRoot: String,
                   scheme: CellScheme) {

  val snaps = new Snapshots(spark, snapshotRoot)

  def run(pages: DataFrame, rects: Dataset[Geom]): DataFrame = {
    val ingest = snaps.getOrCompute("ingest") {
      pages.withColumn("text_md5_in", md5(col("text")))
    }
    val ingestId = snaps.latest("ingest").get

    val skeleton = snaps.getOrCompute("skeleton", Map("ingest" -> ingestId)) {
      Pages.skeleton(ingest).toDF()
    }
    val skeletonId = snaps.latest("skeleton").get

    val joined = snaps.getOrCompute("join", Map("skeleton" -> skeletonId)) {
      import spark.implicits._
      // the skeleton is points by construction — point-specialized plan,
      // zero detection cost (see Pages.geoJoin)
      SpatialJoins.gridJoinPIP(skeleton.as[Geom], rects, scheme)
    }
    val joinId = snaps.latest("join").get

    // A3 analogue: per-cell candidate and result counts
    snaps.getOrCompute("metrics", Map("skeleton" -> skeletonId, "join" -> joinId)) {
      import spark.implicits._
      val cand = SpatialJoins.withCells(
          skeleton.toDF("a_id", "a_xmin", "a_xmax", "a_ymin", "a_ymax"), scheme, "a")
        .groupBy("cell").agg(count(lit(1)).as("candidates"))
      val res = joined.join(skeleton.toDF("a_id", "x0", "x1", "y0", "y1"), "a_id")
        .select(SpatialJoins.cellOfCol(scheme, col("x0"), col("y0")).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("results"))
      cand.join(res, Seq("cell"), "left_outer")
        .withColumn("results", coalesce(col("results"), lit(0L)))
    }

    // final assembly: re-attach payload, witness the text invariant
    joined.join(ingest.select(col("doc_id").as("a_id"), col("url"),
        col("text"), col("text_md5_in")), "a_id")
      .withColumn("text_md5_out", md5(col("text")))
      .select(col("url"), col("a_id"), col("b_id"), col("text_md5_in"), col("text_md5_out"))
  }
}
