package graft.pipeline

import graft.geom.Geom
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The web-page payload pipeline (BASELINE.json input_hint): pages
  * `(url, warc_ts, html, text, lang)` are geocoded to a deterministic point,
  * cell-encoded, spatially joined, and the payload re-attached at the end —
  * with the per-row invariant that `text` stays byte-identical per `url`
  * through every stage.
  *
  * Scale design: the join runs on a *skeleton* `(id, x, y)` — the heavy
  * `html`/`text` columns never enter the shuffle (Catalyst prunes them; the
  * skeleton projection makes it explicit). Payload is re-joined by id
  * afterwards. Shuffle bytes ∝ geometry, not corpus size.
  */
object Pages {

  /** Synthesize the page table from the documents table (deterministic; the
    * driver testdata stands in for the trillion-row Common-Crawl table).
    */
  def pagesFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("https://host-"), col("doc_id") % 100, lit(".example/p/"), col("doc_id")).as("url"),
      (lit(1704067200L) + col("doc_id") * 7).cast("timestamp").as("warc_ts"),
      encode(concat(lit("<html>"), col("text"), lit("</html>")), "UTF-8").as("html"),
      col("text"),
      col("lang"))

  /** Deterministic geocode: doc_id → point in the 1000×1000 map (same
    * int-arithmetic family as [[graft.api.Derived]] so DuckDB can replay it).
    */
  def geocode(id: Column): (Column, Column) = {
    val x = (id * lit(48271L)) % lit(100000L) / lit(100.0)
    val y = (id * lit(69621L)) % lit(100000L) / lit(100.0)
    (x, y)
  }

  val geocodeSqlX = "(doc_id * 48271) % 100000 / 100.0"
  val geocodeSqlY = "(doc_id * 69621) % 100000 / 100.0"

  /** Page skeleton as degenerate MBRs: `(doc_id, x, x, y, y)`. */
  def skeleton(pages: DataFrame): Dataset[Geom] = {
    import pages.sparkSession.implicits._
    val (x, y) = geocode(col("doc_id"))
    pages.select(col("doc_id").as("id"), x.as("xmin"), x.as("xmax"), y.as("ymin"), y.as("ymax"))
      .as[Geom]
  }

  /** Geocode pages, join against a rectangle set, re-attach the payload, and
    * carry the text-integrity hash. Returns
    * `(url, b_id, text, text_md5)` — `text_md5` is the byte-identity witness.
    */
  def geoJoin(pages: DataFrame, rects: Dataset[Geom],
              scheme: graft.cells.CellScheme): DataFrame = {
    // the skeleton is POINTS BY CONSTRUCTION (x==xmax, y==ymax), so the
    // point-specialized plan applies with zero detection cost: no page-side
    // explode generators, no ownership conjunct, narrower shuffle rows —
    // identical pair set (the streaming geoJoinStream already runs this
    // shape; r7 aligns the batch path)
    val joined = graft.join.SpatialJoins.gridJoinPIP(skeleton(pages), rects, scheme)
    joined.join(pages.select(col("doc_id").as("a_id"), col("url"), col("text")), "a_id")
      .select(col("url"), col("a_id"), col("b_id"), col("text"),
        md5(col("text")).as("text_md5"))
  }
}
