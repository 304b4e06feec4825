package graft

import graft.geom.Geom
import graft.sources.Traces
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("text trace: write + distributed read round-trip (float32 semantics)") {
    val g = graft.ingest.Workloads.uniformPolygons(spark, 500, 123)
    val path = java.nio.file.Files.createTempDirectory("trace").resolve("C_t.txt").toString
    Traces.writeTextTrace(g, path)
    // distributed writer emits a directory with one part file
    import scala.jdk.CollectionConverters._
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(path)).iterator().asScala
      .find(_.getFileName.toString.startsWith("part-")).get
    val first = scala.io.Source.fromFile(part.toFile).getLines().next()
    assert(first == "500") // header = num_rows, reference format
    val back = Traces.readTextTrace(spark, path).collect().sortBy(_.id)
    val orig = g.collect().sortBy(_.id)
    // generator values are already float32-exact at 2 decimals → identity
    assert(back.length == 500)
    (back zip orig).foreach { case (b, o) => assert(b == o, s"$b != $o") }
  }

  test("binary trace: 64-B page write + distributed read round-trip") {
    val g = graft.ingest.Workloads.uniformPolygons(spark, 500, 123)
    val path = java.nio.file.Files.createTempDirectory("btrace").resolve("C_t.bin").toString
    Traces.writeBinaryTrace(g, path)
    // page math: 1 header page + ceil(500/3) pages of 3 obj_t
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(path)) == 64L * (1 + 167))
    val back = Traces.readBinaryTrace(spark, path).collect().sortBy(_.id)
    val orig = g.collect().sortBy(_.id)
    assert(back.length == 500)
    // generator emits float32-exact values → exact round-trip through iffff
    (back zip orig).foreach { case (b, o) => assert(b == o, s"$b != $o") }
  }

  test("WKT: format/parse round-trip, POINT for degenerate, parse-failure drop") {
    val rows = Seq(Geom(1, 1.25, 2.5, 3.75, 4.0), Geom(2, 7.0, 7.0, 8.0, 8.0))
    val df = spark.createDataset(rows).select(col("id"),
      Traces.toWkt(col("xmin"), col("xmax"), col("ymin"), col("ymax")).as("w"))
    val wkts = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(wkts(2L) == "POINT(7.00 8.00)")
    assert(wkts(1L).startsWith("POLYGON((1.25 3.75, 1.25 4.00, 2.50 4.00, 2.50 3.75, 1.25 3.75))"))
    val parsed = df.select(col("id"), Traces.parseWktMbr(col("w")).as("m"))
      .select(col("id"), col("m.*")).as[Geom].collect().sortBy(_.id)
    assert(parsed.toSeq == rows)
    // malformed lines are dropped by readWkt
    val dir = java.nio.file.Files.createTempDirectory("wkt")
    java.nio.file.Files.writeString(dir.resolve("w.txt"),
      "POINT(1.00 2.00)\nGEOMETRYCOLLECTION EMPTY\nPOLYGON((0 0, 0 1, 1 1, 1 0, 0 0))\n")
    val read = Traces.readWkt(spark, dir.toString).collect()
    assert(read.length == 2)
    assert(read.exists(g => g.xmin == 1.0 && g.ymin == 2.0 && g.xmin == g.xmax))
    assert(read.exists(g => g.xmin == 0.0 && g.xmax == 1.0))
  }
}
