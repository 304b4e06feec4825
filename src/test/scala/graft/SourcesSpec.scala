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

  test("OSM ingest: every process_OSM.py skip rule enumerated") {
    val dir = java.nio.file.Files.createTempDirectory("osm")
    val lines = Seq(
      // 1. valid polygon, 5 coordinate pairs, numeric tag noise must be ignored
      "5786\tPOLYGON ((13.73 51.04, 13.72 51.05, 13.71 51.03, 13.74 51.02, 13.73 51.04))\t[addr:postcode#01067,contact:phone#+49 351 86420]",
      // 2. GEOMETRYCOLLECTION -> skip (process_OSM.py:53)
      "5787\tGEOMETRYCOLLECTION (POLYGON ((1 1, 1 2, 2 2, 2 1, 1 1)))\t[]",
      // 3. no POLYGON at all -> skip (:53)
      "5788\tPOINT (13.7 51.0)\t[]",
      // 4. fewer than 5 coordinate pairs -> skip (:93)
      "5789\tPOLYGON ((1.0 1.0, 1.0 2.0, 2.0 2.0, 1.0 1.0))\t[]",
      // 5. unparseable coordinate token -> skip (:103-107)
      "5790\tPOLYGON ((1.0 xx, 1.0 2.0, 2.0 2.0, 2.0 1.0, 1.0 1.0))\t[]",
      // 6. extra internal spaces tolerated (:97-101)
      "5791\tPOLYGON ((1.0  1.0, 1.0 4.0, 3.0 4.0, 3.0 1.0, 1.0 1.0))\t[]",
      // 7. malformed line without tabs -> skip
      "POLYGON ((1 1, 1 2, 2 2, 2 1, 1 1))",
      // 8. a FULLY non-numeric pair ("xx yy") keeps the numeric-token count
      //    EVEN — with ≥ 6 pairs the r4 even-count check ingested the line
      //    with an MBR from the surviving tokens; the per-pair count
      //    (ncoord == 2·pairs) must drop it like the reference's float() loop
      "5792\tPOLYGON ((1.0 1.0, xx yy, 1.0 2.0, 2.0 2.0, 2.0 1.0, 1.0 1.0))\t[]",
      // 9. second token is not a float ("1.5.2" fails float()) -> skip
      "5793\tPOLYGON ((1.0 1.5.2, 1.0 2.0, 2.0 2.0, 2.0 1.0, 1.0 1.0))\t[]",
      // 10. a 1-token pair -> skip (the reference's c_pair[1] IndexError),
      //     even when a later 3-token pair keeps aggregate counts balanced
      "5794\tPOLYGON ((1.0, 2.0 3.0 4.0, 1.0 2.0, 2.0 2.0, 2.0 1.0, 1.0 1.0))\t[]",
      // 11. EXTRA trailing tokens are IGNORED, like the reference loop that
      //     never reads c_pair[2:] — valid, MBR from each pair's first two
      //     (the 9.9/7.7 must not leak into the extent)
      "5795\tPOLYGON ((1.0 1.0 9.9, 1.0 2.0, 2.0 2.0 7.7 xx, 2.0 1.0, 1.0 1.0))\t[]",
      // 12. a numeric SUBSTRING inside a junk token does not count:
      //     float("1.0x") fails in the reference -> skip (the r5
      //     numeric-substring count saw two numbers here and ingested)
      "5796\tPOLYGON ((1.0x 2.0, 1.0 2.0, 2.0 2.0, 2.0 1.0, 1.0 1.0))\t[]",
      // 13. junk FIRST token with two numerics after it -> skip (float("xx"))
      "5797\tPOLYGON ((xx 1.0 2.0, 1.0 2.0, 2.0 2.0, 2.0 1.0, 1.0 1.0))\t[]")
    java.nio.file.Files.writeString(dir.resolve("osm.txt"), lines.mkString("\n") + "\n")
    val read = Traces.readOsmWkt(spark, dir.toString).collect().sortBy(_.id)
    assert(read.map(_.id).toSeq == Seq(5786L, 5791L, 5795L))
    val g = read.find(_.id == 5786L).get
    assert(g.xmin == 13.71 && g.xmax == 13.74 && g.ymin == 51.02 && g.ymax == 51.05)
    val h = read.find(_.id == 5791L).get
    assert(h.xmin == 1.0 && h.xmax == 3.0 && h.ymin == 1.0 && h.ymax == 4.0)
    val e = read.find(_.id == 5795L).get
    assert(e.xmin == 1.0 && e.xmax == 2.0 && e.ymin == 1.0 && e.ymax == 2.0,
      "extra pair tokens must not leak into the MBR")
  }

  test("partition-meta pages: 12-B stride, 5/page, zero pad, numMeta bound (partition_meta_t)") {
    import spark.implicits._
    // 7 entries -> 2 pages (5 + 2); one legit count-0 entry proves why the
    // entry count must travel out-of-band (padding is indistinguishable)
    val meta = Seq((0L, 3L, 1.5f, 2.5f), (1L, 1L, 17.0f, 0.25f), (2L, 0L, 3f, 4f),
        (3L, 7L, -1.5f, 8f), (5L, 2L, 0f, 0f), (8L, 4L, 9f, 10f), (9L, 11L, 12f, 13f))
      .toDF("cell", "count", "x", "y")
    val path = java.nio.file.Files.createTempDirectory("meta").resolve("meta.bin").toString
    val n = Traces.writeMetaPages(meta, path)
    assert(n == 7L)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    assert(bytes.length == 128, "2 × 64-B pages")
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(3 * 12) // entry 3 (cell 3) at the reference's 12-B stride
    assert(bb.getInt() == 7 && bb.getFloat() == -1.5f && bb.getFloat() == 8f)
    assert(bytes.slice(64 + 2 * 12, 128).forall(_ == 0), "partial page zero-padded")
    val back = Traces.readMetaPages(spark, path, n).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(back == Set((3L, 1.5, 2.5), (1L, 17.0, 0.25), (0L, 3.0, 4.0),
      (7L, -1.5, 8.0), (2L, 0.0, 0.0), (4L, 9.0, 10.0), (11L, 12.0, 13.0)))
    // parse_meta_unit's bound: entries past numMeta are never parsed
    assert(Traces.readMetaPages(spark, path, 5L).count() == 5L)
  }

  test("gid;geom CSV interchange sink round-trips") {
    val g = graft.ingest.Workloads.uniformPolygons(spark, 300, 456)
    val dir = java.nio.file.Files.createTempDirectory("gidgeom").resolve("out").toString
    Traces.writeGidGeomCsv(g, dir)
    // the reference header (data_gen.py:70) and `;` separator survive
    import scala.jdk.CollectionConverters._
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".csv")).get
    val first = scala.io.Source.fromFile(part.toFile).getLines().take(2).toSeq
    assert(first.head == "gid;geom")
    assert(first(1).matches("\\d+;POLYGON\\(\\(.*\\)\\)"))
    val back = Traces.readGidGeomCsv(spark, dir).collect().sortBy(_.id)
    val orig = g.collect().sortBy(_.id)
    // generator coords are float32-exact at 2 decimals -> exact round-trip
    assert(back.length == 300)
    (back zip orig).foreach { case (b, o) => assert(b == o, s"$b != $o") }
  }

  test("Arrow batch seam: arrow-routed features == direct mapPartitions features") {
    val docs = graft.ingest.Workloads.syntheticDocs(spark, 700, tokensPerDoc = 20)
    val media = graft.ops.Multimodal.mediaFromDocuments(docs)
    def key(f: graft.ops.MediaFeatures) =
      (f.doc_id, f.kind, f.n_bytes, f.checksum, f.histogram.toSeq)
    val direct = graft.ops.Multimodal.extractFeatures(media).collect().map(key).toSet
    // batchSize 64 forces several multi-batch partitions through the
    // VectorSchemaRoot round-trip
    val arrow = graft.ops.Multimodal.extractFeaturesArrow(media, batchSize = 64)
      .collect().map(key).toSet
    assert(arrow == direct && direct.size == 700)
  }
}
