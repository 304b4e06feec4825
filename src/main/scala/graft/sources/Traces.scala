package graft.sources

import graft.geom.Geom
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Readers/writers for the reference's interchange formats.
  *
  *  - text trace (`C_*.txt`): first line `num_rows`, then
  *    `id xlow xhigh ylow yhigh` per line, `%.2f` floats
  *    (`spatial-join-baseline/cpp/singlethread.cpp:62-91`,
  *    `data_gen/data_gen.py:69-76`). Values are float32 in the reference —
  *    parsed via float and widened, so golden counts carry over.
  *  - WKT (`POLYGON((x y, …))` / `POINT(x y)`) as consumed by the
  *    SpatialSpark/PostGIS scripts (`data_gen.py:77-83,117-123`). Parsing
  *    extracts the MBR (the reference never evaluates exact polygon
  *    geometry — SURVEY.md §1.1).
  */
object Traces {

  /** Distributed text-trace scan. The header line (single field) is dropped
    * per-partition — at cluster scale the file splits across executors and
    * only the first split carries it.
    */
  def readTextTrace(spark: SparkSession, path: String): Dataset[Geom] = {
    import spark.implicits._
    spark.read.text(path).select(split(trim(col("value")), "\\s+").as("f"))
      .filter(size(col("f")) === 5)
      .select(
        element_at(col("f"), 1).cast("long").as("id"),
        element_at(col("f"), 2).cast("float").cast("double").as("xmin"),
        element_at(col("f"), 3).cast("float").cast("double").as("xmax"),
        element_at(col("f"), 4).cast("float").cast("double").as("ymin"),
        element_at(col("f"), 5).cast("float").cast("double").as("ymax"))
      .as[Geom]
  }

  /** CPython '%.2f' rounds HALF_EVEN; Java's rounds HALF_UP — format via
    * BigDecimal so adversarial tie values (x.xx5) match the reference bytes.
    */
  private def f2(v: Double): String =
    new java.math.BigDecimal(v).setScale(2, java.math.RoundingMode.HALF_EVEN).toPlainString

  /** Write a dataset as a reference-format trace (header line + `%.2f`
    * rows, id-sorted). Distributed: rows are formatted and written by an
    * executor task, never collected to the driver (a sequential text format
    * is inherently single-writer, but the writer is a task, not the driver
    * heap). `path` becomes a directory of one part file — [[readTextTrace]]
    * reads it transparently.
    */
  def writeTextTrace(ds: Dataset[Geom], path: String): Unit = {
    import ds.sparkSession.implicits._
    val n = ds.count()
    ds.repartition(1).sortWithinPartitions("id")
      .mapPartitions { it =>
        val body = it.map(g =>
          s"${g.id} ${f2(g.xmin)} ${f2(g.xmax)} ${f2(g.ymin)} ${f2(g.ymax)}")
        Iterator(n.toString) ++ body
      }
      .write.mode("overwrite").text(path)
  }

  // ---- binary object trace (reference S2) ----------------------------------
  // 64-B page layout (`spatial-join-on-FPGA-PBSM/scripts/nontree_data_gen/
  // txt_to_bin.py:42-66`): page 0 = int32-LE object count zero-padded to 64 B;
  // every following page holds 3 obj_t records (int32 id + 4×float32, 20 B
  // each) + 4 pad bytes; the final page is zero-padded. Zero padding is
  // indistinguishable from a real id-0 origin point, so the header count
  // decides which trailing records are real.

  private final val PageSize = 64
  private final val ObjSize = 20
  private final val ObjsPerPage = 3

  /** Distributed binary-trace scan: fixed-length 64-B records split across
    * executors (`binaryRecords`), header read once driver-side.
    */
  def readBinaryTrace(spark: SparkSession, path: String): Dataset[Geom] = {
    import spark.implicits._
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hPath)
    val hdr = new Array[Byte](4)
    try in.readFully(hdr) finally in.close()
    val count = java.nio.ByteBuffer.wrap(hdr)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt.toLong
    val pages = spark.sparkContext.binaryRecords(path, PageSize).zipWithIndex()
    val objs = pages.filter(_._2 > 0).flatMap { case (page, pageIdx) =>
      val bb = java.nio.ByteBuffer.wrap(page).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until ObjsPerPage).iterator.flatMap { j =>
        val objIdx = (pageIdx - 1) * ObjsPerPage + j
        if (objIdx < count) {
          bb.position(j * ObjSize)
          Some(Geom(bb.getInt().toLong,
            bb.getFloat().toDouble, bb.getFloat().toDouble,
            bb.getFloat().toDouble, bb.getFloat().toDouble))
        } else None
      }
    }
    spark.createDataset(objs)
  }

  /** Write the reference 64-B-page binary trace. Like [[writeTextTrace]] the
    * sequential format is single-writer, but the writer is an executor task
    * (no driver collect); float32 narrowing matches the reference's
    * `struct.pack('iffff', ...)`.
    */
  def writeBinaryTrace(ds: Dataset[Geom], path: String): Unit = {
    val n = ds.count()
    require(n <= Int.MaxValue, s"binary trace header is int32; got $n rows")
    // ship the SESSION's Hadoop configuration to the executor task (a bare
    // `new Configuration()` would silently drop S3A credentials / HDFS
    // settings on any non-default filesystem; readBinaryTrace already uses
    // the session conf)
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      ds.sparkSession.sparkContext.hadoopConfiguration)
    ds.repartition(1).sortWithinPartitions("id").foreachPartition {
      (it: Iterator[Geom]) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(hadoopConf.value)
        val out = fs.create(p, true)
        try {
          val header = java.nio.ByteBuffer.allocate(PageSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          header.putInt(n.toInt)
          out.write(header.array())
          val page = java.nio.ByteBuffer.allocate(PageSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var inPage = 0
          it.foreach { g =>
            require(g.id == g.id.toInt.toLong,
              s"binary trace obj_t id is int32; id ${g.id} out of range")
            page.putInt(g.id.toInt)
            page.putFloat(g.xmin.toFloat); page.putFloat(g.xmax.toFloat)
            page.putFloat(g.ymin.toFloat); page.putFloat(g.ymax.toFloat)
            inPage += 1
            if (inPage == ObjsPerPage) {
              out.write(page.array()); page.clear()
              java.util.Arrays.fill(page.array(), 0.toByte)
              inPage = 0
            }
          }
          if (inPage > 0) out.write(page.array())
        } finally out.close()
    }
  }

  // ---- partition-meta pages (reference §1.2 `partition_meta_t`) ------------
  // 64-B page = 5 × 12-B entries — int32 count + float32 x + float32 y,
  // little-endian, 12-B stride, zero-padded tail (`types.hpp:33-39`; pack
  // `partition_utils.hpp:352-380`; FPGA parse `PEs.hpp:25-70`). Per occupied
  // cell the A stream carries (count, min_X, min_Y) and the B stream
  // (count, max_X, max_Y) (`partition_multi.hpp:243-244`). The file has NO
  // header: the entry count travels out-of-band (the reference passes
  // `num_meta` as a kernel argument), because a zero-padded entry is
  // indistinguishable from a count-0 cell at the origin.

  private final val MetaSize = 12
  private final val MetaPerPage = 5

  /** Write per-partition metadata `(cell, count, x, y)` as the reference's
    * 64-B meta pages, in ascending cell order (= the reference's partition
    * stream order). Returns the entry count the reader needs. The writer is
    * an executor task (no driver collect), like [[writeBinaryTrace]].
    */
  def writeMetaPages(df: org.apache.spark.sql.DataFrame, path: String): Long = {
    val n = df.count()
    require(n <= Int.MaxValue, s"meta count is int32 out-of-band; got $n entries")
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.select(col("cell").cast("long").as("cell"), col("count").cast("long").as("count"),
        col("x").cast("float").as("x"), col("y").cast("float").as("y"))
      .repartition(1).sortWithinPartitions("cell")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(hadoopConf.value)
        val out = fs.create(p, true)
        try {
          val page = java.nio.ByteBuffer.allocate(PageSize)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          var inPage = 0
          it.foreach { r =>
            val c = r.getLong(1)
            require(c >= 0 && c <= Int.MaxValue, s"partition_meta_t count is int32; got $c")
            page.putInt(c.toInt)
            page.putFloat(r.getFloat(2)); page.putFloat(r.getFloat(3))
            inPage += 1
            if (inPage == MetaPerPage) {
              out.write(page.array()); page.clear()
              java.util.Arrays.fill(page.array(), 0.toByte)
              inPage = 0
            }
          }
          if (inPage > 0) out.write(page.array())
        } finally out.close()
      }
    n
  }

  /** Distributed meta-page scan (`binaryRecords`, 64-B records): yields
    * `(count, x, y)` with coordinates through float32, honoring `numMeta`
    * exactly like `parse_meta_unit`'s `meta_in_current_page` bound — padding
    * entries past it are never parsed.
    */
  def readMetaPages(spark: SparkSession, path: String,
                    numMeta: Long): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val pages = spark.sparkContext.binaryRecords(path, PageSize).zipWithIndex()
    pages.flatMap { case (page, pageIdx) =>
      val bb = java.nio.ByteBuffer.wrap(page).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until MetaPerPage).iterator.flatMap { j =>
        val idx = pageIdx * MetaPerPage + j
        if (idx < numMeta) {
          bb.position(j * MetaSize)
          Some((bb.getInt().toLong, bb.getFloat().toDouble, bb.getFloat().toDouble))
        } else None
      }
    }.toDF("meta_count", "x", "y") // not "count" — a reserved word in oracle SQL
  }

  private val numRe = "-?[0-9]+(?:\\.[0-9]+)?(?:[eE][-+]?[0-9]+)?"

  /** Parse WKT POINT/POLYGON text into an MBR struct
    * `(xmin, xmax, ymin, ymax)` — pure column expressions (codegen'd).
    */
  def parseWktMbr(wkt: Column): Column = {
    val nums = transform(regexp_extract_all(wkt, lit(numRe), lit(0)), _.cast("double"))
    val xs = filter(nums, (_, i) => i % 2 === 0)
    val ys = filter(nums, (_, i) => i % 2 === 1)
    when(size(nums) >= 2 && size(nums) % 2 === 0,
      struct(array_min(xs).as("xmin"), array_max(xs).as("xmax"),
             array_min(ys).as("ymin"), array_max(ys).as("ymax")))
  }

  /** Format an MBR as the reference's WKT (degenerate → POINT). */
  def toWkt(xmin: Column, xmax: Column, ymin: Column, ymax: Column): Column = {
    def f(c: Column) = format_string("%.2f", c)
    when(xmin === xmax && ymin === ymax,
      concat(lit("POINT("), f(xmin), lit(" "), f(ymin), lit(")")))
      .otherwise(concat(
        lit("POLYGON(("),
        f(xmin), lit(" "), f(ymin), lit(", "),
        f(xmin), lit(" "), f(ymax), lit(", "),
        f(xmax), lit(" "), f(ymax), lit(", "),
        f(xmax), lit(" "), f(ymin), lit(", "),
        f(xmin), lit(" "), f(ymin), lit("))")))
  }

  /** WKT scan: text file → parsed MBRs with line ids (SpatialSpark's
    * `textFile + zipWithIndex` pattern, `SpatialJoinApp.scala:160-169`);
    * parse failures are dropped (reference P4).
    */
  def readWkt(spark: SparkSession, path: String): Dataset[Geom] = {
    import spark.implicits._
    spark.read.text(path)
      .select(monotonically_increasing_id().as("id"), parseWktMbr(col("value")).as("m"))
      .filter(col("m").isNotNull)
      .select(col("id"), col("m.xmin").as("xmin"), col("m.xmax").as("xmax"),
              col("m.ymin").as("ymin"), col("m.ymax").as("ymax"))
      .as[Geom]
  }

  /** OSM-dump ingest (reference `data_gen/process_OSM.py:50-116`): lines are
    * `obj_id \t WKT \t [tags]`; the MBR comes from the WKT coordinates ONLY
    * (tags carry free text full of numbers — postcodes, phone numbers — and
    * must never reach the coordinate regex). A line is dropped when it
    * mirrors any of the reference's skip rules:
    *   1. contains `GEOMETRYCOLLECTION`, or has no `POLYGON` at all
    *      (`process_OSM.py:53-57`);
    *   2. has fewer than 5 coordinate pairs (`:93` — the reference's intent
    *      is skip; its code actually falls through with valid=True and a
    *      zero extent, which its callers never emit — we drop outright);
    *   3. a coordinate pair fails the reference's float() loop (`:103-107`):
    *      each comma-delimited pair is space-split (empties dropped, `:97-101`)
    *      and its FIRST TWO tokens must fully float-parse. Exactly like the
    *      loop, trailing extra tokens are IGNORED (it never touches
    *      `c_pair[2:]`), a 1-token pair fails (its `c_pair[1]` IndexError),
    *      and a numeric substring inside a junk token ("1.0x") does NOT
    *      count — the r5 numeric-substring-count check diverged on all three;
    *   4. has no id / WKT field (malformed tab structure).
    * The MBR likewise uses each pair's first two tokens (`:108-111`). The
    * `POLYGON ((` / `))` wrappers are stripped first, as the reference's
    * literal `.replace` does (`:61`) — we also tolerate the spaceless
    * `POLYGON((` our own [[toWkt]] emits.
    */
  def readOsmWkt(spark: SparkSession, path: String): Dataset[Geom] = {
    import spark.implicits._
    val parts = split(col("value"), "\t")
    // try_element_at: a tab-less malformed line must drop, not throw (ANSI)
    val poly = try_element_at(parts, lit(2))
    val id = try_element_at(parts, lit(1)).cast("long")
    // what Python float() accepts (sign, decimal forms, exponent); inf/nan
    // never occur in OSM dumps and are deliberately out — as are float()'s
    // underscore digit groups ('1_0' → 10.0) and whitespace-padded tokens,
    // which likewise cannot occur in OSM dumps (r6 advice: the divergence
    // is intentional and recorded here)
    val floatRe = "^[+-]?((\\d+\\.?\\d*)|(\\.\\d+))([eE][+-]?\\d+)?$"
    val segs = split(regexp_replace(regexp_replace(poly,
      lit("POLYGON\\s*\\(\\("), lit("")), lit("\\)\\)"), lit("")), lit(","))
    def toks(seg: Column) = filter(split(seg, " "), t => t =!= lit(""))
    // try_element_at: null (→ row dropped / never selected) instead of an
    // ANSI index error — And is not contractually short-circuiting in every
    // plan shape, so a 1-token pair must not be able to throw
    def pairOk(seg: Column) = {
      val t = toks(seg)
      size(t) >= 2 && try_element_at(t, lit(1)).rlike(floatRe) &&
        try_element_at(t, lit(2)).rlike(floatRe)
    }
    val xs = transform(segs, s => try_element_at(toks(s), lit(1)).cast("double"))
    val ys = transform(segs, s => try_element_at(toks(s), lit(2)).cast("double"))
    spark.read.text(path)
      .filter(!col("value").contains("GEOMETRYCOLLECTION") &&
        col("value").contains("POLYGON") && size(parts) >= 2 && id.isNotNull)
      .filter(size(segs) >= 5 && forall(segs, pairOk))
      .select(id.as("id"),
        array_min(xs).as("xmin"), array_max(xs).as("xmax"),
        array_min(ys).as("ymin"), array_max(ys).as("ymax"))
      .as[Geom]
  }

  /** External-interchange sink (reference `data_gen/data_gen.py:77-81`): the
    * `gid;geom` CSV consumed by PostGIS-style loaders — header line, `;`
    * separator, `%.2f` WKT polygons in the reference's corner order
    * (xlo ylo → xlo yhi → xhi yhi → xhi ylo → close).
    */
  def writeGidGeomCsv(ds: Dataset[Geom], path: String): Unit =
    ds.toDF().select(col("id").as("gid"),
        toWkt(col("xmin"), col("xmax"), col("ymin"), col("ymax")).as("geom"))
      .write.mode("overwrite")
      .option("sep", ";").option("header", "true")
      .csv(path)

  /** Round-trip reader for [[writeGidGeomCsv]] output. Coordinates pass
    * through float32 (like every reference trace consumer of the `%.2f`
    * text formats), so a written trace reads back bit-identically.
    */
  def readGidGeomCsv(spark: SparkSession, path: String): Dataset[Geom] = {
    import spark.implicits._
    def f32(c: Column) = c.cast("float").cast("double")
    spark.read.option("sep", ";").option("header", "true").csv(path)
      .select(col("gid").cast("long").as("id"), parseWktMbr(col("geom")).as("m"))
      .filter(col("m").isNotNull)
      .select(col("id"), f32(col("m.xmin")).as("xmin"), f32(col("m.xmax")).as("xmax"),
              f32(col("m.ymin")).as("ymin"), f32(col("m.ymax")).as("ymax"))
      .as[Geom]
  }
}
