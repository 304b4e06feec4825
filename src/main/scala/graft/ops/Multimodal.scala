package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed record for an opaque media blob + metadata. */
final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte],
                          width: Int, height: Int, sample_rate: Int)

/** Extracted features — fixed shape regardless of decoder. `checksum` is the
  * md5 hex of the raw blob (cross-engine replayable: DuckDB md5's the same
  * UTF-8 bytes); the histogram comes from the decode stub.
  */
final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                               checksum: String, histogram: Array[Long])

/** Multimodal columns: image/audio/video as opaque `binary` with typed
  * metadata. The Spark-side plumbing (schema, partition-sized batching,
  * iterator-based per-partition processing, fixed feature shape) is real and
  * tested; the actual codec is STUBBED with a deterministic fake — this
  * container has no image/audio libraries, and the decode seam is exactly
  * where a real codec (or a `mapInPandas` python worker) would plug in.
  */
object Multimodal {

  /** Deterministic fake "decode": byte histogram (16 buckets).
    * >>> REAL-CODEC SEAM: replace the body with an actual decoder. <<<
    */
  def decodeStub(media: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](16)
    var i = 0
    while (i < media.length) {
      hist((media(i) & 0xff) >> 4) += 1
      i += 1
    }
    hist
  }

  /** md5 hex of a blob — delegates to the engine-wide digest plumbing
    * ([[graft.functions.OracleHash]]) so there is exactly one md5 path.
    */
  def md5Hex(bytes: Array[Byte]): String = graft.functions.OracleHash.md5Hex(bytes)

  /** Synthesize a media table from the documents table: html-ish bytes as the
    * blob (deterministic), metadata derived from doc_id. Stands in for a real
    * Common-Crawl WARC payload column.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), payloadCol.as("payload"))
      .as[(Long, String)]
      .map { case (id, payload) =>
        MediaRow(id, if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video",
          payload.getBytes("UTF-8"), (id % 640).toInt, (id % 480).toInt, 16000)
      }
  }

  /** Declarative frame sampling over an opaque payload column: fixed-stride
    * windows (`frameLen` units, up to `maxFrames` per blob), each frame
    * fingerprinted with md5 — the video-frame / audio-chunk sampling shape
    * (a real decoder would replace the stride windows with codec frame
    * boundaries; the partitioning, explode and fingerprint plumbing is what
    * the engine owns). Pure column expressions, DuckDB-replayable.
    */
  def sampleFrames(docs: DataFrame, payload: Column,
                   frameLen: Int = 32, maxFrames: Int = 8): DataFrame = {
    val nFrames = least(lit(maxFrames.toLong), (length(payload) / frameLen).cast("long"))
    // guard: sequence(0, -1) would step DOWNWARD in Spark, not yield empty
    val idxs = when(nFrames > 0, sequence(lit(0L), nFrames - 1))
      .otherwise(array().cast("array<bigint>"))
    docs.select(col("doc_id"),
        posexplode(transform(idxs,
          i => md5((payload.substr(i.cast("int") * frameLen + 1, lit(frameLen))).cast("binary")))))
      .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
        col("col").as("frame_md5"))
  }

  /** Declarative "resize" plumbing: nearest-neighbor downsampling by a fixed
    * stride over the opaque payload (every `stride`-th unit survives) —
    * the schema/batch shape of a real image resize, with the interpolation
    * left to the codec seam. Output: surviving-unit count + md5 of the
    * downsampled payload, both DuckDB-replayable.
    */
  def resizeStride(docs: DataFrame, payload: Column, stride: Int = 7): DataFrame = {
    val nOut = ((length(payload) + stride - 1) / stride).cast("long")
    val idxs = when(nOut > 0, sequence(lit(0L), nOut - 1))
      .otherwise(array().cast("array<bigint>"))
    docs.select(col("doc_id"), nOut.as("n_out"),
      md5(concat_ws("", transform(idxs,
        i => payload.substr((i.cast("int") * stride) + 1, lit(1)))).cast("binary")).as("resized_md5"))
  }

  /** DuckDB oracle for [[resizeStride]] over the documents table. */
  def resizeStrideSql(stride: Int = 7): String =
    s"""SELECT doc_id, CAST(ceil(len(p) / ${stride}.0) AS BIGINT) AS n_out,
       |  md5(coalesce((SELECT string_agg(substr(p, CAST(i * $stride + 1 AS INT), 1), '' ORDER BY i)
       |                FROM range(0, 16384) r(i) WHERE i < ceil(len(p) / ${stride}.0)), '')) AS resized_md5
       |FROM (SELECT doc_id, $payloadSql AS p FROM documents)""".stripMargin.replace("\n", " ")

  /** The synthesized html payload as a string column (see
    * [[mediaFromDocuments]]) — shared by the query and the oracle generator.
    */
  def payloadCol: Column =
    concat(lit("<html><body>"), col("text"), lit("</body></html>"))

  val payloadSql: String = "'<html><body>' || text || '</body></html>'"

  /** DuckDB oracle for [[sampleFrames]] over the documents table. */
  def sampleFramesSql(frameLen: Int = 32, maxFrames: Int = 8): String =
    s"""SELECT doc_id, i AS frame_idx, md5(substr(p, CAST(i * $frameLen + 1 AS INT), $frameLen)) AS frame_md5
       |FROM (SELECT doc_id, $payloadSql AS p FROM documents), range(0, $maxFrames) r(i)
       |WHERE i < least($maxFrames, len(p) // $frameLen)""".stripMargin.replace("\n", " ")

  /** Feature extraction over partitions — iterator in, iterator out (never
    * materializes a partition), the same batch shape a vectorized python
    * worker (`mapInPandas`) would see.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val hist = decodeStub(row.media)
        MediaFeatures(row.doc_id, row.kind, row.media.length.toLong,
          md5Hex(row.media), hist)
      }
    }
  }

  // ---- Arrow batch seam ------------------------------------------------------

  /** The SAME feature extraction routed through real Arrow columnar batches —
    * the `mapInPandas`-shaped interchange made EXECUTABLE without a Python
    * runtime: each partition is chunked into `batchSize`-row
    * `VectorSchemaRoot`s (bigint doc_id / varchar kind / varbinary media),
    * handed to a batch worker that reads the Arrow vectors and fills an
    * Arrow output batch (doc_id, kind, n_bytes, checksum, fixed-size-list
    * histogram), which is read back into rows. A real vectorized decoder
    * (python via mapInPandas, or a JNI codec) plugs in by replacing
    * [[featureBatchWorker]] — every schema/batch-shape decision it would
    * need is already exercised here. Output is row-for-row identical to
    * [[extractFeatures]] (spec-asserted).
    */
  def extractFeaturesArrow(media: Dataset[MediaRow], batchSize: Int = 256): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => featureBatchArrow(batch))
    }
  }

  private val HistBuckets = 16

  import org.apache.arrow.memory.RootAllocator
  import org.apache.arrow.vector.{BigIntVector, VarBinaryVector, VarCharVector, VectorSchemaRoot}
  import org.apache.arrow.vector.complex.FixedSizeListVector
  import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}

  private def inSchema: Schema = new Schema(java.util.List.of(
    new Field("doc_id", FieldType.notNullable(new ArrowType.Int(64, true)), null),
    new Field("kind", FieldType.notNullable(ArrowType.Utf8.INSTANCE), null),
    new Field("media", FieldType.notNullable(ArrowType.Binary.INSTANCE), null)))

  private def outSchema: Schema = new Schema(java.util.List.of(
    new Field("doc_id", FieldType.notNullable(new ArrowType.Int(64, true)), null),
    new Field("kind", FieldType.notNullable(ArrowType.Utf8.INSTANCE), null),
    new Field("n_bytes", FieldType.notNullable(new ArrowType.Int(64, true)), null),
    new Field("checksum", FieldType.notNullable(ArrowType.Utf8.INSTANCE), null),
    new Field("histogram", FieldType.notNullable(new ArrowType.FixedSizeList(HistBuckets)),
      java.util.List.of(new Field("item",
        FieldType.notNullable(new ArrowType.Int(64, true)), null)))))

  /** The batch worker: Arrow batch in → Arrow batch out. This is the seam a
    * real vectorized decoder replaces (>>> REAL-CODEC SEAM <<< — same
    * contract as a mapInPandas worker: it sees only columnar batches).
    */
  def featureBatchWorker(in: VectorSchemaRoot, out: VectorSchemaRoot): Unit = {
    val n = in.getRowCount
    val inId = in.getVector("doc_id").asInstanceOf[BigIntVector]
    val inKind = in.getVector("kind").asInstanceOf[VarCharVector]
    val inMedia = in.getVector("media").asInstanceOf[VarBinaryVector]
    val outId = out.getVector("doc_id").asInstanceOf[BigIntVector]
    val outKind = out.getVector("kind").asInstanceOf[VarCharVector]
    val outBytes = out.getVector("n_bytes").asInstanceOf[BigIntVector]
    val outSum = out.getVector("checksum").asInstanceOf[VarCharVector]
    val outHist = out.getVector("histogram").asInstanceOf[FixedSizeListVector]
    val outHistData = outHist.getDataVector.asInstanceOf[BigIntVector]
    var i = 0
    while (i < n) {
      val media = inMedia.get(i)
      val hist = decodeStub(media)
      outId.setSafe(i, inId.get(i))
      outKind.setSafe(i, inKind.get(i))
      outBytes.setSafe(i, media.length.toLong)
      outSum.setSafe(i, md5Hex(media).getBytes("UTF-8"))
      outHist.setNotNull(i)
      var j = 0
      while (j < HistBuckets) { outHistData.setSafe(i * HistBuckets + j, hist(j)); j += 1 }
      i += 1
    }
    out.setRowCount(n)
  }

  /** One full Arrow round-trip for a row batch: rows → input root → worker →
    * output root → rows. Allocator and roots are closed per batch (leak-free
    * regardless of task outcome).
    */
  def featureBatchArrow(rows: Seq[MediaRow]): Seq[MediaFeatures] = {
    val alloc = new RootAllocator(Long.MaxValue)
    try {
      val in = VectorSchemaRoot.create(inSchema, alloc)
      val out = VectorSchemaRoot.create(outSchema, alloc)
      try {
        val inId = in.getVector("doc_id").asInstanceOf[BigIntVector]
        val inKind = in.getVector("kind").asInstanceOf[VarCharVector]
        val inMedia = in.getVector("media").asInstanceOf[VarBinaryVector]
        rows.zipWithIndex.foreach { case (r, i) =>
          inId.setSafe(i, r.doc_id)
          inKind.setSafe(i, r.kind.getBytes("UTF-8"))
          inMedia.setSafe(i, r.media)
        }
        in.setRowCount(rows.length)
        featureBatchWorker(in, out)
        val outId = out.getVector("doc_id").asInstanceOf[BigIntVector]
        val outKind = out.getVector("kind").asInstanceOf[VarCharVector]
        val outBytes = out.getVector("n_bytes").asInstanceOf[BigIntVector]
        val outSum = out.getVector("checksum").asInstanceOf[VarCharVector]
        val outHist = out.getVector("histogram").asInstanceOf[FixedSizeListVector]
        val outHistData = outHist.getDataVector.asInstanceOf[BigIntVector]
        (0 until out.getRowCount).map { i =>
          val hist = Array.tabulate(HistBuckets)(j => outHistData.get(i * HistBuckets + j))
          MediaFeatures(outId.get(i), new String(outKind.get(i), "UTF-8"),
            outBytes.get(i), new String(outSum.get(i), "UTF-8"), hist)
        }
      } finally { in.close(); out.close() }
    } finally alloc.close()
  }
}
