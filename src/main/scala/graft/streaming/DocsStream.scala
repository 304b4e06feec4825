package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingestion of a documents corpus with in-flight exact dedup —
  * the streaming face of [[graft.ops.Dedup.exactDedup]]: content-hash state
  * drops re-arrivals of identical text across micro-batches. The reference
  * has no streaming at all; this is part of the graft's training-data
  * pipeline surface (continuous corpus ingestion).
  */
object DocsStream {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docsSchema).parquet(dir)

  /** Exact streaming dedup on the md5 of the text. State is one 128-bit key
    * per distinct document, kept forever (`dropDuplicates`) — at web scale
    * you bound it with `withWatermark` + `dropDuplicatesWithinWatermark`
    * (same plan, state TTL'd by event time); the corpus table has no event
    * time, so the unbounded variant is the honest one here. Works on batch
    * frames too (dropDuplicates is the batch operator).
    */
  def dedupedDocs(docs: DataFrame): DataFrame =
    docs.withColumn("h", md5(col("text"))).dropDuplicates("h").drop("h")
}
