package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Versioned Parquet snapshot checkpoints with manifests — the sandbox stand-in
  * for Iceberg snapshot checkpoints (no Iceberg jars offline; same semantics:
  * atomic snapshot id, lineage to input snapshots, per-stage row counts,
  * resume from the last committed id). Layout:
  *
  *   root/<stage>/<snapshotId>/data/part-*.parquet
  *   root/<stage>/<snapshotId>/_manifest.json      (written LAST = commit point)
  *
  * A snapshot directory without `_manifest.json` is uncommitted garbage and is
  * ignored by readers — writes are idempotent and restart-safe.
  */
final class Snapshots(spark: SparkSession, root: String) {

  private def stageDir(stage: String): Path = Paths.get(root, stage)

  /** Committed snapshot ids of a stage, ascending. */
  def committed(stage: String): Seq[Long] = {
    val d = stageDir(stage)
    if (!Files.isDirectory(d)) return Seq.empty
    val stream = Files.list(d)
    try {
      stream.iterator().asScala
        .filter(p => Files.exists(p.resolve("_manifest.json")))
        .flatMap(p => scala.util.Try(p.getFileName.toString.toLong).toOption)
        .toSeq.sorted
    } finally stream.close()
  }

  def latest(stage: String): Option[Long] = committed(stage).lastOption

  /** Write a new snapshot of `df` for `stage`, recording input lineage.
    * Returns the snapshot id. The manifest write is the commit point.
    */
  def commit(stage: String, df: DataFrame, inputs: Map[String, Long] = Map.empty): Long = {
    val id = latest(stage).getOrElse(0L) + 1
    val dir = stageDir(stage).resolve(id.toString)
    val dataDir = dir.resolve("data")
    df.write.mode("overwrite").parquet(dataDir.toString)
    // per-partition lineage: file name -> (row count, order-insensitive
    // content hash: xor-fold of per-row xxhash64 over all columns)
    import org.apache.spark.sql.functions._
    val committedDf = spark.read.parquet(dataDir.toString)
    val files = committedDf
      .select(input_file_name().as("f"),
        xxhash64(committedDf.columns.map(col): _*).as("h"))
      .groupBy("f").agg(count(lit(1)).as("n"), bit_xor(col("h")).as("hash"))
      .collect()
      .map(r => r.getString(0).split('/').last -> (r.getLong(1), r.getLong(2))).toMap
    val rows = files.values.map(_._1).sum
    val manifest =
      s"""{"snapshot_id": $id, "stage": "$stage", "rows": $rows,
         | "inputs": {${inputs.map { case (k, v) => s""""$k": $v""" }.mkString(", ")}},
         | "partitions": {${files.map { case (k, (n, h)) =>
             s""""$k": {"rows": $n, "hash": $h}""" }.mkString(", ")}}}"""
        .stripMargin.replace("\n", "")
    // manifest is the commit point — write to a temp name and move
    // atomically so a crash mid-write can never leave a half manifest that
    // committed() would treat as a commit
    val tmp = dir.resolve("_manifest.json.tmp")
    Files.writeString(tmp, manifest)
    Files.move(tmp, dir.resolve("_manifest.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    id
  }

  /** Read the latest committed snapshot of a stage. */
  def read(stage: String): Option[DataFrame] =
    latest(stage).map(id =>
      spark.read.parquet(stageDir(stage).resolve(id.toString).resolve("data").toString))

  /** The manifest of the latest committed snapshot, raw JSON text. */
  def latestManifest(stage: String): Option[String] =
    latest(stage).map(id => Files.readString(
      stageDir(stage).resolve(id.toString).resolve("_manifest.json")))

  /** True iff the latest snapshot's recorded input lineage EQUALS `inputs` —
    * full-map equality, not substring containment (id 1 must not match a
    * recorded 11, and extra/missing inputs are a mismatch).
    */
  private def lineageMatches(stage: String, inputs: Map[String, Long]): Boolean =
    latestManifest(stage).exists(m => Snapshots.parseInputs(m) == inputs)

  /** Resume-or-compute: reuse the latest committed snapshot only when its
    * recorded input lineage matches the requested inputs; otherwise compute
    * and commit a NEW snapshot version. This is the restart contract: a
    * killed run recomputes only missing stages, and a run whose upstream
    * snapshots changed never silently reuses stale data.
    */
  def getOrCompute(stage: String, inputs: Map[String, Long] = Map.empty)
                  (compute: => DataFrame): DataFrame =
    (if (lineageMatches(stage, inputs)) read(stage) else None).getOrElse {
      commit(stage, compute, inputs)
      read(stage).get
    }
}

object Snapshots {
  /** Parse the `"inputs": {...}` object out of a manifest (the manifests are
    * generated here with known shape — keys and long values only).
    */
  private[graft] def parseInputs(manifest: String): Map[String, Long] = {
    val obj = """"inputs"\s*:\s*\{([^}]*)\}""".r
      .findFirstMatchIn(manifest).map(_.group(1)).getOrElse("")
    """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(obj)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }
}
