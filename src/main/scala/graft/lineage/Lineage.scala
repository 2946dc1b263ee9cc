package graft.lineage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Per-partition checkpoint/lineage + resume (north_rule requirement;
 * SURVEY.md §7.5).
 *
 * A job plans its work as coarse cells (tile ranges); each completed
 * unit appends a manifest row `(job_id, snapshot_id, cell, rows_in,
 * rows_out)` AFTER its output lands — so on resume, output without a
 * manifest row is re-run (idempotent because output is overwritten per
 * cell). Resume = planned cells LEFT ANTI manifest for the same
 * (job_id, snapshot_id) — no driver-side state, pure relational.
 *
 * Storage is Iceberg-style partitioned parquet (no Iceberg runtime jar
 * in this image — SURVEY.md §7.4); `snapshotId` stands in for the
 * Iceberg snapshot id. [[graft.sources.TileStore.commit]] is the
 * versioned-write surface that mints snapshot ids, appends these
 * manifest rows alongside the data files, and publishes the snapshot
 * marker as the atomic commit point (read-at-snapshot via
 * TileStore.readAt/scanCoverAt).
 */
object Lineage {

  val ManifestSchema = "job_id STRING, snapshot_id STRING, cell LONG, " +
    "rows_in LONG, rows_out LONG, completed_at LONG"

  def manifestPath(base: String): String = s"$base/_graft_manifest"

  def readManifest(spark: SparkSession, base: String): DataFrame = {
    // Hadoop FileSystem, not java.io.File — the store may be HDFS/S3/
    // anything with a registered scheme, not just the local FS
    val path = new org.apache.hadoop.fs.Path(manifestPath(base))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.schema(ManifestSchema).parquet(manifestPath(base))
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(ManifestSchema))
  }

  /** Append completion records for finished cells. */
  def recordCompleted(spark: SparkSession, base: String, jobId: String,
                      snapshotId: String, completed: DataFrame): Unit =
    completed
      .select(lit(jobId).as("job_id"), lit(snapshotId).as("snapshot_id"),
        col("cell"), col("rows_in"), col("rows_out"),
        lit(System.currentTimeMillis()).as("completed_at"))
      .write.mode("append").parquet(manifestPath(base))

  /** Planned cells minus completed cells for (job, snapshot). */
  def pending(planned: DataFrame, manifest: DataFrame, jobId: String,
              snapshotId: String): DataFrame =
    planned.join(
      manifest.filter(col("job_id") === jobId &&
        col("snapshot_id") === snapshotId).select("cell"),
      Seq("cell"), "left_anti")

  /** Run `work` over the pending plan and RECORD completion.
    * `planned` must carry a `cell` column (one row per work unit);
    * `work` must have LANDED its outputs by the time it returns (it
    * performs its own writes) and return the per-cell completion
    * relation `(cell, rows_in, rows_out)` — which is then appended to
    * the manifest, so the next invocation's pending set excludes it.
    * Returns the completion relation it recorded. */
  def resumableRun(spark: SparkSession, base: String, jobId: String,
                   snapshotId: String, planned: DataFrame)
                  (work: DataFrame => DataFrame): DataFrame = {
    val todo = pending(planned, readManifest(spark, base), jobId, snapshotId)
    val completed = work(todo)
    recordCompleted(spark, base, jobId, snapshotId, completed)
    completed
  }
}
