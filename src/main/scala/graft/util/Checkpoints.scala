package graft.util

import org.apache.spark.sql.DataFrame

/** Storage control for checkpoint()ed / localCheckpoint()ed relations. */
object Checkpoints {

  /** Release the storage of a checkpointed DataFrame.
    * `Dataset.unpersist` only talks to the cache manager and is a no-op
    * for checkpoints — the persisted state belongs to the internal
    * `LogicalRDD`'s RDD. Two cases:
    *  - localCheckpoint: executor block storage; released via
    *    `rdd.unpersist` (otherwise it lives until the ContextCleaner
    *    notices the plan is unreachable);
    *  - reliable checkpoint(): files under the checkpoint dir, which
    *    Spark never deletes during the job unless
    *    spark.cleaner.referenceTracking.cleanCheckpoints is on —
    *    deleted here directly via the Hadoop FS (the RDD is superseded
    *    by contract of the caller, so its files are dead).
    * Only call on relations nothing references anymore. Safe no-op on
    * any other plan shape. */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case r: org.apache.spark.sql.execution.LogicalRDD =>
      r.rdd.getCheckpointFile match {
        case Some(path) =>
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
        case None => r.rdd.unpersist(blocking = false)
      }
    case _ => ()
  }
}
