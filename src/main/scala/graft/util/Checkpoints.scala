package graft.util

import org.apache.spark.sql.DataFrame

/** Storage control for localCheckpoint()ed relations. */
object Checkpoints {

  /** Release the block storage of a `localCheckpoint()`ed DataFrame.
    * `Dataset.unpersist` only talks to the cache manager and is a no-op
    * for checkpoints — the persisted blocks belong to the internal
    * `LogicalRDD`'s RDD, which otherwise lives until the ContextCleaner
    * notices the plan is unreachable. Safe no-op on any other plan
    * shape. */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case r: org.apache.spark.sql.execution.LogicalRDD =>
      r.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
