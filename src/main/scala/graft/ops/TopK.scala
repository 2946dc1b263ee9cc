package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Shared two-phase per-group top-k (W4): the scale-safe replacement for
 * `Window.partitionBy(group).orderBy(score).row_number <= k`.
 *
 * The window formulation shuffles EVERY candidate row of a group into
 * one task and sorts the lot — at 10^12 corpus rows that is a
 * single-reducer full-corpus sort per query. Here the bounded-heap
 * aggregate (graft.functions.topk_by) keeps at most k entries per group
 * per input partition on the MAP side, so the exchange carries
 * <= numPartitions * k rows per group and the final merge is O(parts*k)
 * — identical results (the (score, id) order is total), verified
 * against the same DuckDB window-function oracle.
 */
object TopK {

  /** scored(groupCols..., idCol, scoreCol) -> (groupCols..., rank, id,
    * scoreCol) with rank 1..k best-first. */
  def perGroup(scored: DataFrame, groupCols: Seq[String], scoreCol: String,
               idCol: String, k: Int, ascending: Boolean): DataFrame = {
    import graft.functions.topk_by
    scored
      .groupBy(groupCols.map(col): _*)
      .agg(topk_by(col(scoreCol), col(idCol), k, ascending).as("_top"))
      .select(groupCols.map(col) :+ posexplode(col("_top")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).as("rank"),
        col("col.id").as(idCol),
        col("col.score").as(scoreCol)): _*)
  }
}
