package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Cell-ring-expansion kNN join (SURVEY.md §2.3 mandate; no reference
 * counterpart — north_star requirement).
 *
 * For each query point: probe pages whose cell lies in the Chebyshev
 * disk of radius r around the query cell; a candidate set is EXACT once
 * kth-distance² <= (r·cellHeight)² — any point outside disk(r) is at
 * least r·cellHeight degrees away (grid geometry; lon cells are wider
 * than lat cells, so cellHeight is the conservative bound). Unfinished
 * queries double r; past `maxRadius` the (tiny) residue falls back to a
 * broadcast brute-force pass — still exact, still deterministic.
 *
 * Distance = squared planar degrees, tiebreak = (dist2, id): a total
 * order, so results are identical at any parallelism.
 *
 * Scale shape: the *query* side is broadcast (points are the small
 * dimension, J1-style); the pages side is only ever probed via the cell
 * equi-join — no shuffle of the big side beyond the join itself, and
 * each round's join touches only unfinished queries.
 */
object Knn {

  /** points: (qid, qlon, qlat); pages: (cell, id, lon, lat).
    * Returns (qid, rank, id, dist2) with rank 1..k. */
  def knnJoin(points: DataFrame, pages: DataFrame, res: Int, k: Int,
              initRadius: Int = 4, maxRadius: Int = 16): DataFrame = {
    val cellH = 180.0 / (1L << res).toDouble
    val dist2 = (col("lon") - col("qlon")) * (col("lon") - col("qlon")) +
      (col("lat") - col("qlat")) * (col("lat") - col("qlat"))
    val byDist = Window.partitionBy("qid").orderBy(col("dist2"), col("id"))

    def topkOf(cands: DataFrame): DataFrame =
      cands.withColumn("dist2", dist2)
        .withColumn("rank", row_number().over(byDist))
        .filter(col("rank") <= k)
        .select("qid", "rank", "id", "dist2")

    // The query side is SMALL by contract (it is broadcast into the
    // cell probe), so loop bookkeeping — which queries are done — is
    // collected to the driver instead of spending an anti-join +
    // isEmpty job per round: each round costs exactly one Spark job
    // (the done-set collect over the cached round top-k).
    var pending = points
      .withColumn("qcell", cell_of(col("qlon"), col("qlat"), res))
      .cache()
    var nPending = pending.count()
    var results: DataFrame = null
    var r = initRadius
    while (r <= maxRadius && nPending > 0) {
      val probe = pending
        .withColumn("cell", explode(cell_disk(col("qcell"), r)))
      val cands = pages.join(broadcast(probe), Seq("cell"))
      val topk = topkOf(cands).cache() // <= |pending| * k rows
      // exact iff k found AND kth distance STRICTLY within the disk
      // guarantee (any point outside disk(r) is >= r*cellH away; strict
      // < also rules out an equal-distance outside point winning the
      // (dist2, id) tiebreak with a smaller id)
      val doneIds = topk.groupBy("qid")
        .agg(count(lit(1)).as("cnt"), max("dist2").as("kth"))
        .filter(col("cnt") === k && col("kth") < lit((r * cellH) * (r * cellH)))
        .select("qid").collect().map(_.get(0)).toSeq // keep qid's own type
      if (doneIds.nonEmpty) {
        val finished = topk.filter(col("qid").isInCollection(doneIds))
        results = if (results == null) finished else results.unionByName(finished)
        pending = pending.filter(!col("qid").isInCollection(doneIds))
        nPending -= doneIds.length
      }
      r *= 2
    }
    if (nPending > 0) {
      // residual brute force: tiny query set x full pages (queries in
      // regions emptier than disk(maxRadius) — still exact)
      val cands = pages.crossJoin(broadcast(pending.drop("qcell")))
      results = if (results == null) topkOf(cands)
        else results.unionByName(topkOf(cands))
    }
    results
  }
}
