package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.cell.CellIndex
import graft.functions._
import graft.geo.Polygon

/**
 * Clip operators (SURVEY.md S3/S4; geoRpro raster.py:359-422).
 *
 * Both clips are *prefilter + exact refine* so the cheap part pushes
 * down to the scan:
 *  - the coarse-cover prefilter turns into a set of contiguous
 *    descendant cell-id RANGES (`cell BETWEEN lo AND hi OR ...`) —
 *    range predicates on the sort/partition column reach parquet
 *    min/max stats (the load_window pushdown analog, raster.py:388-392);
 *  - the exact residual predicate (box bounds / ray-casting PIP) runs
 *    codegen'd on the surviving rows only.
 */
object Clip {

  /** Above this many merged ranges the prefilter switches from an
    * OR-of-BETWEEN disjunction (parquet min/max pushdown-friendly on a
    * STORED cell column) to one binary-search probe (`cell_in_ranges`).
    * The disjunction re-inlines the cell expression per disjunct when
    * `cell` is derived, so large covers would blow janino's 64KB
    * method limit and silently fall back to interpreted eval. */
  val MaxDisjuncts = 12

  /** Cover prefilter predicate for a set of coarse cover cells. */
  def coverRangePredicate(cellCol: Column, cover: Array[Long], res: Int): Column = {
    val flat = CellIndex.coverRanges(cover, res)
    if (flat.length / 2 <= MaxDisjuncts)
      flat.grouped(2).map { case Array(lo, hi) => cellCol.between(lo, hi) }
        .reduce(_ || _)
    else cell_in_ranges(cellCol, flat)
  }

  /** S3 `load_window`: rectangular clip. `res` = resolution of the
    * `cell` column; coverRes = coarse prefilter resolution. */
  def window(df: DataFrame, res: Int,
             lonMin: Double, latMin: Double, lonMax: Double, latMax: Double,
             coverRes: Int = 6): DataFrame = {
    val cover = CellIndex.coverRect(lonMin, latMin, lonMax, latMax, coverRes)
    df.filter(coverRangePredicate(col("cell"), cover, res))
      .filter(col("lon") >= lonMin && col("lon") <= lonMax &&
        col("lat") >= latMin && col("lat") <= latMax)
  }

  /** S4 `load_raster_from_poly`: polygon clip = cover prefilter + exact
    * ray-casting PIP expression. The reference raises on no overlap
    * (raster.py:417-419); in a lazy plan that check is the caller's
    * (empty result), kept as `requireNonEmpty` for parity call sites. */
  def byPolygon(df: DataFrame, poly: Polygon, res: Int,
                coverRes: Int = 6): DataFrame = {
    val cover = poly.coverCells(coverRes)
    df.filter(coverRangePredicate(col("cell"), cover, res))
      .filter(point_in_poly(col("lon"), col("lat"), poly))
  }

  /** ValueError-on-no-overlap parity (raster.py:417-419). Eager. */
  def requireNonEmpty(df: DataFrame): DataFrame = {
    if (df.isEmpty)
      throw new IllegalArgumentException(
        "Input shapes do not overlap raster.")
    df
  }
}
