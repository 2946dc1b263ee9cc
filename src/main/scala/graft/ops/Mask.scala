package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Masking family (SURVEY.md §2.2; geoRpro raster.py:22-113).
 *
 * The reference's masked array is a (data, mask) pair; here a masked
 * cell is a NULL — codegen-friendly tri-state (value / null / sentinel)
 * with `apply_mask` materializing the reference's fill_value=9999
 * convention (routines.py:104, extract.py:149,205) only at the parity
 * boundary.
 */
object Mask {

  /** P1 `mask_vals` (raster.py:22-50): null where value ∈ vals. */
  def maskVals(c: Column, vals: Seq[Any]): Column =
    when(!c.isin(vals: _*), c)

  /** P2 `mask_cond` (raster.py:53-82): null where cond holds. */
  def maskCond(c: Column, cond: Column): Column = when(!cond, c)

  /** P3 `apply_mask` (raster.py:85-113): replace masked (null) cells
    * with fill_value (reference default 0; domain convention 9999). */
  def applyMask(c: Column, fillValue: Any): Column = coalesce(c, lit(fillValue))

  /** P4 sentinel re-detection (extract.py:205-207): drop rows whose
    * band columns are ALL equal to the sentinel. */
  def dropFullyMasked(df: DataFrame, bands: Seq[String], sentinel: Any): DataFrame =
    df.filter(!bands.map(b => col(b) === lit(sentinel)).reduce(_ && _))

  /** P6 value-set semi filter (script/filter_imgs.py:81-96): keep
    * groups whose fraction of `flagged` rows is below `threshold`. */
  def lowCoverage(df: DataFrame, groupCol: String, flagged: Column,
                  threshold: Double): DataFrame =
    df.groupBy(col(groupCol))
      .agg((sum(when(flagged, 1L).otherwise(0L)) / count(lit(1L))).as("cc"))
      .filter(col("cc") < threshold)
}
