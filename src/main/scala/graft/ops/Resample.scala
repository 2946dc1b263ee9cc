package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Re-grid operators (SURVEY.md §2.8; geoRpro raster.py:425-464
 * `load_resample` + the R3 tile pyramid).
 *
 * Cell ids carry their own georeference, so resampling is pure index
 * arithmetic: downsample = one shuffle (groupBy parent), upsample =
 * shuffle-free explode of children. GDAL's `Resampling.nearest` default
 * becomes the deterministic "value of the Morton-first child" selector
 * (min cell id — explicit total-order tiebreak, SURVEY.md §7.4
 * determinism note).
 */
object Resample {

  /** Downsample `steps` levels with an aggregate chosen per semantics:
    * "nearest" (Morton-first child value — GDAL nearest parity),
    * "mean", "min", "max", "sum", "count". */
  def downsample(df: DataFrame, valueCol: String, steps: Int,
                 how: String = "nearest"): DataFrame = {
    val parent = cell_parent(col("cell"), steps).as("cell")
    val v = col(valueCol)
    val agg: Column = how match {
      case "nearest" => min_by(v, col("cell")).as(valueCol)
      case "mean" => avg(v).as(valueCol)
      case "min" => min(v).as(valueCol)
      case "max" => max(v).as(valueCol)
      case "sum" => sum(v).as(valueCol)
      case "count" => count(lit(1)).as(valueCol)
      case other => throw new IllegalArgumentException(s"how=$other")
    }
    df.groupBy(parent).agg(agg)
  }

  /** Upsample one level: each cell explodes to its 4 children carrying
    * the parent value (nearest = copy; raster.py scale>1 path).
    * Narrow (no shuffle). */
  def upsample(df: DataFrame, valueCols: Seq[String]): DataFrame = {
    val cols = valueCols.map(col)
    df.select((explode(cell_children(col("cell"))).as("cell") +: cols): _*)
  }

  /** R3 pyramid: roll level r up to [minRes..r], each level built FROM
    * THE PREVIOUS one (child results reused, SURVEY.md §2.4) — returns
    * the union tagged by a `level` column. Aggregates must be
    * re-aggregable (sum/count/min/max).
    *
    * Cache lifetime: every level stays persisted until the caller's
    * final action (the union references them all); release with
    * clearCache/unpersist afterwards. At warehouse scale prefer
    * [[graft.sources.TileStore.writePyramid]], which streams each level
    * to storage and unpersists as it climbs. */
  def pyramid(base: DataFrame, res: Int, minRes: Int,
              valueCol: String, how: String = "sum"): DataFrame = {
    require(how == "sum" || how == "count" || how == "min" || how == "max")
    val reAgg = if (how == "count") "sum" else how
    var level = base.withColumn("level", lit(res))
    var out = level
    var r = res
    while (r > minRes) {
      // persist each level: the union's branches would otherwise each
      // recompute the whole rollup chain below them
      level = downsample(level.drop("level"), valueCol, 1, if (r == res) how else reAgg)
        .withColumn("level", lit(r - 1))
        .persist()
      out = out.unionByName(level)
      r -= 1
    }
    out
  }
}
