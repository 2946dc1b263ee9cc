package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Rasterize / vectorize (SURVEY.md A12 + §2.8 R3 — the graft's tile
 * operators; north_star: "rasterize/vectorize operators that aggregate
 * page density per tile").
 *
 * rasterize: rows-with-cells -> per-tile metric grid (the raster).
 * vectorize: cell grid -> geometry rows (cell bbox as lon/lat bounds),
 * the inverse (cell ids carry their georeference, so this is pure
 * expression arithmetic — no shuffle).
 */
object Tiles {

  /** Page density raster at tileRes from a res-`res` cell table. */
  def rasterize(geo: DataFrame, res: Int, tileRes: Int): DataFrame =
    geo.groupBy(cell_parent(col("cell"), res - tileRes).as("tile"))
      .agg(
        count(lit(1)).as("n_pages"),
        countDistinct("lang").as("n_langs"),
        sum("n_chars").as("sum_chars"))

  /** Cells -> vector features: bbox corners + center, via the decoded
    * grid coords (CellIndex.bounds as Column arithmetic). */
  def vectorize(tiles: DataFrame, tileCol: String = "tile"): DataFrame = {
    val r = shiftright(col(tileCol), 58).cast("int").as("level")
    val n = pow(lit(2.0), shiftright(col(tileCol), 58).cast("double"))
    val x = cell_x(col(tileCol)).cast("double")
    val y = cell_y(col(tileCol)).cast("double")
    tiles.select(
      col("*"),
      r,
      (x / n * 360.0 - 180.0).as("lon_min"),
      (y / n * 180.0 - 90.0).as("lat_min"),
      ((x + 1.0) / n * 360.0 - 180.0).as("lon_max"),
      ((y + 1.0) / n * 180.0 - 90.0).as("lat_max"),
      cell_center_lon(col(tileCol)).as("lon_c"),
      cell_center_lat(col(tileCol)).as("lat_c"))
  }
}
