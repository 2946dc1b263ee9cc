package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions._

/**
 * Streaming tile-density maintenance (SURVEY.md §2.10: the reference has
 * NO streaming — this is the one surface the batch engine exposes for
 * continuously-arriving crawl data, kept deliberately thin).
 *
 * Classic Structured Streaming shape: event time = `warc_ts`, watermark
 * bounds state for late pages, tumbling window x tile hash aggregate.
 * The same geotag_cell/cell_parent expressions as the batch path — a
 * streaming DataFrame composes with codegen'd Catalyst expressions
 * unchanged, so batch/stream parity is by construction.
 */
object TileStream {

  /** pages (streaming or batch) with (url, warc_ts) -> per-window tile
    * density. Output mode for sinks: update or append (after watermark). */
  def tileDensity(pages: DataFrame, res: Int, tileRes: Int,
                  windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    pages
      .withColumn("tile",
        cell_parent(geotag_cell(col("url"), res), res - tileRes))
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowLen), col("tile"))
      .agg(count(lit(1)).as("n_pages"))
      .select(col("window.start").as("win_start"), col("tile"), col("n_pages"))
}
