package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.oracle.Oracle
import graft.sources.Pages

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator family from SURVEY.md §2
  * over the driver's parquet tables; the paired `oracleSql` re-derives
  * the same result in DuckDB SQL (including the geotag + Morton cell
  * encoding, re-implemented independently in SQL by graft.oracle.Oracle)
  * so the correctness gate checks the engine bit-for-bit.
  */
object SparkEntry {

  /** Working resolution for fine cells (4096 x 4096 world grid). */
  val Res = 12
  /** Tile resolution for density rollups (64 x 64 world grid). */
  val TileRes = 6

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qTileDensity(spark, "/root/testdata/sf0.001")

  /** S1/S2 scan + A1-style agg on lineitem — harness sanity anchor. */
  def qTpchAgg(spark: SparkSession, dir: String): DataFrame =
    Pages.table(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** F16 + F15: deterministic geotag + packed-long cell encode
    * (codegen'd Catalyst expressions), verified bit-for-bit. */
  def qGeotag(spark: SparkSession, dir: String): DataFrame =
    Pages.geoPages(spark, dir, Res)
      .select(col("doc_id"), col("url"), col("lon"), col("lat"), col("cell"))
      .orderBy("doc_id")

  /** A12/R3 flagship: per-tile page density (parent rollup of res-12
    * cells to res-6 tiles) — scan -> geotag -> cell -> hash agg. */
  def qTileDensity(spark: SparkSession, dir: String): DataFrame =
    Pages.geoPages(spark, dir, Res)
      .groupBy(cell_parent(col("cell"), Res - TileRes).as("tile"))
      .agg(
        count(lit(1)).as("n_pages"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("tile")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_agg" -> (qTpchAgg _),
    "q_geotag" -> (qGeotag _),
    "q_tile_density" -> (qTileDensity _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_tpch_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        |count(*) AS n_rows FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_geotag" ->
      s"""${Oracle.geoPrefix(Res)}
         |SELECT doc_id, url, lon, lat, cell FROM enc ORDER BY doc_id""".stripMargin,

    "q_tile_density" ->
      s"""${Oracle.geoPrefix(Res)}
         |SELECT ${Oracle.parentSql("cell", Res, Res - TileRes)} AS tile,
         |  count(*) AS n_pages, count(DISTINCT lang) AS n_langs,
         |  count(DISTINCT source) AS n_sources, sum(n_chars) AS sum_chars
         |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
