package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cell.CellIndex

/**
 * Iceberg-style cell-partitioned store (SURVEY.md §4.4; north_rule:
 * "explicit range-partitioning by cell prefix"). No Iceberg runtime jar
 * ships in this image (§7.4), so the layout is plain parquet with the
 * same pruning surface:
 *
 *  - directory partition column `cell_prefix = cell >> prefixShift`
 *    (the Iceberg partition transform analog) → partition pruning;
 *  - `repartitionByRange(cell)` + `sortWithinPartitions(cell)` before
 *    write → tight per-file/row-group min/max stats on `cell` → range
 *    predicates prune files and row groups (the `load_window` pushdown,
 *    geoRpro raster.py:388-392, now on STORAGE rather than in GDAL).
 *
 * `scanCover` is the read path every windowed/clipped scan uses: coarse
 * cover cells → merged descendant ranges → partition filter on
 * cell_prefix + BETWEEN disjunction on cell (pushdown-friendly on this
 * stored column; the derived-column binary-search path in Clip is for
 * computed cells).
 */
object TileStore {

  val DefaultPrefixShift = 14

  /** Write `df` (must carry a LONG `cell` column) cell-range-partitioned. */
  def write(df: DataFrame, path: String,
            prefixShift: Int = DefaultPrefixShift,
            numRanges: Int = 0): Unit = {
    val withPrefix = df.withColumn("cell_prefix",
      shiftrightunsigned(col("cell"), prefixShift))
    val ranged =
      if (numRanges > 0)
        withPrefix.repartitionByRange(numRanges, col("cell"))
      else withPrefix.repartitionByRange(col("cell"))
    ranged.sortWithinPartitions("cell")
      .write.partitionBy("cell_prefix").mode("overwrite").parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Above this many merged ranges, fall back to prefix pruning + one
    * binary-search probe (a 1000-term BETWEEN disjunction costs more in
    * filter evaluation than it saves in row-group pruning). */
  val MaxStoredDisjuncts = 64

  /** Cover-pruned scan: partition filter on cell_prefix + cell range
    * predicate (both reach the parquet reader). */
  def scanCover(spark: SparkSession, path: String, cover: Array[Long],
                res: Int, prefixShift: Int = DefaultPrefixShift): DataFrame = {
    val flat = CellIndex.coverRanges(cover, res)
    val prefixPred = flat.grouped(2).map { case Array(lo, hi) =>
      col("cell_prefix").between(lo >>> prefixShift, hi >>> prefixShift)
    }.reduce(_ || _)
    val cellPred =
      if (flat.length / 2 <= MaxStoredDisjuncts)
        flat.grouped(2).map { case Array(lo, hi) => col("cell").between(lo, hi) }
          .reduce(_ || _)
      else graft.functions.cell_in_ranges(col("cell"), flat)
    read(spark, path).filter(prefixPred).filter(cellPred)
  }
}
