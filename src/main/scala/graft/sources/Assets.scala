package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Filename-companion joins over asset listings (SURVEY.md J7/J8).
 *
 * J7 — asset ↔ udm2 companion discovery (geoRpro
 * script/filter_imgs.py:51-79): a Planet asset name is
 * `date_time_sat_unit_asset.tif`; `get_file_info` splits it into the
 * 4-token info prefix and the asset type (1 or 2 words, extension
 * stripped), and `get_udm2` scans the directory for `info*udm2*` files
 * matching an asset-type-specific pattern. The reference's
 * per-file directory rescan becomes ONE equi-join on (dir, info) with
 * the pattern as a join-side predicate — linear, not quadratic, in
 * listing size.
 *
 * J8 — overlap-polygon pairing (geoRpro overlap.py:310-331): reference
 * polys (name contains the ref tile) and target polys are each sorted
 * by the integer formed from ALL digits in the filename and zipped
 * pairwise; each target's full stack is found by matching the tile
 * token (last `_`-token of the stem) against the stacks listing.
 * Relationally: rank each side by the digit key (a window over a FILE
 * LISTING — catalog-scale, thousands of rows, not data-scale) and
 * equi-join on rank, then equi-join tile token against the stacks'
 * leading token.
 */
object Assets {

  /** Parse a listing (`path` column) into (path, dir, name, info,
    * asset): info = first 4 `_`-tokens, asset = remainder with the
    * extension stripped (filter_imgs.py:50-64). Non-conforming names
    * (< 5 tokens) drop. */
  def entries(listing: DataFrame): DataFrame = {
    val name = element_at(split(col("path"), "/"), -1)
    listing
      .withColumn("name", name)
      .withColumn("dir", regexp_extract(col("path"), "^(.*)/[^/]*$", 1))
      .withColumn("info", regexp_extract(col("name"),
        "^([^_]+_[^_]+_[^_]+_[^_]+)_", 1))
      .withColumn("asset", regexp_extract(col("name"),
        "^(?:[^_]+_){4}(.+?)\\.[^.]*$", 1))
      .filter(col("info") =!= "" && col("asset") =!= "")
  }

  /** J7: primary assets joined to their udm2 companion
    * (filter_imgs.py:66-79 `get_udm2` semantics: same dir, same info
    * prefix, name contains 'udm2', pattern by asset type). Emits
    * (asset_path, asset, udm2_path). */
  def withUdm2(listing: DataFrame): DataFrame = {
    val e = entries(listing)
    val primary = e.filter(col("asset").isin("analytic", "ortho_panchromatic"))
      .select(col("path").as("asset_path"), col("dir"), col("info"), col("asset"))
    val udm = e.filter(col("name").contains("udm2"))
      .select(col("dir"), col("info"), col("name").as("uname"),
        col("path").as("udm2_path"))
    primary.join(udm, Seq("dir", "info"))
      .filter(
        (col("asset") === "analytic" &&
          (col("uname").endsWith("ortho_udm2.tif") ||
            col("uname").rlike("[0-9]_udm2\\.tif$"))) ||
        (col("asset") === "ortho_panchromatic" &&
          col("uname").endsWith("panchromatic_udm2.tif")))
      .select("asset_path", "asset", "udm2_path")
  }

  /** All digits of the filename as the reference's sort key
    * (overlap.py:315 `int(''.join(filter(str.isdigit, x)))`).
    * DECIMAL(38,0), not LONG: Python's int is arbitrary-precision and
    * real asset names concatenate past 19 digits — a long cast would
    * NULL silently and scramble the rank pairing. */
  private def digitKey(name: org.apache.spark.sql.Column) =
    regexp_replace(name, "[^0-9]", "").cast("decimal(38,0)")

  /** Two-phase global rank by (key, name) — the zipWithIndex shape:
    * range-repartition on the sort key, per-partition row_number
    * (Window.partitionBy(partition id) — each partition ranks locally,
    * no single-task funnel), then add per-partition offsets computed
    * from the partition counts (collected — one row per PARTITION, a
    * parallelism-scale collect, not data-scale). The rank values are
    * independent of where the range boundaries fall, so the output is
    * deterministic at any parallelism. Replaces the r2 global
    * `Window.orderBy(...)`, which moved the whole listing through ONE
    * task (fine at catalog scale, a funnel at a 10^7-file listing). */
  private def rankByKeyName(df: DataFrame): DataFrame = {
    // localCheckpoint BEFORE reading twice: the counts job and the
    // downstream consumer must see ONE materialization —
    // repartitionByRange samples its bounds with an RDD-id-derived
    // seed, so two executions of the same plan can place a boundary row
    // in different partitions, and offsets computed against one
    // placement would be added to ranks computed against another
    val local = df.repartitionByRange(col("key"), col("name"))
      .withColumn("part_", spark_partition_id())
      .withColumn("lrk_", row_number().over(
        Window.partitionBy("part_").orderBy("key", "name")))
      .localCheckpoint(true)
    val counts = local.groupBy("part_").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L)(_ + _._2).init)
    // offsets join as a broadcast relation, NOT a per-partition
    // when()-chain: at production shuffle.partitions (hundreds+) a
    // nested CASE that deep re-creates the janino 64KB blow-up shape
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("part_", "off_")
    local.join(broadcast(offDf), Seq("part_"))
      .withColumn("rk", (col("lrk_") + col("off_")).cast("int"))
      .drop("part_", "lrk_", "off_")
  }

  /** J8: pair ref/target overlap polys by digit-key order, attach each
    * target's stack by tile token. `polys`/`stacks` are listings with a
    * `path` column. Emits (rk, ref_path, target_path, stack_path). */
  def pairOverlaps(polys: DataFrame, stacks: DataFrame,
                   refTile: String): DataFrame = {
    val p = polys.withColumn("name", element_at(split(col("path"), "/"), -1))
      .withColumn("key", digitKey(col("name")))
    // name tiebreak: Python's sort is stable on equal keys; an explicit
    // total order keeps the rank deterministic at any parallelism.
    // rankByKeyName = two-phase rank (no global single-partition window)
    val refs = rankByKeyName(p.filter(col("name").contains(refTile)))
      .select(col("path").as("ref_path"), col("rk"))
    val targets = rankByKeyName(p.filter(!col("name").contains(refTile))
        .withColumn("tile",
          element_at(split(element_at(split(col("name"), "\\."), 1), "_"), -1)))
      .select(col("path").as("target_path"), col("tile"), col("rk"))
    val s = stacks
      .withColumn("sname", element_at(split(col("path"), "/"), -1))
      .filter(!col("sname").contains(refTile)) // overlap.py:327 f != ref
      .select(col("path").as("stack_path"),
        element_at(split(col("sname"), "_"), 1).as("tile"))
    refs.join(targets, Seq("rk"))
      .join(s, Seq("tile"))
      .select("rk", "ref_path", "target_path", "stack_path")
  }
}
