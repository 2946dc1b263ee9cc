package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Source catalog by filename convention (SURVEY.md S9; geoRpro
 * `Sentinel2`, sent2.py:5-75) — band-keyed discovery over a listing.
 *
 * Same filename grammar as the reference (sent2.py:11-18): tile
 * `T\d{2}\D{3}`, 8-digit date, band `B02..B12|B8A|AOT|SCL|TCI|WVP`,
 * trailing word attr; lookup key = band + attr (sent2.py:31-35).
 * Duplicates are checked on the FULL key (band+attr), matching what the
 * reference accepts in practice (sent2.py:27-35 keys B02_10m and
 * B02_20m separately — the normal Sentinel-2 L2A layout where the same
 * band ships at several resolutions); only two entries with the same
 * band AND attr collide. Empty catalog fails like sent2.py:74-75.
 *
 * Two surfaces:
 *  - `entries`: DataFrame path for at-scale listings (regexp_extract +
 *    groupBy-count dup assert — all distributed);
 *  - `Catalog`: the reference's driver-side method surface
 *    (get_fpath/get_datetake/get_tile_number/get_all_bands) for plan
 *    construction, built from a collected listing.
 */
object Catalog {

  val TileRe = "^(T\\d{2}\\D{3})_"
  val DateRe = "^T\\d{2}\\D{3}_(\\d{8})"
  val BandAttrRe =
    "^T\\d{2}\\D{3}_\\d{8}.*_(B(?:02|03|04|05|06|07|08|8A|09|11|12)|AOT|SCL|TCI|WVP)(\\w*)"

  /** Parse a listing DataFrame (one `path` column) into catalog
    * entries; non-matching files drop (sent2.py: unmatched skipped). */
  def entries(listing: DataFrame): DataFrame = {
    val name = element_at(split(col("path"), "/"), -1)
    listing
      .withColumn("tile", regexp_extract(name, TileRe, 1))
      .withColumn("date", regexp_extract(name, DateRe, 1))
      .withColumn("band", regexp_extract(name, BandAttrRe, 1))
      .withColumn("attr", regexp_extract(name, BandAttrRe, 2))
      .filter(col("tile") =!= "" && col("date") =!= "" && col("band") =!= "")
      .withColumn("key", concat(col("band"), col("attr")))
  }

  /** Distributed validation: duplicate keys (band+attr) and emptiness.
    * The returned relation is cached for the caller's chained lookups;
    * callers that are done with it own the unpersist. */
  def validated(listing: DataFrame): DataFrame = {
    val e = entries(listing).cache()
    val dups = e.groupBy("key").count().filter(col("count") > 1)
      .select("key").collect().map(_.getString(0))
    if (dups.nonEmpty) {
      e.unpersist()
      throw new IllegalArgumentException(
        s"Duplicate band '${dups.head}' found. " +
          "The directory must contain unique band+attr keys only.")
    }
    if (e.isEmpty) {
      e.unpersist()
      throw new IllegalArgumentException("No file matching found")
    }
    e
  }

  final case class Entry(path: String, tile: String, date: String,
                         band: String, attr: String) {
    def key: String = band + attr
  }

  /** Driver-side catalog with the reference's method surface. */
  final class Cat(lookup: Map[String, Entry]) {
    def getAllBands: Seq[String] = lookup.keys.toSeq.sorted
    def getFpath(band: String): String = lookup(band).path
    def getFpaths(bands: String*): Seq[String] =
      bands.flatMap(b => lookup.get(b).map(_.path))
    def getDatetake(band: String): Option[String] = lookup.get(band).map(_.date)
    def getTileNumber(band: String): Option[String] = lookup.get(band).map(_.tile)
  }

  def build(spark: SparkSession, paths: Seq[String]): Cat = {
    import spark.implicits._
    val rows = validated(paths.toDF("path"))
      .select("path", "tile", "date", "band", "attr").collect()
      .map(r => Entry(r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)))
    new Cat(rows.map(e => e.key -> e).toMap)
  }
}
