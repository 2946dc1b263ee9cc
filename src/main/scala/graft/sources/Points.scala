package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Labeled point tables (the GeoDataFrame `(geometry, classname, id)`
 * analog, geoRpro extract.py:160-161), derived deterministically from a
 * keyed driver table: key -> tld via the ladder on (key*7)%100, host
 * '<prefix><key>.geo.<tld>', coordinates via the same geotagger as
 * pages. Mirror of Oracle.pointsChain — keep in sync.
 */
object Points {

  /** e.g. fromTable(spark, dir, "customer", "c_custkey",
    *   Seq("c_mktsegment"), "c") -> (pid, <extras>, tld, url, lon, lat). */
  def fromTable(spark: SparkSession, dir: String, table: String,
                keyCol: String, extraCols: Seq[String],
                prefix: String): DataFrame = {
    import graft.functions._
    val t = Pages.table(spark, dir, table)
      .select((col(keyCol).as("pid") +: extraCols.map(col)): _*)
      .withColumn("tld", Pages.tldLadderCol((col("pid") * 7) % 100))
      .withColumn("url",
        concat(lit(s"https://$prefix"), col("pid"), lit(".geo."),
          col("tld"), lit("/p")))
    t.withColumn("lon", geotag_lon(col("url")))
      .withColumn("lat", geotag_lat(col("url")))
  }
}
