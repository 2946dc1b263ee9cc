package graft.geo

/**
 * Deterministic URL -> (lon, lat) geotagger (SURVEY.md §2.5 F16).
 *
 * The reference georeferences rasters via an affine transform
 * (geoRpro raster.py:450-455); web pages have no native coordinates, so
 * the graft derives them *purely* from the URL: the host's ccTLD picks a
 * country centroid and an md5-based jitter of the full host spreads pages
 * around it. Hosts with an unknown/generic TLD scatter uniformly.
 *
 * Everything here is reproducible in SQL (md5 hex + ascii arithmetic) so
 * the DuckDB oracle can replicate it bit-for-bit:
 *
 *   md   = md5_hex(host)                       (lowercase, 32 chars)
 *   h4(o)= hexval(md[o])*4096 + hexval(md[o+1])*256
 *        + hexval(md[o+2])*16 + hexval(md[o+3])        (0-based o)
 *   jlon = (h4(0)/65535.0 - 0.5) * 4.0
 *   jlat = (h4(4)/65535.0 - 0.5) * 4.0
 *   known tld:   lon = clamp(clon + jlon), lat = clamp(clat + jlat)
 *   unknown tld: lon = h4(8)/65535.0*360 - 180 ; lat = h4(12)/65535.0*140 - 70
 *
 * ccTLD centroid jitter makes hot cells (every *.de page lands within
 * +-2 degrees of one point) — deliberately pathological for skew testing
 * (SURVEY.md §4.3, salting + AQE).
 */
object GeoTag {

  /** ccTLD -> (centroid lon, centroid lat). Fixed public country
    * centroids; ordering irrelevant (pure lookup). */
  val centroids: Map[String, (Double, Double)] = Map(
    "de" -> (10.45, 51.17),
    "ru" -> (105.32, 61.52),
    "jp" -> (138.25, 36.20),
    "uk" -> (-3.44, 55.38),
    "fr" -> (2.21, 46.23),
    "br" -> (-51.93, -14.24),
    "in" -> (78.96, 20.59),
    "cn" -> (104.20, 35.86),
    "it" -> (12.57, 41.87),
    "nl" -> (5.29, 52.13),
    "pl" -> (19.15, 51.92),
    "es" -> (-3.75, 40.46),
    "au" -> (133.78, -25.27),
    "us" -> (-95.71, 37.09)
  )

  def hostOf(url: String): String = {
    val m = java.util.regex.Pattern.compile("^https?://([^/]+)").matcher(url)
    if (m.find()) m.group(1) else ""
  }

  def tldOf(host: String): String = {
    val i = host.lastIndexOf('.')
    if (i < 0) "" else host.substring(i + 1)
  }

  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  @inline private def hexval(c: Char): Int =
    if (c <= '9') c - '0' else c - 'a' + 10

  /** 16-bit int from 4 hex chars of md at 0-based offset o. */
  @inline def h4(md: String, o: Int): Int =
    hexval(md.charAt(o)) * 4096 + hexval(md.charAt(o + 1)) * 256 +
      hexval(md.charAt(o + 2)) * 16 + hexval(md.charAt(o + 3))

  @inline private def clampLon(v: Double): Double =
    math.max(-179.999, math.min(179.999, v))
  @inline private def clampLat(v: Double): Double =
    math.max(-89.999, math.min(89.999, v))

  /** (lon, lat) of a url. Pure; total (empty host hashes too). */
  def lonLat(url: String): (Double, Double) = {
    val host = hostOf(url)
    val md = md5Hex(host)
    centroids.get(tldOf(host)) match {
      case Some((clon, clat)) =>
        (clampLon(clon + (h4(md, 0) / 65535.0 - 0.5) * 4.0),
          clampLat(clat + (h4(md, 4) / 65535.0 - 0.5) * 4.0))
      case None =>
        (h4(md, 8) / 65535.0 * 360.0 - 180.0,
          h4(md, 12) / 65535.0 * 140.0 - 70.0)
    }
  }

  def lon(url: String): Double = lonLat(url)._1
  def lat(url: String): Double = lonLat(url)._2
}
