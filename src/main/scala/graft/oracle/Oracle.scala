package graft.oracle

import graft.geo.GeoTag
import graft.sources.Pages

/**
 * DuckDB-dialect SQL builders that *independently re-derive* the page
 * table, the geotag and the packed-long Morton cell encoding — so the
 * driver's DuckDB oracle verifies the engine's core expressions
 * bit-for-bit (not just row counts). Any drift between
 * `graft.cell.CellIndex`/`graft.geo.GeoTag` and these fragments fails
 * the correctness gate by construction.
 *
 * Only DuckDB runs this SQL (the Spark side uses the native
 * expressions), so DuckDB syntax (`<<`, `&`, `||`) is fine.
 */
object Oracle {

  /** Morton bit-spread replicated as nested shift/mask SQL
    * (CellIndex.spread). Keep `e` a bare column name — the expression
    * nests 2^5 copies of it. */
  private val spreadSteps = Seq(
    16 -> 281470681808895L,    // 0x0000FFFF0000FFFF
    8 -> 71777214294589695L,   // 0x00FF00FF00FF00FF
    4 -> 1085102592571150095L, // 0x0F0F0F0F0F0F0F0F
    2 -> 3689348814741910323L, // 0x3333333333333333
    1 -> 6148914691236517205L) // 0x5555555555555555
  def spread(e: String): String =
    spreadSteps.foldLeft(s"($e)") { case (acc, (sh, m)) =>
      s"((($acc) | (($acc) << $sh)) & $m)"
    }

  val Res58: Long = 288230376151711744L // 1 << 58

  /** hex char at 1-based position i of column `c` -> 0..15. */
  private def hv(c: String, i: Int): String =
    s"(CASE WHEN substr($c,$i,1) BETWEEN '0' AND '9' " +
      s"THEN ascii(substr($c,$i,1))-48 ELSE ascii(substr($c,$i,1))-87 END)"

  /** 16-bit int from 4 hex chars at 0-based offset o0 (GeoTag.h4). */
  def h4(c: String, o0: Int): String =
    s"(${hv(c, o0 + 1)}*4096 + ${hv(c, o0 + 2)}*256 + " +
      s"${hv(c, o0 + 3)}*16 + ${hv(c, o0 + 4)})"

  val tldCase: String = {
    val whens = Pages.tldLadder.init
      .map { case (b, t) => s"WHEN (doc_id % 100) < $b THEN '$t'" }
    (Seq("CASE") ++ whens ++ Seq(s"ELSE '${Pages.tldLadder.last._2}' END"))
      .mkString(" ")
  }

  private def centroidCase(pick: ((Double, Double)) => Double): String = {
    val whens = GeoTag.centroids.toSeq.sortBy(_._1)
      .map { case (t, c) => s"WHEN '$t' THEN ${pick(c)}" }
    (Seq("CASE tld") ++ whens ++ Seq("ELSE NULL END")).mkString(" ")
  }

  /** `pages` CTE body: the deterministic page derivation
    * (mirror of Pages.fromDocuments — keep in sync). */
  val pagesCte: String =
    s"""pages AS (
       |  SELECT doc_id, text, lang, source, n_chars, tld,
       |    'https://h' || CAST(doc_id AS VARCHAR) || '.example.' || tld || '/p' AS url,
       |    'h' || CAST(doc_id AS VARCHAR) || '.example.' || tld AS host,
       |    ${Pages.Epoch} + (doc_id % 86400) * 37 AS ts_epoch,
       |    '<html><head><title>d' || CAST(doc_id AS VARCHAR) || '</title></head><body><p>' || text || '</p></body></html>' AS html_str
       |  FROM (SELECT *, $tldCase AS tld FROM documents)
       |)""".stripMargin

  /** `geo` CTE chain: md5-jittered ccTLD centroid (GeoTag.lonLat). */
  val geoCte: String =
    s"""geo0 AS (SELECT *, md5(host) AS md FROM pages),
       |geo1 AS (SELECT *, ${h4("md", 0)} AS j0, ${h4("md", 4)} AS j4,
       |  ${h4("md", 8)} AS j8, ${h4("md", 12)} AS j12,
       |  ${centroidCase(_._1)} AS clon, ${centroidCase(_._2)} AS clat
       |  FROM geo0),
       |geo AS (SELECT *,
       |  CASE WHEN clon IS NULL THEN j8/65535.0*360.0 - 180.0
       |       ELSE greatest(-179.999, least(179.999, clon + (j0/65535.0 - 0.5)*4.0)) END AS lon,
       |  CASE WHEN clat IS NULL THEN j12/65535.0*140.0 - 70.0
       |       ELSE greatest(-89.999, least(89.999, clat + (j4/65535.0 - 0.5)*4.0)) END AS lat
       |  FROM geo1)""".stripMargin

  /** `enc` CTE: packed-long cell id at resolution r (CellIndex.encode). */
  def encCte(r: Int): String = {
    val n = 1L << r
    s"""cells AS (SELECT *,
       |  greatest(0, least(${n - 1}, CAST(floor((lon + 180.0) / 360.0 * $n.0) AS BIGINT))) AS xi,
       |  greatest(0, least(${n - 1}, CAST(floor((lat + 90.0) / 180.0 * $n.0) AS BIGINT))) AS yi
       |  FROM geo),
       |enc AS (SELECT *, ($r * $Res58 + ${spread("xi")} * 2 + ${spread("yi")}) AS cell FROM cells)""".stripMargin
  }

  /** Full WITH prefix ending in relation `enc` (pages+geo+cell). */
  def geoPrefix(res: Int): String =
    s"WITH $pagesCte,\n$geoCte,\n${encCte(res)}"

  /** SQL for parent cell of a res-r cell, `steps` levels up. */
  def parentSql(cellCol: String, r: Int, steps: Int): String =
    s"(${r - steps} * $Res58 + (($cellCol % $Res58) >> ${2 * steps}))"
}
