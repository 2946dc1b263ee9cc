package graft.oracle

import graft.geo.Polygon
import Oracle._

/** The DuckDB oracle statement for every SparkEntry query (SURVEY.md §5:
  * the correctness contract). Dialect is DuckDB-only; Spark never runs
  * these. Integer sums are CAST to BIGINT (DuckDB sums to HUGEINT). */
object OracleQueries {

  private val Res = 12
  private val TileRes = 6
  private val JoinRes = 8
  private val firstTen = (0 until 10).map(i => s"'src$i'").mkString(", ")

  val all: Map[String, String] = Map(
    "q_tpch_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        |count(*) AS n_rows FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_tpch_join" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_events_hourly" ->
      """SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_geotag" ->
      s"""${geoPrefix(Res)}
         |SELECT doc_id, url, lon, lat, cell FROM enc ORDER BY doc_id""".stripMargin,

    "q_tile_density" ->
      s"""${geoPrefix(Res)}
         |SELECT ${parentSql("cell", Res, Res - TileRes)} AS tile,
         |  count(*) AS n_pages, count(DISTINCT lang) AS n_langs,
         |  count(DISTINCT source) AS n_sources,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_mask_fill" ->
      s"""WITH $pagesCte
         |SELECT source, count(*) AS n,
         |  CAST(sum(CASE WHEN lang IN ('en','de') THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
         |  CAST(sum(CASE WHEN lang IN ('en','de') THEN 9999 ELSE n_chars END) AS BIGINT) AS sum_b1
         |FROM pages GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_histogram" ->
      s"""WITH $pagesCte
         |SELECT lang, (n_chars // 100) AS bucket, count(*) AS n
         |FROM pages GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_clip_window" ->
      s"""${geoPrefix(Res)}
         |SELECT tld, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM enc
         |WHERE lon >= 0.0 AND lon <= 20.0 AND lat >= 40.0 AND lat <= 55.0
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_clip_poly" ->
      s"""${geoPrefix(Res)}
         |SELECT lang, count(*) AS n, count(DISTINCT tld) AS n_tlds,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM enc WHERE ${pipSql("lon", "lat", Polygon.registry("asia_l"))}
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_extent" ->
      s"""${geoPrefix(Res)}
         |SELECT source AS src, min(lon) AS lon_min, min(lat) AS lat_min,
         |  max(lon) AS lon_max, max(lat) AS lat_max
         |FROM geo GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_overlaps" ->
      s"""${geoPrefixAnd(Res,
        """ext AS (SELECT source AS src, min(lon) AS lon_min, min(lat) AS lat_min,
          |  max(lon) AS lon_max, max(lat) AS lat_max FROM geo GROUP BY 1)""".stripMargin)}
         |SELECT a.src AS src_a, b.src AS src_b,
         |  greatest(a.lon_min, b.lon_min) AS ilon_min,
         |  greatest(a.lat_min, b.lat_min) AS ilat_min,
         |  least(a.lon_max, b.lon_max) AS ilon_max,
         |  least(a.lat_max, b.lat_max) AS ilat_max
         |FROM ext a JOIN ext b ON a.src < b.src
         |  AND a.lon_min <= b.lon_max AND b.lon_min <= a.lon_max
         |  AND a.lat_min <= b.lat_max AND b.lat_min <= a.lat_max
         |ORDER BY 1, 2""".stripMargin,

    "q_semi_points" ->
      s"""${geoPrefixAnd(Res,
        s"""ext AS (SELECT source, lang, min(lon) AS lon_min, min(lat) AS lat_min,
           |  max(lon) AS lon_max, max(lat) AS lat_max FROM geo GROUP BY 1, 2),
           |${pointsChain("customer", "c_custkey", Nil, "c", "cpt")}""".stripMargin)}
         |SELECT source, lang FROM ext e WHERE EXISTS (
         |  SELECT 1 FROM cpt p WHERE p.tld = 'jp'
         |    AND p.lon >= e.lon_min AND p.lon <= e.lon_max
         |    AND p.lat >= e.lat_min AND p.lat <= e.lat_max)
         |ORDER BY 1, 2""".stripMargin,

    "q_resample" ->
      s"""${geoPrefixAnd(Res,
        "base AS (SELECT cell, count(*) AS v FROM enc GROUP BY 1)")}
         |SELECT ${parentSql("cell", Res, 2)} AS cell,
         |  CAST(sum(v) AS BIGINT) AS v_sum, min_by(v, cell) AS v_near
         |FROM base GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_upsample" ->
      s"""${geoPrefixAnd(Res,
        s"tiles AS (SELECT ${parentSql("cell", Res, Res - TileRes)} AS tile, count(*) AS n_pages FROM enc GROUP BY 1)")}
         |SELECT (${TileRes + 1} * $Res58 + ((tile % $Res58) * 4 + u.i)) AS cell, n_pages
         |FROM tiles, (SELECT unnest([0, 1, 2, 3]) AS i) u ORDER BY 1""".stripMargin,

    "q_pyramid" -> {
      val base = "base AS (SELECT cell, count(*) AS v FROM enc GROUP BY 1)"
      val levels = (TileRes until Res).map { r =>
        s"UNION ALL SELECT $r, ${parentSql("cell", Res, Res - r)}, CAST(sum(v) AS BIGINT) FROM base GROUP BY 2"
      }.mkString("\n")
      s"""${geoPrefixAnd(Res, base)}
         |SELECT $Res AS level, cell, CAST(v AS BIGINT) AS v FROM base
         |$levels
         |ORDER BY level, cell""".stripMargin
    },

    "q_vectorize" -> {
      val x = compactSql(s"((tile % $Res58) >> 1)")
      val y = compactSql(s"(tile % $Res58)")
      val n = (1 << TileRes).toDouble
      s"""${geoPrefixAnd(Res,
        s"""tiles AS (SELECT ${parentSql("cell", Res, Res - TileRes)} AS tile, count(*) AS n_pages FROM enc GROUP BY 1),
           |dense AS (SELECT tile, n_pages FROM tiles WHERE n_pages >= 5),
           |xy AS (SELECT tile, n_pages, $x AS x, $y AS y FROM dense)""".stripMargin)}
         |SELECT tile, n_pages, $TileRes AS level,
         |  CAST(x AS DOUBLE) / $n * 360.0 - 180.0 AS lon_min,
         |  CAST(y AS DOUBLE) / $n * 180.0 - 90.0 AS lat_min,
         |  (CAST(x AS DOUBLE) + 1.0) / $n * 360.0 - 180.0 AS lon_max,
         |  (CAST(y AS DOUBLE) + 1.0) / $n * 180.0 - 90.0 AS lat_max,
         |  (CAST(x AS DOUBLE) + 0.5) / $n * 360.0 - 180.0 AS lon_c,
         |  (CAST(y AS DOUBLE) + 0.5) / $n * 180.0 - 90.0 AS lat_c
         |FROM xy ORDER BY tile""".stripMargin
    },

    "q_stack_indexes" -> {
      val bsiA = s"(${real("swir")} + ${real("red")})"
      val bsiB = s"(${real("nir")} + ${real("blue")})"
      s"""${geoPrefixAnd(10,
        """bands AS (SELECT cell, CAST(sum(n_chars) AS BIGINT) AS red,
          |  count(*) * 500 AS nir, CAST(sum(doc_id % 100) AS BIGINT) AS green,
          |  max(n_chars) AS swir, min(n_chars) AS blue FROM enc GROUP BY 1)""".stripMargin)}
         |SELECT cell,
         |  ${normDiffSql(real("nir"), real("red"))} AS ndvi,
         |  ${normDiffSql(real("nir"), real("swir"))} AS nbr,
         |  ${normDiffSql(bsiA, bsiB)} AS bsi,
         |  ${normDiffSql(real("green"), real("nir"))} AS ndwi
         |FROM bands ORDER BY cell""".stripMargin
    },

    "q_mosaic" ->
      s"""${geoPrefixAnd(Res,
        s"""a AS (SELECT cell, CAST(sum(n_chars) AS BIGINT) AS v FROM enc
           |  WHERE source IN ($firstTen) GROUP BY 1),
           |b AS (SELECT cell, CAST(sum(n_chars) AS BIGINT) AS v FROM enc
           |  WHERE source NOT IN ($firstTen) GROUP BY 1),
           |u AS (SELECT cell, v, 0 AS src_rank FROM a WHERE v % 10 <> 0
           |  UNION ALL SELECT cell, v, 1 AS src_rank FROM b WHERE v % 10 <> 0)""".stripMargin)}
         |SELECT cell, min_by(v, src_rank) AS v, min(src_rank) AS src_rank
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_calibrate" ->
      s"""${geoPrefixAnd(JoinRes,
        s"""x AS (SELECT cell, lang, count(*) AS x FROM enc
           |  WHERE source IN ($firstTen) GROUP BY 1, 2),
           |y AS (SELECT cell, lang, count(*) AS y FROM enc
           |  WHERE source NOT IN ($firstTen) GROUP BY 1, 2),
           |p AS (SELECT x.cell, x.lang, x.x, y.y FROM x JOIN y
           |  ON x.cell = y.cell AND x.lang = y.lang),
           |s AS (SELECT lang, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
           |  CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*x) AS BIGINT) AS sxx,
           |  CAST(sum(y*y) AS BIGINT) AS syy, CAST(sum(x*y) AS BIGINT) AS sxy
           |  FROM p GROUP BY 1)""".stripMargin)}
         |SELECT lang, n,
         |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
         |  (CAST(sy AS DOUBLE) - CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
         |  CAST((n*sxy - sx*sy) * (n*sxy - sx*sy) AS DOUBLE) / CAST((n*sxx - sx*sx) * (n*syy - sy*sy) AS DOUBLE) AS r2
         |FROM s ORDER BY lang""".stripMargin,

    "q_correction" ->
      s"""${geoPrefixAnd(10,
        "base AS (SELECT cell, count(*) AS v FROM enc GROUP BY 1)")}
         |SELECT cell,
         |  (CASE WHEN v*7 - 10 < 0 THEN v*7 ELSE v*7 - 10 END) % 65536 AS corrected
         |FROM base ORDER BY cell""".stripMargin,

    "q_extract" ->
      s"""${geoPrefixAnd(JoinRes,
        s"""raster AS (SELECT cell, count(*) AS n_pages,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM enc GROUP BY 1),
           |${pointsChain("customer", "c_custkey", Seq("c_mktsegment"), "c", "cpt")},
           |${encChain("cpt", JoinRes, "cptc")}""".stripMargin)}
         |SELECT p.pid, p.c_mktsegment AS segment, r.n_pages, r.sum_chars
         |FROM cptc p JOIN raster r ON p.cell = r.cell ORDER BY p.pid""".stripMargin,

    "q_knn" ->
      s"""${geoPrefixAnd(JoinRes,
        s"""${pointsChain("nation", "n_nationkey", Nil, "n", "npt")},
           |d AS (SELECT p.pid AS qid, e.doc_id AS id,
           |  ((e.lon - p.lon) * (e.lon - p.lon) + (e.lat - p.lat) * (e.lat - p.lat)) AS dist2
           |  FROM npt p CROSS JOIN enc e),
           |r AS (SELECT qid, id, dist2,
           |  row_number() OVER (PARTITION BY qid ORDER BY dist2, id) AS rank FROM d)""".stripMargin)}
         |SELECT qid, rank, id, dist2 FROM r WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin
  )
}
