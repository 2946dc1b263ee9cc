package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.cell.CellIndex
import graft.geo.{GeoTag, Polygon}
import graft.functions._

/**
 * Codegen-path parity: every Catalyst expression evaluated THROUGH SPARK
 * (whole-stage codegen) must equal the pure kernel called directly.
 * Catches doGenCode bugs that nullSafeEval-only tests would miss.
 */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  val seeds: Seq[Long] = 0L until 300L

  lazy val coords = seeds.map { i =>
    val rnd = new scala.util.Random(i)
    (i, rnd.nextDouble() * 359.9 - 179.95, rnd.nextDouble() * 179.9 - 89.95)
  }.toDF("id", "lon", "lat")

  test("cell_of matches CellIndex.encode through codegen") {
    val got = coords.select($"id", cell_of($"lon", $"lat", 12).as("c"))
      .orderBy("id").collect().map(_.getLong(1))
    val want = coords.orderBy("id").collect()
      .map(r => CellIndex.encode(r.getDouble(1), r.getDouble(2), 12))
    assert(got.sameElements(want))
  }

  test("cell_parent / cell_x / cell_y / centers match kernels") {
    val rows = coords.select(
      cell_of($"lon", $"lat", 12).as("c"),
      cell_parent(cell_of($"lon", $"lat", 12), 3).as("p"),
      cell_x(cell_of($"lon", $"lat", 12)).as("x"),
      cell_y(cell_of($"lon", $"lat", 12)).as("y"),
      cell_center_lon(cell_of($"lon", $"lat", 12)).as("clon"),
      cell_center_lat(cell_of($"lon", $"lat", 12)).as("clat")).collect()
    rows.foreach { r =>
      val c = r.getLong(0)
      assert(r.getLong(1) == CellIndex.parent(c, 3))
      assert(r.getLong(2) == CellIndex.xOf(c))
      assert(r.getLong(3) == CellIndex.yOf(c))
      assert(r.getDouble(4) == CellIndex.centerLon(c))
      assert(r.getDouble(5) == CellIndex.centerLat(c))
    }
  }

  test("cell_children / cell_disk / cell_ring match kernels") {
    val rows = coords.limit(50).select(
      cell_of($"lon", $"lat", 10).as("c"),
      cell_children(cell_of($"lon", $"lat", 10)).as("kids"),
      cell_disk(cell_of($"lon", $"lat", 10), 2).as("disk"),
      cell_ring(cell_of($"lon", $"lat", 10), 2).as("ring")).collect()
    rows.foreach { r =>
      val c = r.getLong(0)
      assert(r.getSeq[Long](1) == CellIndex.children(c).toSeq)
      assert(r.getSeq[Long](2) == CellIndex.disk(c, 2).toSeq)
      assert(r.getSeq[Long](3) == CellIndex.ring(c, 2).toSeq)
    }
  }

  test("geotag_lon/lat match GeoTag kernel through codegen") {
    val urls = (0 until 200).map(i => (i.toLong,
      s"https://h$i.example.${if (i % 3 == 0) "de" else "zz"}/p"))
      .toDF("id", "url")
    val rows = urls.select($"url",
      geotag_lon($"url").as("lon"), geotag_lat($"url").as("lat")).collect()
    rows.foreach { r =>
      val (lon, lat) = GeoTag.lonLat(r.getString(0))
      assert(r.getDouble(1) == lon && r.getDouble(2) == lat)
    }
  }

  test("geotag_cell == cell_of(geotag_lon, geotag_lat) (fusion parity)") {
    val urls = (0 until 200).map(i => (i.toLong,
      s"https://h$i.example.${if (i % 3 == 0) "jp" else "zz"}/p"))
      .toDF("id", "url")
    val rows = urls.select(
      geotag_cell($"url", 12).as("fused"),
      cell_of(geotag_lon($"url"), geotag_lat($"url"), 12).as("composed"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("cell_in_ranges matches CellIndex.inRanges through codegen") {
    val flat = CellIndex.coverRanges(
      CellIndex.coverRect(0.0, 0.0, 90.0, 60.0, 6), 12)
    val rows = coords.select($"lon", $"lat",
      cell_in_ranges(cell_of($"lon", $"lat", 12), flat).as("in"))
      .collect()
    rows.foreach { r =>
      val c = CellIndex.encode(r.getDouble(0), r.getDouble(1), 12)
      assert(r.getBoolean(2) == CellIndex.inRanges(c, flat))
    }
  }

  test("point_in_poly matches kernel through codegen (concave)") {
    val poly = Polygon.registry("asia_l")
    val rows = coords.select($"lon", $"lat",
      point_in_poly($"lon", $"lat", poly).as("in")).collect()
    rows.foreach { r =>
      assert(r.getBoolean(2) == poly.contains(r.getDouble(0), r.getDouble(1)))
    }
  }

  test("expressions survive null inputs (nullIntolerant -> null out)") {
    val df = Seq((Some(1.0), Some(2.0)), (None, Some(2.0))).toDF("lon", "lat")
    val out = df.select(cell_of($"lon", $"lat", 5).as("c")).collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }

  test("SQL registration works (registerAll)") {
    registerAll(spark)
    val r = spark.sql(
      "SELECT cell_parent(cell_of(10.0D, 45.0D, 12), 6) AS p").collect()(0)
    assert(r.getLong(0) == CellIndex.parent(CellIndex.encode(10.0, 45.0, 12), 6))
    val iv = spark.sql(
      "SELECT ivf_cells(quantize_q(array(CAST(0.5 AS FLOAT), CAST(-0.25 AS FLOAT))), 2) AS p")
      .collect()(0).getInt(0)
    assert((iv >> 8) >= 0 && (iv >> 8) < graft.vector.Ann.NumCentroids &&
      (iv & 255) != (iv >> 8))
  }

  test("GraftExtensions injects the surface at session build time") {
    // a fresh session over the SAME context picks up the extensions
    // (the spark.sql.extensions deployment path)
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql("SELECT cell_of(10.0D, 20.0D, 8) AS c").collect()(0)
      assert(r.getLong(0) == CellIndex.encode(10.0, 20.0, 8))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("plan stays in whole-stage codegen (no UDF fallback)") {
    val df = spark.range(1000)
      .select(($"id" % 360 - 180).cast("double").as("lon"),
        ($"id" % 180 - 90).cast("double").as("lat"))
    val plan = df.select(cell_of($"lon", $"lat", 12))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project")) // '*' = inside WholeStageCodegen
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
