package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.WorkflowJson

class WorkflowJsonSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  val sfDir = "/root/testdata/sf0.001"

  val json =
    """{
      |  "density": {
      |    "inp": "pages",
      |    "operations": {
      |      "geotag": {"res": 12},
      |      "tile_density": {"res": 12, "tileRes": 6}
      |    }
      |  },
      |  "window": {
      |    "inp": "pages",
      |    "operations": {
      |      "geotag": {"res": 12},
      |      "clip_window": {"res": 12, "lonMin": 0, "latMin": 40,
      |                      "lonMax": 20, "latMax": 55},
      |      "select": ["tld", "n_chars"]
      |    }
      |  }
      |}""".stripMargin

  test("workflow compiles to the same result as the hand-built plan") {
    val out = WorkflowJson.run(spark, sfDir, json)
    assert(out.keySet == Set("density", "window"))
    val got = out("density").orderBy("tile").collect()
    val want = SparkEntry.qTileDensity(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSeq == want.map(_.getLong(0)).toSeq)
    assert(got.map(_.getLong(1)).toSeq == want.map(_.getLong(1)).toSeq)
    assert(out("window").count() > 0)
  }

  test("unknown operation fails fast with its name") {
    val bad = """{"t": {"inp": "pages", "operations": {"maskkk_raster": {}}}}"""
    val e = intercept[IllegalArgumentException] {
      WorkflowJson.run(spark, sfDir, bad)
    }
    assert(e.getMessage.contains("maskkk_raster"))
  }

  test("unknown attribute fails fast") {
    val bad = """{"t": {"inp": "pages", "outt": "x", "operations": {}}}"""
    val e = intercept[IllegalArgumentException] {
      WorkflowJson.run(spark, sfDir, bad)
    }
    assert(e.getMessage.contains("outt"))
  }
}
