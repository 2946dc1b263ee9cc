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

  test("training-data steps: declarative chain == hand-built pipeline") {
    val j =
      """{
        |  "clean": {
        |    "inp": "documents",
        |    "operations": {
        |      "dedup_near": {"id": "doc_id", "text": "text", "maxHamming": 3},
        |      "quality": {"text": "text"},
        |      "lang_id": {"text": "text"},
        |      "filter": "n_tok >= 3",
        |      "select": ["doc_id", "n_char", "pred_lang"]
        |    }
        |  }
        |}""".stripMargin
    val got = WorkflowJson.run(spark, sfDir, j)("clean")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val docs = graft.sources.Pages.table(spark, sfDir, "documents")
    val want = graft.text.Dedup.keepClusterKeepers(docs, "doc_id",
        graft.text.Dedup.simhashPairs(docs, "doc_id", "text", 3))
      .select(col("doc_id"), length(col("text")).cast("long").as("n_char"),
        graft.text.TextOps.langId(col("text")).as("pred_lang"),
        graft.text.TextOps.nTokens(col("text")).as("n_tok"))
      .filter(col("n_tok") >= 3).drop("n_tok")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.nonEmpty && got.sameElements(want))
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
