package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Catalog
import graft.util.Batching

class CatalogSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark

  val listing = Seq(
    "/data/T37MBN_20170718T075211_B02.jp2",
    "/data/T37MBN_20170718T075211_B8A_20m.jp2",
    "/data/T37MBN_20170718T075211_SCL_20m.jp2",
    "/data/T37MBN_20170718T075211_TCI.jp2",
    "/data/notes.txt", // unmatched -> dropped
    "/data/README.md")

  test("catalog parses tile/date/band/attr; key = band+attr") {
    val cat = Catalog.build(spark, listing)
    assert(cat.getAllBands == Seq("B02", "B8A_20m", "SCL_20m", "TCI"))
    assert(cat.getFpath("B8A_20m") == "/data/T37MBN_20170718T075211_B8A_20m.jp2")
    assert(cat.getDatetake("B02").contains("20170718"))
    assert(cat.getTileNumber("SCL_20m").contains("T37MBN"))
    assert(cat.getFpaths("B02", "nope", "TCI").length == 2)
  }

  test("duplicate band+attr key fails; attr-qualified variants are fine") {
    // same band at another resolution = a DIFFERENT key (B02 vs B02_10m)
    // — the normal Sentinel-2 L2A layout the reference accepts
    // (sent2.py:27-35 keys them separately)
    val multiRes = listing :+ "/other/T37MBN_20190812T073619_B02_10m.jp2"
    val cat = Catalog.build(spark, multiRes)
    assert(cat.getAllBands.contains("B02") && cat.getAllBands.contains("B02_10m"))
    // a second attr-less B02 collides on the full key -> rejected
    val dup = listing :+ "/other/T37MBN_20190812T073619_B02.jp2"
    val e = intercept[IllegalArgumentException](Catalog.build(spark, dup))
    assert(e.getMessage.contains("Duplicate band 'B02'"))
  }

  test("empty catalog fails (sent2.py:74-75)") {
    val e = intercept[IllegalArgumentException](
      Catalog.build(spark, Seq("/data/nothing.txt")))
    assert(e.getMessage.contains("No file matching"))
  }

  test("sizeof_fmt matches the reference's format ladder (F12)") {
    assert(Batching.sizeofFmt(0) == "0.0B")
    assert(Batching.sizeofFmt(1023) == "1023.0B")
    assert(Batching.sizeofFmt(1536) == "1.5KiB")
    assert(Batching.sizeofFmt(3 * 1024.0 * 1024.0) == "3.0MiB")
    assert(Batching.sizeofFmt(-2048) == "-2.0KiB")
    assert(Batching.sizeofFmt(math.pow(1024.0, 8) * 2) == "2.0YiB")
  }

  test("Batching matches the reference doctests (utils.py:77-78,96-97)") {
    assert(Batching.genSublist(Seq(1, 2, 3, 4, 5, 6, 7), 3).toSeq ==
      Seq(Seq(1, 2, 3), Seq(4, 5, 6), Seq(7)))
    assert(Batching.genCurrentFrontPairs(Seq(1, 2, 3)).toSeq ==
      Seq((1, 2), (1, 3), (2, 3)))
    assert(Batching.genCurrentFrontPairs(Seq(1)).toSeq == Seq())
  }
}
