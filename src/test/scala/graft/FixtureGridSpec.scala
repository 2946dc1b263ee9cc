package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Mask, Indexes, Mosaic, Calibrate}

/**
 * Golden tests on the reference's 10x15 fixture raster (FIXTURES.md §1:
 * geoRpro/tests/band.tif decoded pixel matrix) re-derived as a cell
 * table, pinning mask / fill / histogram / index semantics against
 * hand-computed expectations — the reference itself ships no tests
 * (SURVEY.md §5), so this grid is the closest thing to its ground truth.
 */
class FixtureGridSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  /** band.tif pixel matrix, row-major from top-left (FIXTURES.md). */
  val band1: Array[Int] = Array(
    93, 92, 92, 92, 92, 92, 92, 92, 92, 92,
    94, 92, 93, 95, 95, 95, 95, 94, 93, 92,
    94, 93, 95, 96, 96, 96, 97, 96, 95, 94,
    95, 95, 96, 97, 96, 97, 97, 97, 97, 96,
    96, 97, 96, 96, 97, 97, 97, 98, 98, 97,
    97, 96, 96, 96, 98, 98, 97, 97, 97, 97,
    97, 95, 96, 97, 99, 98, 97, 96, 96, 96,
    97, 96, 97, 98, 97, 97, 97, 97, 96, 95,
    96, 97, 98, 97, 95, 95, 96, 97, 96, 94,
    96, 96, 96, 96, 93, 93, 94, 96, 96, 95,
    95, 94, 94, 94, 92, 92, 92, 95, 96, 95,
    93, 92, 91, 91, 93, 92, 92, 93, 93, 94,
    92, 91, 90, 90, 93, 93, 92, 91, 92, 93,
    91, 92, 91, 91, 93, 92, 91, 91, 92, 93,
    90, 92, 93, 94, 94, 93, 91, 91, 92, 93)

  /** (pixel index as cell id, value) table. */
  lazy val grid = band1.zipWithIndex
    .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("cell", "v")

  test("value histogram matches FIXTURES.md (A1 parity)") {
    val expected = Map(90 -> 3, 91 -> 11, 92 -> 25, 93 -> 18, 94 -> 12,
      95 -> 16, 96 -> 29, 97 -> 28, 98 -> 7, 99 -> 1)
    val got = grid.groupBy("v").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1).toInt).toMap
    assert(got == expected)
  }

  test("mask_vals + apply_mask(9999): P1/P3 parity on the fixture") {
    val masked = grid.select(
      Mask.applyMask(Mask.maskVals($"v", Seq(92, 93)), 9999).as("b"))
    val n9999 = masked.filter($"b" === 9999).count()
    assert(n9999 == 25 + 18) // hist(92) + hist(93)
    // unmasked values unchanged
    assert(masked.filter($"b" =!= 9999).count() == 150 - 43)
  }

  test("mask_cond: P2 (NDVI-threshold-style predicate mask)") {
    val masked = grid.select(Mask.maskCond($"v", $"v" > 96).as("b"))
    assert(masked.filter($"b".isNull).count() == 28 + 7 + 1) // 97,98,99
  }

  test("dropFullyMasked: P4 drops rows where ALL bands are sentinel") {
    val two = grid.select($"cell",
      Mask.applyMask(Mask.maskVals($"v", Seq(92)), 9999).as("b1"),
      Mask.applyMask(Mask.maskVals($"v", Seq(92, 93)), 9999).as("b2"))
    // fully masked iff v == 92 (b1 AND b2 both 9999)
    assert(Mask.dropFullyMasked(two, Seq("b1", "b2"), 9999).count() == 150 - 25)
  }

  test("norm_diff float32 + scale/truncate: F1-F5 numpy parity") {
    // ndvi on (b1, reversed b1) — hand-check a few cells in float32
    val pairs = band1.zip(band1.reverse).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }.toSeq.toDF("cell", "nir", "red")
    val got = pairs.select($"cell", Indexes.ndvi($"nir", $"red").as("ndvi"))
      .orderBy("cell").collect().map(_.getLong(1))
    val expect = band1.zip(band1.reverse).map { case (a, b) =>
      val v = (a.toFloat - b.toFloat) / (a.toFloat + b.toFloat)
      val fixed = if (java.lang.Float.isNaN(v)) 0.0f else v
      (fixed * 1000.0f).toLong // toward-zero truncation like astype(int)
    }
    assert(got.sameElements(expect))
  }

  test("norm_diff 0/0 -> 0 (np.nan_to_num parity)") {
    val df = Seq((0, 0), (5, -5)).toDF("a", "b") // a+b == 0 in both
    val got = df.select(graft.functions.norm_diff($"a", $"b")).collect()
      .map(_.getFloat(0))
    assert(got.forall(_ == 0.0f))
  }

  test("scale=1 keeps float32 (raster.py:530 parity)") {
    val df = Seq((97, 92)).toDF("nir", "red")
    val v = df.select(Indexes.ndvi($"nir", $"red", 1)).collect()(0).getFloat(0)
    assert(v == (97.0f - 92.0f) / (97.0f + 92.0f))
  }

  test("array_correction: negative-revert + uint16 wrap (F8)") {
    val df = Seq(5L, 20L, 70000L).toDF("v")
    val got = df.select(Calibrate.arrayCorrection($"v", lit(10)).as("c"))
      .orderBy("c").collect().map(_.getLong(0))
    // 5-10<0 -> revert 5; 20-10=10; 70000-10=69990 -> % 65536 = 4454
    assert(got.sameElements(Array(5L, 10L, 4454L)))
  }

  test("mosaic keeps first non-nodata in source order (A11)") {
    val a = Seq((1L, Some(10)), (2L, None), (3L, Some(30))).toDF("cell", "v")
    val b = Seq((1L, Some(99)), (2L, Some(20)), (4L, Some(40))).toDF("cell", "v")
    val got = Mosaic.mosaic(Seq(a, b), "v").orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.sameElements(Array((1L, 10, 0), (2L, 20, 1), (3L, 30, 0), (4L, 40, 1))))
  }

  test("linear fit recovers an exact line (A5) incl. degenerate group") {
    val pts = (1 to 20).map(i => ("a", i.toLong, (3 * i + 7).toLong)) ++
      (1 to 5).map(_ => ("b", 4L, 9L)) // zero variance -> NULL fit
    val fit = Calibrate.linearFit(pts.toDF("g", "x", "y"), "x", "y", Seq("g"))
      .orderBy("g").collect()
    assert(fit(0).getDouble(2) == 3.0 && fit(0).getDouble(3) == 7.0 &&
      fit(0).getDouble(4) == 1.0)
    assert(fit(1).isNullAt(2)) // try_divide semantics
  }
}
