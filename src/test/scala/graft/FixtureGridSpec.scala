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

  test("build_a_line keeps the reference's m*x MINUS b sign (F7)") {
    // overlap.py:109-125 returns model[0]*x - model[1] — minus, not the
    // poly1d plus; the sign is load-bearing for downstream corrections
    val got = grid.limit(1)
      .select(Calibrate.line(lit(2.0), lit(10.0), lit(3.0)))
      .collect()(0).getDouble(0)
    assert(got == 17.0)
  }

  test("calibrationPipeline: hand-computed fit/mad/correction (e2e math)") {
    // band g: exact colinear pair, both sides normalize to [0,1] -> mad 0
    // band h: (0,20) (10,0) (20,40): slope 1, intercept 10, r2 0.25;
    //   x_n=[0,.5,1], y_n=[.5,0,1] -> mad=1/3 > 0.05 -> correct:
    //   y-10=[10,-10,30], negative revert -> c=[10,0,30], c_n=[1/3,0,1]
    //   -> mad_corr=(1/3+1/2+0)/3 = 5/18
    val pairs = Seq(
      ("g", 0L, 5L), ("g", 10L, 10L),
      ("h", 0L, 20L), ("h", 10L, 0L), ("h", 20L, 40L))
      .toDF("band", "x", "y")
    val out = Calibrate.calibrationPipeline(pairs, "band", 0.05)
      .orderBy("band").collect()
    val g = out(0); val h = out(1)
    assert(g.getDouble(2) == 0.5 && g.getDouble(3) == 5.0) // slope, intercept
    assert(g.getAs[Double]("mad") == 0.0 && !g.getAs[Boolean]("needs_corr"))
    assert(g.isNullAt(g.fieldIndex("mad_corr")))
    assert(h.getDouble(2) == 1.0 && h.getDouble(3) == 10.0)
    assert(h.getAs[Double]("r2") == 0.25)
    assert(h.getAs[Double]("raw_mad") == (20.0 + 10.0 + 20.0) / 3.0)
    assert(h.getAs[Double]("mad") == 800.0 / 2400.0)
    assert(h.getAs[Boolean]("needs_corr"))
    assert(h.getAs[Double]("mad_corr") == 500.0 / 1800.0)
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
