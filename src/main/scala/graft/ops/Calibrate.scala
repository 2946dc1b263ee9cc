package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Radiometric calibration of adjacent tiles (SURVEY.md A3-A6 + F8;
 * geoRpro overlap.py).
 *
 * The reference fits `np.polyfit(x, y, 1)` per band over the overlap
 * region (overlap.py:53-78,208) then corrects the target by the
 * intercept with a negative-revert rule and uint16 cast
 * (overlap.py:147-175).
 *
 * Determinism note (drives oracle parity AND local[8]==local[32]
 * reproducibility): slope/intercept/r² are computed from *integer
 * sums* (exact in Long) via the closed forms
 *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
 *   intercept = (Σy − slope·Σx) / n
 *   r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
 * — no order-dependent floating-point accumulation anywhere.
 */
object Calibrate {

  /** A3 min-max normalize over a partition (overlap.py:41-46). */
  def minMaxNormalize(v: Column, partition: Seq[Column]): Column = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(partition: _*)
    (v - min(v).over(w)) / (max(v).over(w) - min(v).over(w))
  }

  /**
   * A5/A6: per-group linear fit y ~ x from exact integer sums.
   * `x`/`y` must be integral columns (cast upstream). Emits
   * (group..., n, slope, intercept, r2).
   */
  def linearFit(pairs: DataFrame, x: String, y: String,
                groupBy: Seq[String]): DataFrame = {
    val g = pairs.groupBy(groupBy.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(x)).as("sx"), sum(col(y)).as("sy"),
        sum(col(x) * col(x)).as("sxx"),
        sum(col(y) * col(y)).as("syy"),
        sum(col(x) * col(y)).as("sxy"))
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    val cov = n * col("sxy") - sx * sy
    val varx = n * col("sxx") - sx * sx
    val vary = n * col("syy") - sy * sy
    // try_divide: a degenerate group (all x equal -> varx = 0) yields
    // NULL, not an ANSI DIVIDE_BY_ZERO error (and matches SQL engines
    // that return NULL on x/0)
    val slope = try_divide(cov.cast("double"), varx.cast("double"))
    g.select((groupBy.map(col) :+ n.as("n") :+
      slope.as("slope") :+
      ((sy.cast("double") - slope * sx.cast("double")) / n.cast("double")).as("intercept") :+
      try_divide((cov * cov).cast("double"), (varx * vary).cast("double")).as("r2")): _*)
  }

  /** A4 mean absolute difference, thresholded (overlap.py:214-216). */
  def meanAbsDiff(pairs: DataFrame, a: String, b: String): DataFrame =
    pairs.agg(avg(abs(col(a) - col(b))).as("mad"))

  /** F7 build_a_line (overlap.py:109-125): note the reference's sign —
    * the line is m·x − b (MINUS intercept). */
  def line(m: Column, x: Column, b: Column): Column = m * x - b

  /**
   * F8 array_correction (overlap.py:147-175): corrected = v − intercept,
   * but cells driven negative REVERT to their original value
   * (overlap.py:169-173), then cast to int with uint16 wraparound
   * parity (overlap.py:175 `astype('uint16')`).
   */
  def arrayCorrection(v: Column, intercept: Column,
                      uint16Parity: Boolean = true): Column = {
    val corrected = when(v - intercept < 0, v).otherwise(v - intercept)
    val asLong = corrected.cast("long")
    if (uint16Parity) pmod(asLong, lit(65536L)) else asLong
  }
}
