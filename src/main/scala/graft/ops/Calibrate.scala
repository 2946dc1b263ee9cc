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

  /**
   * The reference's flagship calibration workflow composed end-to-end
   * (`bands_correlation`, overlap.py:182-237): per band over the
   * overlap pairs (band, x=reference, y=target),
   *
   *   1. linear fit y ~ x  (A5/A6: n, slope, intercept, r2);
   *   2. normalized mean absolute difference (F6 `calc_diff_arr`
   *      composed with A3 min-max normalize + A4 mean: both sides
   *      normalized by their OWN min/max over the overlap, then
   *      mad = mean |x_norm − y_norm|);
   *   3. bands with mad > threshold are corrected (F8
   *      array_correction: y − intercept, negative-revert, uint16) and
   *      re-scored (`diff_corr`, overlap.py:216-221) — mad_corr is NULL
   *      for bands under the threshold (no correction applied);
   *   plus raw_mad = mean |x − y| (the un-normalized A4 helper shape).
   *
   * Determinism (oracle parity at any parallelism): `x`/`y` must be
   * integral. The normalized mad is computed from exact integer sums —
   *   |x_n − y_n| = |(x−min_x)·D_y − (y−min_y)·D_x| / (D_x·D_y)
   * with D = max−min, so mad = Σ|num| / (n·D_x·D_y): one closed-form
   * double division of Long sums, no float accumulation. Overflow
   * bounds (Long, 2^63): the mad numerator sums need n·D_x·D_y < 2^63
   * (values ≤ 10^5 → n ≤ ~9·10^8 rows/band); the FIT's closed-form
   * products are tighter — cov·cov ~ (n·max²)² must stay < 2^63, i.e.
   * n·max² < ~3·10^9 (n ≤ ~3·10^5 rows/band at values ≤ 10^5). Beyond
   * that, rescale the inputs or bucket the band: the oracle (DuckDB
   * BIGINT) errors rather than wraps, so a violation fails the gate
   * loudly instead of silently corrupting the fit.
   *
   * Scale shape: min/max/fit are groupBy aggregates broadcast back to
   * the pair rows — NOT a Window.partitionBy(band), which would funnel
   * each band's full overlap through one reducer. Two passes over the
   * pair relation (extremes, then normalized sums) — `pairs` is cached
   * between them; caller owns the lifetime.
   *
   * Output: (band, n, slope, intercept, r2, raw_mad, mad, needs_corr,
   * mad_corr).
   */
  def calibrationPipeline(pairs: DataFrame, bandCol: String,
                          threshold: Double): DataFrame = {
    val p = pairs.cache()
    // pass 1 — ONE fused per-band aggregate: the fit's six integer sums
    // (linearFit's exact closed forms) PLUS the extremes and the raw
    // |x-y| sum the mad stages need
    val g = p.groupBy(col(bandCol)).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(abs(col("x") - col("y"))).as("sad"),
      min("x").as("minx"), max("x").as("maxx"),
      min("y").as("miny"), max("y").as("maxy"))
    val n = col("n"); val sx = col("sx"); val sy = col("sy")
    val cov = n * col("sxy") - sx * sy
    val varx = n * col("sxx") - sx * sx
    val vary = n * col("syy") - sy * sy
    val slopeE = try_divide(cov.cast("double"), varx.cast("double"))
    val fit = g.select(col(bandCol), n, slopeE.as("slope"),
      ((sy.cast("double") - slopeE * sx.cast("double")) / n.cast("double")).as("intercept"),
      try_divide((cov * cov).cast("double"), (varx * vary).cast("double")).as("r2"),
      col("sad"), col("minx"), col("maxx"), col("miny"), col("maxy"))
    // pass 2: corrected values + per-band corrected extremes; the
    // normalized |diff| numerators for the UNCORRECTED side are exact
    // integer sums computable in the same pass
    val withC = p
      .join(broadcast(fit), Seq(bandCol))
      .withColumn("c", arrayCorrection(col("y"), col("intercept")))
      .cache()
    val stats = withC.groupBy(bandCol).agg(
      min("c").as("minc"), max("c").as("maxc"),
      sum(abs((col("x") - col("minx")) * (col("maxy") - col("miny")) -
        (col("y") - col("miny")) * (col("maxx") - col("minx")))).as("snum"))
    // pass 3 (corrected-side numerators need minc/maxc) runs over the
    // CACHED corrected relation only
    val nums = withC.join(broadcast(stats.select(col(bandCol), col("minc"), col("maxc"))),
        Seq(bandCol))
      .groupBy(bandCol).agg(
        sum(abs((col("x") - col("minx")) * (col("maxc") - col("minc")) -
          (col("c") - col("minc")) * (col("maxx") - col("minx")))).as("snumc"))
    val dxy = (col("maxx") - col("minx")) * (col("maxy") - col("miny"))
    val dxc = (col("maxx") - col("minx")) * (col("maxc") - col("minc"))
    val mad = try_divide(col("snum").cast("double"),
      (col("n") * dxy).cast("double"))
    val madCorr = try_divide(col("snumc").cast("double"),
      (col("n") * dxc).cast("double"))
    fit.join(stats, Seq(bandCol)).join(nums, Seq(bandCol))
      .select(col(bandCol), col("n"), col("slope"), col("intercept"),
        col("r2"),
        (col("sad").cast("double") / col("n").cast("double")).as("raw_mad"),
        mad.as("mad"),
        (mad > threshold).as("needs_corr"),
        when(mad > threshold, madCorr).as("mad_corr"))
  }
}
