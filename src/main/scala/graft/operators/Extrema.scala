package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A2/A3/A7 — per-attribute extrema over the visible range, and
  * per-axis shared limits (reference `plot.py:74-130`).
  *
  * Two-phase structure mirrors the reference (`server.py:114-119`):
  * extrema must complete before rasterization because the y ranges feed
  * the pixel transform. Both phases are pure hash aggregates — the
  * second one runs over the tiny per-attribute result, so at scale the
  * cost is one pass over the points plus an O(#attributes) reduction.
  */
object Extrema {

  /** Per-series min/max/count of value_r. `logScale=true` applies the
    * positive-value filter first (F3, reference `plot.py:93-97`). NaNs
    * are excluded from extrema like numpy's nanmin/nanmax. */
  def perAttribute(points: DataFrame, keys: Seq[String],
      logScale: Boolean = false): DataFrame = {
    val base = if (logScale) points.where(col("value_r") > 0) else points
    val clean = when(isnan(col("value_r")), lit(null)).otherwise(col("value_r"))
    base.groupBy(keys.map(col): _*)
      .agg(
        min(clean).as("vmin"),
        max(clean).as("vmax"),
        count(lit(1)).as("points")) // A7: total visible point count
  }

  /** Per-axis limits: min-of-mins / max-of-maxes across the attributes
    * sharing a y-axis (A3, reference `plot.py:112-130`). Input is the
    * output of [[perAttribute]] joined with an axis assignment. */
  def axisLimits(extrema: DataFrame, axisCol: String): DataFrame =
    extrema.groupBy(col(axisCol))
      .agg(
        min(col("vmin")).as("axis_min"),
        max(col("vmax")).as("axis_max"),
        sum(col("points")).as("axis_points"),
        count(lit(1)).as("n_series"))

  /** Axis range padding + degenerate-range invention, reference
    * `plot.py:160-188`: pad 5% each side (in log10 space for log axes);
    * a constant-value series gets an invented ±0.5 (lin) / ×/÷2 (log)
    * range. Driver-side scalar math (runs on collected limits). */
  def padRange(vmin: Double, vmax: Double, logScale: Boolean): (Double, Double) =
    if (logScale) {
      val (lo, hi) = (math.log10(vmin), math.log10(vmax))
      if (lo == hi) (math.pow(10, lo - math.log10(2)), math.pow(10, hi + math.log10(2)))
      else {
        val pad = (hi - lo) * 0.05
        (math.pow(10, lo - pad), math.pow(10, hi + pad))
      }
    } else {
      if (vmin == vmax) (vmin - 0.5, vmax + 0.5)
      else {
        val pad = (vmax - vmin) * 0.05
        (vmin - pad, vmax + pad)
      }
    }
}
