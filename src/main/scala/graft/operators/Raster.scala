package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A4/A5/A6 — 2-D binned rasterization of (time, value) points into a
  * width×height pixel grid (reference `plot.py:15-60`, datashader
  * Canvas.line / Canvas.points / per-column hover reductions).
  *
  * Scale design: the raster is an AGGREGATION, not a render loop — the
  * grid has ≤ width×height cells per attribute no matter how many
  * points feed it, so the collect at the end is O(pixels), never
  * O(points) (SURVEY.md §7.5.6). Binning is a plain hash aggregate
  * (partial+final, one shuffle); line rasterization needs consecutive
  * points, i.e. one shuffle+sort per attribute via a window `lag`, then
  * a flatMap that emits covered pixels per segment (≤ width+height per
  * segment) followed by the same hash aggregate.
  *
  * Divergence: datashader draws anti-aliased lines with numba kernels
  * (`plot.py:22-27`); we use a deterministic integer Bresenham so
  * golden tests are stable (SURVEY.md §7.5.2).
  */
object Raster {

  /** Pixel-x of a µs timestamp over [t0, t1] — integer math so the
    * DuckDB oracle reproduces it bit-exactly. Spark's `/` on longs is
    * double division, so integer division is done as
    * `(n - (n mod span)) / span`: the numerator is an exact multiple of
    * span and both fit a double's 53-bit mantissa for ranges up to
    * ~(2^53/width) µs (≈ 100 days at width=1024 — beyond that the worst
    * case is a ±1-pixel difference, invisible in a raster). */
  def pxCol(tUs: Column, t0Us: Long, t1Us: Long, width: Int): Column = {
    val num = (tUs - lit(t0Us)) * lit(width.toLong)
    val span = lit(t1Us - t0Us)
    least(((num - pmod(num, span)) / span).cast("long"), lit(width - 1L))
      .cast("long")
  }

  /** Pixel-y of a value over [vmin, vmax], linear or log10 scale
    * (reference y-scale config `imageplot.js:194-216`). */
  def pyCol(v: Column, vmin: Double, vmax: Double, height: Int,
      logScale: Boolean = false): Column = {
    val (value, lo, hi) =
      if (logScale) (log10(v), math.log10(vmin), math.log10(vmax))
      else (v, vmin, vmax)
    least(floor((value - lit(lo)) / lit(hi - lo) * lit(height)), lit(height - 1L))
      .cast("long")
  }

  /** A5 — Canvas.points equivalent: per-cell count/mean/min/max of
    * value_r (reference `plot.py:28-33`). Input needs `t` (µs) and
    * `value_r`; output one row per non-empty cell per key. */
  def binPoints(points: DataFrame, keys: Seq[String],
      t0Us: Long, t1Us: Long, vmin: Double, vmax: Double,
      width: Int, height: Int, logScale: Boolean = false): DataFrame = {
    // same plan-time contract as the fused RasterFusion.binPoints (the
    // "same values" twin): a zero-length range nulls pxCol's division
    // and least() silently clamps every point into the last column
    require(t1Us > t0Us && width > 0 && height > 0,
      s"degenerate raster window: t=[$t0Us,$t1Us] ${width}x$height")
    val base = points
      .where(col("t").between(t0Us, t1Us) && !isnan(col("value_r"))
        && col("value_r").between(
          if (logScale) math.max(vmin, java.lang.Double.MIN_VALUE) else vmin,
          vmax))
    base
      .withColumn("px", pxCol(col("t"), t0Us, t1Us, width))
      .withColumn("py", pyCol(col("value_r"), vmin, vmax, height, logScale))
      .groupBy(keys.map(col) :+ col("px") :+ col("py"): _*)
      .agg(
        count(lit(1)).as("cnt"),
        // e6-quantized exact integer sum, one de-quantizing multiply,
        // one IEEE division — the same order-free mean contract as the
        // fused twin's CellAgg (a bare avg's double accumulation is
        // merge-order-dependent; the sf1 audit caught the 1-ulp drift)
        (sum(expr("cast(round(value_r * 1e6, 0) as bigint)"))
          .cast("double") / (count(lit(1)).cast("double") * lit(1e6)))
          .as("vmean"),
        min(col("value_r")).as("vmin"),
        max(col("value_r")).as("vmax"))
  }

  /** A6 — hover reductions: collapse the grid along y per pixel column
    * (reference `plot.py:44-60`: nonempty columns, per-column min/max,
    * summed count). Runs over [[binPoints]] output — O(pixels) input. */
  def hoverColumns(grid: DataFrame, keys: Seq[String]): DataFrame =
    grid.groupBy(keys.map(col) :+ col("px"): _*)
      .agg(
        min(col("vmin")).as("col_min"),
        max(col("vmax")).as("col_max"),
        sum(col("cnt")).as("col_count"))

  /** A line point after pixel projection; `k` is the NUL-joined series
    * key, `py` is None for NaN values (line-break semantics). */
  private[operators] final case class LP(k: String, px: Long,
      py: Option[Long], t: Long, tie: Long)

  private val KeySep = "\u0000"

  /** Off-canvas endpoint clamp band (plus/minus band, see
    * [[segCells]]). ONE definition shared with the raster oracles'
    * segClampSql (api/EventQueries) -- the two must stay equal or the
    * engine and its q21/q28/q29 oracles diverge on far-outlier
    * segments. */
  private[graft] def clampBand(height: Int): Long = 4L * height + 4

  /** Weighted cells of the segment prev→cur, or none when the pair
    * spans keys or touches a NaN (None) endpoint. Both kernels emit
    * (key, px, py, w): Bresenham at w=1 (so the summed column IS the
    * hit count) and the AA kernel at w∈[1,256] coverage units.
    * Object-scoped so task closures capture nothing but this
    * serializable object.
    *
    * Out-of-canvas guards (manual axis ranges narrower than the data —
    * `pyCol` has no bottom clamp, so an outlier's py can be billions):
    *  - a segment ENTIRELY below or above the canvas is skipped — its
    *    cells' y all lie between the endpoint ys (Bresenham walks
    *    monotonically; AA straddles at most one extra row, covered by
    *    the 1-row margin), so every cell would be clipped anyway:
    *    output-exact, and it removes the |Δpy|-cells blow-up for the
    *    common both-sides-out case;
    *  - a CROSSING segment's far endpoint is clamped into a ±4·height
    *    band: cells per segment stay O(height+width) (no executor
    *    blow-up, no Int wrap in the kernels) at the cost of a slightly
    *    distorted slope for endpoints beyond the band — a documented
    *    approximation that only engages when the caller's manual range
    *    excludes data by >4 canvas heights. */
  private def segCells(aa: Boolean, height: Int)(
      a: LP, b: LP): Seq[(String, Long, Long, Long)] =
    if (a.k == b.k && a.py.isDefined && b.py.isDefined) {
      val (ya, yb) = (a.py.get, b.py.get)
      val fullyOut =
        (ya < -1 && yb < -1) || (ya > height.toLong && yb > height.toLong)
      if (fullyOut) Nil
      else {
        val band = clampBand(height)
        def cl(y: Long): Int = math.max(-band, math.min(band + height, y)).toInt
        if (aa)
          lineAA(a.px.toInt, cl(ya), b.px.toInt, cl(yb))
            .toSeq.map { case (x, y, w) => (b.k, x.toLong, y.toLong, w) }
        else
          bresenham(a.px.toInt, cl(ya), b.px.toInt, cl(yb))
            .toSeq.map { case (x, y) => (b.k, x.toLong, y.toLong, 1L) }
      }
    } else Nil

  /** A4 — Canvas.line equivalent: per-cell count of pixels covered by
    * the polyline connecting consecutive points of each series
    * (consecutive = ordered by (t, tieCol) within the key). NaN values
    * break the line (datashader semantics: segments touching a NaN
    * endpoint are skipped); cells outside the canvas are clipped after
    * rasterization.
    *
    * Scale design: the earlier implementation windowed over
    * `partitionBy(keys).orderBy(t)`, which serializes a hot series'
    * entire history through ONE sort task (a years-long 1 Hz attribute
    * is ~10⁸ points). This version range-repartitions on
    * (key, t, tie) — Spark splits each series across as many
    * partitions as its size demands — sorts within partitions, emits
    * Bresenham cells per consecutive pair inside each partition, and
    * stitches the O(#partitions) cross-partition segment pairs on the
    * driver. One pass over cached sorted data + one O(#partitions)
    * collect; no per-key sort bottleneck. Output key columns are
    * strings (keys are NUL-joined for the typed pass).
    *
    * Limitation (documented divergence from datashader): segments are
    * rasterized from their true endpoints and clipped per-cell, not
    * geometrically clipped at the canvas edge; callers should pass a
    * [vmin, vmax] covering the data (imageQuery does — axis limits come
    * from the extrema phase). Endpoints beyond ±4 canvas heights are
    * clamped into that band before rasterizing (see [[segCells]]).
    *
    * Precondition: key column values must be NON-NULL — the NUL-joined
    * series key cannot represent null parts (`concat_ws` skips them, so
    * (null, "x") and ("x", null) would collide and reconstruct into the
    * wrong columns). Archive keys (att_name, event_type) satisfy this
    * by construction, the same invariant [[Catalog.latestBefore]]
    * documents for its clustering key. */
  def binLines(points: DataFrame, keys: Seq[String], tieCol: String,
      t0Us: Long, t1Us: Long, vmin: Double, vmax: Double,
      width: Int, height: Int, logScale: Boolean = false): DataFrame =
    linesRaster(points, keys, tieCol, t0Us, t1Us, vmin, vmax, width,
      height, logScale, aa = false, outCol = "cnt")

  /** Shared distribution scaffold for [[binLines]] / [[binLinesAA]]:
    * only the per-segment kernel (Bresenham at w=1 vs AA coverage
    * units) and the summed column's name differ — the partitioning,
    * boundary stitching, clipping and aggregation are one code path.
    * Summing w=1 is exactly the hit count, so binLines' output is
    * bit-identical to its original count(*) form. */
  private def linesRaster(points: DataFrame, keys: Seq[String],
      tieCol: String, t0Us: Long, t1Us: Long, vmin: Double, vmax: Double,
      width: Int, height: Int, logScale: Boolean, aa: Boolean,
      outCol: String): DataFrame = {
    // same plan-time contract as the fused RasterFusion.binPoints —
    // a zero-length range would otherwise null pxCol's division and
    // least() would silently clamp every point into the last column
    require(t1Us > t0Us && width > 0 && height > 0,
      s"degenerate raster window: t=[$t0Us,$t1Us] ${width}x$height")
    val spark = points.sparkSession
    import spark.implicits._
    // a NaN value breaks the line; so does a non-positive value on a
    // log axis (datashader: log10 of it is NaN → the segment is
    // dropped). The explicit guard matters: pyCol's log10 returns null
    // for v ≤ 0, but its `least(…, height-1)` SKIPS nulls (Spark
    // least/greatest semantics) and would silently clamp those points
    // to the TOP row instead of breaking
    val breakValue =
      if (logScale) isnan(col("value_r")) || col("value_r") <= 0
      else isnan(col("value_r"))
    val prepared = points
      .where(col("t").between(t0Us, t1Us))
      .select(
        concat_ws(KeySep, keys.map(col(_).cast("string")): _*).as("k"),
        pxCol(col("t"), t0Us, t1Us, width).as("px"),
        when(breakValue, lit(null))
          .otherwise(pyCol(col("value_r"), vmin, vmax, height, logScale))
          .cast("long").as("py"),
        col("t").cast("long").as("t"),
        col(tieCol).cast("long").as("tie"))
      .as[LP]
    // cached so the edge-collect job and the returned (lazy) cell frame
    // share one shuffle+sort; released by [[CacheLifecycle]] after the
    // result's first materialization (below) — the projection is
    // 5 narrow columns, the same order of magnitude as the reference's
    // per-day data cache entries (utils.py:174-236)
    val sorted = prepared
      .repartitionByRange(col("k"), col("t"), col("tie"))
      .sortWithinPartitions(col("k"), col("t"), col("tie"))
      .persist()
    val kernel = segCells(aa, height) _
    // within-partition consecutive pairs
    val inner = sorted.mapPartitions { it =>
      var prev: LP = null
      it.flatMap { cur =>
        val out = if (prev != null) kernel(prev, cur) else Nil
        prev = cur
        out
      }
    }
    // cross-partition pairs: (last of partition i, first of the next
    // non-empty partition) — O(#partitions) rows, stitched driver-side
    val edges = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val first = it.next(); var last = first
        while (it.hasNext) last = it.next()
        Iterator.single((i, first, last))
      }
    }.collect().sortBy(_._1)
    val boundary = edges.toSeq.sliding(2).flatMap {
      case Seq((_, _, last), (_, first, _)) => kernel(last, first)
      case _ => Nil
    }.toSeq
    val cells = inner.toDF("k", "px", "py", "w")
      .unionByName(spark.createDataFrame(boundary)
        .toDF("k", "px", "py", "w"))
    val keyCols = keys.zipWithIndex.map { case (name, i) =>
      split(col("k"), KeySep).getItem(i).as(name)
    }
    val res = cells
      .where(col("px").between(0, width - 1)
        && col("py").between(0, height - 1))
      .groupBy(col("k"), col("px"), col("py"))
      .agg(sum(col("w")).as(outCol))
      .select(keyCols ++ Seq(col("px"), col("py"), col(outCol)): _*)
    // the edge-collect above already materialized the cache; after the
    // returned frame's own first materialization (the `inner` reader)
    // nothing re-reads it — release instead of waiting for LRU
    CacheLifecycle.unpersistAfterFirstUse(res, sorted)
    res
  }

  /** A4 (opt-in variant) — ANTI-ALIASED line rasterization: per-cell
    * summed coverage weight in 1/256 units (`w256`) instead of a hit
    * count, mirroring datashader's coverage-weighted AA kernels
    * (reference `plot.py:22-27` — the one place the default
    * [[binLines]] deliberately diverges for golden-test stability).
    * Determinism survives because the coverage split is computed in
    * INTEGER-RATIONAL arithmetic ([[lineAA]]): the crossing ordinate at
    * each major-axis step is the exact rational (num/den) of the
    * segment endpoints, and the 256-unit split rounds half-up in
    * integer math — no float accumulates anywhere, so goldens are as
    * stable as Bresenham's.
    *
    * Distribution shape is identical to [[binLines]] (range-spread
    * partitions, per-partition emit, O(#partitions) driver stitch);
    * only the per-segment kernel and the final SUM (vs count) differ.
    * Output: key columns, px, py, `w256` (≥ 1; a fully-covered cell
    * contributes 256 per crossing segment). */
  def binLinesAA(points: DataFrame, keys: Seq[String], tieCol: String,
      t0Us: Long, t1Us: Long, vmin: Double, vmax: Double,
      width: Int, height: Int, logScale: Boolean = false): DataFrame =
    linesRaster(points, keys, tieCol, t0Us, t1Us, vmin, vmax, width,
      height, logScale, aa = true, outCol = "w256")

  /** Anti-aliased line kernel in integer-rational arithmetic: for each
    * major-axis step from (x0,y0) → (x1,y1) (start excluded, like
    * [[bresenham]]), the exact crossing ordinate is the rational
    * `num/den` of the endpoints; its fractional part splits 256
    * coverage units between the two straddled cells (rounded half-up
    * in integer math — the two weights always sum to 256). An exact
    * integer crossing puts all 256 units in one cell, so axis-aligned
    * and 45° lines reproduce Bresenham's cells with w=256.
    * Wu-style endpoint fractional coverage is NOT applied (endpoints
    * land on cell centers here by construction — px/py are already
    * quantized), which keeps the kernel a pure function of the cell
    * coordinates. */
  def lineAA(x0: Int, y0: Int, x1: Int, y1: Int): Array[(Int, Int, Long)] = {
    val out = Array.newBuilder[(Int, Int, Long)]
    val dx = x1 - x0; val dy = y1 - y0
    if (dx == 0 && dy == 0) return out.result()
    val steep = math.abs(dy) > math.abs(dx)
    // (a, b): major/minor axis; emit maps back to (x, y)
    val (a0, b0, a1, b1) = if (steep) (y0, x0, y1, x1) else (x0, y0, x1, y1)
    val da = a1 - a0; val db = b1 - b0
    val sa = if (da >= 0) 1 else -1
    val steps = math.abs(da)
    var i = 1
    while (i <= steps) {
      val m = a0 + i * sa
      // exact crossing: b = b0 + (m - a0) * db / da, normalized to a
      // positive denominator
      var num = b0.toLong * da + (m - a0).toLong * db
      var den = da.toLong
      if (den < 0) { num = -num; den = -den }
      val ib = Math.floorDiv(num, den)
      val rem = num - ib * den // 0 ≤ rem < den
      if (rem == 0L) {
        out += emitAA(steep, m, ib.toInt, 256L)
      } else {
        // upper-cell share of the 256 units, rounded half-up
        val wHi = (256L * rem * 2 + den) / (2 * den)
        val wLo = 256L - wHi
        if (wLo > 0) out += emitAA(steep, m, ib.toInt, wLo)
        if (wHi > 0) out += emitAA(steep, m, ib.toInt + 1, wHi)
      }
      i += 1
    }
    out.result()
  }

  @inline private def emitAA(steep: Boolean, major: Int, minor: Int,
      w: Long): (Int, Int, Long) =
    if (steep) (minor, major, w) else (major, minor, w)

  /** Integer Bresenham line: all cells covered from (x0,y0) to (x1,y1),
    * excluding the start cell (so consecutive segments don't double-count
    * their shared endpoint). */
  def bresenham(x0: Int, y0: Int, x1: Int, y1: Int): Array[(Int, Int)] = {
    val out = Array.newBuilder[(Int, Int)]
    var (x, y) = (x0, y0)
    val dx = math.abs(x1 - x0); val sx = if (x0 < x1) 1 else -1
    val dy = -math.abs(y1 - y0); val sy = if (y0 < y1) 1 else -1
    var err = dx + dy
    var first = true
    var continue = true
    while (continue) {
      if (!first) out += ((x, y))
      first = false
      if (x == x1 && y == y1) continue = false
      else {
        val e2 = 2 * err
        if (e2 >= dy) { err += dy; x += sx }
        if (e2 <= dx) { err += dx; y += sy }
      }
    }
    out.result()
  }
}
