package graft.render

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.util.Base64

/** Driver-side render sinks (K1/K2/K3/U4/C10): the reference's three
  * user-visible output formats, produced from COLLECTED aggregates.
  *
  * Scale note: everything in this package is O(result) driver work —
  * CSV/JSON render the (already resampled/filtered) rows the user asked
  * for, exactly like the reference's pandas renderers
  * (`data.py:50-75`); the PNG path renders pixel GRIDS (≤ width×height
  * cells per attribute, collected from the raster aggregates), never
  * raw points. The cluster does all data-volume work.
  */
object Render {

  /** One attribute's raw/resampled rows for CSV/JSON rendering:
    * (t µs — double because the resample mean of `t` is fractional —
    * and value, None for NaN). */
  final case class Series(name: String, rows: Seq[(Double, Option[Double])])

  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  /** K1 — CSV block format (`data.py:50-55`): per attribute, a name
    * line, a `t[us],value_r` header, then one `t,value` row per point;
    * blocks joined with "\n" (the reference's trailing-newline rows +
    * join yields a blank separator line).
    *
    * Number formatting divergence (documented): pandas `to_csv` prints
    * shortest-repr floats; we print Scala's — byte parity with pandas
    * is not a correctness criterion (the reference has no golden files),
    * our own golden tests pin THIS format. Raw integer µs timestamps
    * are printed as integers. */
  def csv(series: Seq[Series]): String = {
    val w = new CsvStream(new java.lang.StringBuilder)
    series.foreach { s =>
      w.startSeries(s.name)
      s.rows.foreach { case (t, v) => w.row(t, v) }
    }
    w.finish()
  }

  /** K2 — Grafana JSON envelope (`data.py:58-75`):
    * `[{"target": name, "datapoints": [[value|null, t_ms], …]}]`,
    * NaN→null, timestamps in fractional ms. */
  def grafanaJson(series: Seq[Series]): String = {
    val w = new GrafanaStream(new java.lang.StringBuilder)
    series.foreach { s =>
      w.startSeries(s.name)
      s.rows.foreach { case (t, v) => w.row(t, v) }
    }
    w.finish()
  }

  /** INCREMENTAL sink behind both text renders: rows append as they
    * arrive from a local iterator, so a capped 1M-row raw query never
    * buffers per-attribute row collections on the driver — peak state
    * beyond the output buffer itself is one row. [[csv]]/
    * [[grafanaJson]] are thin wrappers over these, so the golden tests
    * pin the streamed format by construction. */
  sealed trait SeriesStream {
    def startSeries(name: String): Unit
    def row(t: Double, v: Option[Double]): Unit
    /** Closes any open series and returns the rendered payload. */
    def finish(): String
  }

  /** Streaming K1 CSV blocks (block separator = the "\n" join of the
    * batch form: a blank line, since each row carries its own). */
  final class CsvStream(out: java.lang.StringBuilder) extends SeriesStream {
    private var first = true
    override def startSeries(name: String): Unit = {
      if (!first) out.append('\n')
      first = false
      out.append(name).append("\nt[us],value_r\n")
    }
    override def row(t: Double, v: Option[Double]): Unit = {
      val tStr = if (t == t.floor && math.abs(t) < 1e15) t.toLong.toString
        else fmt(t)
      out.append(tStr).append(',').append(v.map(fmt).getOrElse(""))
        .append('\n')
    }
    override def finish(): String = out.toString
  }

  /** Streaming K2 Grafana JSON. */
  final class GrafanaStream(out: java.lang.StringBuilder)
      extends SeriesStream {
    out.append('[')
    private var anySeries = false
    private var anyDp = false
    private def jsonNum(d: Double): String =
      if (d.isNaN || d.isInfinite) "null" else fmt(d)
    private def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    override def startSeries(name: String): Unit = {
      if (anySeries) out.append("]}, ") // close the previous series
      anySeries = true
      anyDp = false
      out.append("{\"target\": \"").append(esc(name))
        .append("\", \"datapoints\": [")
    }
    override def row(t: Double, v: Option[Double]): Unit = {
      if (anyDp) out.append(", ")
      anyDp = true
      out.append('[').append(v.map(jsonNum).getOrElse("null"))
        .append(", ").append(jsonNum(t / 1000.0)).append(']')
    }
    override def finish(): String = {
      if (anySeries) out.append("]}")
      out.append(']').toString
    }
  }

  /** A collected line-raster grid for one attribute: cnt per (px, py),
    * py=0 at the BOTTOM (value axis grows upward, datashader
    * convention). */
  final case class Grid(name: String, color: Int,
      width: Int, height: Int, cells: Seq[(Int, Int, Long)])

  /** K3 — datashader's DEFAULT shade normalization: histogram
    * equalization (`tf.shade(how='eq_hist')`, the default the
    * reference's `plot.py:36` gets). A cell's alpha is proportional to
    * the RANK of its count among the grid's distinct non-zero counts —
    * the count CDF — so a few very hot cells cannot wash every other
    * cell down to the minimum alpha the way linear normalization does
    * on heavy-tailed grids. Deterministic: ranks come from the sorted
    * distinct counts, no sampling. */
  def shadeEqHist(grid: Grid): Array[Int] = {
    val px = new Array[Int](grid.width * grid.height)
    val distinct = grid.cells.map(_._3).distinct.sorted
    val rank = distinct.zipWithIndex.toMap
    val n = math.max(distinct.size, 1)
    grid.cells.foreach { case (x, y, c) =>
      if (x >= 0 && x < grid.width && y >= 0 && y < grid.height) {
        val row = grid.height - 1 - y
        val alpha = (64 + (191 * (rank(c) + 1)) / n).min(255)
        px(row * grid.width + x) = (alpha << 24) | (grid.color & 0xffffff)
      }
    }
    px
  }

  /** K3 (alternative) — linear count-to-alpha shading (datashader's
    * `how='linear'`): alpha scales with cell count relative to the
    * grid max. Kept alongside [[shadeEqHist]] because it is the easier
    * mapping to reason about in goldens and matches what thin/uniform
    * grids render under eq-hist anyway. */
  def shade(grid: Grid): Array[Int] = {
    val px = new Array[Int](grid.width * grid.height)
    val maxCnt = if (grid.cells.isEmpty) 1L else grid.cells.map(_._3).max
    grid.cells.foreach { case (x, y, c) =>
      if (x >= 0 && x < grid.width && y >= 0 && y < grid.height) {
        // PNG rows run top-down; the grid's py runs bottom-up
        val row = grid.height - 1 - y
        val alpha = (64 + (191 * c) / maxCnt).toInt.min(255)
        px(row * grid.width + x) = (alpha << 24) | (grid.color & 0xffffff)
      }
    }
    px
  }

  /** U4 — stack per-attribute shaded layers with src-over compositing
    * (reference `datashader.transfer_functions.stack`,
    * `plot.py:201-206`); later layers composite over earlier ones. */
  def stack(layers: Seq[Array[Int]], width: Int, height: Int): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
    layers.foreach { layer =>
      var i = 0
      while (i < layer.length) {
        val s = layer(i)
        val sa = (s >>> 24) & 0xff
        if (sa > 0) {
          val d = img.getRGB(i % width, i / width)
          val da = (d >>> 24) & 0xff
          val oa = sa + da * (255 - sa) / 255
          def ch(shift: Int): Int = {
            val sc = (s >> shift) & 0xff; val dc = (d >> shift) & 0xff
            if (oa == 0) 0 else (sc * sa + dc * da * (255 - sa) / 255) / oa
          }
          img.setRGB(i % width, i / width,
            (oa << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0))
        }
        i += 1
      }
    }
    img
  }

  /** C10 — PNG bytes, base64-encoded for the JSON envelope
    * (`plot.py:64-71`). */
  def pngBase64(img: BufferedImage): String = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    Base64.getEncoder.encodeToString(out.toByteArray)
  }
}
