package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ExtremaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def pts = Seq(
    ("a", 1L, 5.0), ("a", 2L, -3.0), ("a", 3L, Double.NaN),
    ("b", 1L, 2.0), ("b", 2L, 8.0),
    ("c", 1L, Double.NaN), ("c", 2L, Double.NaN))
    .toDF("att_name", "t", "value_r")

  test("perAttribute: NaN excluded from extrema but counted (A2/A7)") {
    val r = Extrema.perAttribute(pts, Seq("att_name"))
      .orderBy("att_name").collect()
    assert(r(0).getString(0) == "a" && r(0).getDouble(1) == -3.0
      && r(0).getDouble(2) == 5.0 && r(0).getLong(3) == 3L)
    assert(r(2).getString(0) == "c" && r(2).isNullAt(1) && r(2).isNullAt(2)
      && r(2).getLong(3) == 2L) // all-NaN series: null extrema (nodata path)
  }

  test("perAttribute log scale drops non-positive values first (F3)") {
    val r = Extrema.perAttribute(pts, Seq("att_name"), logScale = true)
      .orderBy("att_name").collect()
    // -3.0 dropped; NaN survives v > 0 (Spark/DuckDB order NaN greatest)
    // but is nulled out of the extrema — so vmin=vmax=5, 2 rows counted
    assert(r(0).getString(0) == "a" && r(0).getDouble(1) == 5.0
      && r(0).getDouble(2) == 5.0 && r(0).getLong(3) == 2L)
  }

  test("axisLimits: min-of-mins / max-of-maxes (A3)") {
    val ex = Seq(("a", 0, -3.0, 5.0, 3L), ("b", 0, 2.0, 8.0, 2L),
      ("d", 1, 1.0, 1.0, 1L))
      .toDF("att_name", "y_axis", "vmin", "vmax", "points")
    val r = Extrema.axisLimits(ex, "y_axis").orderBy("y_axis").collect()
    assert(r(0).getDouble(1) == -3.0 && r(0).getDouble(2) == 8.0
      && r(0).getLong(3) == 5L && r(0).getLong(4) == 2L)
  }

  test("padRange: 5% linear padding (plot.py:186-188)") {
    assert(Extrema.padRange(0.0, 100.0, logScale = false) == (-5.0, 105.0))
  }

  test("padRange: log padding in log10 space (plot.py:181-185)") {
    val (lo, hi) = Extrema.padRange(1.0, 100.0, logScale = true)
    assert(math.abs(lo - math.pow(10, -0.1)) < 1e-12)
    assert(math.abs(hi - math.pow(10, 2.1)) < 1e-12)
  }

  test("padRange: constant-value invention (plot.py:162-177)") {
    assert(Extrema.padRange(4.0, 4.0, logScale = false) == (2.0, 6.0))
    assert(Extrema.padRange(0.0, 0.0, logScale = false) == (-0.5, 0.5))
    assert(Extrema.padRange(-4.0, -4.0, logScale = false) == (-6.0, -2.0))
    // the reference's constant branch runs before the log/linear split
    assert(Extrema.padRange(4.0, 4.0, logScale = true) == (2.0, 6.0))
  }
}
