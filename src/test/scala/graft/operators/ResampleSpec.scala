package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ResampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("resample: round-to-nearest centered buckets, means of ALL cols") {
    // Δ=1000: t=400 → bucket 0, t=600 → bucket 1000 (data.py:12-14)
    val df = Seq(("a", 400L, 2.0), ("a", 600L, 4.0), ("a", 1400L, 6.0))
      .toDF("att_name", "t", "value_r")
    val r = Resample.resample(df, "1ms", Seq("att_name"), Seq("value_r"))
      .orderBy("bucket_us").collect()
    assert(r.length == 2)
    // bucket 0: one point; bucket 1000: t mean (600+1400)/2, value (4+6)/2
    assert(r(0).getLong(1) == 0L && r(0).getDouble(2) == 400.0
      && r(0).getDouble(3) == 2.0)
    assert(r(1).getLong(1) == 1000L && r(1).getDouble(2) == 1000.0
      && r(1).getDouble(3) == 5.0)
  }

  test("rawQuery without interval returns filtered rows unchanged") {
    val df = Seq(("a", 5L, 1.0), ("a", 10L, 2.0), ("a", 20L, 3.0),
      ("a", 25L, 4.0)).toDF("att_name", "t", "value_r")
    val r = Resample.rawQuery(df, 10L, 20L, None, Seq("att_name"))
      .orderBy("t").as[(String, Long, Double)].collect()
    assert(r.toSeq == Seq(("a", 10L, 2.0), ("a", 20L, 3.0)))
  }

  test("property: resampled mean lies within [min, max] of its bucket") {
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val pts = Seq.fill(60)((rnd.nextLong(10000L).abs,
        rnd.nextDouble() * 200 - 100))
      val df = pts.map { case (t, v) => ("k", t, v) }
        .toDF("att_name", "t", "value_r")
      val buckets = Resample
        .resample(df, "1ms", Seq("att_name"), Seq("value_r"))
        .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
      val d = 1000L
      val byBucket = pts.groupBy { case (t, _) => ((t + d / 2) / d) * d }
      assert(buckets.keySet == byBucket.keySet)
      byBucket.foreach { case (b, ps) =>
        val vs = ps.map(_._2)
        val mean = buckets(b)
        assert(mean >= vs.min - 1e-9 && mean <= vs.max + 1e-9,
          s"bucket $b mean $mean outside [${vs.min}, ${vs.max}]")
      }
    }
  }

  test("property: union of period slices ≡ single scan (U1)") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val pts = Seq.fill(40)((rnd.nextLong(1000L).abs, rnd.nextDouble() * 10))
      val df = pts.map { case (t, v) => ("k", t, v) }
        .toDF("att_name", "t", "value_r")
      val single = df.where(col("t") < 900)
        .agg(count(lit(1)), sum("value_r")).collect().head
      val unioned = df.where(col("t") < 300)
        .unionByName(df.where(col("t") >= 300 && col("t") < 900))
        .agg(count(lit(1)), sum("value_r")).collect().head
      assert(single.getLong(0) == unioned.getLong(0))
      if (single.getLong(0) > 0)
        assert(math.abs(single.getDouble(1) - unioned.getDouble(1)) < 1e-6)
    }
  }

  test("resampleExact matches resample's bucketing with exact means") {
    val df = Seq(("a", 100L, 1.25), ("a", 300L, 2.75), ("a", 1600L, 4.0))
      .toDF("att_name", "t", "value_r")
    val r = Resample.resampleExact(df, "1ms", Seq("att_name"), 0L)
      .orderBy("bucket_us").collect()
    assert(r(0).getLong(1) == 0L && r(0).getDouble(2) == 200.0
      && r(0).getDouble(3) == 2.0 && r(0).getLong(4) == 2L)
    assert(r(1).getLong(1) == 2000L && r(1).getDouble(3) == 4.0)
  }
}
