package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The derived-bound rule: a NAIVE filter on the derived µs column —
  * `t = ts div 1000` over legacy epoch-nano longs, `t = micros_of(ts)`
  * over the current timestamp_ntz encoding, no manually paired raw
  * bound either way — must still put a raw-`ts` predicate into the
  * parquet footer, and must never change results, including at the
  * truncation edge cases the sign guards protect. */
class DerivedDivBoundsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** The driver's current events.parquet: ts is timestamp[us] → the
    * adapter derives t via micros_of. */
  private def eventsNtz = {
    graft.functions.MicrosOf.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("ts"), expr("micros_of(ts)").as("t"), col("user_id"))
  }

  /** The legacy encoding: epoch-nano longs (what TIMESTAMP(NANOS)
    * data looks like after the nanosAsLong read) → t = ts div 1000. */
  private lazy val legacyPath = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ddb-legacy").toString
    eventsNtz.select((col("t") * 1000L).as("ts"), col("user_id"))
      .write.mode("overwrite").parquet(dir)
    dir
  }
  private def eventsLegacy =
    spark.read.parquet(legacyPath)
      .select(col("ts"), expr("ts div 1000").as("t"), col("user_id"))

  private def assertPrunes(events: => org.apache.spark.sql.DataFrame,
      label: String): Unit = {
    DerivedDivBounds.register(spark)
    val Seq(t0, t1) = events.agg(min("t"), max("t")).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSeq
    val mid0 = t0 + (t1 - t0) / 3
    val mid1 = t0 + 2 * (t1 - t0) / 3
    val df = events.where(col("t") >= mid0 && col("t") <= mid1)
    val pushed = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }
    assert(pushed.exists(s => s.contains("GreaterThanOrEqual(ts")
      && s.contains("LessThanOrEqual(ts")),
      s"$label: no derived raw-ts bounds pushed (pushed=$pushed)")
    // identical rows to the un-deriving formulation (count + endpoint);
    // key on (t, user_id) so the comparison is encoding-agnostic
    val expected = events.collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .filter { case (t, _) => t >= mid0 && t <= mid1 }
    val got = df.collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSet == expected.toSet && got.length == expected.length,
      s"$label: rule changed the result set")
  }

  test("naive t-range filter reaches the footer (timestamp_ntz encoding)") {
    assertPrunes(eventsNtz, "ntz")
  }

  test("naive t-range filter reaches the footer (legacy nano-long encoding)") {
    assertPrunes(eventsLegacy, "legacy")
  }

  test("truncation edges: x = 0 lower bound must NOT be derived") {
    DerivedDivBounds.register(spark)
    import spark.implicits._
    // a = -500: a div 1000 = 0 under truncation toward zero, so
    // `t >= 0` must keep it — a derived `a >= 0` would wrongly drop it
    val d = Seq(-1500L, -500L, 0L, 500L, 1500L).toDF("a")
      .select(col("a"), expr("a div 1000").as("t"))
    assert(d.where(col("t") >= 0).select("a").as[Long].collect().toSet
      == Set(-500L, 0L, 500L, 1500L))
    assert(d.where(col("t") >= 1).select("a").as[Long].collect().toSet
      == Set(1500L))
    assert(d.where(col("t") <= 0).select("a").as[Long].collect().toSet
      == Set(-1500L, -500L, 0L, 500L))
    assert(d.where(col("t") === 1).select("a").as[Long].collect().toSet
      == Set(1500L))
    assert(d.where(lit(0L) < col("t")).select("a").as[Long].collect().toSet
      == Set(1500L))
  }

  test("property: random div filters match brute force with rule active") {
    DerivedDivBounds.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val as = Seq.fill(200)(rnd.nextLong() % 5000L) // mixed-sign longs
    (1 to 6).foreach { _ =>
      val c = Seq(1L, 7L, 1000L)(rnd.nextInt(3))
      val x = rnd.nextLong() % (5000L / c + 2)
      val d = as.toDF("a").select(col("a"), expr(s"a div ${c}L").as("t"))
      def brute(p: Long => Boolean): Set[Long] =
        as.filter(a => p(a / c)).toSet
      assert(d.where(col("t") >= x).select("a").as[Long].collect().toSet
        == brute(_ >= x), s"t >= $x with c=$c")
      assert(d.where(col("t") > x).select("a").as[Long].collect().toSet
        == brute(_ > x), s"t > $x with c=$c")
      assert(d.where(col("t") <= x).select("a").as[Long].collect().toSet
        == brute(_ <= x), s"t <= $x with c=$c")
      assert(d.where(col("t") < x).select("a").as[Long].collect().toSet
        == brute(_ < x), s"t < $x with c=$c")
      assert(d.where(col("t") === x).select("a").as[Long].collect().toSet
        == brute(_ == x), s"t = $x with c=$c")
      assert(d.where(lit(x) <= col("t")).select("a").as[Long].collect().toSet
        == brute(_ >= x), s"$x <= t with c=$c")
    }
  }

  test("derived bounds are exact at the bucket boundary") {
    DerivedDivBounds.register(spark)
    import spark.implicits._
    // 1999 div 1000 = 1 must survive `t <= 1`; 2000 must not
    val d = Seq(999L, 1000L, 1999L, 2000L).toDF("a")
      .select(col("a"), expr("a div 1000").as("t"))
    assert(d.where(col("t") <= 1).select("a").as[Long].collect().toSet
      == Set(999L, 1000L, 1999L))
    assert(d.where(col("t") >= 1 && col("t") < 2).select("a").as[Long]
      .collect().toSet == Set(1000L, 1999L))
  }
}
