package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TimeFnsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("intervalUs parses the reference's unit set") {
    assert(TimeFns.intervalUs("500ms") == 500000L)
    assert(TimeFns.intervalUs("30s") == 30000000L)
    assert(TimeFns.intervalUs("15m") == 900000000L)
    assert(TimeFns.intervalUs("2h") == 7200000000L)
    assert(TimeFns.intervalUs("1d") == 86400000000L)
    assert(TimeFns.intervalUs("7us") == 7L)
  }

  test("intervalUs rejects junk") {
    intercept[IllegalArgumentException](TimeFns.intervalUs("5x"))
    intercept[IllegalArgumentException](TimeFns.intervalUs(""))
    intercept[IllegalArgumentException](TimeFns.intervalUs("m5"))
  }

  test("roundBucketUs rounds to NEAREST bucket, half-tie up") {
    val d = 1000L
    val rows = Seq(0L, 499L, 500L, 501L, 999L, 1000L, 1499L, 1500L)
      .toDF("t")
      .select(TimeFns.roundBucketUs(col("t"), d).as("b"))
      .as[Long].collect()
    // round(t/Δ)*Δ with half-up: 499→0, 500→1000, 1499→1000, 1500→2000
    assert(rows.toSeq == Seq(0L, 0L, 1000L, 1000L, 1000L, 1000L, 1000L, 2000L))
  }

  test("epochUsSplit combines seconds and µs remainder (hdbpp.py:84-87)") {
    val df = Seq(("2024-01-01 00:00:01", 250))
      .toDF("ts", "us")
      .select(TimeFns.epochUsSplit(to_timestamp(col("ts")), col("us")).as("t"))
      .as[Long].collect()
    assert(df.head == 1704067201000250L)
  }

  test("parseNaiveUtc: naive→UTC, offsets honored, date-only = midnight (C3)") {
    assert(TimeFns.parseNaiveUtc("2017-06-16T15:00:00") == 1497625200000000L)
    assert(TimeFns.parseNaiveUtc("2017-06-16 15:00:00") == 1497625200000000L)
    // +02:00 normalizes back to the same instant
    assert(TimeFns.parseNaiveUtc("2017-06-16T17:00:00+02:00")
      == 1497625200000000L)
    assert(TimeFns.parseNaiveUtc("2017-06-16") == 1497571200000000L)
    // offset WITH a space separator — normalized like the no-offset path
    assert(TimeFns.parseNaiveUtc("2017-06-16 17:00:00+02:00")
      == 1497625200000000L)
    assert(TimeFns.parseNaiveUtc("2017-06-16T15:00:00.250") % 1000000L
      == 250000L)
  }

  test("inRangeInclusive keeps both endpoints (data.py:104-105)") {
    val hits = Seq(9L, 10L, 15L, 20L, 21L).toDF("t")
      .where(TimeFns.inRangeInclusive(col("t"), 10L, 20L))
      .as[Long].collect()
    assert(hits.toSeq == Seq(10L, 15L, 20L))
  }

  test("ntzOfMicros renders naive UTC under any session zone, " +
    "including DST-ambiguous fall-back wall times") {
    // 2024-11-03T07:30:00Z is the SECOND 01:30 in America/Chicago:
    // cast(LTZ as NTZ) renders 01:30 local, and convert_timezone
    // re-interpreting that wall time resolves the overlap to the
    // EARLIER offset — one hour wrong. The reinterpret has no zone.
    val t = java.time.Instant.parse("2024-11-03T07:30:00Z")
      .toEpochMilli * 1000L
    val s = SparkTestBase.spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "America/Chicago")
    import s.implicits._
    val got = Seq(t).toDF("t")
      .select(date_format(TimeFns.ntzOfMicros(col("t")),
        "yyyy-MM-dd'T'HH:mm:ss")).as[String].collect().head
    assert(got == "2024-11-03T07:30:00", s"got $got")
    // and the round trip back through micros_of is the identity
    val rt = Seq(t).toDF("t")
      .select(org.apache.spark.sql.GraftPlanBridge.column(
        MicrosOf(org.apache.spark.sql.GraftPlanBridge.expression(
          TimeFns.ntzOfMicros(col("t"))))))
      .as[Long].collect().head
    assert(rt == t)
  }
}
