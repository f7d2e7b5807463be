package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SessionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def events = Seq(
    // user a: events at 0, 10, 50 with gap 20 → sessions {0,10}, {50}
    ("a", 1L, 0L), ("a", 2L, 10L), ("a", 3L, 50L),
    // user b: single event
    ("b", 4L, 100L),
    // user c: exactly-at-gap boundary is the SAME session (strict >)
    ("c", 5L, 0L), ("c", 6L, 20L), ("c", 7L, 41L))
    .toDF("k", "id", "t")

  test("sessionize: strict-gap splits, per-key ordinals") {
    val r = Sessions.sessionize(events, Seq("k"), "t", "id", gapUs = 20L)
      .select("k", "id", "session_seq").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2))).toSet
    assert(r == Set(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 2L),
      ("b", 4L, 1L),
      ("c", 5L, 1L), ("c", 6L, 1L), // gap == 20 keeps the session
      ("c", 7L, 2L))) // gap 21 > 20 splits
  }

  test("sessionStats: counts and durations per session") {
    val r = Sessions.sessionStats(events, Seq("k"), "t", "id", gapUs = 20L)
      .orderBy("k", "session_seq").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getLong(5)))
    assert(r.toSeq == Seq(
      ("a", 1L, 2L, 10L), ("a", 2L, 1L, 0L),
      ("b", 1L, 1L, 0L),
      ("c", 1L, 2L, 20L), ("c", 2L, 1L, 0L)))
  }

  test("topTerms: bounded top-k matches the window formulation") {
    val d = Seq(
      (0L, "en", "a a a b b c"), (1L, "en", "b d"), (2L, "fr", "x y x"))
      .toDF("doc_id", "lang", "text")
    val r = TextStats.topTerms(d, Seq("lang"), k = 2)
      .orderBy("lang", "rn").collect()
      .map(row => (row.getString(0), row.getLong(1), row.getString(2),
        row.getLong(3)))
    // en: a=3, b=3 → tie broken alphabetically; fr: x=2, y=1
    assert(r.toSeq == Seq(
      ("en", 1L, "a", 3L), ("en", 2L, "b", 3L),
      ("fr", 1L, "x", 2L), ("fr", 2L, "y", 1L)))
  }

  test("bigramNovelty: shared bigrams aren't novel, unique ones are") {
    val d = Seq(
      (0L, "a b c d"),   // bigrams: ab bc cd
      (1L, "a b x y"),   // bigrams: ab bx xy — shares 'a b' with doc 0
      (2L, "z z"))       // bigram: zz — unique
      .toDF("doc_id", "text")
    val r = TextStats.bigramNovelty(d).orderBy("doc_id").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    assert(r.toSeq == Seq((0L, 3L, 2L), (1L, 3L, 2L), (2L, 1L, 1L)))
  }

  test("tokenQuantiles: lower-interpolation exact quantiles") {
    // en token counts: 1,2,3,4,5 → n=5, median idx ⌊4·.5⌋+1=3 → 3,
    // p90 idx ⌊4·.9⌋+1=4 → 4
    val d = (1 to 5).map(i =>
      (i.toLong, "en", (1 to i).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val r = TextStats.tokenQuantiles(d, Seq("lang")).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 5L && row.getLong(2) == 3L
      && row.getLong(3) == 4L)
  }
}
