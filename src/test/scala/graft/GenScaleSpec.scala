package graft

import org.scalatest.funsuite.AnyFunSuite

/** The GenScale tag-collision guard (GenScale.validateTagDisjointness):
  * tags only exist for copy i > 0, so the copies==1 skip is load-bearing
  * — this spec pins both sides of that conditional so it cannot
  * silently rot (commit d981105's behavior, now under test).
  */
class GenScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("a _<digits>-bearing vocabulary PASSES at copies=1 " +
    "(verbatim copy, no tags to collide with)") {
    GenScale.validateTagDisjointness(
      docs("plain words here", "token foo_1 inside"), copies = 1)
  }

  test("the same vocabulary TRIPS at copies=2") {
    val e = intercept[IllegalArgumentException] {
      GenScale.validateTagDisjointness(
        docs("plain words here", "token foo_1 inside"), copies = 2)
    }
    assert(e.getMessage.contains("_<digits>"))
  }

  test("a clean vocabulary passes at copies=2; mid-token digits or a " +
    "trailing underscore do not trip the suffix check") {
    GenScale.validateTagDisjointness(
      docs("plain words here", "v2_x has digits but no _digits suffix",
        "trailing_ underscore"), copies = 2)
  }
}
