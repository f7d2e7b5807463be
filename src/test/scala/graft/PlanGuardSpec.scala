package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Scale-regression guard over EVERY SparkEntry query plan: an
  * unpartitioned Window funnels the whole input through ONE task (the
  * round-2 p02 hotspot — 27 s of a 69 s bench from a single global
  * `row_number`), and a CartesianProduct is the all-pairs blow-up the
  * dedup operators exist to avoid. Neither may ever appear.
  *
  * knnBrute's intentional corpus×queries product needs no whitelist:
  * its broadcast plans as BroadcastNestedLoopJoin, not
  * CartesianProductExec — the guard thereby ALSO asserts the small
  * side stays broadcast.
  */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("no query plans an unpartitioned Window or a CartesianProduct") {
    val offenders = scala.collection.mutable.Buffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val globalWindows = df.queryExecution.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      if (globalWindows.nonEmpty)
        offenders += s"$name: unpartitioned Window"
      val cartesian = df.queryExecution.sparkPlan.collect {
        case c: CartesianProductExec => c
      }
      if (cartesian.nonEmpty) offenders += s"$name: CartesianProduct"
    }
    assert(offenders.isEmpty, offenders.mkString("; "))
  }
}
