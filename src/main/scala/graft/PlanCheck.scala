package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time and explain individual SparkEntry queries.
  * Usage: runMain graft.PlanCheck <sfDir> <query>[,query…] [explain] */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q09_point_in_time", "q10_history_limit")
    val doExplain = args.length > 2 && args(2) == "explain"
    // the BENCH-standard session (Harness): a hand-rolled builder here
    // once skipped DerivedDivBounds.register, so this tool explained
    // full-scan plans no production session executes — the opposite of
    // its purpose
    val spark = Harness.session()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      if (doExplain) { println(s"=== $name plan ==="); df.explain("formatted") }
      val t0 = System.nanoTime()
      val n = df.count()
      val t1 = System.nanoTime()
      df.foreach(_ => ())
      val t2 = System.nanoTime()
      println(f"=== $name rows=$n count=${(t1 - t0) / 1e9}%.2fs " +
        f"foreach=${(t2 - t1) / 1e9}%.2fs")
      // observe()-metrics (e.g. lshCandidates / simhashHammingDups
      // bucket-overflow accounting) — populated by the actions above.
      // CAVEAT: Spark does not surface CollectMetrics through every
      // execution shape (count/foreach on a derived plan can read
      // [null, 0] while a collect() on the operator's own frame reads
      // real values — see connectedComponents' in-code note); treat a
      // zero row here as "not surfaced", not "no overflow".
      df.queryExecution.observedMetrics.foreach { case (m, row) =>
        println(s"=== $name observed $m: $row")
      }
    }
    spark.stop()
  }
}
