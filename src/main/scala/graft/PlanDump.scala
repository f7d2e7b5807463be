package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump `explain("formatted")` for every SparkEntry query to
  * files, for the optimization round's before/after plan evidence.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [suffix]
  *   → writes <outDir>/<query>_<suffix>.txt (suffix default "before").
  *
  * Driver-only (no job execution): `explain` plans the query without
  * running it, so a full-suite dump is seconds, not minutes. Streaming
  * queries whose sinks cannot be planned lazily fall back to recording
  * the exception message — better a loud marker than a silent skip.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "plans/r17"
    val suffix = if (args.length > 2) args(2) else "before"
    val spark = Harness.session()
    Files.createDirectories(Paths.get(out))
    val selected = Verify.subsetFilter("plandump", SparkEntry.queries)
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val text =
        try {
          val df = fn(spark, dir)
          val qe = df.queryExecution
          qe.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch {
          case e: Throwable =>
            s"PLAN UNAVAILABLE: ${e.getClass.getName}: ${e.getMessage}"
        }
      Files.writeString(Paths.get(s"$out/${name}_$suffix.txt"), text)
      // unpersist anything a query builder persisted during planning
      spark.sharedState.cacheManager.clearCache()
      println(s"[plandump] $name -> $out/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
