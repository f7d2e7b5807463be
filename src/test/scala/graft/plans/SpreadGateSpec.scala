package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The docsSpread scale gate's SCALE branch (r17 change, r18 test —
  * VERDICT item 5): the gate skips the round-robin repartition of the
  * documents scan when the scan already arrives at least as parallel
  * as the session. Locally the one-row-group bench file never fires
  * it, so this spec builds a MULTI-SPLIT documents fixture (many files
  * + a tiny maxPartitionBytes so each file is its own scan partition)
  * and pins:
  *  1. the no-exchange branch: the scale layout's plan carries NO
  *     RoundRobinPartitioning exchange (the 100 TB corpus must not be
  *     text-shuffled for "parallelism" it already has);
  *  2. the local branch still spreads: the single-file layout's plan
  *     DOES carry the repartition;
  *  3. partition-independence in practice: both layouts produce
  *     identical results for a representative pipeline query.
  */
class SpreadGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("docsSpread skips the round-robin exchange when the scan is " +
    "already parallel, and results are layout-independent") {
    val base = java.nio.file.Files
      .createTempDirectory("spreadgate").toString
    val docs = spark.range(600).select(
      col("id").as("doc_id"),
      concat(lit("tok"), pmod(col("id"), lit(13)).cast("string"),
        lit(" tok"), pmod(col("id"), lit(7)).cast("string"),
        lit(" w"), col("id").cast("string")).as("text"),
      concat(lit("l"), pmod(col("id"), lit(3)).cast("string")).as("lang"),
      concat(lit("s"), pmod(col("id"), lit(5)).cast("string")).as("source"),
      length(concat(lit("tok"), pmod(col("id"), lit(13)).cast("string"),
        lit(" tok"), pmod(col("id"), lit(7)).cast("string"),
        lit(" w"), col("id").cast("string"))).cast("long").as("n_chars"))
    // single-file layout (the bench shape: 1 scan partition)
    docs.coalesce(1).write.mode("overwrite")
      .parquet(s"$base/one/documents.parquet")
    // multi-file layout: more files than the session's parallelism
    val target = spark.sparkContext.defaultParallelism
    docs.repartition(target + 4).write.mode("overwrite")
      .parquet(s"$base/many/documents.parquet")
    val savedMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val savedOpen = spark.conf.get("spark.sql.files.openCostInBytes")
    // one split per file: without this the tiny files pack into one
    // split and the gate (correctly) keeps repartitioning
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    spark.conf.set("spark.sql.files.openCostInBytes", "1024")
    try {
      val q = graft.api.PipelineQueries.queries("p14_token_counts")
      def roundRobins(dir: String): Int = {
        val plan = q(spark, dir).queryExecution.executedPlan.toString()
        "RoundRobinPartitioning".r.findAllIn(plan).length
      }
      val scanParts = spark.read
        .parquet(s"$base/many/documents.parquet").rdd.getNumPartitions
      assert(scanParts >= target,
        s"fixture defect: $scanParts scan partition(s) < $target — " +
          "the gate's scale branch would not fire")
      assert(roundRobins(s"$base/many") == 0,
        "scale branch still round-robin-shuffles an already-parallel scan")
      val many = q(spark, s"$base/many").collect().toSeq
      // local branch under DEFAULT split conf (the tiny
      // maxPartitionBytes above splits even the single file, which
      // correctly disarms the gate there too)
      spark.conf.set("spark.sql.files.maxPartitionBytes", savedMax)
      spark.conf.set("spark.sql.files.openCostInBytes", savedOpen)
      assert(roundRobins(s"$base/one") > 0,
        "local branch lost its spread repartition")
      val one = q(spark, s"$base/one").collect().toSeq
      assert(one == many,
        s"results depend on input layout: one=${one.take(3)}… " +
          s"many=${many.take(3)}…")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", savedMax)
      spark.conf.set("spark.sql.files.openCostInBytes", savedOpen)
    }
  }
}
