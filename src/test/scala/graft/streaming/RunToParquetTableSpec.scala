package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** Pins [[StreamOps.runToParquetTable]]'s sink contract — the
  * executor-written replacement for the memory sink the oracled
  * streaming queries first shipped with (see its scaladoc for the
  * measured driver-OOM rationale). Three load-bearing behaviors:
  * complete-mode reruns OVERWRITE the fixed directory (last full
  * result wins, disk bounded at one copy), append-mode reruns CLEAR
  * before appending (no cross-run accumulation), and a zero-batch
  * input falls back to an empty frame with the stream's schema
  * instead of a read error on the empty directory. */
class RunToParquetTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", LongType)))

  private def writeInput(dir: String, rows: Seq[(String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("k", "v").coalesce(1).write
      .mode("overwrite").parquet(dir)
  }

  test("complete mode: rerun overwrites the fixed dir, last result wins") {
    val in = java.nio.file.Files
      .createTempDirectory("rtpt-complete-in").toString
    writeInput(in, Seq(("a", 1L), ("a", 2L), ("b", 5L)))
    def run(): Map[String, Long] = {
      val stream = spark.readStream.schema(schema).parquet(in)
        .groupBy(col("k")).agg(sum(col("v")).as("s"))
      StreamOps.runToParquetTable(stream, "complete", spark,
          "spec-complete")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(run() == Map("a" -> 3L, "b" -> 5L))
    // changed input, SAME sink key: the rerun must show only the new
    // result — stale files from run 1 must not survive the overwrite
    writeInput(in, Seq(("c", 7L)))
    assert(run() == Map("c" -> 7L))
  }

  test("append mode: rerun clears the dir first — no accumulation") {
    val in = java.nio.file.Files
      .createTempDirectory("rtpt-append-in").toString
    writeInput(in, Seq(("x", 1L), ("y", 2L)))
    def run(): Seq[(String, Long)] = {
      val stream = spark.readStream.schema(schema).parquet(in)
        .select(col("k"), col("v"))
      StreamOps.runToParquetTable(stream, "append", spark, "spec-append")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    }
    val first = run()
    assert(first == Seq(("x", 1L), ("y", 2L)))
    // identical rerun: an accumulating sink would now show 4 rows
    assert(run() == first)
  }

  test("zero-batch input falls back to an empty frame with the schema") {
    val in = java.nio.file.Files
      .createTempDirectory("rtpt-empty-in").toString
    val stream = spark.readStream.schema(schema).parquet(in)
      .select(col("k"), col("v"))
    val out = StreamOps.runToParquetTable(stream, "append", spark,
      "spec-empty")
    assert(out.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(out.count() == 0L)
  }

  test("unsupported mode is rejected loudly") {
    val stream = spark.readStream.schema(schema)
      .parquet(java.nio.file.Files
        .createTempDirectory("rtpt-mode-in").toString)
    val e = intercept[IllegalArgumentException] {
      StreamOps.runToParquetTable(stream, "update", spark, "spec-mode")
    }
    assert(e.getMessage.contains("unsupported sink mode"))
  }
}
