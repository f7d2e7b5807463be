package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.cache.ArchiveCache
import org.apache.spark.sql.functions._

class ArchiveSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def writeArchive(): String = {
    val root = Files.createTempDirectory("graft-arch").toString
    // 3 attributes × 3 days, laid out with the reference's partition key
    val rows = for {
      id <- 1 to 3
      day <- 1 to 3
      i <- 0 until 10
    } yield (id, f"2024-01-0$day", day.toLong * 1000000L + i, id * 100.0 + i)
    rows.toDF("att_conf_id", "period", "t", "value_r")
      .write.partitionBy("att_conf_id", "period")
      .parquet(s"$root/att_scalar_devdouble_ro")
    root
  }

  test("points scan prunes (att_conf_id, period) partitions at planning time") {
    val root = writeArchive()
    val src = new ParquetArchiveSource(spark, root)
    val df = src.points(Seq(2), "2024-01-02", "2024-01-03")
    assert(df.collect().length == 20)
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // both predicates must be partition filters, and the file count read
    // must reflect pruning: 2 of 9 (attr, day) directories touched,
    // ≤ 2 files each, vs 9 directories total
    assert(scan.toString().contains("PartitionFilters"))
    val numFiles = scan.metrics("numFiles").value
    assert(numFiles > 0 && numFiles <= 4, s"numFiles=$numFiles")
  }

  test("ArchiveWriter round-trip: derived periods, append, pruned read") {
    val root = Files.createTempDirectory("graft-ingest").toString
    val day1 = Seq((1, "2024-02-01 10:00:00", 1.0),
      (2, "2024-02-01 11:00:00", 2.0))
      .toDF("att_conf_id", "s", "value_r")
      .select(col("att_conf_id"), to_timestamp(col("s")).as("data_time"),
        col("value_r"))
    ArchiveWriter.write(day1, root)
    // append-only: a later batch for the next day
    val day2 = Seq((1, "2024-02-02 09:00:00", 3.0))
      .toDF("att_conf_id", "s", "value_r")
      .select(col("att_conf_id"), to_timestamp(col("s")).as("data_time"),
        col("value_r"))
    ArchiveWriter.write(day2, root)
    val src = new ParquetArchiveSource(spark, root)
    assert(src.points(Seq(1), "2024-02-01", "2024-02-02").count() == 2)
    val pruned = src.points(Seq(1), "2024-02-02", "2024-02-02")
    assert(pruned.collect().map(_.getAs[Double]("value_r")).toSeq
      == Seq(3.0))
  }

  test("PeriodCache over the parquet source serves closed days from cache") {
    val root = writeArchive()
    val src = new ParquetArchiveSource(spark, root)
    val cache = new ArchiveCache.PeriodCache(
      p => src.points(Seq(1, 2, 3), p, p), () => "2024-01-03")
    assert(cache.range("2024-01-01", "2024-01-03").count() == 90)
    val before = cache.fetches
    assert(cache.range("2024-01-01", "2024-01-03").count() == 90)
    assert(cache.fetches == before + 1) // only the open day re-fetched
  }
}
