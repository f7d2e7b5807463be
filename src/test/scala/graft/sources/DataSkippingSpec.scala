package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** [[DataSkipping]] / [[TsStatsFileIndex]]: file-level time skipping
  * over flat multi-file archives, including the unadjusted-µs
  * (TIMESTAMP_NTZ) encoding whose ROW-GROUP stats Spark cannot use
  * (EncodingMatrixSpec pins that limitation — this is the tier above
  * it).
  */
class DataSkippingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import DataSkipping._

  private val Base = 1704412800000000L // 2024-01-05T00:00:00Z, epoch-µs
  private val DayUs = 86400000000L
  private val Days = 8
  private val PerDay = 120

  /** One file per day, `Days` days, written under the given ts
    * projection; returns the events dir root. */
  private def writeDaily(label: String)(ts: org.apache.spark.sql.Column)
      : String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft-skip-$label").toString
    (0 until Days).foreach { d =>
      val rows = (0 until PerDay).map { i =>
        val id = (d * PerDay + i).toLong
        (id, Base + d * DayUs + i.toLong * 60000000L, 1L + (i % 2),
          "click", 1.0 + id, s"p$id")
      }.toDF("event_id", "t_us", "user_id", "event_type", "value", "props")
      rows.select(col("event_id"), ts.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("append").parquet(s"$dir/events.parquet")
    }
    dir
  }

  private def scanStats(df: DataFrame): (Long, Long) = {
    df.collect() // force execution so metrics populate
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec =>
        (f.metrics("numFiles").value, f.metrics("numOutputRows").value)
    }
    (scans.map(_._1).sum, scans.map(_._2).sum)
  }

  private def dayWindow(adapter: EventsArchiveAdapter, d: Int): DataFrame =
    adapter.pointsAll.where(EventsArchiveAdapter.tsRangeUs(
      Base + d * DayUs, Base + (d + 1) * DayUs - 1))

  test("unadjusted-µs multi-file archive: a 1-day window reads 1 file " +
    "of 8 and matches the unpruned result") {
    val dir = writeDaily("ntz")(
      timestamp_micros(col("t_us")).cast("timestamp_ntz"))
    val adapter = new EventsArchiveAdapter(spark, dir)
    val q = dayWindow(adapter, 3)
    val (files, rows) = scanStats(q)
    assert(files == 1, s"expected 1 of $Days files scanned, got $files")
    assert(rows == PerDay)
    // ground truth via the stock reader + the same filter
    val plain = spark.read.parquet(s"$dir/events.parquet")
      .where(col("ts").between(
        timestamp_micros(lit(Base + 3 * DayUs)).cast("timestamp_ntz"),
        timestamp_micros(lit(Base + 4 * DayUs - 1)).cast("timestamp_ntz")))
    assert(q.select("point_id").collect().map(_.getLong(0)).toSet ==
      plain.select("event_id").collect().map(_.getLong(0)).toSet)
  }

  test("legacy epoch-nano multi-file archive prunes identically") {
    val dir = writeDaily("nano")((col("t_us") * 1000L))
    val adapter = new EventsArchiveAdapter(spark, dir)
    val (files, rows) = scanStats(dayWindow(adapter, 5))
    assert(files == 1 && rows == PerDay,
      s"nano-long archive: $files files / $rows rows")
  }

  test("an unbounded query and a full-range query keep every file") {
    val dir = writeDaily("full")(
      timestamp_micros(col("t_us")).cast("timestamp_ntz"))
    val adapter = new EventsArchiveAdapter(spark, dir)
    val (allFiles, allRows) = scanStats(adapter.pointsAll)
    assert(allFiles == Days && allRows == Days * PerDay)
    val (wFiles, wRows) = scanStats(adapter.pointsAll.where(
      EventsArchiveAdapter.tsRangeUs(Base, Base + Days * DayUs)))
    assert(wFiles == Days && wRows == Days * PerDay,
      s"full-range window dropped files: $wFiles")
  }

  test("non-ts predicates do not prune; conjunction with a ts bound " +
    "still does") {
    val dir = writeDaily("conj")(
      timestamp_micros(col("t_us")).cast("timestamp_ntz"))
    val adapter = new EventsArchiveAdapter(spark, dir)
    val (f1, _) = scanStats(adapter.pointsAll.where(col("user_id") === 1L))
    assert(f1 == Days)
    // the scan still surfaces the whole pruned FILE (row-group stats
    // are unusable on NTZ — EncodingMatrixSpec); the win is files==1
    val q2 = dayWindow(adapter, 2).where(col("user_id") === 1L)
    val (f2, r2) = scanStats(q2)
    assert(f2 == 1 && r2 == PerDay, s"conjunction: $f2 files / $r2 rows")
    assert(q2.count() == PerDay / 2)
  }

  test("single-file layouts stay on the stock reader path") {
    // the LIVE driver testdata is single-file: eligibility must be false
    assert(!TsStatsFileIndex.eligible(spark,
      "/root/testdata/sf0.001/events.parquet"))
    val multi = writeDaily("gate")(
      timestamp_micros(col("t_us")).cast("timestamp_ntz"))
    assert(TsStatsFileIndex.eligible(spark, s"$multi/events.parquet"))
  }

  test("boundsOf covers every pushed comparison shape, both operand " +
    "orders, and ignores foreign predicates") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val ts = AttributeReference("ts", TimestampNTZType)()
    val other = AttributeReference("value", LongType)()
    def lit(v: Long) = Literal(v, TimestampNTZType)
    assert(boundsOf(GreaterThanOrEqual(ts, lit(10)), "ts") ==
      Bounds(Some(10), None))
    assert(boundsOf(GreaterThan(ts, lit(10)), "ts") == Bounds(Some(11), None))
    assert(boundsOf(LessThanOrEqual(ts, lit(10)), "ts") ==
      Bounds(None, Some(10)))
    assert(boundsOf(LessThan(ts, lit(10)), "ts") == Bounds(None, Some(9)))
    assert(boundsOf(EqualTo(ts, lit(10)), "ts") == Bounds(Some(10), Some(10)))
    assert(boundsOf(GreaterThan(lit(10), ts), "ts") == Bounds(None, Some(9)))
    assert(boundsOf(LessThan(lit(10), ts), "ts") == Bounds(Some(11), None))
    assert(boundsOf(GreaterThanOrEqual(other,
      Literal(5L, LongType)), "ts") == Unbounded)
    // conjunction folding narrows from both sides
    val b = Seq(GreaterThanOrEqual(ts, lit(10)), LessThan(ts, lit(20)))
      .map(boundsOf(_, "ts")).foldLeft(Unbounded)(_ and _)
    assert(b == Bounds(Some(10), Some(19)))
  }

  test("files with unusable stats are always kept (conservative)") {
    import org.apache.hadoop.fs.{FileStatus, Path}
    def fs(name: String) = {
      val s = new FileStatus(); s.setPath(new Path(s"/x/$name")); s
    }
    val known = fs("a"); val unknown = fs("b")
    val idx = TsStatsFileIndex.seeded(spark, new Path("/x"), "ts",
      Seq(known, unknown),
      Map(known.getPath.toString -> TsStats(0L, 100L, UnitMicros)))
    val kept = idx.prunedFor(Bounds(Some(1000L), Some(2000L)))
    assert(kept == Seq(unknown)) // known file misses the range; b kept
    assert(idx.prunedFor(Unbounded) == Seq(known, unknown))
  }

  test("refresh() picks up files appended after index build (R1 " +
    "open-day growth) and indexes only the new footers") {
    import spark.implicits._
    val dir = writeDaily("refresh")(
      timestamp_micros(col("t_us")).cast("timestamp_ntz"))
    val root = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val idx = new TsStatsFileIndex(spark, root, "ts")
    val before = idx.inputFiles.toSet
    assert(before.size == Days)
    // a window over the not-yet-written day 9 prunes to zero files
    val day9 = Bounds(Some(Base + Days * DayUs),
      Some(Base + (Days + 1) * DayUs - 1))
    assert(idx.prunedFor(day9).isEmpty)
    // day 9 arrives (the open day rolls a new file into the archive)
    val rows = (0 until PerDay).map { i =>
      val id = (Days * PerDay + i).toLong
      (id, Base + Days * DayUs + i.toLong * 60000000L, 1L, "click",
        1.0 + id, s"p$id")
    }.toDF("event_id", "t_us", "user_id", "event_type", "value", "props")
    rows.select(col("event_id"),
        timestamp_micros(col("t_us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(root.toString)
    idx.refresh()
    val after = idx.inputFiles.toSet
    assert(before.subsetOf(after) && after.size == Days + 1)
    // the appended file is both LISTED and stats-indexed: the day-9
    // window now keeps exactly it, and day-0 still keeps one old file
    val kept9 = idx.prunedFor(day9).map(_.getPath.toString)
    assert(kept9.toSet == after -- before, s"day-9 kept: $kept9")
    assert(idx.prunedFor(Bounds(Some(Base), Some(Base + DayUs - 1)))
      .map(_.getPath.toString).toSet.subsetOf(before))
  }

  test("millisecond-annotated stats convert to µs before overlap") {
    val s = TsStats(1000L, 2000L, UnitMillis) // 1e6..2e6 µs
    assert(overlaps(s, Bounds(Some(1500000L), None)))
    assert(!overlaps(s, Bounds(Some(2000001L), None)))
    assert(!overlaps(s, Bounds(None, Some(999999L))))
  }
}
