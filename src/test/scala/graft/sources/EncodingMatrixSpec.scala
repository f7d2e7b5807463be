package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Fixture-contract matrix: the driver has regenerated `events.parquet`
  * under two different `ts` encodings across rounds — TIMESTAMP(NANOS)
  * (read as an epoch-nano bigint via nanosAsLong) and the current
  * parquet `timestamp[us]` (Spark TIMESTAMP_NTZ). Round 8 lost its
  * entire core query surface because only the former was exercised in
  * tests; this suite pins BOTH encodings through the SAME adapter and
  * helper predicates so any future regeneration fails loudly in
  * `sbt test`, not just in the driver's verify.
  *
  * Strategy: one logical dataset, written twice (µs-timestamp and
  * nano-long), must produce IDENTICAL `pointsAll` output and identical
  * rows under every `ts*Us` helper — plus footer pushdown in both. A
  * final case smoke-runs the flagship entry against the LIVE
  * /root/testdata files, so the suite also fails if a third encoding
  * ever appears. */
class EncodingMatrixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // 2024-01-05T00:00:00Z and friends, epoch-µs
  private val Base = 1704412800000000L
  private val HourUs = 3600000000L

  /** One logical dataset: 48 hourly points across 2 users × 2 types. */
  private def logical: DataFrame = {
    import spark.implicits._
    (0 until 48).map { i =>
      (i.toLong, Base + i * HourUs, (i % 2).toLong + 1L,
        if (i % 4 < 2) "click" else "purchase", 100.0 + i, s"p$i")
    }.toDF("event_id", "t_us", "user_id", "event_type", "value", "props")
  }

  /** Written as parquet timestamp[us] (TIMESTAMP_NTZ) — the current
    * driver encoding. */
  private lazy val ntzDir = {
    val dir = Files.createTempDirectory("graft-enc-ntz").toString
    logical.select(col("event_id"),
      timestamp_micros(col("t_us")).cast("timestamp_ntz").as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Written as epoch-nano bigint — the legacy encoding as it appears
    * after the nanosAsLong read. */
  private lazy val nanoDir = {
    val dir = Files.createTempDirectory("graft-enc-nano").toString
    logical.select(col("event_id"), (col("t_us") * 1000L).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Written as parquet `timestamp[us]` ADJUSTED to UTC (Spark
    * TimestampType/LTZ) — the third plausible regeneration. The
    * default parquet output for LTZ is INT96, whose stats parquet
    * cannot push predicates against, so the writer pins
    * TIMESTAMP_MICROS; under the UTC session zone the stored micros
    * equal the NTZ encoding's. */
  private lazy val ltzDir = {
    val dir = Files.createTempDirectory("graft-enc-ltz").toString
    val key = "spark.sql.parquet.outputTimestampType"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try logical.select(col("event_id"),
      timestamp_micros(col("t_us")).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.set(key, saved)
    dir
  }

  private def rows(df: DataFrame): Set[(Long, Long, String, Long, Double)] =
    df.select("point_id", "att_conf_id", "att_name", "t", "value_r")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4))).toSet

  test("pointsAll is encoding-invariant (µs-ntz ≡ nano-long ≡ µs-ltz)") {
    val ntz = new EventsArchiveAdapter(spark, ntzDir)
    val nano = new EventsArchiveAdapter(spark, nanoDir)
    val ltz = new EventsArchiveAdapter(spark, ltzDir)
    val a = rows(ntz.pointsAll)
    assert(a.nonEmpty && a == rows(nano.pointsAll)
      && a == rows(ltz.pointsAll))
    // the derived t is the exact epoch-µs of the fixture
    assert(ntz.pointsAll.agg(min("t")).head().getLong(0) == Base)
  }

  test("every ts helper selects identical rows under both encodings") {
    val t0 = Base + 10 * HourUs
    val t1 = Base + 30 * HourUs
    def run(dir: String): Seq[Set[Long]] = {
      val p = new EventsArchiveAdapter(spark, dir).pointsAll
      Seq(
        p.where(EventsArchiveAdapter.tsRangeUs(t0, t1)),
        p.where(EventsArchiveAdapter.tsGeLtUs(t0, t1)),
        p.where(EventsArchiveAdapter.tsGtLtUs(t0, t1)),
        p.where(EventsArchiveAdapter.tsLtUs(t1)))
        .map(_.select("point_id").collect().map(_.getLong(0)).toSet)
    }
    val ntz = run(ntzDir)
    assert(ntz == run(nanoDir) && ntz == run(ltzDir))
    // semantics, not just invariance: inclusive 10..30 = 21 hourly points
    assert(ntz(0).size == 21 && ntz(1).size == 20
      && ntz(2).size == 19 && ntz(3).size == 30)
  }

  test("helper predicates reach the parquet footer in every encoding") {
    Seq("ntz" -> ntzDir, "nano" -> nanoDir, "ltz" -> ltzDir)
      .foreach { case (label, dir) =>
      val p = new EventsArchiveAdapter(spark, dir).pointsAll
        .where(EventsArchiveAdapter.tsRangeUs(
          Base + 10 * HourUs, Base + 30 * HourUs))
      val pushed = p.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metadata.getOrElse("PushedFilters", "")
      }
      assert(pushed.exists(s => s.contains("GreaterThanOrEqual(ts")
        && s.contains("LessThanOrEqual(ts")),
        s"$label: raw ts bounds missing from the footer (pushed=$pushed)")
    }
  }

  test("row-group skipping measured per encoding: long and adjusted-µs " +
    "prune, unadjusted-µs CANNOT (Spark builds no stats predicate)") {
    // the driver's events file is ONE row group, so the green
    // pushdown assertions above prove the predicate REACHES the
    // footer but not that groups get skipped. This writes ts-sorted
    // files with deliberately tiny row groups and measures the scan's
    // surfaced rows under a ~2% time window, per encoding:
    //  - epoch-nano LONG: skips (stats predicates on int64 work);
    //  - ADJUSTED-to-UTC µs timestamp (what ArchiveWriter pins via
    //    TIMESTAMP_MICROS output): skips;
    //  - UNADJUSTED µs (the driver's current events encoding): reads
    //    EVERY group — Spark's parquet filter layer constructs stats
    //    predicates only for adjusted timestamps, and the FILE
    //    annotation governs (disabling NTZ inference or forcing an
    //    LTZ read schema changes nothing; all three were measured).
    // The third expectation is asserted too: if a Spark upgrade ever
    // starts pruning unadjusted files, this fails and the limitation
    // note (and the ArchiveWriter choice) should be revisited.
    import spark.implicits._
    val n = 50000
    val minuteUs = 60000000L
    val logicalBig = (0 until n).map(i =>
      (i.toLong, Base + i.toLong * minuteUs, 1L, "click", 1.0 + i, s"p$i"))
      .toDF("event_id", "t_us", "user_id", "event_type", "value", "props")
    val t0 = Base + 30000L * minuteUs
    val t1 = Base + 31000L * minuteUs

    def measure(label: String)(writeTs: DataFrame => DataFrame): Long = {
      val dir = Files.createTempDirectory(s"graft-rg-$label").toString
      writeTs(logicalBig)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .coalesce(1).sortWithinPartitions("ts")
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite").parquet(s"$dir/events.parquet")
      // filter-only plan: no exchange → no AQE wrapper, so the scan
      // node (and its metrics) stays reachable from executedPlan
      val q = new EventsArchiveAdapter(spark, dir).pointsAll
        .where(EventsArchiveAdapter.tsRangeUs(t0, t1))
      assert(q.collect().length == 1001, s"$label: wrong row count")
      val scanned = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numOutputRows").value
      }.sum
      info(s"$label: scan surfaced $scanned of $n rows " +
        s"(${math.round(scanned * 100.0 / n)}%) for a 1001-row window")
      scanned
    }

    val long = measure("long")(df =>
      df.select((col("t_us") * 1000).as("ts"), col("*")))
    assert(long > 0 && long < n / 4,
      s"epoch-long encoding did not row-group-prune: $long of $n")

    val key = "spark.sql.parquet.outputTimestampType"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    val adjusted =
      try measure("adjusted-us")(df =>
        df.select(timestamp_micros(col("t_us")).as("ts"), col("*")))
      finally spark.conf.set(key, saved)
    assert(adjusted > 0 && adjusted < n / 4,
      s"adjusted-µs encoding did not row-group-prune: $adjusted of $n")

    val unadjusted = measure("unadjusted-us")(df =>
      df.select(timestamp_micros(col("t_us")).cast("timestamp_ntz")
        .as("ts"), col("*")))
    assert(unadjusted == n,
      s"unadjusted-µs files suddenly prune ($unadjusted of $n) — a " +
        "Spark upgrade lifted the limitation; revisit the adapter and " +
        "ArchiveWriter scaladocs")
  }

  test("an unknown event type gets a NULL att_conf_id, matching the " +
    "oracle's CASE-without-ELSE (the old -1 default aliased slots)") {
    val dir = Files.createTempDirectory("graft-enc-unknown").toString
    logical.withColumn("event_type",
      when(col("event_id") === 0, lit("refund")) // a SIXTH type
        .otherwise(col("event_type")))
      .select(col("event_id"),
        timestamp_micros(col("t_us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val p = new EventsArchiveAdapter(spark, dir).pointsAll
      .where(col("event_type") === "refund")
      .select("att_conf_id").collect()
    assert(p.length == 1 && p.head.isNullAt(0),
      s"unknown type must yield null att_conf_id, got ${p.toSeq}")
  }

  test("adapter leaves the session's nanosAsLong untouched on " +
    "non-NANOS data") {
    // the conf is set ON DEMAND when a read rejects TIMESTAMP(NANOS)
    // files — an earlier version set it unconditionally on every
    // access, silently changing how unrelated parquet reads in the
    // same session handle NANOS files
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    Seq(ntzDir, nanoDir, ltzDir).foreach { dir =>
      new EventsArchiveAdapter(spark, dir).pointsAll.limit(1).collect()
    }
    assert(spark.conf.getOption(key) == before)
  }

  test("derived period is the UTC day regardless of session time zone") {
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    // negative offset: date_format would file the fixture's
    // midnight-UTC rows (Base itself is one) under the PREVIOUS day
    spark.conf.set(tzKey, "America/Chicago")
    try {
      val rows = new EventsArchiveAdapter(spark, ntzDir).pointsAll
        .select("t", "period").collect()
      assert(rows.exists(_.getLong(0) % 86400000000L == 0))
      rows.foreach { r =>
        val utcDay = java.time.Instant
          .ofEpochSecond(r.getLong(0) / 1000000L)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
        assert(r.getString(1) == utcDay,
          s"t=${r.getLong(0)}: period ${r.getString(1)} != UTC $utcDay")
      }
    } finally spark.conf.set(tzKey, saved)
  }

  test("flagship entry runs against the LIVE driver testdata") {
    // guards the fixture contract itself: if the driver regenerates
    // /root/testdata under yet another encoding, this fails in sbt test
    assert(graft.SparkEntry.entry(spark).limit(1).count() == 1)
  }
}
