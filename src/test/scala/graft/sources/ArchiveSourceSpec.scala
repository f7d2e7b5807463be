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

  test("ArchiveWriter derives UTC periods regardless of session " +
    "time zone") {
    val root = Files.createTempDirectory("graft-ingest-tz").toString
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    // a near-midnight-UTC instant: under a negative-offset session,
    // date_format would have filed it under the previous day — and a
    // mis-filed period corrupts every UTC-day reader (PeriodCache's
    // closed-day test, day-range enumeration)
    spark.conf.set(tzKey, "America/Chicago")
    try {
      val pts = Seq((1, 1706832000000000L, 1.0)) // 2024-02-02T00:00:00Z
        .toDF("att_conf_id", "t_us", "value_r")
        .select(col("att_conf_id"),
          timestamp_micros(col("t_us")).as("data_time"), col("value_r"))
      ArchiveWriter.write(pts, root)
      val dirs = new java.io.File(s"$root/att_scalar_devdouble_ro/att_conf_id=1")
        .list().filter(_.startsWith("period=")).toSeq
      assert(dirs == Seq("period=2024-02-02"), s"got $dirs")
    } finally {
      spark.conf.set(tzKey, saved)
    }
  }

  test("catalog tables round-trip: parameterAt/history over written parquet") {
    val root = Files.createTempDirectory("graft-cat").toString
    val params = Seq(
      (7, 1000L, 1000L, "sec/dev/att/a", "mA"),
      (7, 2000L, 2100L, "sec/dev/att/a", "A"), // re-send: latest insert wins
      (7, 2000L, 2000L, "sec/dev/att/a", "STALE"),
      (7, 9000L, 9000L, "sec/dev/att/a", "kA"), // after the cutoff below
      (8, 1500L, 1500L, "sec/dev/att/b", "V"))
      .toDF("att_conf_id", "recv_time", "insert_time", "label", "unit")
    ArchiveWriter.writeParameters(params, root)
    val src = new ParquetArchiveSource(spark, root)
    // (7,2000) collapsed last-write-wins → 4 rows total
    assert(src.attParameter.count() == 4)
    val p = graft.api.ArchiveApi.parameterAt(src.attParameter, 7, 5000L)
      .collect()
    assert(p.length == 1)
    assert(p(0).getAs[Long]("recv_time") == 2000L)
    assert(p(0).getAs[String]("unit") == "A")

    val hist = Seq(
      (7, 100L, "add"), (7, 200L, "start"), (7, 200L, "start"), // dup ts
      (7, 300L, "stop"), (8, 150L, "add"))
      .toDF("att_conf_id", "time", "event")
    ArchiveWriter.writeHistory(hist, root)
    assert(src.attHistory.count() == 4)
    val h = graft.api.ArchiveApi.history(src.attHistory, 7, 0L, 1000L)
      .orderBy("rn").collect()
      .map(r => (r.getAs[Long]("time"), r.getAs[String]("event")))
    assert(h.toSeq == Seq((100L, "add"), (200L, "start"), (300L, "stop")))

    // reference's no-cutoff variants: latest_parameter / all_history
    val lp = graft.api.ArchiveApi.latestParameter(src.attParameter, 7)
      .collect()
    assert(lp.length == 1 && lp(0).getAs[Long]("recv_time") == 9000L)
    val all = graft.api.ArchiveApi.historyAll(src.attHistory, 7)
      .collect().map(_.getAs[Long]("time"))
    assert(all.toSeq == Seq(100L, 200L, 300L))
  }

  test("EventsArchiveAdapter synthesizes catalog-table views") {
    val ad = new EventsArchiveAdapter(spark, "/root/testdata/sf0.001")
    val param = ad.attParameter
    assert(param.columns.contains("recv_time")
      && param.columns.contains("label"))
    val hist = ad.attHistory.collect()
    assert(hist.nonEmpty && hist.forall(_.getString(2) == "add"))
  }

  test("CassandraArchiveSource: partition-key IN fan-out, never a period range") {
    assert(CassandraArchiveSource.periods("2024-01-30", "2024-02-02")
      == Seq("2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02"))
    val pred = CassandraArchiveSource
      .pointsPredicate(Seq(1, 2), "2024-01-01", "2024-01-02")
    val probe = Seq((1, "2024-01-01"), (1, "2024-01-03"), (3, "2024-01-01"))
      .toDF("att_conf_id", "period")
    // shape: And(In(att_conf_id, …), In(period, …)) — both partition-key
    // columns as CQL-pushable IN lists (a BETWEEN on period would unpush)
    import org.apache.spark.sql.catalyst.expressions.{And, In}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val cond = probe.where(pred).queryExecution.analyzed.collectFirst {
      case f: Filter => f.condition
    }.get
    cond match {
      case And(In(_, ids), In(_, ps)) =>
        assert(ids.length == 2 && ps.length == 2)
      case other => fail(s"unexpected predicate shape: $other")
    }
    // semantic equivalence with the parquet source's between-filter
    assert(probe.where(pred).collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("cassandra connector compile-fence: pinned wire contract") {
    // These constants ARE the wire contract with the connector jar the
    // offline build cannot resolve; a rename here must be a conscious
    // protocol change, never a refactor accident. An online CI
    // additionally verifies ConnectorClass resolves and a live EXPLAIN
    // shows both IN filters pushed (README §"Online validation").
    assert(CassandraArchiveSource.Format ==
      "org.apache.spark.sql.cassandra")
    assert(CassandraArchiveSource.ConnectorClass ==
      "org.apache.spark.sql.cassandra.DefaultSource")
    assert(CassandraArchiveSource.KeyspaceOption == "keyspace")
    assert(CassandraArchiveSource.TableOption == "table")
    // the predicate must survive translation into data-source filters —
    // the same entry point scan planning feeds to the connector's
    // unhandledFilters — as In filters on BOTH partition-key columns
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    import org.apache.spark.sql.execution.datasources.DataSourceStrategy
    import org.apache.spark.sql.sources
    val pred = CassandraArchiveSource
      .pointsPredicate(Seq(1, 2), "2024-01-01", "2024-01-02")
    val probe = Seq((1, "2024-01-01")).toDF("att_conf_id", "period")
    // analyzed, not optimized: ConvertToLocalRelation folds the filter
    // into the tiny probe relation before translation could see it
    val cond = probe.where(pred).queryExecution.analyzed.collectFirst {
      case f: Filter => f.condition
    }.get
    // translateFilter is protected[sql] in Scala but public in
    // bytecode — reflection is the sanctioned way to reach Spark's own
    // pushdown translation from outside the sql package
    val translate = DataSourceStrategy.getClass.getMethod("translateFilter",
      classOf[org.apache.spark.sql.catalyst.expressions.Expression],
      java.lang.Boolean.TYPE)
    translate.invoke(DataSourceStrategy, cond, java.lang.Boolean.FALSE)
      .asInstanceOf[Option[sources.Filter]] match {
      case Some(sources.And(sources.In(a, ids), sources.In(p, ps))) =>
        assert(a == "att_conf_id" && ids.toSeq == Seq(1, 2))
        assert(p == "period" &&
          ps.toSeq == Seq("2024-01-01", "2024-01-02"))
      case other => fail(s"predicate did not translate to pushable " +
        s"partition-key In filters: $other")
    }
    // reflection probe: absent in this offline sandbox by construction;
    // when the jar IS present the format string must resolve to it
    val present =
      try { Class.forName(CassandraArchiveSource.ConnectorClass); true }
      catch { case _: ClassNotFoundException => false }
    if (present) {
      val cls = org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource(CassandraArchiveSource.Format,
          spark.sessionState.conf)
      assert(cls.getName.startsWith("org.apache.spark.sql.cassandra"))
    }
    info(s"connector on classpath: $present")
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
