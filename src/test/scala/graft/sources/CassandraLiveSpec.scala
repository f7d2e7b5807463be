package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** LIVE Cassandra-connector validation — the runtime evidence the
  * offline sandbox cannot buy (no connector jar resolves, no cluster
  * exists; the wire contract itself is pinned offline by
  * ArchiveSourceSpec's compile-fence test). `tools/online_check.sh`
  * boots a dockerized Cassandra, seeds the HDB++-shaped schema
  * (hdbpp.py:95-208) and runs this suite with the connector jar on the
  * test classpath and `GRAFT_CASSANDRA_HOST` set.
  *
  * Offline this whole suite is SKIPPED (scalatest `assume`), never
  * failed — `sbt test` stays green in the sandbox.
  */
class CassandraLiveSpec extends AnyFunSuite {

  private val host = sys.env.get("GRAFT_CASSANDRA_HOST")

  private def connectorPresent: Boolean =
    try { Class.forName(CassandraArchiveSource.ConnectorClass); true }
    catch { case _: ClassNotFoundException => false }

  /** Fresh session per suite: `spark.cassandra.connection.host` must be
    * set before the connector plans any scan, and the shared test
    * session (graft.SparkTestBase) is built without it. */
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-cassandra-live")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.cassandra.connection.host", host.getOrElse(""))
    .getOrCreate()

  private def live[A](body: => A): A = {
    assume(host.isDefined,
      "GRAFT_CASSANDRA_HOST unset - live Cassandra checks skipped")
    assume(connectorPresent,
      s"${CassandraArchiveSource.ConnectorClass} not on classpath - " +
        "run via tools/online_check.sh")
    body
  }

  test("live: load() reads att_conf through the connector") {
    live {
      val src = new CassandraArchiveSource(spark)
      val conf = src.attConf.collect()
      assert(conf.nonEmpty, "seeded att_conf came back empty")
      assert(conf.map(_.getAs[Int]("att_conf_id")).toSet == Set(1, 2))
    }
  }

  test("live: points() returns exactly the seeded partitions") {
    live {
      val src = new CassandraArchiveSource(spark)
      // ids {1} x days {01, 02}: excludes id 2's day-01 row and id 1's
      // day-03 row - the partition-key fan-out doing its job
      val rows = src.points(Seq(1), "2024-01-01", "2024-01-02").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Double]("value_r")).toSet == Set(1.5, 2.5))
    }
  }

  test("live: EXPLAIN pushes both partition-key IN filters") {
    live {
      val src = new CassandraArchiveSource(spark)
      val plan = src.points(Seq(1, 2), "2024-01-01", "2024-01-02")
        .queryExecution.executedPlan.toString
      // the connector's scan node lists its pushed CQL predicates; both
      // partition-key columns must appear (a period RANGE would unpush
      // into a full-table scan + Spark-side filter - the exact failure
      // pointsPredicate is designed to avoid)
      assert(plan.contains("att_conf_id"),
        s"att_conf_id filter not visible in scan:\n$plan")
      assert(plan.contains("period"),
        s"period filter not visible in scan:\n$plan")
      // connector versions differ on whether a safety re-check Filter
      // remains above a fully-pushed scan, so its absence is reported,
      // not asserted
      info(s"residual Spark-side filter: ${plan.contains("Filter (")}")
    }
  }
}
