package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest side of the archive: writes point rows into the
  * `(att_conf_id, period)`-partitioned parquet layout that
  * [[ParquetArchiveSource]] scans — the role Cassandra's partition key
  * plays in the reference (`hdbpp.py:274-287`). The reference has no
  * ingest path (HDB++ archivers write Cassandra); a standalone library
  * needs one.
  *
  * Scale notes:
  *  - `period` is derived from the timestamp when absent, so writers
  *    can feed raw `(att_conf_id, data_time, value_r, …)` rows;
  *  - rows are pre-repartitioned on the partition columns so each
  *    day-partition directory is written by few tasks (without it,
  *    every task writes a sliver of every open partition — the
  *    many-small-files failure mode);
  *  - append mode is the contract (archives are append-only by day,
  *    which is exactly what makes [[graft.cache.ArchiveCache.PeriodCache]]'s
  *    closed-day persist valid).
  */
object ArchiveWriter {

  /** Write `points` into `root/<table>/att_conf_id=…/period=…/`.
    * Requires `att_conf_id` and `data_time`; derives `period`
    * (UTC date string) if missing.
    *
    * Timestamps are written as parquet TIMESTAMP_MICROS ADJUSTED to
    * UTC — a load-bearing choice, not a default: Spark's parquet
    * filter layer constructs row-group stats predicates ONLY for
    * adjusted timestamp columns (measured in EncodingMatrixSpec —
    * unadjusted µs and INT96, the session default for LTZ, both read
    * every group under a pushed time bound), so this is what makes a
    * within-day `data_time` range prune at the row-group layer on
    * top of the partition-dir pruning. */
  def write(points: DataFrame, root: String,
      table: String = "att_scalar_devdouble_ro",
      mode: String = "append"): Unit = {
    val withPeriod =
      if (points.columns.contains("period")) points
      else points.withColumn("period",
        // UTC day by construction — date_format renders in the SESSION
        // zone, which on a non-UTC caller session would file
        // near-midnight rows under the neighboring day and break every
        // UTC-day reader (PeriodCache closed-day test, day enumeration)
        graft.functions.TimeFns.utcDay(unix_micros(col("data_time"))))
    val conf = points.sparkSession.conf
    val key = "spark.sql.parquet.outputTimestampType"
    val saved = conf.get(key)
    conf.set(key, "TIMESTAMP_MICROS")
    try withPeriod
      .repartition(col("att_conf_id"), col("period"))
      .write
      .partitionBy("att_conf_id", "period")
      .mode(mode)
      .parquet(s"$root/$table")
    finally conf.set(key, saved)
  }

  /** Write the attribute-properties log (`root/att_parameter`; reference
    * reads it in `hdbpp.py:167-177`). Engine-native schema: µs-long
    * `recv_time`/`insert_time` (the reference's split s+µs pair is
    * combined at ingest — C5) plus the HDB++ property columns the
    * caller supplies (label, unit, format, …).
    *
    * Enforces the Cassandra invariant [[graft.operators.Catalog
    * .latestBefore]] depends on: `recv_time` is att_parameter's
    * CLUSTERING key, so (att_conf_id, recv_time) is unique —
    * last-write-wins by `insert_time` collapses re-sends exactly like a
    * Cassandra upsert. The dedup window partitions by the pair — state
    * is bounded by duplicate re-sends per key, no skew. Catalog tables
    * are ~100k rows: written as ONE overwritten snapshot, not an
    * append log (the mode default differs from [[write]] for that
    * reason). */
  def writeParameters(params: DataFrame, root: String,
      mode: String = "overwrite"): Unit = {
    val w = Window.partitionBy(col("att_conf_id"), col("recv_time"))
      .orderBy(col("insert_time").desc)
    params
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .drop("_rn")
      .repartition(col("att_conf_id"))
      .write.mode(mode).parquet(s"$root/att_parameter")
  }

  /** Write the archiving-event log (`root/att_history`; reference
    * `hdbpp.py:180-191`): (att_conf_id, time µs, event). Uniqueness on
    * (att_conf_id, time) — `time` is the clustering key — with the
    * lexicographically first event kept on re-send ties so the write
    * is deterministic. */
  def writeHistory(history: DataFrame, root: String,
      mode: String = "overwrite"): Unit = {
    val w = Window.partitionBy(col("att_conf_id"), col("time"))
      .orderBy(col("event").asc)
    history
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
      .drop("_rn")
      .repartition(col("att_conf_id"))
      .write.mode(mode).parquet(s"$root/att_history")
  }
}
