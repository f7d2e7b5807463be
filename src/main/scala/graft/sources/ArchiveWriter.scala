package graft.sources

import org.apache.spark.sql.DataFrame
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
    * (UTC date string) if missing. */
  def write(points: DataFrame, root: String,
      table: String = "att_scalar_devdouble_ro",
      mode: String = "append"): Unit = {
    val withPeriod =
      if (points.columns.contains("period")) points
      else points.withColumn("period",
        date_format(col("data_time"), "yyyy-MM-dd"))
    withPeriod
      .repartition(col("att_conf_id"), col("period"))
      .write
      .partitionBy("att_conf_id", "period")
      .mode(mode)
      .parquet(s"$root/$table")
  }
}
