package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.EventQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 expressed
  * over the driver's parquet tables; [[oracleSql]] holds the DuckDB
  * equivalent for the hash-compare correctness gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's `/query`
    * pipeline (scan → inclusive time filter → round-to-nearest 5m
    * resample-mean, SURVEY.md §3.2). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.queries("q02_resample_5m")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.queries ++ api.PipelineQueries.queries

  def oracleSql: Map[String, String] =
    EventQueries.oracleSql ++ api.PipelineQueries.oracleSql
}
