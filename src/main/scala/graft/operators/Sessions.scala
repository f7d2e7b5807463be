package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each key's event stream into
  * sessions wherever the gap to the previous event exceeds `gapUs`.
  * The event-stream op behind both archive-viewer "activity bursts"
  * and training-data conversation/session assembly.
  *
  * Plan shape: ONE per-key window (lag for the gap test, running sum
  * of session starts for the ordinal) — a single shuffle + partitioned
  * sort, the same distribution any engine needs for per-key ordered
  * scans. `tieCol` makes equal-timestamp ordering deterministic.
  * Skewed keys sort within one task; at whale-key scale the standard
  * remedy is pre-splitting by coarse time range (the day-partitioned
  * layout the archive writer already produces) before sessionizing. */
object Sessions {

  /** Adds `session_seq` (1-based per key, in time order) to `events`.
    * A session starts at the first event and at every event whose gap
    * from the previous one is STRICTLY greater than `gapUs`. */
  def sessionize(events: DataFrame, keyCols: Seq[String], timeCol: String,
      tieCol: String, gapUs: Long): DataFrame = {
    require(gapUs > 0)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol), col(tieCol))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_prev_t", lag(col(timeCol), 1).over(w))
      .withColumn("_starts", when(col("_prev_t").isNull
        || col(timeCol) - col("_prev_t") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_starts")).over(wc))
      .drop("_prev_t", "_starts")
  }

  /** Per-session rollup: event count, start/end time, duration. */
  def sessionStats(events: DataFrame, keyCols: Seq[String], timeCol: String,
      tieCol: String, gapUs: Long): DataFrame =
    sessionize(events, keyCols, timeCol, tieCol, gapUs)
      .groupBy(keyCols.map(col) :+ col("session_seq"): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(timeCol)).as("t_start"),
        max(col(timeCol)).as("t_end"))
      .withColumn("duration_us", col("t_end") - col("t_start"))
}
