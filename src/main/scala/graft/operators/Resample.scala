package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/** A1 — resample = tumbling-window MEAN with round-to-NEAREST bucket
  * assignment (reference `data.py:12-47`).
  *
  * Sharp edges reproduced (SURVEY.md §7.5):
  *  - buckets are CENTERED on multiples of Δ (`round(t/Δ)*Δ`), not
  *    floored like Spark's `window()` — implemented as integer-µs
  *    arithmetic in [[TimeFns.roundBucketUs]];
  *  - the reference's `groupby(...).mean()` averages ALL numeric
  *    columns, *including the µs timestamp `t`* (`data.py:47`) — so the
  *    output carries the bucket-mean timestamp, not the bucket label.
  *    We emit both (`bucket_us` and mean `t`).
  *
  * Scale: a single hash aggregate — partial (map-side) means merge into
  * final means, no sort, one shuffle on (key, bucket). At 100 TB the
  * cardinality after resampling is bounded by keys × range/Δ, far
  * smaller than the input; AQE coalesces the post-shuffle partitions.
  */
object Resample {

  /** Resample `df` to `freq` (e.g. "30s", "15m").
    *
    * @param df       must contain a µs-epoch `t` column and the value
    *                 columns to average
    * @param keys     per-series grouping columns (attribute identity)
    * @param valueCols numeric columns to mean (the reference means all
    *                 numerics; callers pass value_r and co.)
    */
  def resample(df: DataFrame, freq: String, keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    val deltaUs = TimeFns.intervalUs(freq)
    val bucket = TimeFns.roundBucketUs(col("t"), deltaUs).as("bucket_us")
    val aggs: Seq[Column] =
      avg(col("t")).as("t") +: valueCols.map(c => avg(col(c)).as(c))
    df.groupBy(keys.map(col) :+ bucket: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keys.map(col) ++ Seq(col("bucket_us"), col("t")) ++
        valueCols.map(col): _*)
  }

  /** Resample applied the way `/query` uses it (reference
    * `data.py:102-108`): inclusive time filter first, then resample. */
  def rawQuery(df: DataFrame, t0Us: Long, t1Us: Long, freq: Option[String],
      keys: Seq[String]): DataFrame = {
    val filtered = df.where(TimeFns.inRangeInclusive(col("t"), t0Us, t1Us))
    freq match {
      case Some(f) => resample(filtered, f, keys, Seq("value_r"))
      case None => filtered
    }
  }

  /** Oracle-exact resample used by the correctness queries: the same
    * round-to-nearest bucketing, but means computed as exact integer
    * sums (µs offsets from `epochRefUs`; integer cents for values) with
    * a single double division — bit-identical in any engine, unlike
    * [[resample]]'s float `avg` whose accumulation order varies. */
  def resampleExact(df: DataFrame, freq: String, keys: Seq[String],
      epochRefUs: Long): DataFrame = {
    val d = TimeFns.intervalUs(freq)
    df.withColumn("t_off", col("t") - lit(epochRefUs))
      .groupBy(keys.map(col) :+
        TimeFns.roundBucketUs(col("t"), d).as("bucket_us"): _*)
      .agg(
        (sum(col("t_off")).cast("double") / count(lit(1)))
          .as("t_mean_off_us"),
        round(sum(round(col("value_r") * 100).cast("long")).cast("double")
          / count(lit(1)) / lit(100.0), 6).as("value_mean"),
        count(lit(1)).as("n"))
  }
}
