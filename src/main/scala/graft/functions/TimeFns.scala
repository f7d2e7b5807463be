package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time helpers mirroring the reference's semantics.
  *
  *  - `t` derived epoch-µs column (reference `data.py:25-30`:
  *    `data_time.astype(int64)//1000 + data_time_us`);
  *  - interval-string parsing with the reference's unit quirks
  *    (`data.py:37-42`: ms/s/m translated to pandas offsets);
  *  - round-to-NEAREST bucket assignment (`data.py:12-14`:
  *    `round(t/Δ)*Δ` — buckets are *centered* on multiples of Δ, unlike
  *    Spark's `window()` which floors).
  *
  * All bucket math is integer µs arithmetic → deterministic across
  * engines (no float rounding), which the DuckDB-oracle hash compare
  * requires. Divergence from the reference: Python `round` is
  * half-to-even; we use half-up (`(t + Δ/2) div Δ`), which differs only
  * on exact half-bucket ties — measure-zero for real timestamps, and
  * documented here.
  */
object TimeFns {

  /** Epoch microseconds of a TimestampType column (the reference's `t`). */
  def epochUs(ts: Column): Column = unix_micros(ts)

  /** Epoch µs from the reference's split (second-precision ts + µs
    * remainder) representation, `hdbpp.py:84-87`. */
  def epochUsSplit(dataTime: Column, dataTimeUs: Column): Column =
    unix_micros(dataTime) + coalesce(dataTimeUs.cast("long"), lit(0L))

  /** Parse an interval string like "500ms", "30s", "15m", "2h", "1d"
    * into microseconds. Unit set mirrors data.py:37-42 (+h/d which
    * pandas accepted natively). */
  def intervalUs(freq: String): Long = {
    val m = "^([0-9]+)(ms|us|s|m|h|d)$".r
    freq.trim match {
      case m(n, u) =>
        val k = u match {
          case "us" => 1L
          case "ms" => 1000L
          case "s" => 1000000L
          case "m" => 60L * 1000000L
          case "h" => 3600L * 1000000L
          case "d" => 86400L * 1000000L
        }
        n.toLong * k
      case other => throw new IllegalArgumentException(
        s"bad interval '$other' (expected e.g. 30s, 15m, 500ms)")
    }
  }

  /** Round-to-nearest bucket label in µs: `((t + Δ/2) div Δ) * Δ`,
    * computed as `h - (h mod Δ)` with h = t + Δ/2 so the arithmetic is
    * EXACT integer math (Spark's `/` on longs is double division, whose
    * rounding could drift one bucket vs the oracle's integer `//`). */
  def roundBucketUs(tUs: Column, deltaUs: Long): Column = {
    val h = tUs + lit(deltaUs / 2)
    h - pmod(h, lit(deltaUs))
  }

  /** Same, for use in oracle SQL (DuckDB `//` is integer division). */
  def roundBucketSql(tExpr: String, deltaUs: Long): String =
    s"(($tExpr + ${deltaUs / 2}) // $deltaUs) * $deltaUs"

  /** Inclusive-both-ends time filter (reference `data.py:104-105`). */
  def inRangeInclusive(tUs: Column, t0Us: Long, t1Us: Long): Column =
    tUs >= lit(t0Us) && tUs <= lit(t1Us)

  /** C3 — naive-UTC timestamp parsing (reference `utils.py:14-19`): an
    * ISO timestamp with no zone is ASSUMED UTC; an explicit offset is
    * honored then normalized to UTC; date-only means midnight UTC.
    * Returns epoch-µs. */
  def parseNaiveUtc(s: String): Long = {
    import java.time._
    import java.time.format.DateTimeFormatter
    // space-separated timestamps are normalized to 'T' on BOTH paths —
    // the reference's parser accepts "2026-01-01 00:00:00+02:00" too
    val trimmed = s.trim.replace(' ', 'T')
    val asOffset =
      try Some(OffsetDateTime.parse(trimmed,
        DateTimeFormatter.ISO_OFFSET_DATE_TIME))
      catch { case _: Exception => None }
    val utc = asOffset match {
      case Some(odt) => odt.atZoneSameInstant(ZoneOffset.UTC)
      case None =>
        val local =
          try LocalDateTime.parse(trimmed)
          catch {
            case _: Exception => LocalDate.parse(trimmed).atStartOfDay()
          }
        local.atZone(ZoneOffset.UTC)
    }
    utc.toInstant.getEpochSecond * 1000000L + utc.toInstant.getNano / 1000L
  }
}
