package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join splitting (on by default in Spark 4) is the first
  * line of defense; these are for the cases it doesn't cover —
  * deterministic pre-salting of a known-hot key in a shuffle join or
  * a high-cardinality aggregation whose partials are already huge.
  */
object SkewOps {

  /** Shared salt-bucket count: the session's reducer count, clamped
    * to [2, 1024] (past 1024 reducers the per-reducer share of a hot
    * key already dwarfs the dim-replication cost — the measured
    * argument at [[graft.operators.TextStats]]'s saltedFreqJoin). */
  def defaultBuckets(df: DataFrame): Int =
    math.min(1024, math.max(2, df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt))

  /** Salted equi-join of a skewed `fact` against a small-ish `dim`
    * on `key`: the fact side gets a deterministic salt in [0, buckets)
    * derived from a uniqueness column (NOT random — reruns must
    * produce identical partitioning for retry safety), the dim side is
    * replicated `buckets`× with every salt value, and the join key
    * becomes (key, salt) — a hot key now spreads over `buckets`
    * reducers instead of one.
    *
    * dim grows `buckets`×, so this suits dims small enough that
    * replication is cheap but too big (or too mid-sized) to broadcast
    * outright. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFrom: String, buckets: Int): DataFrame = {
    require(buckets > 1, "need at least 2 salt buckets")
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(col(saltFrom)), lit(buckets)))
    val replicated = dim.withColumn("_salt",
      explode(lit((0 until buckets).toArray)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation: partial-aggregate on (keys, salt)
    * first — splitting each hot key's rows over `buckets` reducers —
    * then merge the partials per key. `partials` maps an input column
    * to its partial aggregate; `merges` merges partial columns.
    * (Plain partial/final hash aggregation already does this
    * map-side; explicit salting helps when the map-side hash table
    * itself thrashes on a hot key's collision chain, or when the
    * aggregate is not algebraic map-side.) */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFrom: String,
      buckets: Int, partials: Seq[Column], merges: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(saltFrom)), lit(buckets)))
      .groupBy(keys.map(col) :+ col("_salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
}
