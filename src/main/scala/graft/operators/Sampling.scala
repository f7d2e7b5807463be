package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / packing operators for
  * training-data assembly (the step after dedup and quality filtering:
  * decide WHICH docs go into WHICH split/mix, and how they pack into
  * fixed-token-budget shards).
  *
  * Everything keys off a content-derived pseudo-random integer
  * ([[graft.functions.PolyHash31]] over a salted rendering of the doc
  * id) rather than an engine RNG: the assignment is reproducible across
  * engines (the DuckDB oracle computes the identical hash), across
  * runs, and across cluster sizes — the property a training-data
  * lineage audit actually needs. No `rand()`, no seed-per-partition
  * trap, no resampling drift when the corpus is re-partitioned.
  */
object Sampling {

  /** Salted split hash: poly_hash31("<salt>:<doc_id>") — uniform-ish in
    * [0, 2^31-1), reproducible in DuckDB via the ascii() recurrence. */
  def splitHash(salt: String, idCol: Column): Column =
    call_function("poly_hash31",
      concat(lit(salt + ":"), idCol.cast("string")))

  /** Train/val/test assignment by hash percentile: bucket = h mod 100,
    * train < `trainPct` ≤ val < `trainPct`+`valPct` ≤ test. A pure
    * per-row projection — no shuffle, no coordination, stable under
    * corpus growth (a doc's split never changes when others arrive). */
  def assignSplits(docs: DataFrame, salt: String = "split",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    graft.functions.PolyHash31.register(docs.sparkSession)
    val h = splitHash(salt, col("doc_id"))
    docs.withColumn("h_split", h)
      .withColumn("bucket", col("h_split") % 100)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Per-stratum quota sample: the `k` docs with the smallest
    * (split-hash, doc_id) per stratum — a deterministic "random k" that
    * any engine reproduces. Runs on the bounded [[TopK]] aggregator:
    * per-group state never exceeds k pairs and merges map-side, so a
    * 100 TB stratum costs one hash aggregate — NOT a per-stratum window
    * sort (rank-over-window sorts every stratum in full; with few
    * strata that is a handful of giant single-key sort tasks). Output:
    * one row per kept doc with its within-stratum rank `rn` (1-based,
    * hash order). */
  def quotaSample(docs: DataFrame, strataCols: Seq[String], k: Int,
      salt: String = "quota"): DataFrame = {
    graft.functions.PolyHash31.register(docs.sparkSession)
    val h = splitHash(salt, col("doc_id"))
    docs.select(strataCols.map(col) :+ h.as("h_quota") :+ col("doc_id"): _*)
      .groupBy(strataCols.map(col): _*)
      .agg(TopK.smallestK(k, col("h_quota"), col("doc_id")).as("ks"))
      .select(strataCols.map(col) :+
        posexplode(col("ks")).as(Seq("i", "p")): _*)
      .select(strataCols.map(col) :+
        (col("i") + 1).cast("long").as("rn") :+
        col("p._2").as("doc_id") :+ col("p._1").as("h_quota"): _*)
  }

  /** Global deterministic sample of exactly `n` docs: the n smallest
    * (split-hash, doc_id) over the whole corpus. Plans as
    * `TakeOrderedAndProject` — every partition keeps its local top-n
    * and only those reach the driver-side merge, so the "global sort"
    * never materializes; the same reproducibility contract as
    * [[quotaSample]], without strata. */
  def globalSample(docs: DataFrame, n: Int,
      salt: String = "sample"): DataFrame = {
    graft.functions.PolyHash31.register(docs.sparkSession)
    docs.select(col("doc_id"), splitHash(salt, col("doc_id")).as("h_sample"))
      .orderBy(col("h_sample"), col("doc_id"))
      .limit(n)
  }

  /** Benchmark decontamination: flag docs in `train` whose k-shingle
    * sets overlap the distinct shingle universe of `heldout` (the
    * eval/test split) — the hygiene pass that keeps benchmark text out
    * of a training corpus. Returns one row per CONTAMINATED train doc
    * with the overlap count; clean docs are absent (callers anti-join
    * to drop flagged docs).
    *
    * Scale shape: both sides use the in-row content-hash shingle sets
    * (no vocabulary); the held-out side collapses to its DISTINCT
    * shingle-id universe — benchmarks are orders of magnitude smaller
    * than the corpus, so this is the small side of one equi-join
    * against the train postings, and the join output is only the
    * colliding rows. Nothing is ever all-pairs and the train text
    * itself never shuffles (ids only). */
  def decontaminate(train: DataFrame, heldout: DataFrame,
      shingleK: Int = 3): DataFrame = {
    val testTids = TextOps.shingleIdSets(heldout, shingleK)
      .select(explode(col("tids")).as("tid")).distinct()
    TextOps.shingleIdSets(train, shingleK)
      .select(col("doc_id"), explode(col("tids")).as("tid"))
      .join(testTids, Seq("tid"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[decontaminate]] specialization for the common case where train
    * and held-out are SPLITS OF ONE TABLE (e.g. the hash split): one
    * shingling pass over the whole table with the split label carried
    * in-row, then the same postings⋈universe join — half the scan/hash
    * work of the two-frame form, identical output. */
  def decontaminateSplit(docs: DataFrame, splitCol: String,
      trainVal: String, heldoutVal: String,
      shingleK: Int = 3): DataFrame = {
    val sets = TextOps.shingleIdSets(docs, shingleK, keep = Seq(splitCol))
      .persist()
    val testTids = sets.where(col(splitCol) === heldoutVal)
      .select(explode(col("tids")).as("tid")).distinct()
    sets.where(col(splitCol) === trainVal)
      .select(col("doc_id"), explode(col("tids")).as("tid"))
      .join(testTids, Seq("tid"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Mixture rebalancing plan: per stratum cell (e.g. lang × source),
    * the deterministic downsampling rate that moves the corpus toward
    * a UNIFORM token budget per cell — `target = total_tokens div
    * n_cells`, `rate = min(1, target / cell_tokens)` — plus the
    * resulting token estimate. The "how much of each slice do we
    * keep" planning step before a mixture-weighted sample; feed
    * `rate` into a hash threshold ([[splitHash]] mod 10⁶ <
    * rate·10⁶) for the actual per-doc draw.
    *
    * Exactness: the target is integer division, the rate ONE IEEE
    * division of exact integers — any engine reproduces the plan
    * bit-for-bit. The corpus-wide total reaches each cell via a
    * broadcast single-row aggregate (never an unpartitioned window —
    * the cell table may be large at 100 TB even though each row is
    * tiny). */
  def mixturePlan(docs: DataFrame, strataCols: Seq[String]): DataFrame = {
    val cells = docs
      .select(strataCols.map(col) :+
        size(split(col("text"), " ")).cast("long").as("n_tok"): _*)
      .groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("cell_tokens"))
    val totals = cells.agg(
      sum(col("cell_tokens")).as("total_tokens"),
      count(lit(1)).as("n_cells"))
    cells.crossJoin(broadcast(totals))
      .withColumn("target_tokens", expr("total_tokens div n_cells"))
      .withColumn("rate",
        least(lit(1.0), col("target_tokens").cast("double")
          / col("cell_tokens")))
      .withColumn("kept_tokens_est",
        least(col("cell_tokens"), col("target_tokens")))
      .select(strataCols.map(col) ++ Seq(col("n_docs"),
        col("cell_tokens"), col("target_tokens"), col("rate"),
        col("kept_tokens_est")): _*)
  }

  /** Greedy token-budget packing: per stratum, walk docs in doc_id
    * order accumulating token counts; a doc goes to the bin its
    * RUNNING-START offset falls in (`floor(start / budget)`), i.e. docs
    * fill shard 0 until `budget` tokens are reached, then shard 1, …
    * The deterministic, restart-safe shape of "pack the corpus into
    * fixed-size training shards".
    *
    * The running sum is a window ordered by doc_id within each stratum:
    * strata sort independently (one range-sorted shuffle keyed by the
    * stratum — the partitioned-window shape PlanGuard allows), and at
    * 100 TB each stratum's sort distributes across tasks via
    * range partitioning on the (stratum, doc_id) prefix. Output is the
    * per-bin manifest: doc list boundaries summarized as n_docs /
    * sum_tokens / first/last doc ids — the shard index a pack-writer
    * consumes. */
  def packTokenBudget(docs: DataFrame, strataCols: Seq[String],
      budget: Long): DataFrame = {
    require(budget > 0)
    val nTok = size(split(col("text"), " ")).cast("long")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(strataCols.map(col) :+ col("doc_id") :+ nTok.as("n_tok"): _*)
      .withColumn("cum", sum(col("n_tok")).over(w))
      // integer `div`, not `/`: float division + cast can round a
      // boundary value up across the bin edge for non-power-of-2 budgets
      .withColumn("bin", expr(s"(cum - n_tok) div ${budget}L"))
      .groupBy(strataCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }
}
