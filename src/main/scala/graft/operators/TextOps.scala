package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenization / shingling primitives shared by the LLM-pipeline
  * operators (dedup, similarity, text stats).
  *
  * Determinism contract: every derived value is exact integer math (or
  * a single IEEE division of exact integers) so the DuckDB oracle
  * reproduces results bit-for-bit. Token/shingle ids are NEVER an
  * engine hash (Spark's murmur3/xxhash64 and DuckDB's hash differ);
  * the two oracle-reproducible strategies are a sorted dense
  * [[vocab]] (collision-free, costs a distinct + range-sort + join)
  * and the content-derived [[graft.functions.PolyHash31]] recurrence
  * (a pure projection, zero coordination — what the MinHash pipeline
  * uses). Operators whose id space must be dense (SimHash's quadratic
  * threshold hash) keep the vocabulary.
  */
object TextOps {

  val HashP: Long = 2147483647L // 2^31-1, the Mersenne prime both engines mod by

  /** (doc_id, pos, w): one row per token, pos 1-based (matches DuckDB's
    * generate_subscripts). Input needs `doc_id` and `text`. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("w"))

  /** Distinct k-word shingles per doc — computed with an array
    * `transform` over the split tokens inside narrow projections.
    * (A lead()-window formulation needs a shuffle+sort per document
    * before the first aggregation; this shape reaches the distinct
    * directly from the scan. The oracle uses the window formulation —
    * the shingle SETS are identical either way.)
    *
    * The split is HOISTED into its own projection and the lambda reads
    * `element_at(ws, i+j)` — O(1) lookups, no per-position re-split or
    * array copy. (A `split(text)` INSIDE the lambda re-evaluates per
    * shingle position — O(tokens²) per doc, measured 4.6× slower at
    * sf0.1 — and `slice` allocates a fresh array per shingle.
    * CollapseProject keeps the hoist: `ws` is referenced k+2 times, so
    * the optimizer does not inline it back.) */
  def shingles(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= 8, s"shingle size $k out of range")
    val terms = (0 until k).map(j => s"element_at(ws, i + $j)")
      .mkString(", ")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(expr(
        s"""case when size(ws) >= $k
           |then transform(sequence(1, size(ws) - ${k - 1}),
           |  i -> concat_ws(' ', $terms))
           |else array() end""".stripMargin)).as("shingle"))
      .distinct()
  }

  /** Per-doc DISTINCT shingle-id SET as one array row: (doc_id, tids)
    * with tids = array_distinct of [[graft.functions.PolyHash31]] over
    * the k-shingles — the same id set [[shingles]]+hash yields after
    * explode+distinct, built without EITHER: the distinct is in-row
    * (`array_distinct`), the ids are content-derived, so the whole
    * stage is a narrow projection with NO shuffle. This is the MinHash
    * pipeline's 100 TB input shape: per-doc state is bounded by doc
    * length, and nothing global exists until the band-bucket groupBy.
    *
    * Docs with fewer than k tokens are DROPPED (no shingles — the
    * exploded formulation has no rows for them either). The filter
    * runs on the cheap token count BEFORE the shingle transform: an
    * after-the-fact `size(tids) > 0` is predicate-pushed through the
    * projection and re-evaluates the whole hash pipeline per row
    * (measured 12× slower). */
  def shingleIdSets(docs: DataFrame, k: Int,
      keep: Seq[String] = Nil): DataFrame = {
    require(k >= 2 && k <= 8, s"shingle size $k out of range")
    val terms = (0 until k).map(j => s"element_at(ws, i + $j)")
      .mkString(", ")
    docs
      .select(col("doc_id") +: keep.map(col) :+
        split(col("text"), " ").as("ws"): _*)
      .where(size(col("ws")) >= k)
      .select(col("doc_id") +: keep.map(col) :+ expr(
        s"""array_distinct(transform(sequence(1, size(ws) - ${k - 1}),
           |  i -> poly_hash31(concat_ws(' ', $terms))))""".stripMargin)
        .as("tids"): _*)
  }

  /** Dense vocabulary: term → tid (1-based, global sorted order —
    * identical to DuckDB's `row_number() OVER (ORDER BY term)`).
    *
    * NOT a global `row_number` window (that funnels every distinct term
    * through ONE sort task — round 2's 27 s p02 hotspot). Two parallel
    * passes instead: range-repartition + sort-within-partitions puts
    * the terms in global order across ordered partition ranges, then
    * `zipWithIndex` (itself a count pass + a map pass) assigns the
    * global rank without ever centralizing the data. Partition-boundary
    * choice cannot affect ids: ranges are ordered, so the global rank
    * of a term is the same wherever the cuts land. Precondition: no
    * null terms (Spark sorts nulls first, DuckDB last — token/shingle
    * sources never produce null). See the object doc for the true
    * 100 TB variant (hash ids, no vocabulary at all). */
  def vocab(terms: DataFrame, termCol: String): DataFrame = {
    val spark = terms.sparkSession
    val distinct = terms.select(col(termCol)).distinct()
    val parts = spark.sessionState.conf.numShufflePartitions
    // zipWithIndex's eager count pass + the downstream map pass both
    // consume `sorted`; persisting saves re-running the distinct
    // aggregation (MEMORY_AND_DISK, LRU-evicted — worst case recompute)
    val sorted = distinct
      .repartitionByRange(parts, col(termCol))
      .sortWithinPartitions(termCol)
      .persist()
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "tid", org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    val res = spark.createDataFrame(indexed, schema)
    // zipWithIndex's eager count already consumed the cache once; the
    // returned frame's first materialization is the only other reader
    // — release then instead of pinning one distinct-term set per call
    // until LRU pressure (the library-wide CacheLifecycle contract)
    CacheLifecycle.unpersistAfterFirstUse(res, sorted)
    res
  }

  /** Corpus with planted near-duplicates: every doc_id % every`th doc
    * is re-emitted at doc_id + 1000000 with its first `dropWords` words
    * removed. Used to make near-dup detection results non-trivial on
    * the all-distinct synthetic corpus (and exercised the same way by
    * the oracle). */
  def withPlantedNearDups(docs: DataFrame, every: Int, dropWords: Int): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionByName(
        docs.where(col("doc_id") % every === 0)
          .select(
            (col("doc_id") + 1000000L).as("doc_id"),
            array_join(
              expr(s"slice(split(text, ' '), ${dropWords + 1}, size(split(text, ' ')))"),
              " ").as("text")))

  /** Corpus with planted EXACT duplicates at doc_id + 2000000. */
  def withPlantedExactDups(docs: DataFrame, every: Int): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionByName(
        docs.where(col("doc_id") % every === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
}
