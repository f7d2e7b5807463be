package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenization / shingling primitives shared by the LLM-pipeline
  * operators (dedup, similarity, text stats).
  *
  * Determinism contract: every derived value is exact integer math (or
  * a single IEEE division of exact integers) so the DuckDB oracle
  * reproduces results bit-for-bit. Token/shingle IDs come from a
  * sorted dense vocabulary (`row_number` over distinct tokens) — NOT an
  * engine hash — because Spark's murmur3/xxhash64 and DuckDB's hash
  * differ. At 100 TB you would skip the vocabulary join entirely and
  * feed `xxhash64(token)` straight into the min-hash (one less shuffle,
  * no global window); the vocabulary exists to keep results
  * oracle-checkable, and the operator shape is identical either way.
  */
object TextOps {

  val HashP: Long = 2147483647L // 2^31-1, the Mersenne prime both engines mod by

  /** (doc_id, pos, w): one row per token, pos 1-based (matches DuckDB's
    * generate_subscripts). Input needs `doc_id` and `text`. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("w"))

  /** Distinct k-word shingles per doc — computed with an array
    * `transform` over the split tokens inside ONE narrow projection.
    * (A lead()-window formulation needs a shuffle+sort per document
    * before the first aggregation; this shape reaches the distinct
    * directly from the scan. The oracle uses the window formulation —
    * the shingle SETS are identical either way.) */
  def shingles(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= 8, s"shingle size $k out of range")
    docs
      .select(col("doc_id"), explode(expr(
        s"""case when size(split(text, ' ')) >= $k
           |then transform(sequence(1, size(split(text, ' ')) - ${k - 1}),
           |  i -> concat_ws(' ', slice(split(text, ' '), i, $k)))
           |else array() end""".stripMargin)).as("shingle"))
      .distinct()
  }

  /** Dense vocabulary: term → tid (1-based, sorted order). The global
    * row_number window is a deliberate test-scale choice — see the
    * object doc for the 100 TB variant (hash IDs, no vocab). */
  def vocab(terms: DataFrame, termCol: String): DataFrame =
    terms.select(col(termCol)).distinct()
      .withColumn("tid",
        row_number().over(Window.orderBy(col(termCol))).cast("long"))

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
