package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document-corpus ingestion for the LLM-pipeline operators. Training
  * corpora arrive overwhelmingly as JSONL (one JSON doc per line) or
  * parquet; this source reads both into the pipeline's canonical
  * `documents` schema with an explicit, enforced schema — NEVER
  * `inferSchema`/`read.json(path)` without one, which buys schema
  * drift plus a full extra pass over 100 TB just to guess types.
  *
  * Malformed lines are not dropped silently: PERMISSIVE mode routes
  * them to a `_corrupt` column, and [[readJsonl]] returns them
  * separately so an ingestion job can count/quarantine bad records —
  * the "never lose data, never poison the table" contract. JSONL is
  * splittable line-by-line, so a directory of .jsonl files fans out
  * across the cluster exactly like parquet row-groups (gzipped JSONL
  * is NOT splittable — store uncompressed or zstd-framed at scale).
  */
object CorpusSource {

  /** Canonical documents schema (matches the parquet fixtures). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** JSONL read with enforced schema + corrupt-record capture.
    * Returns (clean rows in canonical column order, corrupt lines). */
  def readJsonl(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(
      DocumentsSchema.fields :+ StructField("_corrupt", StringType))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      // PERMISSIVE-mode corrupt capture requires the parsed rows to be
      // materialized before filtering on _corrupt (Spark refuses a
      // filter-only query on the corrupt column); caching the small
      // parse boundary is the documented pattern
      .cache()
    val clean = raw.where(col("_corrupt").isNull)
      .select(DocumentsSchema.fieldNames.map(col).toSeq: _*)
    val corrupt = raw.where(col("_corrupt").isNotNull)
      .select(col("_corrupt"))
    (clean, corrupt)
  }

  /** Parquet read with schema enforcement (extra columns pruned,
    * missing/mistyped columns fail loudly at analysis). */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(DocumentsSchema.fields.map(f =>
        col(f.name).cast(f.dataType)).toSeq: _*)

  /** JSONL write (one JSON object per line, splittable at scale). */
  def writeJsonl(docs: DataFrame, path: String): Unit =
    docs.select(DocumentsSchema.fieldNames.map(col).toSeq: _*)
      .write.mode("overwrite").json(path)
}
