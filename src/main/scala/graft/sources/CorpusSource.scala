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

  /** One JSONL ingestion's frames plus the handle that releases its
    * cached parse boundary. The cache is REQUIRED for correctness
    * (below), so it cannot be silently skipped or auto-released after
    * first use (the other frame still needs it) — but without an
    * explicit release, a long-lived session ingesting one shard per
    * call would pin one dead cached parse per call until Spark's LRU
    * pushes them out. Call `release()` once both frames are consumed.
    * Released frames recompute on access, with one Spark caveat: a
    * query over them whose referenced columns reduce to ONLY the
    * corrupt column (a bare `count()` does — it prunes every data
    * column, leaving just the filter's `_corrupt`) is rejected by
    * Spark's raw-files rule once the cache no longer materializes the
    * parse; queries touching any real column still work. */
  final case class JsonlRead(clean: DataFrame, corrupt: DataFrame,
      release: () => Unit)

  /** JSONL read with enforced schema + corrupt-record capture:
    * clean rows in canonical column order, corrupt lines separately. */
  def readJsonl(spark: SparkSession, path: String): JsonlRead = {
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
    JsonlRead(clean, corrupt, () => { raw.unpersist(); () })
  }

  /** LOSSLESS widenings accepted by [[readParquet]]: an external
    * producer that wrote int32 ids or float32 counts reads fine (the
    * cast cannot lose information); anything else — string↔numeric,
    * long→int, double→float — still fails loudly (a silent narrowing
    * or string coercion surfaces as nulls mid-pipeline). */
  private val SafeWiden: Set[(DataType, DataType)] = Set(
    (ByteType, ShortType), (ByteType, IntegerType), (ByteType, LongType),
    (ShortType, IntegerType), (ShortType, LongType),
    (IntegerType, LongType),
    (ByteType, DoubleType), (ShortType, DoubleType),
    (IntegerType, DoubleType), (FloatType, DoubleType))

  /** Parquet read with schema enforcement: extra columns are pruned,
    * losslessly-widenable columns (e.g. an int32 `doc_id` from an
    * external producer) are cast up, and missing or incompatibly
    * typed columns fail loudly up front (a silent lossy cast would
    * coerce e.g. a string doc_id to long and surface as nulls
    * mid-pipeline instead). */
  def readParquet(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val problems = DocumentsSchema.fields.flatMap { f =>
      actual.get(f.name) match {
        case None => Some(s"${f.name}: missing")
        case Some(dt) if dt != f.dataType && !SafeWiden((dt, f.dataType)) =>
          Some(s"${f.name}: expected ${f.dataType.simpleString}, " +
            s"found ${dt.simpleString}")
        case _ => None
      }
    }
    require(problems.isEmpty,
      s"$path does not match the documents schema — ${problems.mkString("; ")}")
    df.select(DocumentsSchema.fields.map { f =>
      if (actual(f.name) == f.dataType) col(f.name)
      else col(f.name).cast(f.dataType).as(f.name)
    }.toSeq: _*)
  }

  /** JSONL write (one JSON object per line, splittable at scale). */
  def writeJsonl(docs: DataFrame, path: String): Unit =
    docs.select(DocumentsSchema.fieldNames.map(col).toSeq: _*)
      .write.mode("overwrite").json(path)
}
