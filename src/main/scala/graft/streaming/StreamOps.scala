package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType
import graft.functions.TimeFns
import scala.jdk.CollectionConverters._

/** Structured Streaming extensions (SURVEY §2.9): the streaming
  * counterparts of the batch-incremental open-day path (R1/R3).
  *
  * The reference has no push pipeline (websockets are a listed "Idea",
  * `server.py:33`); these operators are the Spark-native way to stand
  * one up: `readStream` on the archive directory → the SAME transforms
  * the batch path uses → windowed aggregation with watermarks, plus a
  * stateful change-detector mirroring what a Tango HDB++ archiver does
  * upstream (only archive points that moved enough).
  *
  * Scale: both are standard Spark stateful operators — state is
  * per-key bounded (window aggregates evicted by the watermark; one
  * row of state per attribute for the change detector), partitioned by
  * the shuffle like any aggregation.
  */
object StreamOps {

  /** Run `body` against a SESSION CLONE whose shuffle partitions —
    * which FIX a streaming query's state-partition count for the life
    * of its checkpoint — are set to `n`. State partitions are an
    * operational sizing knob (state volume ÷ target per-partition
    * state), NOT a parallelism knob: every stateful operator commits
    * one state-store delta per partition per micro-batch, so an
    * over-partitioned tiny-state stream pays pure fixed I/O — measured
    * on the sf0.1 range join, 32 partitions × 4 join stores ran 7.3 s
    * where 8 partitions run 2.6 s for identical output. A real
    * deployment sizes `n` by the watermark-window's state volume and
    * scales it with load; the probe-side shuffle uses the same count,
    * so keep it ≥ the executor count once state is executor-memory-
    * sized.
    *
    * Isolation: the clone (`spark.newSession()`) shares the
    * SparkContext and cache manager but OWNS its conf, so nothing
    * here mutates the parent session — concurrent callers cannot
    * cross-contaminate each other, and a stalled query inside one
    * `body` cannot block another (an earlier design mutated the
    * shared conf under a process-wide lock held across the drain,
    * which turned one hung stream into a process-wide stall). The
    * parent's runtime SQL confs are copied onto the clone first — a
    * fresh session starts from the shared SparkConf, NOT the parent's
    * session conf, and losing runtime flags like the legacy parquet
    * nanos handling would silently change what `body` reads. Session-
    * registered UDFs and temp views do NOT carry over: `body` must
    * build its whole pipeline (registrations, `readStream`, sink
    * reads) on the clone it receives. */
  def withStatePartitions[T](spark: SparkSession, n: Int)(
      body: SparkSession => T): T = {
    val sess = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      // static / non-modifiable keys throw AnalysisException on set —
      // skip them (they are process-wide anyway, so the clone already
      // sees them). Only that: any OTHER failure to copy a runtime
      // flag (e.g. a semantic flag like the parquet nanos handling)
      // must propagate, not surface later as wrong results in `body`
      try sess.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    sess.conf.set("spark.sql.shuffle.partitions", n.toString)
    body(sess)
  }

  /** Run a streaming frame to completion (AvailableNow trigger) with
    * the results landing in EXECUTOR-written parquet, and return the
    * result read back from those files.
    *
    * This replaces the memory sink the oracled streaming queries
    * (q32/q33/q34/p60) first shipped with. A memory sink materializes
    * the ENTIRE result on the driver, and reading it back plans a
    * LocalTableScan whose execution parallelizes the driver-held rows
    * into task closures — task payload grows linearly with the result
    * (measured: 2.2 MiB/task at sf1 → 6.7 at sf3 → 22.4 at sf10 for
    * the q32 resample, straight through Spark's 1 MiB large-task
    * warning and, at sf10, into a driver OOM at the 8 GiB bench
    * heap). That is the one shape a 1000-executor deployment can
    * never use: results must land in storage, partitioned, with the
    * driver holding only file handles. `foreachBatch` + a parquet
    * write is exactly that — rows go executor → files, the read-back
    * is an ordinary pruned parquet scan, and the driver's share is
    * O(1).
    *
    * Mode contract (mirrors the sink semantics each query used):
    *  - "complete": every micro-batch carries the FULL result, so
    *    each batch OVERWRITES the directory — the last batch's files
    *    are the result.
    *  - "append": batches carry deltas; each APPENDS, and the
    *    directory is cleared up front so a rerun starts empty.
    *
    * Lifecycle: one FIXED directory per `key` — reruns overwrite in
    * place, so disk stays bounded at one result copy per query
    * regardless of bench pass count. The caller builds the key from
    * whatever is STABLE across its reruns (the q32–q34/p60 sites use
    * parent-session key + data dir + query tag, the stagedStreamDir
    * convention — NOT the per-invocation `withStatePartitions`
    * clone, whose identity changes every run). Consequently only the
    * LATEST returned frame per key is valid — a rerun invalidates
    * earlier frames (the same single-active-result contract the
    * memory-sink version had via `dropTempView`).
    *
    * An input that produces zero batches leaves no files; the
    * fallback is an empty frame with the stream's schema (bare
    * `read.parquet` on an empty directory throws instead). */
  def runToParquetTable(frame: DataFrame, mode: String,
      sess: SparkSession, key: String): DataFrame = {
    require(mode == "complete" || mode == "append",
      s"unsupported sink mode: $mode")
    val dir = sinkDirs.computeIfAbsent(key,
      _ => java.nio.file.Files
        .createTempDirectory("graft-sink").toString)
    if (mode == "append") { // clear accumulation from any earlier run
      val p = java.nio.file.Paths.get(dir)
      val entries = java.nio.file.Files.list(p)
      try entries.iterator().asScala.toList // drain BEFORE deleting
        .foreach(java.nio.file.Files.delete)
      finally entries.close()
    }
    val saveMode = if (mode == "complete") "overwrite" else "append"
    val q = frame.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
          _: Long) =>
        batch.write.mode(saveMode).parquet(dir); ()
      }
      .outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val hasData =
      try files.iterator().asScala.exists(_.getFileName.toString
        .endsWith(".parquet"))
      finally files.close()
    if (hasData) sess.read.parquet(dir)
    else sess.createDataFrame(
      sess.sparkContext.emptyRDD[org.apache.spark.sql.Row], frame.schema)
  }
  private val sinkDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Name-only tuning knobs for [[statePartitionsFor]] — a distinct
    * type so a positional Int/Long at the call site can never bind to
    * a knob (the misbinding hazard both pre- and post-r14 flat
    * signatures carried in one direction or the other). Construct
    * with named args: `StateSizing(numStores = 4)`. Fields validate
    * on construction so a bad knob fails where it was written, not
    * inside the sizing math. */
  final case class StateSizing(
      targetRowsPerPartition: Long = 64 * 1024,
      maxPartitions: Int = 256,
      numStores: Int = 1) {
    require(targetRowsPerPartition > 0, "target must be positive")
    require(maxPartitions > 0, "maxPartitions must be positive")
    require(numStores > 0, "numStores must be positive")
  }

  /** The scaladoc's sizing rule as code: state-store partition count =
    * estimated state volume ÷ (per-partition target × store count),
    * clamped to [1, `maxPartitions`]. `estStateRows` is an UPPER BOUND
    * estimate of live state entries (for an aggregation: distinct
    * keys×windows ≤ input rows; for a stream-stream join: rows
    * buffered within the watermark horizon ≤ input rows) — callers
    * pass the cheapest sound bound they have, typically the input row
    * count from parquet metadata.
    *
    * `numStores` is the operator's state-store count per partition
    * (1 for a windowed/session aggregation, 4 for a stream-stream
    * join: keyToNumValues + keyWithIndexToValue per side) and is the
    * measured divergence between the two families: commit I/O per
    * micro-batch scales with partitions × STORES, so a join's
    * partitions must be `numStores`× fatter to pay the same overhead.
    * The round-13 sf1 sweep (PROFILE_STREAM.json, ~10⁶ rows):
    * aggregations improved monotonically up to 16 partitions (q32
    * 11.2 s at 1 → 4.5 s at 16; q33 11.2 → 4.2) while the 4-store
    * join bottomed at 4 (3.0 s) and DEGRADED 2.9× by 32 (8.7 s) — a
    * single shared target cannot fit both, and the ratio between
    * their optima is exactly the store count. The base target
    * (64 Ki rows/partition/store) reproduces both optima: ×1 → 16
    * partitions at sf1 for aggregations, ×4 = 256 Ki (the round-12
    * q34 calibration, unchanged) → 4-5 for the join.
    *
    * Per-partition state stays well under executor memory (~13 MB at
    * ~200 B/row per store); the rule still errs toward FEWER, FATTER
    * stores until memory binds — on a real cluster raise
    * `maxPartitions` (and the input estimate) rather than shrinking
    * the target, so parallelism comes from volume, not from slicing
    * small state thin. Partition count never affects results — only
    * where state lives — so callers can re-size per run as data grows
    * (with a FRESH checkpoint: a checkpoint pins the count for its
    * lifetime).
    *
    * The tuning knobs live in [[StateSizing]], a separate config
    * type, so no positional Int/Long at a `statePartitionsFor` call
    * site can bind to any of them: the pre-r14 flat signature let
    * `statePartitionsFor(n, stores)` compile with the store count
    * silently widening into the Long target (and the r14 reorder
    * merely inverted which misbinding compiled). With the config
    * type, a stale positional call is a type error, and each knob
    * must be named inside a deliberate `StateSizing(...)`. */
  def statePartitionsFor(estStateRows: Long,
      sizing: StateSizing = StateSizing()): Int = {
    val byVolume = math.ceil(math.max(0L, estStateRows).toDouble /
      (sizing.targetRowsPerPartition.toDouble * sizing.numStores)).toInt
    math.min(sizing.maxPartitions, math.max(1, byVolume))
  }

  /** The archive as a LIVE source: tail the
    * `(att_conf_id, period)`-partitioned parquet layout
    * [[graft.sources.ArchiveWriter]] writes — every new file an
    * archiver appends becomes a micro-batch, so the same directory
    * serves the batch scans AND a push pipeline (the reference lists
    * websocket push as an unimplemented Idea, `server.py:33`; in Spark
    * it is `readStream` on the storage you already have). The schema
    * must be supplied (streams cannot infer) and should include the
    * partition columns; `maxFilesPerTrigger` bounds micro-batch size
    * during backfill so a cold start does not build one giant batch. */
  def archiveStream(spark: SparkSession, root: String, table: String,
      schema: StructType, maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"$root/$table")

  /** A1 as a streaming aggregation: tumbling mean of `value_r` per
    * attribute with round-to-NEAREST bucket parity. Spark's `window()`
    * floors, so event times are shifted by Δ/2 first — then
    * `window.start` IS the reference's centered bucket label
    * (`round(t/Δ)·Δ`, data.py:12-14). Late data beyond
    * `watermarkDelay` is dropped (the batch path has no such loss —
    * documented streaming divergence). Input needs `att_name`,
    * `data_time` (timestamp), `value_r`. */
  def streamingResample(points: DataFrame, freq: String,
      watermarkDelay: String): DataFrame = {
    val d = TimeFns.intervalUs(freq)
    points
      .withColumn("shifted",
        expr(s"data_time + INTERVAL ${d / 2} MICROSECOND"))
      .withWatermark("shifted", watermarkDelay)
      .groupBy(col("att_name"),
        window(col("shifted"), s"$d microseconds"))
      .agg(avg(col("value_r")).as("value_mean"),
        count(lit(1)).as("n"))
      .select(col("att_name"),
        unix_micros(col("window.start")).as("bucket_us"),
        col("value_mean"), col("n"))
  }

  /** Gap-based sessionization as a streaming aggregation — the
    * streaming twin of [[graft.operators.Sessions.sessionStats]],
    * built on Spark's native `session_window` (merging session state,
    * watermark-driven finalization: a session EMITS once the watermark
    * passes its close, i.e. once no event could extend it). Per-key
    * session ordinals don't exist in a stream (they'd require total
    * order over an unbounded past), so sessions are identified by
    * their start time instead — the contract an incremental consumer
    * actually wants. Input needs a key column, an event-time column,
    * and rides the same shuffle a batch sessionize needs. */
  def streamingSessions(events: DataFrame, keyCol: String,
      eventTimeCol: String, gap: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(eventTimeCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        unix_micros(col("session_window.start")).as("t_start"),
        unix_micros(col("session_window.end")).as("t_end"),
        col("n_events"))

  /** Streaming RANGE join — the streaming twin of
    * [[graft.operators.TimeJoins.rangeJoin]]: point events joined to
    * interval-opening events (interval = [openTime, openTime +
    * `windowLen`]) on a key, as a watermarked stream-stream join.
    * The time-range predicate is exactly what lets Spark bound and
    * evict join state: a buffered point can only match interval
    * openers within `windowLen` of it, so state beyond
    * watermark + windowLen drops. Event-time columns must be
    * timestamps. Emits one row per (point, matching interval). */
  def streamingRangeJoin(points: DataFrame, openers: DataFrame,
      keyCol: String, pointTimeCol: String, openTimeCol: String,
      windowLen: String, watermarkDelay: String): DataFrame = {
    // the time columns get the same rename treatment as the key: the
    // join predicate names both sides in ONE scope, so identical names
    // (both streams carrying the engine's canonical "t", say) would be
    // AMBIGUOUS_REFERENCE at analysis. When they collide, the opener's
    // time is restored as `<openTimeCol>_open` — duplicate output names
    // would just move the ambiguity onto the caller's first select.
    val outOpen =
      if (openTimeCol == pointTimeCol) openTimeCol + "_open" else openTimeCol
    val p = points.withColumnRenamed(keyCol, "_pk")
      .withColumnRenamed(pointTimeCol, "_pt")
      .withWatermark("_pt", watermarkDelay)
    val o = openers.withColumnRenamed(keyCol, "_ok")
      .withColumnRenamed(openTimeCol, "_ot")
      .withWatermark("_ot", watermarkDelay)
    p.join(o, expr(
      s"""_pk = _ok
         |AND _pt >= _ot
         |AND _pt <= _ot + interval $windowLen"""
        .stripMargin))
      .withColumnRenamed("_pk", keyCol).drop("_ok")
      .withColumnRenamed("_pt", pointTimeCol)
      .withColumnRenamed("_ot", outOpen)
  }

  /** Streaming exact dedup of a document stream: drop any doc whose
    * content digest was already seen (state = one digest per distinct
    * doc, partitioned by the aggregation shuffle). Input needs
    * `doc_id`, `text`; the digest column is kept in the output so
    * downstream stages can skip re-hashing.
    *
    * CONTRACT: global-forever dedup — state grows one entry per
    * distinct document for the life of the stream, which is the exact
    * batch semantics but an eventual-OOM on an unbounded stream. Use it
    * for bounded replays (backfill a day through the streaming path);
    * long-running pipelines want [[streamingExactDedupWithinWatermark]],
    * whose state is evicted once the watermark passes. */
  def streamingExactDedup(docs: DataFrame): DataFrame =
    docs.withColumn("fp", sha2(col("text"), 256))
      .dropDuplicates("fp")

  /** Bounded-state streaming dedup: duplicates are dropped only within
    * the watermark horizon on `eventTimeCol`; older digests are evicted
    * from the state store, so state is O(docs per `delay` window), not
    * O(all docs ever). The tradeoff is the contract: a duplicate
    * arriving after the watermark passed its original re-emits — that
    * re-admission IS the eviction observable (tested in StreamOpsSpec). */
  def streamingExactDedupWithinWatermark(docs: DataFrame,
      eventTimeCol: String, delay: String): DataFrame =
    docs.withColumn("fp", sha2(col("text"), 256))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Continuous KMV distinct-token sketch: the per-cell distinct
    * vocabulary estimate ([[graft.operators.TextStats
    * .kmvDistinctTokens]]) maintained over a document stream. The
    * batch operator is one explode + one UDAF aggregate, so it runs
    * under Structured Streaming as-is — this alias exists to state
    * the streaming contract: the bounded k-smallest-distinct-hash
    * buffer becomes per-group STATE-STORE state, merged per
    * micro-batch exactly as the batch aggregate merges per
    * partition, so stream-over-prefix ≡ batch-over-prefix at every
    * micro-batch boundary (the sketch's mergeability is what makes
    * this exact, not approximate — pinned in StreamOpsSpec). No
    * watermark: a stratum cell lives for the stream's life, and its
    * state is k longs — O(cells × k) total, the operator's whole
    * point. Emit with `complete`/`update` output mode. */
  def streamingKmvDistinct(docs: DataFrame, groupCols: Seq[String],
      k: Int = 128, salt: String = "kmv"): DataFrame =
    graft.operators.TextStats.kmvDistinctTokens(docs, groupCols, k, salt)

  /** Continuous HyperLogLog distinct-token sketch — the fixed-register
    * sibling of [[streamingKmvDistinct]]
    * ([[graft.operators.TextStats.hllDistinctTokens]]). The batch
    * operator is one explode + one register-max UDAF aggregate
    * ([[graft.operators.TopK.RegisterMax]]), so it runs under
    * Structured Streaming as-is; per-group state is exactly m ints
    * REGARDLESS of stream length, and max-merge idempotence means a
    * replayed micro-batch cannot corrupt the sketch (addition-based
    * sketch state would double-count on retry; max cannot). Same
    * contract as the KMV form: no watermark, cells live for the
    * stream's life, emit with `complete`/`update` mode;
    * stream-over-prefix ≡ batch-over-prefix at every micro-batch
    * boundary (pinned in StreamOpsSpec). */
  def streamingHllDistinct(docs: DataFrame, groupCols: Seq[String],
      logM: Int = 6, salt: String = "hll"): DataFrame =
    graft.operators.TextStats.hllDistinctTokens(docs, groupCols,
      logM = logM, salt = salt)

  /** Continuous log-binned quantile histogram — the quantile member
    * of the streaming sketch family ([[streamingKmvDistinct]],
    * [[streamingHllDistinct]]): per-stratum bin counts
    * ([[graft.operators.TextStats.histBins]]) maintained as
    * state-store state, merged per micro-batch by addition exactly as
    * the batch aggregate merges per partition — stream-over-prefix ≡
    * batch-over-prefix at every micro-batch boundary (pinned in
    * StreamOpsSpec). State is ≤ 64·B counters per cell, stream-length
    * independent. Quantile EXTRACTION (the cumulative-sum finisher,
    * [[graft.operators.TextStats.histQuantiles]]) is a chained
    * aggregate + window — not streamable — so it runs batch-side over
    * the emitted state, the same split every serving layer makes.
    * Emit with `complete`/`update` mode, no watermark. */
  def streamingHistBins(docs: DataFrame, groupCols: Seq[String],
      binsPerOctave: Int = 8): DataFrame =
    graft.operators.TextStats.histBins(docs, groupCols, binsPerOctave)

  /** Streaming MinHash-LSH NEAR-dup detection with watermark-bounded
    * state — the streaming form of
    * [[graft.operators.Dedup.minhashNearDups]]'s array-native
    * pipeline. Every per-doc step (shingle-id set, `minhash_sigs`
    * signature, band keys) is an in-row projection over the stream —
    * poly ids mean NO vocabulary, so nothing global blocks a stream.
    * Candidates come from a watermarked stream-stream SELF-join on
    * (band, bkey) restricted to docs whose event times lie within
    * `horizon` of each other (the time-range predicate is what lets
    * Spark evict join state); the exact Jaccard verify runs in-row on
    * the carried id sets, and a final `dropDuplicatesWithinWatermark`
    * collapses multi-band matches of the same pair.
    *
    * Contract: detects near-dup pairs whose members arrive within
    * `horizon` of each other — the standard streaming-dedup tradeoff
    * ([[streamingExactDedupWithinWatermark]] has the same one);
    * cross-horizon duplicates need the batch pipeline over the archive.
    * Input needs `doc_id`, `text`, and an event-time column. */
  def streamingNearDups(docs: DataFrame, eventTimeCol: String,
      horizon: String, shingleK: Int = 3, numPerms: Int = 16,
      rowsPerBand: Int = 4, threshold: Double = 0.5): DataFrame = {
    graft.functions.PolyHash31.register(docs.sparkSession)
    val bands = graft.operators.TextOps
      .shingleIdSets(docs, shingleK, keep = Seq(eventTimeCol))
      .withColumn("sig", expr(s"minhash_sigs(tids, $numPerms)"))
      .select(col("doc_id"), col(eventTimeCol).as("ts"), col("tids"),
        posexplode(array(
          graft.operators.Dedup.sigBandKeys(numPerms, rowsPerBand): _*))
          .as(Seq("band", "bkey")))
    val a = bands.select(col("doc_id").as("d1"), col("ts").as("ts1"),
      col("tids").as("t1"), col("band").as("band1"),
      col("bkey").as("bkey1")).withWatermark("ts1", horizon)
    val b = bands.select(col("doc_id").as("d2"), col("ts").as("ts2"),
      col("tids").as("t2"), col("band").as("band2"),
      col("bkey").as("bkey2")).withWatermark("ts2", horizon)
    a.join(b, expr(
      s"""band1 = band2 AND bkey1 = bkey2 AND d1 < d2
         |AND ts2 >= ts1 - interval $horizon
         |AND ts2 <= ts1 + interval $horizon""".stripMargin))
      .withColumn("n_inter",
        size(array_intersect(col("t1"), col("t2"))).cast("long"))
      .withColumn("n_union",
        size(col("t1")).cast("long") + size(col("t2")) - col("n_inter"))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
      .where(col("jaccard") >= threshold)
      .withColumn("pair_ts", greatest(col("ts1"), col("ts2")))
      .withWatermark("pair_ts", horizon)
      .dropDuplicatesWithinWatermark("d1", "d2")
      .select(col("d1"), col("d2"), col("n_inter"), col("n_union"),
        col("jaccard"), col("pair_ts"))
  }

  /** Streaming EXACT dedup of a document stream against a persisted
    * corpus ([[graft.operators.Dedup.writeDedupState]] output): a
    * stream-static LEFT ANTI join on the content digest — the
    * continuous-ingest form of the incremental batch path. The static
    * digest table re-reads per micro-batch through Spark's file-source
    * caching; no stream state at all (the corpus IS the state). The
    * digest column `fp` is kept so downstream stages skip re-hashing. */
  def streamingExactDedupAgainstCorpus(docs: DataFrame,
      stateRoot: String): DataFrame = {
    val spark = docs.sparkSession
    val exDigests = spark.read.parquet(s"$stateRoot/dedup_digests")
    docs.withColumn("fp", sha2(col("text"), 256))
      .join(exDigests, Seq("fp"), "left_anti")
  }

  /** Streaming NEAR-dup detection against a persisted corpus: flags
    * stream docs whose shingle set verifies (exact Jaccard ≥
    * `threshold`) against at least one corpus doc sharing an LSH band
    * key. Banding parameters come from the state's meta table, so the
    * stream side is always banded compatibly with the corpus side.
    *
    * Shape: the stream's band keys are an in-row projection (no
    * vocabulary — nothing global blocks the stream); the corpus side
    * joins as a STATIC equi-semi-join on (band, bkey) with the
    * Jaccard verify folded into the join condition, so state is zero
    * and a micro-batch costs one hash join against the band table.
    * Multi-band hits of one doc collapse via
    * `dropDuplicatesWithinWatermark` on the doc id (a doc's band rows
    * share its event time, so the watermark can never split them).
    *
    * Returns the stream of FLAGGED docs (doc_id + event time) —
    * callers route them out of the ingest (the stream-stream anti-join
    * that would subtract them inline is unsupported by Structured
    * Streaming; composing "exact-anti then flag" is the supported
    * contract). */
  def streamingNearDupsAgainstCorpus(docs: DataFrame, stateRoot: String,
      eventTimeCol: String, delay: String,
      threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.PolyHash31.register(spark)
    val meta = spark.read.parquet(s"$stateRoot/dedup_meta").head()
    val (k, p, r) = (meta.getAs[Int]("shingle_k"),
      meta.getAs[Int]("num_perms"), meta.getAs[Int]("rows_per_band"))
    // "__c"-prefixed names cannot collide with the caller's event-time
    // column (which is caller-chosen, e.g. "et")
    val eb = spark.read.parquet(s"$stateRoot/dedup_bands")
      .select(col("tids").as("__c_tids"), col("band").as("__c_band"),
        col("bkey").as("__c_bkey"))
    val bands = graft.operators.TextOps
      .shingleIdSets(docs, k, keep = Seq(eventTimeCol))
      .withColumn("sig", expr(s"minhash_sigs(tids, $p)"))
      .select(col("doc_id"), col(eventTimeCol), col("tids"),
        posexplode(array(
          graft.operators.Dedup.sigBandKeys(p, r): _*))
          .as(Seq("band", "bkey")))
    // the intersect appears three times, but this residual predicate
    // only runs on rows the (band, bkey) hash keys already matched —
    // LSH collisions, not the corpus
    val verify = col("band") === col("__c_band") &&
      col("bkey") === col("__c_bkey") &&
      size(array_intersect(col("tids"), col("__c_tids"))).cast("double") /
        (size(col("tids")) + size(col("__c_tids")) -
          size(array_intersect(col("tids"), col("__c_tids")))) >= threshold
    bands.join(eb, verify, "left_semi")
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("doc_id")
      .select(col("doc_id"), col(eventTimeCol))
  }

  final case class RawPoint(att_name: String, t: Long, value_r: Double)
  final case class ArchivedPoint(att_name: String, t: Long,
      value_r: Double, prev: Double)

  /** Threshold archiver: per attribute, emit a point only when its
    * value moved at least `delta` from the LAST EMITTED value (first
    * point always emits) — the HDB++ "archive event" contract, kept as
    * one double of state per attribute via flatMapGroupsWithState.
    * Within a batch, points are processed in `t` order.
    *
    * NaN is a VALUE here (a sensor-fault reading the archive must
    * record), not a sentinel: transitions into and out of NaN emit,
    * repeated NaNs are suppressed like any unchanged value, and NaN
    * state survives micro-batch boundaries. (An earlier version used
    * NaN as the "no state yet" marker, which silently dropped every
    * fault reading — NaN satisfies no delta comparison — and lost the
    * detector's state whenever the last emitted value was NaN.) The
    * `prev` of a group's FIRST emitted point stays NaN: "no previous"
    * and "previous was a fault" coincide there, which consumers of an
    * append-only archive can disambiguate by position. */
  def archiveEvents(points: Dataset[RawPoint],
      delta: Double): Dataset[ArchivedPoint] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_.att_name)
      .flatMapGroupsWithState[Double, ArchivedPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[RawPoint], state: GroupState[Double]) =>
          var last: Option[Double] = state.getOption
          val out = rows.toSeq.sortBy(p => (p.t, p.value_r)).flatMap { p =>
            val moved = last match {
              case None => true // first point always emits
              case Some(l) if l.isNaN || p.value_r.isNaN =>
                // fault-transition: exactly one side NaN emits;
                // NaN → NaN is "unchanged", like a small delta
                l.isNaN != p.value_r.isNaN
              case Some(l) => math.abs(p.value_r - l) >= delta
            }
            if (moved) {
              val prev = last.getOrElse(Double.NaN)
              last = Some(p.value_r)
              Some(ArchivedPoint(key, p.t, p.value_r, prev))
            } else None
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
