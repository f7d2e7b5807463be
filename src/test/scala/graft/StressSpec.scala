package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable.ArrayBuffer

import graft.operators.{Catalog, Dedup, Retrieval, Sampling, SkewOps, TextStats, TimeJoins}

/** Scale/skew stress harness over SELF-GENERATED pathological data
  * (never touches /root/testdata): each scenario plants the exact
  * degeneracy the operator scaladocs claim to survive at 100 TB —
  * a corpus that is one giant stratum, an LSH band that stops
  * discriminating, a whale key holding most of a join's rows, a
  * duplicate CHAIN deeper than any single propagation round — and
  * asserts BOTH the answer and the distribution contract (work spread
  * across partitions/tasks, max ≤ 2× mean; candidate counts O(n), not
  * O(n²)). These turn the scaladoc scale arguments into measurements.
  *
  * Sizes are tuned to the shared local[2]/4-shuffle-partition test
  * session (seconds, not minutes); the SHAPES are scale-free — the
  * same assertions hold with more executors because every bound here
  * is per-partition, never global.
  */
class StressSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val timings = ArrayBuffer[(String, Double)]()
  private def timed[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    val sec = (System.nanoTime() - t0) / 1e9
    timings += label -> sec
    info(f"$label: $sec%.2f s")
    r
  }

  /** Collects per-task shuffle-read record counts while `body` runs,
    * grouped by stage. The listener bus is async — poll until the
    * captured set stabilizes before returning. */
  private def withTaskReads[A](body: => A): (A, Map[Int, Seq[Long]]) = {
    val reads = ArrayBuffer[(Int, Long)]()
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && t.taskInfo != null && t.taskInfo.successful)
          reads.synchronized {
            reads += ((t.stageId, m.shuffleReadMetrics.recordsRead))
          }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = body
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (stable < 2 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val n = reads.synchronized(reads.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      (r, reads.synchronized(reads.toSeq).groupBy(_._1)
        .map { case (s, xs) => s -> xs.map(_._2) })
    } finally spark.sparkContext.removeSparkListener(l)
  }

  /** Bounded re-measure for WALL-CLOCK ratio assertions (r18, the r17
    * driver flake): a shared container's load spike can stretch one
    * timing draw past any honest bound — one draw is not evidence of a
    * structural regression. Re-measuring is: the documented bug
    * signatures these ratios guard (lost gate cache, lost exchange
    * reuse, quadratic blowup) reproduce on EVERY draw at well past the
    * bound, so `attempts` consecutive failures still fail the suite
    * with the last measurement in the message, while an isolated spike
    * passes on re-draw. Bounds are NOT widened — detection power is
    * unchanged; only single-draw variance is retired. */
  private def retriedRatioAssert(attempts: Int)(measureAndAssert: => Unit)
      : Unit = {
    var n = 0
    var passed = false
    while (!passed) {
      n += 1
      try { measureAndAssert; passed = true }
      catch {
        case e: org.scalatest.exceptions.TestFailedException
            if n < attempts =>
          info(s"wall-clock ratio over bound (attempt $n/$attempts), " +
            s"re-measuring: ${e.getMessage}")
      }
    }
  }

  /** The heaviest shuffle stage must spread its reads: max per-task
    * records ≤ 2× the mean over that stage's tasks. */
  private def assertBalanced(reads: Map[Int, Seq[Long]],
      label: String): Unit = {
    val (sid, rs) = reads.filter(_._2.sum > 0).maxBy(_._2.sum)
    val mean = rs.sum.toDouble / rs.length
    assert(rs.max <= 2.0 * mean,
      s"$label: stage $sid skewed — max task read ${rs.max} rows vs " +
        f"mean $mean%.0f over ${rs.length} task(s)")
    info(s"$label: stage $sid — ${rs.length} task(s), " +
      f"max/mean = ${rs.max / mean}%.2f")
  }

  // ------------------------------------------------- one-stratum corpus
  test("stress: a one-stratum corpus spreads across partitions " +
    "(runningTokenSum / packTokenBudget)") {
    // 120k docs, ALL lang='en' — a per-stratum window would serialize
    // the whole corpus through one sort task; the two-pass prefix sum
    // must instead range-spread it and still be exactly right
    val docs = spark.range(120000).select(
      col("id").as("doc_id"), lit("en").as("lang"),
      (col("id") % 7 + 1).cast("long").as("n_tok"))
    val cum = timed("one-stratum runningTokenSum")(
      Sampling.runningTokenSum(docs, Seq("lang"))
        .persist())
    try {
      val perPid = cum.groupBy(col("pid")).count()
        .collect().map(r => r.get(0) -> r.getLong(1))
      assert(perPid.length > 1,
        s"single stratum landed in ${perPid.length} partition(s)")
      val counts = perPid.map(_._2)
      val mean = counts.sum.toDouble / counts.length
      assert(counts.max <= 2.0 * mean,
        f"partition skew: max ${counts.max} vs mean $mean%.0f")
      // exactness under the pathology: final cum = total token mass,
      // and a spot doc's cum = closed-form prefix over id%7+1
      val total = docs.agg(sum(col("n_tok"))).head().getLong(0)
      assert(cum.agg(max(col("cum"))).head().getLong(0) == total)
      val at = cum.where(col("doc_id") === 6999).select(col("cum"))
        .head().getLong(0)
      assert(at == 1000L * (1 + 2 + 3 + 4 + 5 + 6 + 7))
      info(f"${counts.length} partitions, max/mean = ${counts.max / mean}%.2f")
    } finally { cum.unpersist(); () }
  }

  // ------------------------------------------------ collapsed LSH band
  test("stress: a collapsed LSH band yields O(n) star pairs, one cluster") {
    // 3000 IDENTICAL docs: every band key is the same bucket of 3000
    // (> maxBucket=1000), so all-pairs would be ~4.5M; the cap must
    // degrade to a 2999-pair star that still clusters everything
    val n = 3000
    val docs = spark.range(n).select(col("id").as("doc_id"),
      lit("the same thirty word document body repeated verbatim for " +
        "every single row of this degenerate corpus so each band key " +
        "collapses into one bucket").as("text"))
    val pairs = timed("collapsed-band minhashNearDups")(
      Dedup.minhashNearDups(docs, spark).persist())
    try {
      val np = pairs.count()
      assert(np == (n - 1).toLong,
        s"expected ${n - 1} star pairs, got $np (all-pairs would be " +
          s"${n.toLong * (n - 1) / 2})")
      // identical texts: every verified pair is jaccard 1 on the anchor
      assert(pairs.where(col("jaccard") =!= 1.0).isEmpty)
      val cc = timed("collapsed-band connectedComponents")(
        Dedup.connectedComponents(pairs.select(col("d1"), col("d2"))))
      val byKeep = cc.groupBy(col("keep")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byKeep(1L) == 1L && byKeep(0L) == (n - 1).toLong,
        s"star must collapse to ONE canonical doc: $byKeep")
    } finally { pairs.unpersist(); () }
  }

  // ---------------------------------------------------- whale-key asof
  test("stress: asofJoinBucketed bounds the whale key's task size") {
    // one key holds ~83% of both sides — asofJoin would sort all of it
    // in ONE window task; the bucketed form must hash (key, bucket)
    // cells across tasks with no task reading > 2× the mean
    val whaleN = 120000
    val bucketUs = 4000L // whale spans 300 cells of ~400 rows/side
    def side(isLeft: Boolean): DataFrame = {
      val off = if (isLeft) 5L else 0L // left probes sit between rights
      val whale = spark.range(whaleN).select(
        lit("whale").as("k"), (col("id") * 10 + off).as("t"),
        col("id").as("rid"))
      val rest = spark.range(4000).select(
        concat(lit("k"), (col("id") % 5).cast("string")).as("k"),
        (col("id") * 10 + off).as("t"),
        (col("id") + 1000000).as("rid"))
      whale.unionByName(rest)
    }
    val left = side(isLeft = true)
    val right = side(isLeft = false).withColumn("v", col("rid") * 3)
      .drop("rid")
    // AQE's small-output coalescing would fold this local-sized shuffle
    // into one task and blind the balance measurement; at real scale
    // the stage is far past the advisory size and never coalesces
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      val (got, reads) = withTaskReads {
        timed("whale-key asofJoinBucketed")(
          TimeJoins.asofJoinBucketed(left, right, Seq("k"), "t", "t",
            Seq("v"), "t", bucketUs)
            .agg(count(lit(1)), sum(col("v"))).head())
      }
      assertBalanced(reads, "asofJoinBucketed")
      // parity with the single-window reference implementation: same
      // row count, same total matched payload
      val want = TimeJoins.asofJoin(left, right, Seq("k"), "t", "t",
        Seq("v"), "t").agg(count(lit(1)), sum(col("v"))).head()
      assert(got.getLong(0) == want.getLong(0) &&
        got.getLong(1) == want.getLong(1),
        s"bucketed/plain divergence: $got vs $want")
    } finally spark.conf.set(coalesceKey, saved)
  }

  // -------------------------------------------------- fused raster
  test("stress: fused raster keeps partial state O(pixels) on 1M points") {
    // 1M points into a 64×32 grid: the partial rows per task are
    // bounded by keys × pixels (≤ 2×2048 cells), so total shuffle rows
    // ≤ #partitions × cells regardless of the 1M input — the property
    // that makes the /image path interactive at archive scale
    val n = 1000000L
    val pts = spark.range(n).select(
      when(col("id") % 2 === 0, "a").otherwise("b").as("event_type"),
      col("id").as("point_id"),
      (col("id") * 3).as("t"),
      (col("id") % 97).cast("double").as("value_r"))
    val grid = graft.plans.RasterFusion.binPoints(pts, Seq("event_type"),
      0L, 3000000L, 0.0, 96.0, 64, 32)
    val rows = timed("fused raster 1M points")(grid.collect())
    assert(rows.length <= 2 * 64 * 32,
      s"grid exploded past the pixel bound: ${rows.length}")
    assert(rows.map(_.getLong(3)).sum == n) // every point binned once
    val plan = grid.queryExecution.executedPlan.toString
    assert(plan.contains("RasterBinPartial") &&
      plan.contains("RasterBinMerge"))
  }

  // ------------------------------------------- hot-token (Zipf) joins
  test("stress: an 80%-hot token spreads across the salted freq join " +
    "(rareTokenStats / tfidfTopTerms shape)") {
    // 60k docs; 'the' appears THRICE in 80% of docs (stop-word-grade:
    // 144k of 264k postings), plus one mid-frequency w<k> (df=3) and
    // one unique u<id> token per doc. Unsalted, every 'the' probe row
    // hashes to ONE reducer — and AQE cannot split it (the freq side's
    // exchange is elided, so the join isn't a two-shuffle pattern).
    // The salted join must spread it; broadcast is disabled so the
    // shuffle path (the 100 TB regime, where the vocabulary outgrows
    // any broadcast) is what gets measured.
    val n = 60000
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(
        when(col("id") % 5 =!= 0, lit("the the the ")).otherwise(lit("")),
        lit("w"), (col("id") % 20000).cast("string"),
        lit(" u"), col("id").cast("string")).as("text"))
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val (res, reads) = withTaskReads {
        timed("hot-token rareTokenStats")(
          TextStats.rareTokenStats(docs)
            .agg(count(lit(1)), sum(col("n_rare")), sum(col("n_tok")))
            .head())
      }
      val hot = n - n / 5
      assert(res.getLong(0) == n) // every doc scored
      assert(res.getLong(1) == n) // exactly the u<id> token is rare
      assert(res.getLong(2) == 5L * hot + 2L * (n / 5)) // total postings
      assertBalanced(reads, "rareTokenStats hot-token join")
      val (tfid, reads2) = withTaskReads {
        timed("hot-token tfidfTopTerms")(
          TextStats.tfidfTopTerms(docs)
            .agg(count(lit(1)), countDistinct(col("doc_id"))).head())
      }
      // 3 distinct terms in hot docs, 2 in the rest; top-k keeps all
      assert(tfid.getLong(0) == 3L * hot + 2L * (n / 5))
      assert(tfid.getLong(1) == n)
      assertBalanced(reads2, "tfidfTopTerms hot-term join")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  // -------------------------------------- salted join flat-cost price
  test("stress: the salted freq join's insurance on a SKEW-FREE corpus " +
    "is measured, not assumed") {
    // the Zipf salting is paid unconditionally (vocabulary×buckets
    // replication) — price it against the plain join on a uniform
    // corpus: 240k docs × 5 tokens uniformly over a 20k vocabulary,
    // no hot key anywhere. Broadcast disabled: the regime being priced
    // is the 100 TB shuffle join. Buckets = what saltedFreqJoin picks
    // at this session's shuffle-partition count, plus a 64-bucket
    // point to confirm the replication term scales linearly and stays
    // sane. Sized so per-run work (~1 s) dominates the GATE's fixed
    // per-query overhead (a few extra stages + two broadcasts,
    // ~0.2 s on this host regardless of data size) — at 60k docs that
    // constant read as a fake 1.7× "ratio".
    val n = 240000
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(
        lit("w"), (col("id") % 20000).cast("string"),
        lit(" w"), ((col("id") * 7 + 1) % 20000).cast("string"),
        lit(" w"), ((col("id") * 13 + 2) % 20000).cast("string"),
        lit(" w"), ((col("id") * 31 + 3) % 20000).cast("string"),
        lit(" w"), ((col("id") * 57 + 4) % 20000).cast("string"))
        .as("text"))
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    def consume(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("freq"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val shufP = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val buckets = math.min(1024, math.max(2, shufP))
      def best(label: String)(body: => (Long, Long)): Double = {
        body // warm-up pass: JIT + shuffle-file effects off the clock
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val r = body
          ((System.nanoTime() - t0) / 1e9, r)
        }
        assert(runs.map(_._2).distinct.length == 1)
        val sec = runs.map(_._1).min
        info(f"$label: $sec%.2f s → ${runs.head._2}")
        sec
      }
      val plainRes = consume(toks.join(freq, "tok"))
      // value parity on top of the timing
      assert(consume(SkewOps.saltedJoin(toks, freq, "tok", "doc_id",
        buckets)) == plainRes)
      assert(consume(SkewOps.hotSaltedJoin(toks, freq, "tok", "doc_id",
        buckets, "freq")) == plainRes)
      // the whole measurement (all four variants) re-draws on a bound
      // miss so both sides of each ratio come from ONE load window —
      // retrying only the failing side would compare across windows
      retriedRatioAssert(3) {
        val plain = best("plain uniform join")(
          consume(toks.join(freq, "tok")))
        val salted = best(s"salted($buckets) uniform join")(
          consume(SkewOps.saltedJoin(toks, freq, "tok", "doc_id", buckets)))
        val salted64 = best("salted(64) uniform join")(
          consume(SkewOps.saltedJoin(toks, freq, "tok", "doc_id", 64)))
        val gated = best(s"gated($buckets) uniform join")(
          consume(SkewOps.hotSaltedJoin(toks, freq, "tok", "doc_id",
            buckets, "freq")))
        val ratio = salted / plain
        val ratio64 = salted64 / plain
        val ratioG = gated / plain
        info(f"flat-cost ratio: salted($buckets)/plain = $ratio%.2f, " +
          f"salted(64)/plain = $ratio64%.2f, GATED/plain = $ratioG%.2f")
        // the documented claim is "noise next to the postings"; allow
        // generous host noise but fail if the insurance turns structural
        assert(ratio < 3.0,
          f"salted join costs $ratio%.2fx plain on a skew-free corpus")
        // the GATE is what production paths use now: a uniform corpus
        // has an empty hot set, so its cost must track the plain join
        // (the round-8 1.25–2.65× insurance is exactly what this
        // retires). The timed calls after the warm-up replay the
        // MEMOIZED gate decision (SkewOps.gateCache — the repeat-call
        // path every production pipeline takes), so this prices
        // gated≈plain directly; the one-off cold gate's 1.3–1.4×
        // serialized-aggregate latency is paid once per corpus at
        // construction. A structural regression (losing the cache or
        // exchange reuse) lands well past 2
        assert(ratioG < 2.0,
          f"gated join costs $ratioG%.2fx plain on a skew-free corpus")
      }
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  // --------------------------------------------- catalog-scale search
  test("stress: glob search over a 1M-row catalog stays a codegen " +
    "filter, no pre-filter collect") {
    // the reference sizes wildcard search at ~100k attributes fetched
    // whole into Python (hdbpp.py:216-218); 10× that must remain ONE
    // distributed filter+sort with the regex inside codegen
    val names = spark.range(1000000).select(
      concat(lit("r"), (col("id") % 3).cast("string")).as("domain"),
      concat(lit("fam"), (col("id") % 1000).cast("string")).as("family"),
      concat(lit("m"), (col("id") % 97).cast("string")).as("member"),
      concat(lit("attr"), col("id").cast("string")).as("name"))
    val q = Catalog.search(names, "r1/fam7/*/attr1*")
    val rows = timed("1M-row glob search")(q.collect())
    // closed form: id%3==1 ∧ id%1000==7 → id ≡ 1007 (mod 3000), and
    // name must start with attr1
    val want = (0 until 1000000).count(i =>
      i % 3 == 1 && i % 1000 == 7 && s"attr$i".startsWith("attr1"))
    assert(rows.length == want && want > 0)
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    val plan = q.queryExecution.executedPlan.toString
    // executedPlan.toString marks whole-stage-codegen spans "*(n) "
    assert(plan.contains("*(1) Filter"),
      s"glob filter fell out of codegen:\n$plan")
    // no driver round-trip before the filter: the only collect is the
    // final result; the plan must contain a Filter over the projection,
    // not a LocalTableScan of pre-collected rows
    assert(plan.contains("Filter"), s"no distributed filter in:\n$plan")
    assert(!plan.contains("LocalTableScan"),
      s"catalog was materialized driver-side before filtering:\n$plan")
  }

  // ------------------------------------------- collapsed k-means cell
  test("stress: a collapsed semanticDedup cell degrades to an anchor " +
    "star, O(n) pairs") {
    // 30k IDENTICAL vectors, one init label: every vector lands in ONE
    // cell, so honest all-pairs would be ~450M cosine checks; past
    // maxCell the operator must compare against the min-id anchor only
    // (29,999 pairs) and still drop everything but the anchor
    val n = 30000
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      expr("array(1.0f, 0.5f, 0.25f, 0.125f)").as("embedding"),
      lit(1).as("label"))
    val r = timed("collapsed-cell semanticDedup")(
      graft.operators.Similarity.semanticDedup(vecs, threshold = 0.99,
        iters = 1, dims = 4)
        .groupBy(col("keep")).count().collect()
        .map(x => x.getInt(0) -> x.getLong(1)).toMap)
    assert(r == Map(1 -> 1L, 0 -> (n - 1).toLong),
      s"star must keep exactly the anchor: $r")
  }

  // ------------------------------------------ curation-scale clusters
  test("stress: kmeans assignment at L=2048 clusters runs on the " +
    "broadcast-matrix path, sane plan, bounded time") {
    // SemDeDup-style dedup scales the cluster count with the corpus
    // (its cited deployments use ~50k cells); at L=2048 × dims=64 the
    // literal-SQL argmax would already be megabytes of SQL and past
    // Janino's method limit, so this must run on the broadcast
    // expression path (default threshold 64) — and stay join-free with
    // the plan O(1) in L
    val n = 4000
    val emb = spark.range(n).select(
      col("id").as("vec_id"),
      expr("transform(sequence(1L, 64L), " +
        "d -> cast(cast(pmod(id * d + d, 19) as double) / 19.0 as float))")
        .as("embedding"),
      (col("id") % 2048 + 1).cast("int").as("label"))
    val q = graft.operators.Similarity.kmeansAssign(emb, iters = 1)
    val rows = timed("L=2048 kmeans assignment")(q.collect())
    assert(rows.length == n)
    assert(rows.map(_.getInt(1)).distinct.length <= 2048)
    val joins = q.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, s"L=2048 assignment must not join: $joins")
    // the plan carries the broadcast expression, not 2048×64 literals:
    // its string form stays small
    val planStr = q.queryExecution.optimizedPlan.toString
    assert(planStr.contains("argmax_dot_e4"),
      s"expected the broadcast argmax expression in:\n$planStr")
    assert(planStr.length < 100000,
      s"plan blew up with literals: ${planStr.length} chars")
    assert(timings.last._2 < 60.0,
      f"L=2048 assignment too slow: ${timings.last._2}%.1f s")
  }

  // ------------------------------------------------ diameter-20 chain
  test("stress: bpeTokenize on a 4M-token maximal-hot-vocab corpus — " +
    "learning scales with the vocab, apply has no join to skew") {
    // every token drawn from an 8-word vocab: the worst case for the
    // vocab-JOIN apply formulation (every token is a hot key — the
    // exact pathology the salted freq join pays for elsewhere). The
    // in-row carry-fold apply has NO join: its only shuffle is the
    // doc_id regroup of integer sizes, asserted balanced; learning's
    // per-merge aggregate runs over an 8-row word-frequency table no
    // matter the corpus size
    val vocabLits = Seq("alpha", "beta", "gamma", "delta", "epsi",
      "zeta", "eta", "theta").map(w => s"'$w'").mkString(", ")
    def mkDocs(n: Long) = spark.range(n).select(col("id").as("doc_id"),
      expr(s"array_join(transform(sequence(0, 19), i -> " +
        s"element_at(array($vocabLits), " +
        s"int(pmod(id * 7 + i, 8)) + 1)), ' ')").as("text"))
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      val (row, reads) = withTaskReads {
        timed("bpeTokenize 200k docs × 20 hot tokens (broadcast apply)")(
          TextStats.bpeTokenize(mkDocs(200000), numMerges = 4)
            .agg(count(lit(1)), sum(col("n_sym0")), sum(col("n_bpe")))
            .head())
      }
      assert(row.getLong(0) == 200000L)
      // 4M tokens × (4|5)-char words; merges strictly shrink
      assert(row.getLong(1) > 4000000L * 4 - 1)
      assert(row.getLong(2) < row.getLong(1))
      assertBalanced(reads, "bpeTokenize apply regroup")
      // past-broadcast fallback: the per-row fold path must produce
      // the bit-identical frame (smaller corpus — the fold pays ~10×
      // CPU per token, which is the measured price of not joining)
      val small = mkDocs(10000)
      val bc = timed("bpe apply 10k docs, broadcast path")(
        TextStats.bpeTokenize(small, 4).orderBy("doc_id").collect())
      val fold = timed("bpe apply 10k docs, fold path")(
        TextStats.bpeTokenize(small, 4, broadcastVocabMax = 0)
          .orderBy("doc_id").collect())
      assert(bc.toSeq == fold.toSeq)
    } finally spark.conf.set(coalesceKey, saved)
  }

  test("stress: connectedComponents closes a diameter-20 dup chain") {
    // a 21-doc path graph (diameter 20) among 500 two-doc islands:
    // min-label propagation moves ONE hop per round, so the chain
    // forces the composed 2/4/8-round escalation to actually compose —
    // a single materialization cannot finish it
    val chain = (0 until 20).map(i => (1000L + i, 1000L + i + 1))
    val islands = (0 until 500).map(i => (2000L + 2 * i, 2001L + 2 * i))
    val pairs = (chain ++ islands).toDF("d1", "d2")
    // localEdgeThreshold = 0 forces the DISTRIBUTED loop — this case
    // pins the composed-round escalation, which the driver-side
    // fast path would otherwise bypass at this size
    val cc = timed("diameter-20 connectedComponents")(
      Dedup.connectedComponents(pairs, localEdgeThreshold = 0).persist())
    try {
      // the whole chain must collapse to its minimum label…
      val chainLabels = cc.where(col("doc_id").between(1000L, 1020L))
        .select(col("cluster_id")).distinct().as[Long].collect().toSeq
      assert(chainLabels == Seq(1000L),
        s"chain did not converge to one cluster: $chainLabels")
      // …while every island keeps its own
      val islandClusters = cc.where(col("doc_id") >= 2000L)
        .select(col("cluster_id")).distinct().count()
      assert(islandClusters == 500L)
      val keeps = cc.where(col("keep") === 1).count()
      assert(keeps == 501L) // 1 chain canonical + 500 island canonicals
    } finally { cc.unpersist(); () }
  }

  test("stress: connectedComponents closes a diameter-1000 chain " +
    "within the default round budget (pointer jumping)") {
    // the propagation worst case — one giant path graph, where plain
    // min-label moves ONE hop per round and the default maxIter=50
    // would fail loudly. Pointer jumping engages after round 6 and
    // halves the label-forest depth per materialization, so the chain
    // must close in O(log 1000) materializations under the DEFAULT
    // budget — this is the "degrade gracefully, not fail" contract for
    // chain-shaped pathologies.
    val chain = (0 until 1000).map(i => (5000L + i, 5000L + i + 1))
    // distributed loop forced (threshold 0): the case exists to pin
    // pointer jumping, not the driver-side fast path
    val cc = timed("diameter-1000 connectedComponents")(
      Dedup.connectedComponents(chain.toDF("d1", "d2"),
        localEdgeThreshold = 0).persist())
    try {
      val labels = cc.select(col("cluster_id")).distinct()
        .as[Long].collect().toSeq
      assert(labels == Seq(5000L),
        s"chain did not converge to one cluster: ${labels.take(5)}…")
      assert(cc.where(col("keep") === 1).count() == 1L)
      assert(cc.count() == 1001L)
    } finally { cc.unpersist(); () }
  }

  test("stress: connectedComponents past its round budget fails " +
    "LOUDLY, never silently truncates") {
    // exhausting maxIter must throw (a silently-truncated clustering
    // would ship non-minimal cluster_ids downstream): maxIter=2 allows
    // exactly one depth-2 materialization against a diameter-20 chain
    val chain = (0 until 20).map(i => (7000L + i, 7000L + i + 1))
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain.toDF("d1", "d2"), maxIter = 2,
        localEdgeThreshold = 0)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("stress: a degenerate Hamming bucket (20k identical docs) " +
    "star-expands instead of going quadratic") {
    // 20k copies of ONE text: every fingerprint identical, so each of
    // the 2 blocks has ONE bucket holding all 20k docs — all-pairs
    // would be 2 × C(20k,2) ≈ 400M pair rows in two tasks. The cap
    // must (a) finish fast, (b) emit exactly the n-1 anchor-star
    // pairs, (c) say so in the observe metric.
    val n = 20000
    val corpus = spark.range(n).select(col("id").as("doc_id"),
      lit("same text repeated in every single document body").as("text"))
    val pairs = timed("degenerate hamming bucket, n=20k")(
      Dedup.simhashHammingDups(corpus, spark, maxDist = 1).persist())
    try {
      val cnt = pairs.count()
      assert(cnt == (n - 1).toLong,
        s"expected ${n - 1} anchor-star pairs, got $cnt")
      // all pairs anchored at doc 0, all hamming 0
      assert(pairs.where(col("d1") =!= 0L).count() == 0L)
      assert(pairs.where(col("hamming") =!= 0).count() == 0L)
      val overflow = pairs.queryExecution.observedMetrics.collect {
        case (name, row) if name.startsWith("hamming_buckets_") =>
          (row.getAs[Long]("overflow_buckets"),
            row.getAs[Int]("max_bucket_size"))
      }
      assert(overflow.nonEmpty, "observe metric not recorded")
      assert(overflow.head._1 == 2L, // one degenerate bucket per block
        s"expected 2 overflow buckets, got ${overflow.head._1}")
      assert(overflow.head._2 == n)
    } finally { pairs.unpersist(); () }
  }

  test("stress: a 100%-hot boilerplate header never parks on one reducer") {
    // 30k docs, every one opening with the SAME 4-token header chunk —
    // the operator's own target pathology (site chrome on every page).
    // The header digest's 30k count rows must spread over the salted
    // aggregate's buckets, and the flagging join is a broadcast of ONE
    // digest — the chunk text never shuffles on the digest at all.
    val n = 30000
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("h1 h2 h3 h4 b"), col("id").cast("string"),
        lit(" c d e")).as("text"))
    val (res, reads) = withTaskReads {
      timed("hot-header stripBoilerplate")(
        Dedup.stripBoilerplate(docs, k = 4)
          .agg(count(lit(1)), sum(col("n_dropped")), sum(col("n_chunks")),
            sum(when(col("kept_text").startsWith("b"), 1L).otherwise(0L)))
          .head())
    }
    assert(res.getLong(0) == n)      // every doc survives as a row
    assert(res.getLong(1) == n)      // exactly the header dropped per doc
    assert(res.getLong(2) == 2L * n)
    assert(res.getLong(3) == n)      // every rewrite kept only the body
    assertBalanced(reads, "stripBoilerplate hot-header count")
  }

  test("stress: a stop-word shared by every doc and every query keeps " +
    "lexical retrieval balanced") {
    // 60k docs and 8 queries all containing 'the' — the retrieval
    // worst case: the hot token makes EVERY doc a candidate for EVERY
    // query (Q×N scored pairs, inherent to exhaustive scoring). The
    // (query_id, doc_id) aggregate must spread those pairs; the
    // broadcast query/weight sides mean no shuffle ever keys on the
    // hot token itself.
    val n = 60000
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("the u"), col("id").cast("string")).as("text"))
    val queries = spark.range(8).select((col("id") + 1000000L).as("query_id"),
      concat(lit("the u"), (col("id") * 7500).cast("string")).as("text"))
    // AQE would coalesce the small-byte pair aggregate to one
    // partition and make the balance assertion vacuous; the per-task
    // spread is the thing under test
    val saved = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val (res, reads) = withTaskReads {
        timed("hot-token lexicalTopK")(
          Retrieval.lexicalTopK(docs, queries, k = 3)
            .agg(count(lit(1)), countDistinct(col("query_id")),
              min(col("score"))).head())
      }
      assert(res.getLong(0) == 24L) // 8 queries × k=3
      assert(res.getLong(1) == 8L)
      // rank-1 per query is the doc sharing the rare u<id> token
      // (df=1 → wt 10^6) plus 'the' (10^6/60000 = 16); the rest share
      // only 'the' — min score over the top-3 is the hot-token-only tier
      assert(res.getLong(2) == 1000000L / n)
      assertBalanced(reads, "lexicalTopK hot-token scoring")
    } finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", saved)
  }

  test("stress: a stop-bigram in 80% of docs spreads across " +
    "bigramSurprise's salted joins") {
    // 'the end' appears once per hot doc (48k of 60k) — stop-bigram
    // grade; each doc also has a unique u<id> transition. Broadcast
    // is disabled so the salted shuffle path (the 100 TB regime) is
    // what gets measured, as in the rareTokenStats stress.
    val n = 60000
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("u"), col("id").cast("string"),
        when(col("id") % 5 =!= 0, lit(" the end"))
          .otherwise(lit(" solo fin"))).as("text"))
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val (res, reads) = withTaskReads {
        timed("hot-bigram bigramSurprise")(
          TextStats.bigramSurprise(docs)
            .agg(count(lit(1)), sum(col("n_bigrams"))).head())
      }
      assert(res.getLong(0) == n)      // every doc has transitions
      assert(res.getLong(1) == 2L * n) // 3 tokens → 2 bigrams each
      assertBalanced(reads, "bigramSurprise hot-bigram join")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("stress: footer-index skipping on a 120-file flat archive " +
    "touches 1 file for a 1-day window") {
    // the 100 TB shape TsStatsFileIndex exists for: a flat dir of
    // day-rolled unadjusted-µs files, where Spark's own parquet layer
    // prunes NOTHING (EncodingMatrixSpec). 120 day files ≈ 4 months;
    // a one-day window must touch 1 of them — the claim is I/O
    // PROPORTIONALITY (files touched ∝ window, not archive size); at
    // this fixture size wall-clock is planning-dominated either way,
    // so timings are recorded as info, not asserted. Also measures the
    // driver-side footer index build — the O(#files) metadata cost
    // paid once per adapter.
    import org.apache.spark.sql.functions._
    val nFiles = 120
    val perFile = 2000
    val base = 1704412800000000L
    val dayUs = 86400000000L
    val dir = java.nio.file.Files
      .createTempDirectory("graft-stress-skip").toString
    timed("footer-skip: write 120 day files") {
      spark.range(nFiles.toLong * perFile)
        .select(col("id").as("event_id"),
          timestamp_micros(lit(base) + (col("id") / perFile).cast("long")
            * dayUs + (col("id") % perFile) * 1000000L)
            .cast("timestamp_ntz").as("ts"),
          (col("id") % 50).as("user_id"),
          lit("click").as("event_type"),
          col("id").cast("double").as("value"),
          col("id").cast("string").as("props"))
        .repartitionByRange(nFiles, col("ts"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    val adapter = timed("footer-skip: index build (120 footers)") {
      val a = new graft.sources.EventsArchiveAdapter(spark, dir)
      a.raw.rdd.getNumPartitions // force the lazy index + listing
      a
    }
    val d = 60
    val window = graft.sources.EventsArchiveAdapter.tsRangeUs(
      base + d * dayUs, base + (d + 1) * dayUs - 1)
    val pruned = timed("footer-skip: 1-day window, indexed") {
      adapter.pointsAll.where(window).agg(count(lit(1))).head().getLong(0)
    }
    val q = adapter.pointsAll.where(window)
    q.collect()
    val files = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
    val full = timed("footer-skip: same window, stock reader") {
      spark.read.parquet(s"$dir/events.parquet")
        .where(col("ts").between(
          timestamp_micros(lit(base + d * dayUs)).cast("timestamp_ntz"),
          timestamp_micros(lit(base + (d + 1) * dayUs - 1))
            .cast("timestamp_ntz")))
        .agg(count(lit(1))).head().getLong(0)
    }
    assert(pruned == full && pruned == perFile)
    // repartitionByRange may split a day boundary across two files;
    // the point is 1-2 of 120, not 120 of 120
    assert(files <= 2, s"expected ≤2 of $nFiles files, scanned $files")
  }

  test("stress: flagship dedup scales sub-quadratically over a 10× " +
    "synthetic near-dup corpus") {
    // builder-generated corpus (distributed spark.range — NOT driver
    // seqs, so generation itself scales): groups of 10 docs share 29
    // of 30 tokens (pairwise Jaccard 29/31 ≈ 0.94 — safely over the
    // 0.5 default), one token varies per doc. Near-dup structure is
    // O(n): n/10 clusters of 10 → ~45 verified pairs per cluster —
    // the LSH regime the 100 TB argument assumes. Every stage's
    // claimed shape (banded candidates, bounded buckets, broadcast
    // anti-join) is what makes the end-to-end time scale ~linearly;
    // all-pairs anywhere would show up as ~100× at 10× data.
    def corpus(n: Long): DataFrame = {
      val variant = concat(lit("v"),
        pmod(xxhash64(col("id")), lit(977)))
      val shared = (1 to 29).map(j => concat(lit("t"),
        pmod(xxhash64(expr(s"(id div 10) * 31 + $j")), lit(5000))))
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", variant +: shared: _*).as("text"))
    }
    def run(n: Long): (Long, Double) = {
      var survivors = 0L
      val sec = {
        val t0 = System.nanoTime()
        survivors = Dedup.dedupedCorpus(corpus(n), spark).count()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sharedState.cacheManager.clearCache()
      (survivors, sec)
    }
    run(1500L) // warm codegen/JIT so the ratio measures execution
    retriedRatioAssert(2) {
      val (s1, t1) = run(1500L)
      val (s10, t10) = run(15000L)
      timings += "dedup scale 1x" -> t1
      timings += "dedup scale 10x" -> t10
      info(f"dedup 1×: $t1%.2f s ($s1 survivors), 10×: $t10%.2f s ($s10)")
      // one keeper per 10-doc group when LSH finds the cluster; allow
      // slack for pairs a 16-perm signature misses
      assert(s1 >= 150L && s1 <= 300L, s"unexpected survivor count $s1")
      assert(s10 >= 1500L && s10 <= 3000L, s"unexpected survivor count $s10")
      // sub-quadratic: 10× data in well under quadratic's 100× time
      // (generous bound — a shared CI-ish host jitters small runs)
      val ratio = t10 / math.max(t1, 0.5)
      assert(ratio < 30.0,
        f"dedup did not scale: 1×=$t1%.2f s, 10×=$t10%.2f s (${ratio}%.1f×)")
    }
  }

  test("stress: blockedJaccard REFUSES a pathological oversized block " +
    "instead of detonating O(n²)") {
    // one fat block — the skewed-blocking-key shape a 100 TB web corpus
    // has (most docs land in one (lang, source) stratum). The operator's
    // scale contract is quadratic-WITHIN-a-block, so the guard must
    // refuse loudly BEFORE producing any pair, naming the fat block and
    // pointing at the sub-quadratic alternative.
    val docs = spark.range(5000).select(
      col("id").as("doc_id"),
      lit("en").as("lang"),
      // 4999 docs in one block, 1 in another: the guard must report the
      // fat block, not trip on the healthy one
      when(col("id") === 0, "rare").otherwise("cc").as("source"),
      concat(lit("w"), col("id").cast("string")).as("text"))
    val e = intercept[IllegalArgumentException] {
      Dedup.blockedJaccard(docs, Seq("lang", "source"), 0.5,
        maxBlock = 1000L)
    }
    assert(e.getMessage.contains("source=cc"), e.getMessage)
    assert(e.getMessage.contains("4999"), e.getMessage)
    assert(e.getMessage.contains("minhashNearDups"), e.getMessage)
    // same data under a sufficient cap still runs (and pairs only
    // within blocks — zero pairs here, every doc's word set is unique)
    assert(Dedup.blockedJaccard(docs, Seq("lang", "source"), 0.5,
      maxBlock = 5000L).count() === 0L)
  }

  test("stress: IVF top-k scales sub-quadratically over a 10× " +
    "synthetic embedding corpus") {
    // 64-dim quantized embeddings from a hash recurrence, 32 IVF
    // cells; query cost is |Q|·nprobe cells against ONE broadcast
    // centroid matrix — corpus rows never fan out, so 10× vectors
    // must cost ~10×, not 100× (the all-pairs failure the broadcast
    // argmax expression exists to avoid).
    def embs(n: Long): DataFrame = spark.range(n).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(1, 64), i ->
        cast((cast(pmod(xxhash64(id * 64 + i), 2001) as double) - 1000.0)
          / 1000.0 as float))""").as("embedding"),
      pmod(xxhash64(col("id")), lit(32)).cast("int").as("label"))
    def run(n: Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = graft.operators.Similarity
        .ivfTopK(embs(n), col("vec_id") < 20, k = 5, nprobe = 2)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      (rows, sec)
    }
    run(20000L) // warm
    retriedRatioAssert(2) {
      val (r1, t1) = run(20000L)
      val (r10, t10) = run(200000L)
      timings += "ivf scale 1x" -> t1
      timings += "ivf scale 10x" -> t10
      info(f"ivf 1×: $t1%.2f s ($r1 rows), 10×: $t10%.2f s ($r10 rows)")
      // every query fills its top-k from ~n/32-deep probed cells
      assert(r1 == 100L && r10 == 100L)
      val ratio = t10 / math.max(t1, 0.5)
      assert(ratio < 30.0,
        f"ivf did not scale: 1×=$t1%.2f s, 10×=$t10%.2f s (${ratio}%.1f×)")
    }
  }

  test("stress: BM25 retrieval scales ~linearly over a 10× corpus " +
    "with a fixed query set") {
    // the bench-tail family's 100 TB argument: with Q fixed, every
    // stage is linear in the corpus — postings tf aggregate, the
    // query-vocab prune, the Q-fanout scoring aggregate (Q×N pairs),
    // and the bounded top-k. Docs share one hot token with every
    // query (the dense regime: every doc is a candidate for every
    // query) plus rare tokens; 10× docs must cost ~10×, not the
    // all-pairs-style blowup a sort-merge or window regression would
    // produce.
    def corpus(n: Long): DataFrame = spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("the u"), col("id").cast("string"), lit(" t"),
        pmod(xxhash64(col("id")), lit(997))).as("text"))
    val queries = spark.range(8).select(
      (col("id") + 10000000L).as("query_id"),
      concat(lit("the u"), (col("id") * 977).cast("string")).as("text"))
      .persist()
    def run(n: Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val rows = graft.operators.Retrieval
        .bm25TopK(corpus(n), queries, k = 5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      (rows, sec)
    }
    run(30000L) // warm
    try retriedRatioAssert(2) {
      val (r1, t1) = run(30000L)
      val (r10, t10) = run(300000L)
      timings += "bm25 scale 1x" -> t1
      timings += "bm25 scale 10x" -> t10
      info(f"bm25 1×: $t1%.2f s ($r1 rows), 10×: $t10%.2f s ($r10 rows)")
      assert(r1 == 40L && r10 == 40L) // 8 queries × k=5 at both scales
      val ratio = t10 / math.max(t1, 0.5)
      assert(ratio < 30.0,
        f"bm25 did not scale: 1×=$t1%.2f s, 10×=$t10%.2f s (${ratio}%.1f×)")
    } finally queries.unpersist()
  }

  test("stress timings summary") {
    // recorded for STATUS.md; scalatest orders tests in declaration
    // order within a suite, so everything above has run
    timings.foreach { case (l, s) => info(f"$l: $s%.2f s") }
    assert(timings.nonEmpty)
    // durable artifact (STRESS_SELF.json): ABSOLUTE per-stage seconds,
    // so STATUS cites a committed file instead of one window's ratio —
    // r12's ivf-10× ratio read 2.9× in one window and 5.7× in another
    // while the absolute times told the same story. A `-z` subset run
    // writes a partial map (fewer keys); only commit full-suite files.
    val js = timings.map { case (l, s) =>
      Verify.q(l) + ":" + String.format(java.util.Locale.ROOT, "%.3f",
        Double.box(s))
    }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STRESS_SELF.json"),
      s"""{"metric":"stress_timings","unit":"sec","agg":"single-run",""" +
        s""""host":"local[2]","timings":$js}""" + "\n")
  }
}
