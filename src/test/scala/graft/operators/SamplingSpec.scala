package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "en", "a b c d e f g h"),
    (1L, "en", "i j k l"),
    (2L, "en", "m n o p q r"),
    (3L, "de", "s t u"),
    (4L, "de", "v w x y z a b c d e"),
    (5L, "en", "f g h i j"))
    .toDF("doc_id", "lang", "text")

  test("assignSplits: pure projection, stable buckets, full coverage") {
    val r = Sampling.assignSplits(docs)
    assert(r.count() == 6)
    // buckets in range, split consistent with bucket
    val rows = r.select("bucket", "split").collect()
    rows.foreach { row =>
      val (b, s) = (row.getLong(0), row.getString(1))
      assert(b >= 0 && b < 100)
      val expect = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == expect)
    }
    // deterministic across invocations
    val a = Sampling.assignSplits(docs).select("doc_id", "split").collect().toSet
    val b = Sampling.assignSplits(docs).select("doc_id", "split").collect().toSet
    assert(a == b)
  }

  test("clusterSafeSplits: no pair straddles a split; singleton docs " +
    "equal assignSplits; clusters ride the canonical min id") {
    // pair graph: {10,11,12} chained, {20,21} — plus loners 30, 31
    val corpus = Seq(10L, 11L, 12L, 20L, 21L, 30L, 31L)
      .map(i => (i, s"text $i")).toDF("doc_id", "text")
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("d1", "d2")
    val r = Sampling.clusterSafeSplits(corpus, pairs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getString(2))).toMap
    assert(r.keySet == Set(10L, 11L, 12L, 20L, 21L, 30L, 31L))
    // clusters collapse to the min id and share ONE split
    assert(Seq(10L, 11L, 12L).map(r(_)._1).distinct == Seq(10L))
    assert(Seq(10L, 11L, 12L).map(r(_)._2).distinct.length == 1)
    assert(Seq(20L, 21L).map(r(_)._1).distinct == Seq(20L))
    assert(r(20L)._2 == r(21L)._2)
    // the straddle set over the assignment is empty — no pair sees
    // two different splits
    val assigned = Sampling.clusterSafeSplits(corpus, pairs)
    val straddling = pairs
      .join(assigned.select(col("doc_id").as("d1"),
        col("split").as("s1")), Seq("d1"))
      .join(assigned.select(col("doc_id").as("d2"),
        col("split").as("s2")), Seq("d2"))
      .where(col("s1") =!= col("s2"))
    assert(straddling.count() == 0L)
    // loners: identical to the plain per-doc assignment
    val plain = Sampling.assignSplits(corpus)
      .select(col("doc_id"), col("split")).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    Seq(30L, 31L).foreach { d =>
      assert(r(d)._1 == d && r(d)._2 == plain(d))
    }
  }

  test("quotaSample: k smallest hashes per stratum, rank order, no window") {
    val r = Sampling.quotaSample(docs, Seq("lang"), k = 2)
    val rows = r.orderBy("lang", "rn").collect()
    // at most k per stratum
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang("en").length == 2 && byLang("de").length == 2)
    // rn is 1..k and hashes ascend within a stratum
    byLang.values.foreach { g =>
      assert(g.map(_.getLong(1)).toSeq == (1L to g.length))
      val hs = g.map(_.getLong(3)).toSeq
      assert(hs == hs.sorted)
    }
    // equals the brute-force window formulation
    graft.functions.PolyHash31.register(spark)
    val brute = docs
      .select(col("lang"), col("doc_id"),
        Sampling.splitHash("quota", col("doc_id")).as("h"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy("h", "doc_id")))
      .where(col("rn") <= 2)
      .select(col("lang"), col("rn").cast("long"), col("doc_id"), col("h"))
      .collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet == brute)
  }

  test("domainTokenCaps: share-based cap, hash-priority keep order, " +
    "inclusive boundary, window parity") {
    // two domains: "big" holds 3/4 of the tokens, "small" 1/4; cap 50%
    val d = Seq(
      (0L, "big", "t " * 30), (1L, "big", "t " * 30),
      (2L, "big", "t " * 30), (3L, "big", "t " * 30),
      (4L, "small", "t " * 40))
      .map { case (id, s, t) => (id, s, t.trim) }
      .toDF("doc_id", "source", "text")
    val r = Sampling.domainTokenCaps(d, "source", 1, 2)
      .orderBy("source", "doc_id").collect()
    // total 160 tokens → cap 80: small (40) fully kept; big keeps docs
    // in (h_ord, doc_id) order while cum ≤ 80 → exactly 2 of its 4
    assert(r.forall(_.getLong(5) == 80L))
    val big = r.filter(_.getString(0) == "big")
    assert(big.count(_.getBoolean(6)) == 2)
    val keptBig = big.filter(_.getBoolean(6)).map(x => (x.getLong(3), x.getLong(1)))
    val allBig = big.map(x => (x.getLong(3), x.getLong(1))).sorted
    assert(keptBig.sorted.toSeq == allBig.take(2).toSeq,
      "keep priority is hash order")
    assert(r.filter(_.getString(0) == "small").forall(_.getBoolean(6)))
    // window-formulation parity on a wider frame
    graft.functions.PolyHash31.register(spark)
    val wide = (0 until 120).map(i =>
      (i.toLong, s"s${i % 5}", ("w " * (i % 7 + 1)).trim))
      .toDF("doc_id", "source", "text")
    val got = Sampling.domainTokenCaps(wide, "source", 1, 10)
      .select("source", "doc_id", "n_tok", "h_ord", "cum", "cap", "kept")
      .collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy("h_ord", "doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = wide.agg(sum(size(split(col("text"), " "))).cast("long"))
      .head().getLong(0)
    val brute = wide
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        Sampling.splitHash("domcap", col("doc_id")).as("h_ord"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("cap", lit(tot / 10))
      .withColumn("kept", col("cum") <= col("cap"))
      .collect().map(_.toSeq).toSet
    assert(got == brute)
  }

  test("packTokenBudget: greedy fill, bins chain by start offset") {
    // en docs in id order: 8, 4, 6, 5 tokens; budget 10 →
    // starts 0,8,12,18 → bins 0,0,1,1
    val r = Sampling.packTokenBudget(docs, Seq("lang"), budget = 10L)
      .orderBy("lang", "bin").collect()
    val en = r.filter(_.getString(0) == "en")
    assert(en.map(row => (row.getLong(1), row.getLong(2), row.getLong(3)))
      .toSeq == Seq((0L, 2L, 12L), (1L, 2L, 11L)))
    // first/last doc ids per bin
    assert(en.map(row => (row.getLong(4), row.getLong(5))).toSeq ==
      Seq((0L, 1L), (2L, 5L)))
    // de: 3 + 10 tokens → starts 0,3 → both bin 0
    val de = r.filter(_.getString(0) == "de")
    assert(de.map(row => (row.getLong(1), row.getLong(2), row.getLong(3)))
      .toSeq == Seq((0L, 2L, 13L)))
  }

  test("packTokenBudget: two-pass cumsum matches the window form and " +
      "distributes a single giant stratum across partitions") {
    // 4000 docs, 90% in one stratum — the shape where a per-stratum
    // window serializes through one sort task
    val big = spark.range(4000).selectExpr(
      "id AS doc_id",
      "CASE WHEN id % 10 < 9 THEN 'en' ELSE 'de' END AS lang",
      // 1..7 tokens, deterministic
      "array_join(transform(sequence(1, CAST(id % 7 + 1 AS INT)), " +
        "i -> 'w'), ' ') AS text")
    val r = Sampling.packTokenBudget(big, Seq("lang"), budget = 100L)
    // reference: the straight per-stratum window cumsum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val brute = big
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("bin", expr("(cum - n_tok) div 100L"))
      .groupBy("lang", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    assert(r.orderBy("lang", "bin").collect().map(_.toSeq).toSeq ==
      brute.orderBy("lang", "bin").collect().map(_.toSeq).toSeq)
    // the cumsum itself spread the 'en' stratum over many partitions:
    // no single-task sort of a one-stratum corpus
    val pids = Sampling.runningTokenSum(
      big.where(col("lang") === "en").select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")),
      Seq("lang"))
      .select(countDistinct(col("pid"))).head().getLong(0)
    assert(pids > 1, s"single-stratum cumsum used only $pids partition(s)")
  }

  test("packTokenBudget: a null-text doc counts as 0 tokens, no crash") {
    val d = Seq((0L, "en", "a b c"), (1L, "en", null), (2L, "en", "d e"))
      .toDF("doc_id", "lang", "text")
    val r = Sampling.packTokenBudget(d, Seq("lang"), budget = 100L)
      .collect()
    assert(r.length == 1)
    // 3 docs, 5 real tokens, the null doc occupies its slot at 0 cost
    assert(r.head.getLong(2) == 3L && r.head.getLong(5) == 2L)
  }

  test("property: runningTokenSum ≡ window cumsum across random shapes") {
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { trial =>
      val nStrata = Seq(1, 2, 5, 40)(trial - 1) // incl. the 1-stratum shape
      val rows = (0 until 300).map { i =>
        val lang =
          if (rnd.nextInt(10) == 0) null // null stratum must survive
          else s"s${rnd.nextInt(nStrata)}"
        (i.toLong, lang, 1L + rnd.nextInt(9))
      }
      val df = rows.toDF("doc_id", "lang", "n_tok")
      val got = Sampling.runningTokenSum(df, Seq("lang"))
        .select("lang", "doc_id", "cum").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1)) -> r.getLong(2))
        .toMap
      val expect = rows.groupBy(_._2).flatMap { case (lang, g) =>
        g.sortBy(_._1).scanLeft((0L, 0L)) { case ((_, acc), (id, _, n)) =>
          (id, acc + n)
        }.drop(1).map { case (id, cum) => (Option(lang), id) -> cum }
      }
      assert(got == expect, s"trial $trial diverged")
    }
  }

  test("runningTokenSum: binary stratum column compares by value") {
    // BinaryType strata surface in the per-partition pass as
    // Array[Byte], whose == is reference identity — without key
    // normalization the accumulator resets every row and cum is wrong
    val rows = (0 until 100).map { i =>
      (i.toLong, Array[Byte]((i % 2).toByte), 3L)
    }
    val df = rows.toDF("doc_id", "grp", "n_tok")
    val got = Sampling.runningTokenSum(df, Seq("grp"))
      .select(conv(hex(col("grp")), 16, 10).cast("int").as("g"),
        col("doc_id"), col("cum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.groupBy(_._2(0).toInt).foreach { case (g, docs) =>
      docs.map(_._1).sorted.zipWithIndex.foreach { case (id, rank) =>
        assert(got((g, id)) == 3L * (rank + 1),
          s"stratum $g doc $id: got ${got((g, id))}, want ${3L * (rank + 1)}")
      }
    }
  }

  test("globalSample: n smallest hashes, bounded top-n plan") {
    val r = Sampling.globalSample(docs, n = 3)
    val rows = r.collect()
    assert(rows.length == 3)
    val hs = rows.map(_.getLong(1)).toSeq
    assert(hs == hs.sorted)
    // matches a brute-force full sort
    graft.functions.PolyHash31.register(spark)
    val brute = docs
      .select(col("doc_id"), Sampling.splitHash("sample", col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.take(3)
      .map(_._2).toSeq
    assert(rows.map(_.getLong(0)).toSeq == brute)
    // the plan is a bounded top-n, not a global sort
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("decontaminate: flags only train docs overlapping held-out shingles") {
    val train = Seq(
      (0L, "the quick brown fox jumps high"), // shares 'the quick brown'…
      (1L, "completely clean training text here"),
      (2L, "short"))                          // < 3 tokens → no shingles
      .toDF("doc_id", "text")
    val heldout = Seq(
      (100L, "benchmark says the quick brown fox runs"))
      .toDF("doc_id", "text")
    val r = Sampling.decontaminate(train, heldout).collect()
      .map(row => (row.getLong(0), row.getLong(1)))
    // doc 0 shares 'the quick brown' and 'quick brown fox' → 2 shingles
    assert(r.toSeq == Seq((0L, 2L)))
    // split form over the unioned table agrees with the two-frame form
    val unioned = train.withColumn("sp", lit("train"))
      .unionByName(heldout.withColumn("sp", lit("test")))
    val rs = Sampling.decontaminateSplit(unioned, "sp", "train", "test")
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    assert(rs.toSeq == r.toSeq)
  }

  test("mixturePlan: uniform target, capped rates, exact arithmetic") {
    // en: 8+4+6+5=23 tokens over 4 docs… but strata here are lang only:
    // en=23, de=13 → total 36, 2 cells, target 18 → en rate 18/23,
    // de rate capped at 1.0
    val r = Sampling.mixturePlan(docs, Seq("lang"))
      .orderBy("lang").collect()
    val de = r(0); val en = r(1)
    assert(de.getString(0) == "de" && en.getString(0) == "en")
    assert(en.getLong(2) == 23L && de.getLong(2) == 13L) // cell_tokens
    assert(en.getLong(3) == 18L && de.getLong(3) == 18L) // target
    assert(de.getDouble(4) == 1.0)
    assert(en.getDouble(4) == 18.0 / 23.0)
    assert(en.getLong(5) == 18L && de.getLong(5) == 13L) // kept est
  }

  test("isqrtExpr: exact at boundaries, past 2^53, and at Long.MaxValue") {
    // reference isqrt by bisection on the square-vs-x comparison done
    // in overflow-free division form (same trick the operator uses)
    def ref(x: Long): Long = {
      var lo = 0L; var hi = 3037000499L // isqrt(Long.MaxValue)
      while (lo < hi) {
        val mid = lo + (hi - lo + 1) / 2
        if (mid <= x / mid) lo = mid else hi = mid - 1
      }
      if (x == 0) 0L else lo
    }
    val k = 94906266L // k*k just above 2^53: double can't hold it
    val vals = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L, 17L,
      (1L << 52) - 1, 1L << 52, (1L << 53) + 1,
      k * k - 1, k * k, k * k + 1,
      3037000499L * 3037000499L - 1, 3037000499L * 3037000499L,
      Long.MaxValue)
    val got = vals.toDF("x")
      .select(col("x"), Sampling.isqrtExpr("x").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    vals.foreach { v => assert(got(v) == ref(v), s"isqrt($v)") }
  }

  test("temperatureMixturePlan: sqrt weights flatten the head, exact " +
    "split-division targets") {
    // one doc per cell with an exact token count: (en,a)=100 w=10,
    // (en,b)=25 w=5, (fr,a)=4 w=2 → total=129, sum_w=17
    // target(en,a) = 7*10 + (10*10)//17 = 75 → rate .75
    // target(en,b) = 7*5 + 50//17 = 37 → capped, keeps all 25
    // target(fr,a) = 7*2 + 20//17 = 15 → capped, keeps all 4
    val cells = Seq(
      (0L, "en", "a", 100), (1L, "en", "b", 25), (2L, "fr", "a", 4))
      .map { case (id, l, s, n) =>
        (id, l, s, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "lang", "source", "text")
    val r = Sampling.temperatureMixturePlan(cells, Seq("lang", "source"))
      .orderBy("lang", "source").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(3),
        x.getLong(4), x.getLong(5), x.getDouble(6), x.getLong(7)))
    assert(r.toSeq == Seq(
      ("en", "a", 100L, 10L, 75L, 0.75, 75L),
      ("en", "b", 25L, 5L, 37L, 1.0, 25L),
      ("fr", "a", 4L, 2L, 15L, 1.0, 4L)))
    // flattening vs the uniform plan: the head cell keeps MORE than
    // uniform (75 > 43), the tail cells still keep everything
    val uni = Sampling.mixturePlan(cells, Seq("lang", "source"))
      .orderBy("lang", "source").collect()
    assert(uni(0).getLong(4) == 43L) // uniform target 129 div 3
    assert(75L > 43L)
  }

  test("applyMixture: rate-1 cells keep everything, draw is deterministic") {
    val r = Sampling.applyMixture(docs, Seq("lang"))
      .orderBy("doc_id").collect()
    // de rate is 1.0 (13 < target 18): both de docs survive, rate col 1.0
    val de = r.filter(_.getString(0) == "de")
    assert(de.map(_.getLong(1)).toSeq == Seq(3L, 4L))
    assert(de.forall(_.getDouble(3) == 1.0))
    // en kept set = exactly the docs whose hash clears the threshold
    graft.functions.PolyHash31.register(spark)
    val enRate = 18.0 / 23.0
    val expect = docs.where(col("lang") === "en")
      .select(col("doc_id"),
        (Sampling.splitHash("mix", col("doc_id")) % 1000000L).as("h"))
      .collect().filter(_.getLong(1).toDouble < enRate * 1000000.0)
      .map(_.getLong(0)).toSet
    assert(r.filter(_.getString(0) == "en").map(_.getLong(1)).toSet
      == expect)
    // identical on re-invocation (no RNG anywhere)
    val again = Sampling.applyMixture(docs, Seq("lang"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(again == r.map(_.toSeq).toSeq)
  }

  test("splitLeakage: keeps only cross-split pairs, labels match " +
    "assignSplits, columns carried through") {
    def splitOf(id: Long): String = {
      val b = graft.functions.PolyHash31.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"split:$id")
      ) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    // scan ids until we have one same-split and one cross-split pair
    val ids = (0L until 200L)
    val base = ids.find(i => splitOf(i) == "train").get
    val same = ids.find(i => i != base && splitOf(i) == "train").get
    val cross = ids.find(i => splitOf(i) != "train").get
    val pairs = Seq((base, same, 0.9), (base, cross, 0.8))
      .toDF("d1", "d2", "jaccard")
    val r = Sampling.splitLeakage(pairs).collect()
    assert(r.length == 1, "same-split pair must be filtered out")
    assert(r.head.getLong(0) == base && r.head.getLong(1) == cross)
    assert(r.head.getDouble(2) == 0.8, "payload columns carried through")
    assert(r.head.getString(3) == "train"
      && r.head.getString(4) == splitOf(cross))
    // in-row recompute: no join appears in the plan
    val joins = Sampling.splitLeakage(pairs).queryExecution.optimizedPlan
      .collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, "split labels must be recomputed in-row")
    // agreement with assignSplits over the same ids
    val docs = Seq(base, same, cross).toDF("doc_id")
    Sampling.assignSplits(docs).collect().foreach { row =>
      assert(row.getString(3) == splitOf(row.getLong(0)))
    }
  }

  test("scrub: redacts planted spans, counts them, normalizes whitespace") {
    val d = Seq(
      (0L, "hello  bob@mail.example  call 555-1234 now "),
      (1L, "no pii here at all"),
      (2L, "two mails a@b.c and d@e.f plus 999-00 and 123-456"))
      .toDF("doc_id", "text")
    val r = TextStats.scrub(d).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 1 && r(0).getLong(2) == 1) // email, phone
    assert(r(1).getLong(1) == 0 && r(1).getLong(2) == 0)
    assert(r(2).getLong(1) == 2 && r(2).getLong(2) == 2)
    // clean text of doc 0: collapsed + trimmed + redacted
    val clean0 = "hello <EMAIL> call <PHONE> now"
    val fp0 = java.security.MessageDigest.getInstance("SHA-256")
      .digest(clean0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r(0).getLong(3) == clean0.length)
    assert(r(0).getString(4) == fp0)
  }

  test("exportShards: every doc lands in exactly one shard with a " +
    "contiguous deterministic in-shard rank") {
    val docs = (0L until 500L).toDF("doc_id")
    val r = Sampling.exportShards(docs, nShards = 8).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.length == 500 && r.map(_._3).distinct.length == 500)
    assert(r.forall(x => x._1 >= 0 && x._1 < 8))
    r.toSeq.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      // ranks are 1..n and follow (h_ord, doc_id) order exactly
      assert(sorted.map(_._2) == (1L to g.length.toLong).toSeq)
      assert(sorted.map(x => (x._4, x._3)) ==
        sorted.map(x => (x._4, x._3)).sorted)
    }
    // stable: a second run reproduces the assignment bit-for-bit
    val again = Sampling.exportShards(docs, nShards = 8).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq.sortBy(x => (x._1, x._2)) ==
      again.toSeq.sortBy(x => (x._1, x._2)))
  }
}
