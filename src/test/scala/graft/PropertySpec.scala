package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GlobFns, TimeFns}
import graft.operators.{Extrema, Resample}

/** SURVEY §5.3's property-based invariants (scalacheck), complementing
  * the example-based specs and the DuckDB-oracle gate: each property
  * states an algebraic law the operator must satisfy for ARBITRARY
  * inputs, checked against an independent in-test model.
  *
  * Spark-evaluating properties batch all generated cases into one
  * DataFrame per sample (or keep minSuccessful modest) so a property
  * run costs a handful of local jobs, not hundreds. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def check(p: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------------ A1 resample
  private val genRows: Gen[List[(Long, Double)]] =
    Gen.nonEmptyListOf(for {
      t <- Gen.choose(0L, 86400000000L) // one day of µs
      v <- Gen.choose(-1000000, 1000000).map(_ / 100.0) // 2-decimal
    } yield (t, v))

  test("property: resample partitions rows into round-to-nearest buckets " +
    "with bucket means inside the bucket's extrema (A1)") {
    check(Prop.forAll(genRows, Gen.oneOf("30s", "5m", "2h")) { (rows, freq) =>
      val d = TimeFns.intervalUs(freq)
      val df = rows.toDF("t", "value_r").withColumn("att_name", lit("a"))
      val out = Resample.resampleExact(df, freq, Seq("att_name"), 0L)
        .collect()
      // independent model: nonneg t ⇒ ((t + Δ/2) / Δ) * Δ
      val byBucket = rows.groupBy { case (t, _) => ((t + d / 2) / d) * d }
      val nTotal = out.map(_.getLong(4)).sum == rows.size.toLong
      val buckets = out.length == byBucket.size &&
        out.forall(r => byBucket.contains(r.getLong(1)))
      val meansBounded = out.forall { r =>
        val grp = byBucket(r.getLong(1)).map(_._2)
        val mean = r.getDouble(3)
        mean >= grp.min - 1e-6 && mean <= grp.max + 1e-6
      }
      nTotal && buckets && meansBounded
    }, n = 12)
  }

  // ------------------------------------------------------------ U1 union
  test("property: union of arbitrary half-open time partitions ≡ one " +
    "scan (U1, generalizing q15's fixed split)") {
    check(Prop.forAll(genRows,
      Gen.listOf(Gen.choose(0L, 86400000000L))) { (rows, cuts) =>
      val df = rows.toDF("t", "value_r")
      // arbitrary ascending split points → consecutive [lo, hi) slices
      val bounds = (Long.MinValue +: cuts.sorted.distinct :+ Long.MaxValue)
      val slices = bounds.sliding(2).map { case Seq(lo, hi) =>
        df.where(col("t") >= lo && col("t") < hi)
      }.toSeq
      val unioned = slices.reduce(_ unionByName _)
        .groupBy().agg(count(lit(1)), sum(col("t")),
          sum(round(col("value_r") * 100).cast("long"))).collect().head
      val direct = df
        .groupBy().agg(count(lit(1)), sum(col("t")),
          sum(round(col("value_r") * 100).cast("long"))).collect().head
      unioned == direct
    }, n = 12)
  }

  // ------------------------------------------------------------ C2 glob
  /** Independent fnmatch-style matcher: same class-scan rules as
    * `GlobFns.globToRegex` (leading `!`, literal `]` member, unclosed
    * `[` is literal, `a-c` ranges) but evaluated by direct
    * backtracking — no regex involved, so a translation bug cannot
    * hide in both sides. */
  private def fnmatchRef(p: String, s: String): Boolean = {
    def inSet(set: String, c: Char): Boolean = {
      var k = 0; var hit = false
      while (k < set.length) {
        if (k + 2 < set.length && set.charAt(k + 1) == '-') {
          if (set.charAt(k) <= c && c <= set.charAt(k + 2)) hit = true
          k += 3
        } else {
          if (set.charAt(k) == c) hit = true
          k += 1
        }
      }
      hit
    }
    def m(pi: Int, si: Int): Boolean = {
      if (pi == p.length) si == s.length
      else p.charAt(pi) match {
        case '*' => (si to s.length).exists(k => m(pi + 1, k))
        case '?' => si < s.length && m(pi + 1, si + 1)
        case '[' =>
          var j = pi + 1
          if (j < p.length && p.charAt(j) == '!') j += 1
          if (j < p.length && p.charAt(j) == ']') j += 1
          val close = p.indexOf(']', j)
          if (close < 0) // unclosed class: literal '['
            si < s.length && s.charAt(si) == '[' && m(pi + 1, si + 1)
          else {
            val inner = p.substring(pi + 1, close)
            val neg = inner.startsWith("!")
            val set = if (neg) inner.substring(1) else inner
            si < s.length && (inSet(set, s.charAt(si)) != neg) &&
              m(close + 1, si + 1)
          }
        case c => si < s.length && s.charAt(si) == c && m(pi + 1, si + 1)
      }
    }
    m(0, 0)
  }

  test("property: globToRegex agrees with an independent backtracking " +
    "fnmatch on arbitrary patterns (C2/F5)") {
    val patChar = Gen.frequency(
      (5, Gen.oneOf('a', 'b', 'c', '0', '1')),
      (3, Gen.oneOf('*', '?')),
      (2, Gen.oneOf('[', ']', '!', '-')))
    val genPat = Gen.resize(10, Gen.listOf(patChar)).map(_.mkString)
    val strChar = Gen.oneOf('a', 'b', 'c', '0', '1', '-', '!', '[', ']')
    val genStr = Gen.resize(10, Gen.listOf(strChar)).map(_.mkString)
    check(Prop.forAll(genPat, Gen.listOfN(30, genStr)) { (pat, strs) =>
      // a descending class range ([c-a]) is invalid regex — fnmatch
      // raises there too; skip exactly that case
      val re = try Some(java.util.regex.Pattern
        .compile(GlobFns.globToRegex(pat)))
      catch { case _: java.util.regex.PatternSyntaxException => None }
      re.forall { r =>
        (strs :+ pat).forall(s => r.matcher(s).matches() == fnmatchRef(pat, s))
      }
    }, n = 200)
  }

  // ------------------------------------------------------------ as-of join
  test("property: bucketed as-of join ≡ a naive last-right-at-or-before " +
    "model for ANY bucket width (cross-bucket carry included)") {
    val genLeft = Gen.nonEmptyListOf(for {
      u <- Gen.choose(0, 3); t <- Gen.choose(0L, 5000L)
    } yield (u, t))
    val genRight = Gen.listOf(for {
      u <- Gen.choose(0, 3); ct <- Gen.choose(0L, 5000L)
      rid <- Gen.choose(0L, 50L) // small range → tie cases occur
    } yield (u, ct, rid))
    val genBucket = Gen.oneOf(1L, 7L, 100L, 10000L)
    check(Prop.forAll(genLeft, genRight, genBucket) { (ls, rs, bucket) =>
      val lrows = ls.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
      val left = lrows.toDF("user_id", "t", "lid")
      val right = rs.toDF("user_id", "ct", "rid")
      val out = graft.operators.TimeJoins.asofJoinBucketed(
        left, right, Seq("user_id"), "t", "ct", Seq("rid"), "rid", bucket)
        .select(col("lid"), col("rid")).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      val model = lrows.map { case (u, t, lid) =>
        val cands = rs.filter(r => r._1 == u && r._2 <= t)
        (lid, if (cands.isEmpty) None
              else Some(cands.maxBy(r => (r._2, r._3))._3))
      }.toSet
      out == model
    }, n = 10)
  }

  // ------------------------------------------------------------ range join
  test("property: bucketed range join ≡ naive containment, with " +
    "intervals spanning many buckets") {
    val genPoints = Gen.listOf(for {
      u <- Gen.choose(0, 2); t <- Gen.choose(0L, 3000L)
    } yield (u, t))
    val genIvals = Gen.listOf(for {
      u <- Gen.choose(0, 2); a <- Gen.choose(0L, 3000L)
      len <- Gen.choose(0L, 800L)
    } yield (u, a, a + len))
    val genBucket = Gen.oneOf(1L, 13L, 250L, 5000L)
    check(Prop.forAll(genPoints, genIvals, genBucket) { (ps, is, bucket) =>
      val prows = ps.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
      val irows = is.zipWithIndex.map { case ((u, a, b), i) =>
        (u, a, b, i.toLong) }
      val points = prows.toDF("user_id", "t", "pid")
      val ivals = irows.toDF("user_id", "lo", "hi", "iid")
      val out = graft.operators.TimeJoins.rangeJoin(
        points, ivals, Seq("user_id"), "t", "lo", "hi", bucket)
        .select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val model = (for {
        (pu, t, pid) <- prows
        (iu, lo, hi, iid) <- irows
        if pu == iu && t >= lo && t <= hi
      } yield (pid, iid)).toSet
      out == model
    }, n = 10)
  }

  // ------------------------------------------------------------ C7 padding
  test("property: padLoCol/padHiCol ≡ padRange scalar on arbitrary " +
    "ranges, constant-value branches included (C7)") {
    val genV = Gen.frequency(
      (5, Gen.choose(-1000000, 1000000).map(_ / 100.0)),
      (1, Gen.oneOf(0.0, 4.0, -4.0)))
    val genCase = for {
      a <- genV; b <- genV
      pair <- Gen.oneOf((math.min(a, b), math.max(a, b)), (a, a))
    } yield pair
    check(Prop.forAll(Gen.listOfN(40, genCase)) { cases0 =>
      val cases = (0.0, 0.0) :: (1.0, 100.0) :: cases0 // pin v=0 + log case
      val df = cases.zipWithIndex
        .map { case ((lo, hi), i) => (i, lo, hi) }
        .toDF("id", "vmin", "vmax")
        .select(col("id"), col("vmin"), col("vmax"),
          Extrema.padLoCol(col("vmin"), col("vmax")).as("lo"),
          Extrema.padHiCol(col("vmin"), col("vmax")).as("hi"),
          when(col("vmin") > 0 && col("vmin") =!= col("vmax"),
            Extrema.padLoLogCol(col("vmin"), col("vmax"))).as("llo"),
          when(col("vmin") > 0 && col("vmin") =!= col("vmax"),
            Extrema.padHiLogCol(col("vmin"), col("vmax"))).as("lhi"))
        .orderBy(col("id")).collect()
      df.forall { r =>
        val (vmin, vmax) = (r.getDouble(1), r.getDouble(2))
        val (elo, ehi) = Extrema.padRange(vmin, vmax, logScale = false)
        val linOk = r.getDouble(3) == elo && r.getDouble(4) == ehi
        // log branch: codegen'd log10/pow (StrictMath) vs the scalar's
        // java.lang.Math can differ in the final ulp — which is why
        // q40 rounds the log columns to 6 digits before hashing; here
        // a tight relative tolerance pins the parity
        def close(a: Double, b: Double): Boolean =
          math.abs(a - b) <= 1e-12 * math.max(math.abs(a), math.abs(b))
        val logOk =
          if (vmin > 0 && vmin != vmax) {
            val (llo, lhi) = Extrema.padRange(vmin, vmax, logScale = true)
            close(r.getDouble(5), llo) && close(r.getDouble(6), lhi)
          } else r.isNullAt(5) && r.isNullAt(6)
        linOk && logOk
      }
    }, n = 8)
  }

  // ------------------------------------------------------------ C3 parse
  test("property: parseNaiveUtcCol ≡ parseNaiveUtc scalar ≡ java.time " +
    "model on arbitrary instants × the eight request forms (C3)") {
    import java.time.{Instant, LocalDate, ZoneOffset}
    import java.time.format.DateTimeFormatter
    val genCase = for {
      sec <- Gen.choose(0L, 4102444800L) // 1970..2100
      form <- Gen.choose(0, 7)
      ms <- Gen.choose(0, 999)
    } yield (sec, form, ms)
    check(Prop.forAll(Gen.listOfN(40, genCase)) { cases =>
      val fmtT = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
        .withZone(ZoneOffset.UTC)
      val fmtSp = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(ZoneOffset.UTC)
      val fmtD = DateTimeFormatter.ofPattern("yyyy-MM-dd")
        .withZone(ZoneOffset.UTC)
      val rows = cases.zipWithIndex.map { case ((sec, form, ms), i) =>
        val inst = Instant.ofEpochSecond(sec)
        val (s, expected) = form match {
          case 0 => (fmtT.format(inst), sec * 1000000L)
          case 1 => (fmtSp.format(inst), sec * 1000000L)
          case 2 =>
            val d = LocalDate.ofInstant(inst, ZoneOffset.UTC)
            (fmtD.format(inst),
              d.atStartOfDay(ZoneOffset.UTC).toEpochSecond * 1000000L)
          case 3 =>
            (fmtT.format(inst.plusSeconds(7200)) + "+02:00", sec * 1000000L)
          case 4 => // fractional millis — exercises the pad-to-µs path
            (fmtT.format(inst) + f".$ms%03d", sec * 1000000L + ms * 1000L)
          case 5 => // fraction AND offset combined
            (fmtT.format(inst.plusSeconds(7200)) + f".$ms%03d+02:00",
              sec * 1000000L + ms * 1000L)
          case 6 => // 'Z' suffix — the most common UTC wire spelling
            (fmtT.format(inst) + "Z", sec * 1000000L)
          case _ => // fraction AND 'Z'
            (fmtT.format(inst) + f".$ms%03dZ", sec * 1000000L + ms * 1000L)
        }
        (i, s, expected)
      }
      val scalarOk = rows.forall { case (_, s, expected) =>
        TimeFns.parseNaiveUtc(s) == expected
      }
      val colOut = rows.toDF("id", "s", "expected")
        .select(col("id"), col("expected"),
          TimeFns.parseNaiveUtcCol(col("s")).as("parsed"))
        .orderBy(col("id")).collect()
      scalarOk && colOut.forall(r => r.getLong(2) == r.getLong(1))
    }, n = 8)
  }

  // ------------------------------------------------- dedup clustering
  test("property: connectedComponents driver fast path ≡ distributed " +
    "loop ≡ an independent union-find model on arbitrary pair graphs") {
    // three independent implementations must agree: the collect+DSU
    // fast path (default), the iterative min-label loop (threshold 0),
    // and a plain in-test DSU model. Graphs are small — the loop costs
    // ~2 s/sample — but arbitrary: multi-components, cycles, dup
    // edges, self-pairs excluded by construction in callers but kept
    // legal here via filtering.
    val genEdges: Gen[List[(Long, Long)]] =
      Gen.nonEmptyListOf(for {
        a <- Gen.choose(0L, 40L)
        b <- Gen.choose(0L, 40L) if a != b
      } yield (a, b)).map(_.take(30))
    def model(edges: List[(Long, Long)]): Map[Long, (Long, Long)] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x
        else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      parent.keys.map { n =>
        val r = find(n)
        n -> (r, if (n == r) 1L else 0L)
      }.toMap
    }
    def canon(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    check(Prop.forAll(genEdges) { edges =>
      val pairs = edges.toDF("d1", "d2")
      val fast = canon(graft.operators.Dedup.connectedComponents(pairs))
      val loop = canon(graft.operators.Dedup.connectedComponents(pairs,
        localEdgeThreshold = 0))
      val m = model(edges)
      fast == m && loop == m
    }, n = 6)
  }

  // ------------------------------------------------- lexical retrieval
  test("property: lexicalTopK / bm25TopK / mineHardNegatives ≡ an " +
    "independent integer-exact model on arbitrary corpora") {
    // the three retrieval surfaces re-derived in plain Scala with the
    // same floor-division arithmetic: df over query-vocab postings,
    // wt = scale div df, the BM25 contrib rational, the integer
    // Jaccard gate, and (-score, doc_id) top-k ordering. A tiny
    // alphabet forces score ties (the doc_id tiebreak), repeated
    // sampling forces tf > 1 (saturation), and empty texts exercise
    // the tokenized-docs-only avgdl rule.
    import graft.operators.Retrieval
    val (k, nNeg, scale, tauNum, tauDen) = (3, 2, 1000000L, 1L, 2L)
    val genDocs: Gen[List[(Long, String)]] = for {
      nd <- Gen.choose(4, 8)
      texts <- Gen.listOfN(nd, Gen.choose(0, 8).flatMap(len =>
        Gen.listOfN(len, Gen.choose(0, 5).map(i => s"w$i"))
          .map(_.mkString(" "))))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def toks(s: String): Array[String] = s.split(" ").filter(_.length >= 1)
    def rankTopK(scores: Seq[(Long, Long)], n: Int): Seq[(Long, Long, Long)] =
      scores.sortBy { case (d, s) => (-s, d) }.take(n)
        .zipWithIndex.map { case ((d, s), i) => (i + 1L, d, s) }
    // shared model pieces: query token sets and the pruned-postings df
    def modelCommon(docs: List[(Long, String)], queryIds: Seq[Long]) = {
      val qt = queryIds.map(q => q -> toks(docs.toMap.apply(q)).toSet).toMap
      val qvocab = qt.values.flatten.toSet
      val dset = docs.map { case (d, t) => d -> toks(t) }
      val df = qvocab.iterator.map(w =>
        w -> dset.count(_._2.contains(w)).toLong).filter(_._2 > 0).toMap
      (qt, dset, df.map { case (w, n) => w -> scale / n })
    }
    def modelLexical(docs: List[(Long, String)], queryIds: Seq[Long],
        n: Int): Map[Long, Seq[(Long, Long, Long)]] = {
      val (qt, dset, wt) = modelCommon(docs, queryIds)
      queryIds.map { q =>
        val scores = dset.collect { case (d, ws)
          if d != q && (ws.toSet & qt(q)).nonEmpty =>
          (d, (ws.toSet & qt(q)).toSeq.map(wt).sum)
        }
        q -> rankTopK(scores, n)
      }.toMap.filter(_._2.nonEmpty)
    }
    def modelBm25(docs: List[(Long, String)],
        queryIds: Seq[Long]): Map[Long, Seq[(Long, Long, Long)]] = {
      val (qt, dset, wt) = modelCommon(docs, queryIds)
      val dl = dset.map { case (d, ws) => d -> ws.length.toLong }.toMap
      val tokenized = dl.values.filter(_ >= 1L)
      if (tokenized.isEmpty) return Map.empty
      val avgdl = tokenized.sum / tokenized.size
      queryIds.map { q =>
        val scores = dset.collect { case (d, ws)
          if d != q && (ws.toSet & qt(q)).nonEmpty =>
          val dlr = (1000L * dl(d)) / avgdl
          (d, (ws.toSet & qt(q)).toSeq.map { w =>
            val tf = ws.count(_ == w).toLong
            (wt(w) * tf * 2200L) / (1000L * tf + 300L + (9L * dlr) / 10L)
          }.sum)
        }
        q -> rankTopK(scores, 5)
      }.toMap.filter(_._2.nonEmpty)
    }
    def modelMine(docs: List[(Long, String)],
        queryIds: Seq[Long]): Map[Long, Seq[(Long, Long, Long)]] = {
      val cand = modelLexical(docs, queryIds, k)
      val dmap = docs.toMap
      cand.map { case (q, top) =>
        val qs = toks(dmap(q)).toSet
        val kept = top.collect { case (_, d, s) =>
          val ds = toks(dmap(d)).toSet
          val ni = (qs & ds).size.toLong
          (d, s, tauDen * ni < tauNum * (qs.size + ds.size - ni))
        }.collect { case (d, s, true) => (d, s) }
        q -> rankTopK(kept, nNeg)
      }.filter(_._2.nonEmpty)
    }
    def canon(df: org.apache.spark.sql.DataFrame)
        : Map[Long, Seq[(Long, Long, Long)]] = df.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.map(_._2).sortBy(_._1).toSeq }
    check(Prop.forAll(genDocs) { docs =>
      val queryIds = docs.map(_._1).filter(_ % 2 == 0)
      val corpus = docs.toDF("doc_id", "text")
      val queries = docs.filter(t => queryIds.contains(t._1))
        .map { case (d, t) => (d, t) }.toDF("query_id", "text")
      val lex = canon(Retrieval.lexicalTopK(corpus, queries, k, scale))
      val bm = canon(Retrieval.bm25TopK(corpus, queries, 5, scale))
      val mine = canon(Retrieval.mineHardNegatives(corpus, queries,
        k, nNeg, scale, tauNum, tauDen, "lexical"))
      lex == modelLexical(docs, queryIds, k) &&
        bm == modelBm25(docs, queryIds) &&
        mine == modelMine(docs, queryIds)
    }, n = 8)
  }

  // ------------------------------------------------- simhash blocking
  test("property: simhashHammingDups ≡ the brute-force Hamming ball " +
    "over its own fingerprints, for arbitrary bits × maxDist") {
    // the pigeonhole blocking's recall-losslessness claim, tested
    // directly: with the bucket cap out of the way, the blocked
    // equi-join + popcount verify must produce EXACTLY the pairs a
    // brute-force all-pairs popcount finds over the operator's own
    // simhash output — for any corpus, any fingerprint width, and any
    // radius (including maxDist = 0, where blocks = 1 ⇒ the whole
    // fingerprint is the key). A tiny alphabet collapses many docs to
    // identical or near fingerprints, so the ball is dense.
    import graft.operators.Dedup
    val genCorpus: Gen[List[(Long, String)]] = for {
      nd <- Gen.choose(3, 10)
      texts <- Gen.listOfN(nd, Gen.choose(1, 6).flatMap(len =>
        Gen.listOfN(len, Gen.choose(0, 3).map(i => s"w$i"))
          .map(_.mkString(" "))))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val genParams: Gen[(Int, Int)] = for {
      bits <- Gen.choose(6, 20)
      maxDist <- Gen.choose(0, 3)
    } yield (bits, maxDist)
    check(Prop.forAll(genCorpus, genParams) { case (docs, (bits, maxDist)) =>
      val corpus = docs.toDF("doc_id", "text")
      val fp = Dedup.simhash(corpus, spark, bits).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = (for {
        d1 <- fp.keys; d2 <- fp.keys if d1 < d2
        if java.lang.Long.bitCount(fp(d1) ^ fp(d2)) <= maxDist
      } yield (d1, d2)).toSet
      val actual = Dedup.simhashHammingDups(corpus, spark, bits, maxDist,
          maxBucket = 1000000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      actual == expected
    }, n = 10)
  }

  // ------------------------------------------------- bounded top-k
  test("property: TopK.smallestK ≡ sorted-take under forced " +
    "multi-partition merges, for arbitrary groups × k") {
    // every ranking surface (retrieval, catalog first-N, hover top-k)
    // rides this aggregate; the retrieval property above only feeds it
    // single-buffer-sized groups. Here rows repartition round-robin
    // across 16 partitions so every group's state must go through
    // reduce AND merge, with duplicate (key, tie) pairs and negative
    // keys included; the model is a plain lexicographic sort-take.
    import graft.operators.TopK
    val genRows: Gen[List[(Long, Long, Long)]] =
      Gen.nonEmptyListOf(for {
        g <- Gen.choose(0L, 5L)
        t <- Gen.choose(-50L, 50L)
        tie <- Gen.choose(0L, 8L)
      } yield (g, t, tie)).map(_.take(400))
    check(Prop.forAll(genRows, Gen.choose(1, 6)) { (rows, k) =>
      val df = rows.toDF("g", "t", "tie").repartition(16)
      val out = df.groupBy(col("g"))
        .agg(TopK.smallestK(k, col("t"), col("tie")).as("top"))
        .collect()
        .map(r => r.getLong(0) ->
          r.getSeq[org.apache.spark.sql.Row](1)
            .map(p => (p.getLong(0), p.getLong(1))))
        .toMap
      val model = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3))
          .sortBy(identity).take(k)
      }
      out == model
    }, n = 12)
  }

  // ------------------------------------------------- archive events
  test("property: archiveEvents ≡ a scalar change-detector model on " +
    "random sequences with NaN faults, across batch boundaries") {
    import graft.streaming.StreamOps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // per group: ~8 points with values from a small set (forcing both
    // under- and over-delta moves) plus NaN faults; split into two
    // micro-batches so the state (including NaN state) must survive
    val genGroup = for {
      n <- Gen.choose(2, 8)
      vals <- Gen.listOfN(n, Gen.oneOf(
        Seq(0.0, 0.4, 1.1, 5.0, Double.NaN)))
      cut <- Gen.choose(0, n)
    } yield (vals, cut)
    def modelFold(batches: Seq[Seq[StreamOps.RawPoint]])
        : Seq[(Long, Double)] = {
      var last: Option[Double] = None
      val out = Seq.newBuilder[(Long, Double)]
      batches.foreach { b =>
        b.sortBy(p => (p.t, p.value_r)).foreach { p =>
          val moved = last match {
            case None => true
            case Some(l) if l.isNaN || p.value_r.isNaN =>
              l.isNaN != p.value_r.isNaN
            case Some(l) => math.abs(p.value_r - l) >= 1.0
          }
          if (moved) { out += ((p.t, p.value_r)); last = Some(p.value_r) }
        }
      }
      out.result()
    }
    check(Prop.forAll(Gen.listOfN(12, genGroup)) { groups =>
      implicit val sc = spark.sqlContext
      val in = MemoryStream[StreamOps.RawPoint]
      val q = StreamOps.archiveEvents(in.toDS(), delta = 1.0)
        .writeStream.format("memory").queryName("ae_prop")
        .outputMode("append").start()
      try {
        val perGroup = groups.zipWithIndex.map { case ((vals, cut), g) =>
          val pts = vals.zipWithIndex.map { case (v, i) =>
            StreamOps.RawPoint(s"g$g", i.toLong + 1, v) }
          s"g$g" -> Seq(pts.take(cut), pts.drop(cut))
        }
        in.addData(perGroup.flatMap(_._2.head))
        q.processAllAvailable()
        in.addData(perGroup.flatMap(_._2(1)))
        q.processAllAvailable()
        val got = spark.table("ae_prop").collect()
          .groupBy(_.getString(0))
          .map { case (k, rs) =>
            k -> rs.map(r => (r.getLong(1), r.getDouble(2)))
              .sortBy(_._1).toSeq }
        perGroup.forall { case (k, batches) =>
          val want = modelFold(batches)
          val have = got.getOrElse(k, Seq.empty)
          // NaN-tolerant comparison (NaN != NaN under ==)
          want.length == have.length && want.zip(have).forall {
            case ((t1, v1), (t2, v2)) =>
              t1 == t2 && (v1 == v2 || (v1.isNaN && v2.isNaN)) }
        }
      } finally {
        q.stop()
        spark.sql("DROP TABLE IF EXISTS ae_prop")
      }
    }, n = 4)
  }

  // --------------------------------------------------- K3/U4/C10 render
  // The four goldens-only rows (PNG bytes, compositing, base64, fence)
  // sit outside the DuckDB gate; these properties widen their evidence
  // from single fixtures to arbitrary inputs.

  private def imgPixels(img: java.awt.image.BufferedImage): Array[Int] = {
    val w = img.getWidth
    val out = new Array[Int](w * img.getHeight)
    var i = 0
    while (i < out.length) { out(i) = img.getRGB(i % w, i / w); i += 1 }
    out
  }

  private val genArgbImage: Gen[(Int, Int, Array[Int])] = for {
    w <- Gen.choose(1, 16)
    h <- Gen.choose(1, 16)
    px <- Gen.containerOfN[Array, Int](w * h,
      Gen.choose(Int.MinValue, Int.MaxValue))
  } yield (w, h, px)

  test("property: pngBase64 round-trips ARBITRARY ARGB images through " +
    "javax.imageio pixel-identically (C10, beyond the goldens)") {
    check(Prop.forAll(genArgbImage) { case (w, h, px) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      img.setRGB(0, 0, w, h, px, 0, w)
      val b64 = graft.render.Render.pngBase64(img)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(
          java.util.Base64.getDecoder.decode(b64)))
      // PNG RGBA8 is lossless, including color channels under full
      // transparency; the decoder may hand back a different
      // BufferedImage TYPE, but getRGB canonicalizes to ARGB ints
      back.getWidth == w && back.getHeight == h &&
        imgPixels(back).sameElements(imgPixels(img))
    }, n = 30)
  }

  /** Double-precision straight-alpha src-over fold — the mathematical
    * model Render.stack quantizes. Returns per-pixel (alpha 0-255,
    * premultiplied r/g/b on the 0-255 scale). */
  private def refStack(layers: Seq[Array[Int]],
      n: Int): Array[Array[Double]] = {
    val acc = Array.fill(n)(Array(0.0, 0.0, 0.0, 0.0)) // a, pr, pg, pb
    for (layer <- layers; i <- 0 until n) {
      val s = layer(i)
      val sa = ((s >>> 24) & 0xff) / 255.0
      val d = acc(i)
      val oa = sa + d(0) * (1 - sa)
      var c = 0
      while (c < 3) {
        val sc = (s >> (16 - 8 * c)) & 0xff
        // premultiplied src-over needs no division: P = Ps + Pd(1-as)
        d(c + 1) = sc * sa + d(c + 1) * (1 - sa)
        c += 1
      }
      d(0) = oa
    }
    acc.map(d => Array(d(0) * 255.0, d(1), d(2), d(3)))
  }

  /** |impl − model| per pixel: alpha within `aTol`/255; color compared
    * PREMULTIPLIED (ch×a/255) within `pTol`/255 — the straight-alpha
    * integer impl floor-divides by the composite alpha, so straight
    * color under tiny alpha is legitimately coarse (error ~255/oa),
    * while color×coverage — what a viewer sees — stays tight. */
  private def closeToRef(px: Array[Int], ref: Array[Array[Double]],
      aTol: Double, pTol: Double): Boolean =
    px.indices.forall { i =>
      val a = (px(i) >>> 24) & 0xff
      math.abs(a - ref(i)(0)) <= aTol && (0 until 3).forall { c =>
        val ch = (px(i) >> (16 - 8 * c)) & 0xff
        math.abs(ch * a / 255.0 - ref(i)(c + 1)) <= pTol
      }
    }

  test("property: stack src-over matches the float model on ARBITRARY " +
    "stacks (folded AND regrouped ⇒ associative within quantization), " +
    "and is exact on its identity/opaque laws (U4)") {
    import graft.render.Render
    check(Prop.forAll(Gen.choose(1, 12), Gen.choose(1, 12)) { (w, h) =>
      val layerGen = Gen.containerOfN[Array, Int](w * h,
        Gen.choose(Int.MinValue, Int.MaxValue))
      Prop.forAllNoShrink(layerGen, layerGen, layerGen) { (a, b, c) =>
        val ref = refStack(Seq(a, b, c), w * h)
        // the 3-layer fold tracks the model…
        val folded = imgPixels(Render.stack(Seq(a, b, c), w, h))
        // …and so does the REGROUPED pipeline a∘(b∘c) (flatten b,c
        // first, composite the flattened layer over a) — together:
        // associativity within quantization error. Each integer
        // composite floors alpha once (≤1/255) and premult color a few
        // /255 (dc/da propagation + the impl-alpha error re-entering
        // through ch×a); 2-3 lossy steps normally stay within ~4/255
        // alpha and ~20/255 premult color, but rare worst-case draws
        // (tiny composite alpha after 3 layers) stack the floor-div
        // error a few /255 further — the bands below carry that slack
        // (an r17 full-suite run caught a one-in-hundreds draw just
        // past the old 20/255 band; re-runs passed). An implementation
        // BUG (a dropped (255-sa)/255 factor, swapped operands) shows
        // 50-200/255 on swaths of pixels, far outside these bands.
        val bc = imgPixels(Render.stack(Seq(b, c), w, h))
        val regrouped = imgPixels(Render.stack(Seq(a, bc), w, h))
        val tracksModel = closeToRef(folded, ref, 6.0, 28.0) &&
          closeToRef(regrouped, ref, 8.0, 34.0)
        // identity law: a fully-transparent layer is a no-op (exact)
        val clear = Array.fill(w * h)(0)
        val ident = imgPixels(Render.stack(Seq(a, clear), w, h))
          .sameElements(imgPixels(Render.stack(Seq(a), w, h)))
        // opaque law: an opaque top layer replaces everything (exact)
        val opaque = b.map(_ | 0xff000000)
        val replaced = imgPixels(Render.stack(Seq(a, opaque), w, h))
          .sameElements(opaque)
        tracksModel && ident && replaced
      }
    }, n = 15)
  }
}
