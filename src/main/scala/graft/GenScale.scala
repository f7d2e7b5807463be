package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator: synthesize an `sf(0.1 × copies)` dataset from
  * the driver's sf0.1 tables, for scale-proof bench runs beyond the
  * largest driver tier.
  *
  * Naive replication would be the WRONG data: ten verbatim copies of
  * `documents` turn every doc into a 10-way exact-duplicate cluster
  * (dup RATE 90% instead of sf0.1's few percent), and every dedup /
  * ANN query's selectivity — not just its volume — changes, which is
  * exactly what a scale-proof run must NOT do. Each copy is instead
  * pushed through a transform that PRESERVES within-copy structure
  * and SEPARATES copies from each other, so every statistical
  * property the operators key on (dup rate, cluster-size profile,
  * bucket occupancy, join hit rate, per-day event density shape)
  * stays at its sf0.1 value while the volume scales by `copies`:
  *
  *  - keyed tables shift each key by `copies`-invariant strides, one
  *    stride per KEY SPACE shared across tables (`user_id` and
  *    `c_custkey` shift together, so the events↔customer join hit
  *    rate is unchanged; likewise order/part/supp FK chains);
  *  - `documents.text` applies a per-copy TOKEN BIJECTION (suffix
  *    every whitespace token with the copy tag): within a copy every
  *    pairwise Jaccard / shingle-set relation is exactly preserved
  *    (bijections on tokens are bijections on shingles), across
  *    copies vocabularies are disjoint so no new near-dup pairs
  *    appear; `n_chars` is recomputed to stay == length(text);
  *  - `embeddings.embedding` applies a per-copy SIGNED PERMUTATION of
  *    dimensions — an orthogonal transform, so every within-copy
  *    inner product, norm, and cosine is exactly preserved (k-means /
  *    IVF / LSH structure intact), while cross-copy cosines are
  *    randomized even for mean-dominated vectors (the sign flips kill
  *    the common-component correlation a bare permutation would keep);
  *  - `events` keeps its timestamp range: ten copies of the user
  *    population emitting in the SAME month is how a 10× deployment
  *    actually looks (density grows, horizon does not), and attribute
  *    count scales through the derived `user_id * 8 + type` ids;
  *  - `region`/`nation` stay verbatim — fixed-size dimensions scale
  *    by definition with sf in neither TPC-H nor this layout.
  *
  * Copy 0 is always VERBATIM sf0.1, so every query constant baked
  * into the suite (attribute names, doc ids, time windows) still
  * selects real data, and partition/row-group pruning at scale is
  * exercised rather than voided.
  *
  * Usage: `runMain graft.GenScale <srcDir> <dstDir> [copies=10]`.
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenScale <srcDir> <dstDir> [copies]")
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    require(copies >= 1, "copies must be >= 1")
    val spark = Harness.session()
    generate(spark, src, dst, copies)
    spark.stop()
  }

  /** The token-tag collision guard, extracted so the copies==1 skip
    * is itself under test: tags only exist for copy i > 0, so a
    * single verbatim copy can never collide and a `_<digits>`-bearing
    * vocabulary must PASS at copies=1 — while the same vocabulary at
    * copies>1 must trip loudly (source "foo_1" in verbatim copy 0
    * equals copy 1's tag of "foo"). Conservative check: any token
    * with a _<digits> suffix trips it, whether or not its prefix is a
    * live source token. */
  def validateTagDisjointness(documents: DataFrame, copies: Int): Unit =
    if (copies > 1) {
      val tainted = documents
        .where(col("text").rlike("_\\d+(\\s|$)")).count()
      require(tainted == 0L,
        s"GenScale: $tainted source document(s) contain a token ending " +
          "in _<digits> — the per-copy token tag could collide across " +
          "copies (source 'foo_1' = copy 1's tag of 'foo'); pick a " +
          "different tag separator for this vocabulary")
    }

  def generate(spark: SparkSession, src: String, dst: String,
      copies: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[genscale] $t written")
    }

    // verbatim dimensions
    Seq("region", "nation").foreach(t => write(t, read(t)))

    // one stride per key SPACE (max+1 over every table carrying the
    // key, so shifted ranges never collide and FK joins keep their
    // sf0.1 hit rate)
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head().getLong(0) + 1L
    val customer = read("customer")
    val orders = read("orders")
    val events = read("events")
    val custStride =
      math.max(stride(customer, "c_custkey"), stride(events, "user_id"))
    val orderStride = stride(orders, "o_orderkey")
    val partStride = stride(read("part"), "p_partkey")
    val suppStride = stride(read("supplier"), "s_suppkey")

    /** Union of `copies` branches, each shifting the named long key
      * columns by `i × stride` — structure within a copy untouched. */
    def scaled(df: DataFrame, shifts: Map[String, Long],
        perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(s * i))
        }
        perCopy(shifted, i)
      }.reduce(_ unionByName _)

    write("customer", scaled(customer, Map("c_custkey" -> custStride)))
    write("supplier", scaled(read("supplier"), Map("s_suppkey" -> suppStride)))
    write("part", scaled(read("part"), Map("p_partkey" -> partStride)))
    write("orders", scaled(orders,
      Map("o_orderkey" -> orderStride, "o_custkey" -> custStride)))
    write("lineitem", scaled(read("lineitem"), Map(
      "l_orderkey" -> orderStride, "l_partkey" -> partStride,
      "l_suppkey" -> suppStride)))
    write("events", scaled(events, Map(
      "event_id" -> stride(events, "event_id"), "user_id" -> custStride)))

    // documents: token bijection per copy (suffix = "_<copy>" tag);
    // copy 0 verbatim. The "_" separator removes the bare-digit tag's
    // collision ("2"+tag1 = "21" = copy 0's untagged "21") and the
    // "$1"+i group-parse ambiguity for i ≥ 10 ("$111" = group 1 +
    // "11") — but cross-copy disjointness is still CONDITIONAL on the
    // source vocabulary: a source token that itself ends in
    // "_<digits>" (e.g. "foo_1" in verbatim copy 0) equals copy 1's
    // tag of "foo". Validated loudly below instead of assumed
    // (conservative check: any token with a _<digits> suffix trips
    // it, whether or not its prefix is a live source token).
    val documents = read("documents")
    validateTagDisjointness(documents, copies)
    write("documents", scaled(documents,
      Map("doc_id" -> stride(documents, "doc_id")),
      (d, i) => if (i == 0) d else d
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1_" + i))
        .withColumn("n_chars", length(col("text")).cast("long"))))

    // embeddings: per-copy signed permutation of dims (orthogonal ⇒
    // all within-copy inner products exact; sign flips decorrelate
    // copies even when vectors share a mean component). Deterministic
    // from the copy index — re-runs are reproducible.
    val embeddings = read("embeddings")
    val vecStride = stride(embeddings, "vec_id")
    val dims = embeddings.select(size(col("embedding"))).head().getInt(0)
    write("embeddings", (0 until copies).map { i =>
      val base = embeddings.withColumn("vec_id", col("vec_id") + lit(vecStride * i))
      if (i == 0) base
      else {
        val rnd = new scala.util.Random(0xC0FFEE + i)
        val perm = rnd.shuffle((0 until dims).toVector)
        val sign = Vector.fill(dims)(if (rnd.nextBoolean()) 1.0f else -1.0f)
        // columnar signed gather — no UDF: array literal of per-output
        // source positions, zipped with signs
        val gathered = array((0 until dims).map { j =>
          (element_at(col("embedding"), perm(j) + 1) * lit(sign(j)))
            .cast("float")
        }: _*)
        base.withColumn("embedding", gathered)
      }
    }.reduce(_ unionByName _))
  }
}
