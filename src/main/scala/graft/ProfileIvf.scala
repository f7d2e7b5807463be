package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-time breakdown of [[graft.operators.Similarity
  * .ivfTopK]] at 1× and 10× corpus scale — the measurement behind the
  * StressSpec "ivf scale 10x" ratio (r11: 2.36 s → 13.70 s, 5.8× at
  * 10× data, super-linear enough to owe an explanation).
  *
  * Same discipline as [[ProfileDedup]]: each stage materializes with
  * its upstream already cached, so a reading is that stage's own
  * shuffle + compute + per-materialization constants; an `end_to_end`
  * reading of the real `ivfTopK` call cross-checks sum-of-parts ≈
  * whole. The synthetic corpus is EXACTLY StressSpec's (hash-
  * recurrence 64-dim vectors, 32 cells, 20 queries, nprobe=2), so the
  * stage ratios decompose the stress test's headline ratio, not a
  * lookalike.
  *
  * Stages (mirroring ivfTopK's phases):
  *  - `centroids` — the label-grouped component-sum aggregate + driver
  *    collect (O(corpus) scan, O(L×dims) driver state);
  *  - `assign`    — the corpus scan computing every row's argmax cell
  *    dot (O(corpus × L × dims) multiply-adds, zero shuffles);
  *  - `probe`     — the query-side nprobe cell fan-out (O(|Q|));
  *  - `score`     — the broadcast cell join + per-pair integer dot
  *    (O(candidate pairs × dims));
  *  - `topk`      — the per-query rank window + cut (O(pairs));
  *  - `end_to_end`— the real ivfTopK + count, nothing pre-cached.
  *
  * Usage: `sbt "runMain graft.ProfileIvf"` → one JSON line; scale via
  * SPARK_GRAFT_IVF_N (default 20000) and SPARK_GRAFT_IVF_MULT (10).
  */
object ProfileIvf {
  import graft.operators.Similarity

  private def now(): Long = System.nanoTime()
  private def sec(t0: Long): Double = (now() - t0) / 1e9

  /** StressSpec's synthetic embedding corpus, verbatim. */
  private def embs(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(1, 64), i ->
        cast((cast(pmod(xxhash64(id * 64 + i), 2001) as double) - 1000.0)
          / 1000.0 as float))""").as("embedding"),
      pmod(xxhash64(col("id")), lit(32)).cast("int").as("label"))

  private def profile(s: SparkSession, n: Long): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    def stage[T](name: String)(body: => T): T = {
      val t0 = now(); val r = body; out += name -> sec(t0); r
    }
    val (k, nprobe, dims) = (5, 2, 64)
    val emb = embs(s, n).persist()
    emb.count() // input off the clock — stages measure the index, not gen
    Similarity.ensureDotE8(emb)
    val cents = stage("centroids") {
      Similarity.collectCentroids(emb, "label", dims)
    }
    val cells = new Similarity.CentroidSet(emb, cents,
      Similarity.LiteralCentroidMaxL)
    val withCell = stage("assign") {
      val w = emb.withColumn("clab", cells.assignCol).persist()
      w.count(); w
    }
    val queries = stage("probe") {
      val q = emb.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          explode(cells.probeCol(nprobe)).as("clab")).persist()
      q.count(); q
    }
    val pairs = stage("score") {
      val p = withCell.join(broadcast(queries), Seq("clab"))
        .where(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("clab"), col("vec_id").as("nid"),
          Similarity.dotE8("qe", "embedding").as("dot_e8")).persist()
      p.count(); p
    }
    stage("topk") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("dot_e8").desc, col("nid").asc)
      pairs.withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= k).count()
    }
    Seq(queries, pairs, withCell).foreach(_.unpersist())
    stage("end_to_end") {
      Similarity.ivfTopK(emb, col("vec_id") < 20, k = k, nprobe = nprobe)
        .count()
    }
    emb.unpersist()
    s.sharedState.cacheManager.clearCache()
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_IVF_N", "20000").toLong
    val mult = sys.env.getOrElse("SPARK_GRAFT_IVF_MULT", "10").toInt
    val spark = Harness.session()
    profile(spark, n) // warm: Janino + JIT, same rationale as Bench
    // min-of-3 per scale, interleaved (1×,10×, 1×,10×, …) so monotonic
    // host drift hits both scales instead of only the later block
    val runs = Seq.fill(3)((profile(spark, n).toMap,
      profile(spark, n * mult).toMap))
    val (runs1, runs10) = (runs.map(_._1), runs.map(_._2))
    val names = Seq("centroids", "assign", "probe", "score", "topk",
      "end_to_end")
    // locale-pinned: the f interpolator honors the default locale, and
    // a comma-decimal locale would emit invalid JSON ("0,123")
    def d(fmt: String, v: Double): String =
      String.format(java.util.Locale.ROOT, fmt, Double.box(v))
    def best(rs: Seq[Map[String, Double]]) =
      names.map(nm => nm -> rs.map(_(nm)).min)
    val js = (best(runs1).map { case (k, v) => s""""1x.$k":${d("%.3f", v)}""" }
      ++ best(runs10).map { case (k, v) =>
        s""""${mult}x.$k":${d("%.3f", v)}""" }
      ++ names.map { nm =>
        val r = runs10.map(_(nm)).min / math.max(runs1.map(_(nm)).min, 1e-3)
        s""""ratio.$nm":${d("%.2f", r)}"""
      }).mkString("{", ",", "}")
    val line = s"""{"metric":"profile_ivf","unit":"sec","n":$n,""" +
      s""""mult":$mult,"passes":3,"agg":"min","stages":$js}"""
    println(line)
    // durable artifact: STATUS cites ABSOLUTE per-stage seconds from
    // this file, never one run's ratio (toy-scale ratios are window
    // noise — r12's ivf-10× read 2.9× in one window, 5.7× in another)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PROFILE_IVF.json"), line + "\n")
    spark.stop()
  }
}
