package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-time breakdown of the BM25 hard-negative chain
  * (the p74 shape: spread corpus + planted near-dups → BM25 top-8 per
  * query → positive gate → top-5 negatives) — the [[ProfileDedup]]
  * companion for the retrieval family, the current bench tail
  * (p44/p67/p72/p74).
  *
  * Stages mirror [[graft.operators.Retrieval.bm25TopK]] and
  * [[graft.operators.Retrieval.mineHardNegatives]] exactly (same
  * expressions, same parameters as p74); each materializes with its
  * upstream cached so a reading is the stage's OWN cost. An
  * `end_to_end` reading of the real composed call cross-checks the
  * sum of parts.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.ProfileRetrieval"` → one JSON line, stages in seconds.
  */
object ProfileRetrieval {
  import graft.operators.{Retrieval, TextOps, TopK}

  private def now(): Long = System.nanoTime()
  private def sec(t0: Long): Double = (now() - t0) / 1e9

  /** p74's corpus/queries: spread docs + near-copies every 100th
    * (2 words dropped); every 100th base doc is a query. */
  private def inputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"))
    val corpus = TextOps.withPlantedNearDups(base, every = 100, dropWords = 2)
    val queries = base.where(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("query_id"), col("text"))
    (corpus, queries)
  }

  private def profile(s: SparkSession, dir: String): Seq[(String, Double)] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    def stage[T](name: String)(body: => T): T = {
      val t0 = now(); val r = body; out += name -> sec(t0); r
    }
    val (corpus0, queries0) = inputs(s, dir)
    val corpus = corpus0.persist(); corpus.count()
    val queries = queries0.persist(); queries.count()
    val (k, scale) = (8, 1000000L)

    // 1. query tokens (distinct (query_id, w)) — broadcast build side
    val qt = stage("query_tokens") {
      val q = queries
        .select(col("query_id"), explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) >= 1).distinct().persist()
      q.count(); q
    }
    // 2. corpus postings tf aggregate (the full (doc_id, w) shuffle)
    val tf = stage("postings_tf") {
      val dlExpr =
        expr("size(filter(split(text, ' '), x -> length(x) >= 1))")
          .cast("long")
      val t = corpus.select(col("doc_id"), dlExpr.as("dl"),
        explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) >= 1)
        .groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl")).persist()
      t.count(); t
    }
    // 3. vocab prune (rel) + df weights
    val (rel, wt) = stage("prune_df") {
      val r = tf.join(broadcast(qt.select(col("w")).distinct()), Seq("w"))
        .persist()
      val w = r.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .select(col("w"), expr(s"${scale}L div df").as("wt")).persist()
      r.count(); w.count(); (r, w)
    }
    // 4. corpus stats (N, sumdl)
    val stats = stage("corpus_stats") {
      val dlExpr =
        expr("size(filter(split(text, ' '), x -> length(x) >= 1))")
          .cast("long")
      val st = corpus.select(dlExpr.as("dl")).where(col("dl") >= 1)
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl")).persist()
      st.count(); st
    }
    // 5. the dense scoring join + (query_id, doc_id) aggregate
    val scored = stage("score_agg") {
      val sc = rel
        .join(broadcast(wt), Seq("w"))
        .join(broadcast(qt), Seq("w"))
        .where(col("doc_id") =!= col("query_id"))
        .crossJoin(broadcast(stats))
        .withColumn("dlr_e3", expr("(1000 * dl) div (sumdl div n)"))
        .withColumn("contrib", expr(
          "(wt * tf * 2200) div (1000 * tf + 300 + (9 * dlr_e3) div 10)"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("contrib")).as("score")).persist()
      sc.count(); sc
    }
    // 6. bounded top-k per query
    val cand = stage("topk") {
      val c = scored
        .groupBy(col("query_id"))
        .agg(TopK.smallestK(k, -col("score"), col("doc_id")).as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .select(col("query_id"),
          (col("pos") + 1).cast("long").as("rank"),
          col("col._2").as("doc_id"), (-col("col._1")).as("score"))
        .persist()
      c.count(); c
    }
    // 7. the positive gate + negative re-rank
    stage("gate_rerank") {
      val (tauNum, tauDen, nNeg) = (7L, 10L, 5)
      val qset = queries.select(col("query_id"),
        array_distinct(split(col("text"), " ")).as("qs"))
      val dset = corpus
        .join(broadcast(cand.select(col("doc_id")).distinct()),
          Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          array_distinct(split(col("text"), " ")).as("ds"))
      cand
        .join(broadcast(qset), Seq("query_id"))
        .join(broadcast(dset), Seq("doc_id"))
        .withColumn("ni",
          size(array_intersect(col("qs"), col("ds"))).cast("long"))
        .where(lit(tauDen) * col("ni") < lit(tauNum) *
          (size(col("qs")).cast("long") + size(col("ds")) - col("ni")))
        .groupBy(col("query_id"))
        .agg(TopK.smallestK(nNeg, -col("score"), col("doc_id")).as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .write.format("noop").mode("overwrite").save()
    }
    s.sharedState.cacheManager.clearCache()
    // cross-check: the real composed operator, cold cache
    stage("end_to_end") {
      val (c2, q2) = inputs(s, dir)
      Retrieval.mineHardNegatives(c2, q2, k = 8, nNeg = 5,
          tauNum = 7L, tauDen = 10L, scorer = "bm25")
        .orderBy(col("query_id"), col("rank"))
        .write.format("noop").mode("overwrite").save()
    }
    s.sharedState.cacheManager.clearCache()
    out.toSeq
  }

  def main(args: Array[String]): Unit =
    Harness.runProfile("retrieval_profile", profile)
}
