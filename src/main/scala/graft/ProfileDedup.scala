package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-time breakdown of the corpus-dedup chain (the
  * p20 shape: planted corpus → exact dedup → MinHash-LSH near-dup
  * pairs → connected components → anti-join survivors) — the
  * measurement behind "where do the bench tail's seconds actually
  * go".
  *
  * Each stage materializes (persist + count, or a noop write for the
  * terminal frames) with its upstream already cached, so a stage's
  * reading is its OWN cost: shuffle + compute + Spark's
  * per-materialization constants (job scheduling, AQE re-planning,
  * codegen), not its ancestors'. The stages mirror
  * [[graft.operators.Dedup.minhashNearDups]]'s poly branch and
  * [[graft.operators.Dedup.dedupedCorpus]] exactly (same functions,
  * same parameters as p20); an `end_to_end` reading of the real
  * `dedupedCorpus` call cross-checks that the sum of parts ≈ the
  * whole.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.ProfileDedup"` → one JSON line, stages in seconds.
  */
object ProfileDedup {
  import graft.operators.{Dedup, TextOps}

  private def now(): Long = System.nanoTime()
  private def sec(t0: Long): Double = (now() - t0) / 1e9

  /** p20's corpus: base docs + near-copies (every 25th, 3 words
    * dropped) + exact copies (every 50th, ids offset by 2M). */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val base = s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"))
    TextOps.withPlantedNearDups(base, every = 25, dropWords = 3)
      .unionByName(base.where(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
  }

  private def profile(s: SparkSession, dir: String): Seq[(String, Double)] = {
    graft.functions.PolyHash31.register(s)
    val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    def stage[T](name: String)(body: => T): T = {
      val t0 = now(); val r = body; out += name -> sec(t0); r
    }
    val (numPerms, rowsPerBand, threshold) = (16, 4, 0.5)

    // 1. exact dedup (digest groupBy — one corpus shuffle)
    val kept = stage("exact_dedup") {
      val k = corpus(s, dir)
        .select(sha2(col("text"), 256).as("fp"), col("doc_id"), col("text"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id"), first(col("text")).as("text"))
        .select(col("doc_id"), col("text")).persist()
      k.count(); k
    }
    // 2. shingle-id sets (pure per-doc compute, no shuffle)
    val sets = stage("shingle_sets") {
      val d = TextOps.shingleIdSets(kept, 3)
        .select(col("doc_id"), col("tids")).persist()
      d.count(); d
    }
    // 3. signature + banding + bucket join (band groupBy + pair distinct)
    val cands = stage("lsh_candidates") {
      val withSig = sets.withColumn("sig",
        expr(s"minhash_sigs(tids, $numPerms)"))
      val bands = withSig.select(col("doc_id"),
        posexplode(array(Dedup.sigBandKeys(numPerms, rowsPerBand): _*))
          .as(Seq("band", "bkey")))
      val c = Dedup.lshCandidates(bands).persist(); c.count(); c
    }
    // 4. exact-Jaccard verify (two joins of the candidate pairs
    //    against the cached sets + in-row array_intersect)
    val pairs = stage("jaccard_verify") {
      val p = cands
        .join(sets.select(col("doc_id").as("d1"), col("tids").as("t1")),
          Seq("d1"))
        .join(sets.select(col("doc_id").as("d2"), col("tids").as("t2")),
          Seq("d2"))
        .withColumn("n_inter",
          size(array_intersect(col("t1"), col("t2"))).cast("long"))
        .withColumn("n_union",
          size(col("t1")).cast("long") + size(col("t2")) - col("n_inter"))
        .where(col("n_inter").cast("double") / col("n_union") >= threshold)
        .select(col("d1"), col("d2")).persist()
      p.count(); p
    }
    // 5. connected components (driver-side union-find under the
    //    broadcast threshold; distributed min-label loop above it)
    val nonCanonical = stage("connected_components") {
      val n = Dedup.connectedComponents(pairs)
        .where(col("keep") === 0).select(col("doc_id")).persist()
      n.count(); n
    }
    // 6. survivor anti-join
    stage("anti_join") {
      kept.join(broadcast(nonCanonical), Seq("doc_id"), "left_anti")
        .select(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    s.sharedState.cacheManager.clearCache()
    // cross-check: the real composed operator, cold cache
    stage("end_to_end") {
      Dedup.dedupedCorpus(corpus(s, dir), s).orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    s.sharedState.cacheManager.clearCache()
    out.toSeq
  }

  def main(args: Array[String]): Unit =
    Harness.runProfile("dedup_profile", profile)
}
