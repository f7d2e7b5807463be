package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Prefix-timing diagnosis for the ProfileIvf staged-vs-end-to-end
  * gap: times each PREFIX of the real (unpersisted) ivfTopK plan, so
  * the increment between consecutive prefixes localizes costs a
  * persisted stage decomposition hides (a persisted stage gets its own
  * codegen stage, which is exactly what fused production plans don't).
  *
  * This instrument caught the round-12 literal-centroid cliff: the
  * L≤64 literal argmax fused into the candidate-scoring join broke
  * whole-stage codegen for the combined stage and dropped it to
  * interpreted eval — `pairs_full` 48.9 s vs 0.37 s after switching
  * the default to the broadcast expressions (see
  * [[graft.operators.Similarity.LiteralCentroidMaxL]]). Kept so the
  * next fused-stage regression has a ready probe. */
object ProfileIvfDiag {
  import graft.operators.Similarity

  private def embs(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(1, 64), i ->
        cast((cast(pmod(xxhash64(id * 64 + i), 2001) as double) - 1000.0)
          / 1000.0 as float))""").as("embedding"),
      pmod(xxhash64(col("id")), lit(32)).cast("int").as("label"))

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_IVF_N", "200000").toLong
    val spark = Harness.session()
    val emb = embs(spark, n).persist()
    emb.count()
    Similarity.ensureDotE8(emb)
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[diag] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r rows)")
    }
    val (k, nprobe, dims) = (5, 2, 64)
    // the REAL operator internals, unpersisted, prefix by prefix
    val cells = new Similarity.CentroidSet(emb,
      Similarity.collectCentroids(emb, "label", dims),
      Similarity.LiteralCentroidMaxL)
    val withCell = emb.withColumn("clab", cells.assignCol)
    val queries = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(cells.probeCol(nprobe)).as("clab"))
    val pairs = withCell.join(broadcast(queries), Seq("clab"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("clab"), col("vec_id").as("nid"),
        Similarity.dotE8("qe", "embedding").as("dot_e8"))
    time("assign_only")(withCell.select(max(col("clab"))).count())
    time("queries_only")(queries.count())
    time("pairs_nofilter")(withCell.join(broadcast(queries), Seq("clab")).count())
    time("pairs_full")(pairs.count())
    time("full_ivfTopK")(
      Similarity.ivfTopK(emb, col("vec_id") < 20, k = k, nprobe = nprobe).count())
    time("full_ivfTopK_bcast")(
      Similarity.ivfTopK(emb, col("vec_id") < 20, k = k, nprobe = nprobe,
        literalMaxL = 0).count())
    time("full_ivfTopK_2nd")(
      Similarity.ivfTopK(emb, col("vec_id") < 20, k = k, nprobe = nprobe).count())
    time("full_ivfTopK_bcast2")(
      Similarity.ivfTopK(emb, col("vec_id") < 20, k = k, nprobe = nprobe,
        literalMaxL = 0).count())
    spark.stop()
  }
}
