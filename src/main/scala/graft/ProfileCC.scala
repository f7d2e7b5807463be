package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** Connected-components scaling probe — the pointer-jumping loop
  * ([[graft.operators.Dedup.connectedComponents]]) is the last
  * iterative operator without a committed multi-tier scaling artifact
  * (round-15 verdict #2). Two measurements over the REAL p16 pair
  * graph (planted near-dups → minhash LSH → verified pairs, identical
  * parameters to the production query) at `SPARK_GRAFT_SF_DIR`:
  *
  *  1. `production`: `connectedComponents(pairs)` with default
  *     thresholds — whichever path production takes (driver fast path
  *     under the edge threshold, distributed loop above it);
  *  2. `loop`: same graph with `localEdgeThreshold = 0` — pins the
  *     distributed pointer-jumping loop itself, with the rounds /
  *     materializations breadcrumb from [[Dedup.lastCcStats]] as the
  *     bounded-iteration evidence.
  *
  * The LSH pair build is EXCLUDED from the timings (pairs persisted
  * and materialized first); each pass re-runs CC end to end. Min of
  * `SPARK_GRAFT_CC_PASSES` (default 3) per cell. One JSON line to
  * stdout and `PROFILE_CC.json` — absolute seconds; cross-scale
  * claims need same-window ORDER-ALTERNATING runs (PROBE_p34_ABA
  * protocol), which is the caller's job.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.ProfileCC"`.
  */
object ProfileCC {

  def main(args: Array[String]): Unit = {
    val passes = sys.env.getOrElse("SPARK_GRAFT_CC_PASSES", "3").toInt
    // 0/negative would skip both measurement loops: the cluster-count
    // cross-check then passes trivially (-1 == -1) and cell() NPEs on
    // the null CcStats — fail loudly at the source instead (ADVICE r15)
    require(passes > 0, s"SPARK_GRAFT_CC_PASSES must be positive, got $passes")
    val spark = Harness.session()
    val dir = Harness.sfDir

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    val planted = TextOps.withPlantedNearDups(docs, every = 25,
      dropWords = 3)
    val pairs = Dedup.minhashNearDups(planted, spark, shingleK = 3,
      numPerms = 16, rowsPerBand = 4, threshold = 0.5)
      .select(col("d1"), col("d2")).persist()
    val nEdges = pairs.count()

    // production cell: NO explicit threshold — if the default is ever
    // retuned the probe keeps measuring the actual production path
    // instead of a stale literal (ADVICE r15)
    def timeCc(threshold: Option[Long]): (Double, Dedup.CcStats, Long) = {
      val t0 = System.nanoTime()
      val cc = threshold match {
        case Some(t) => Dedup.connectedComponents(pairs,
          localEdgeThreshold = t)
        case None => Dedup.connectedComponents(pairs)
      }
      val nClusters = cc.where(col("keep") === 1).count()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, Dedup.lastCcStats.get(), nClusters)
    }

    // warm: Janino + JIT on the small tier's graph shape
    try {
      val wDocs = spark.read.parquet(s"${Harness.warmDir}/documents.parquet")
      val wPairs = Dedup.minhashNearDups(
        TextOps.withPlantedNearDups(wDocs, every = 25, dropWords = 3),
        spark, shingleK = 3, numPerms = 16, rowsPerBand = 4,
        threshold = 0.5).select(col("d1"), col("d2"))
      Dedup.connectedComponents(wPairs)
        .write.format("noop").mode("overwrite").save()
      Dedup.connectedComponents(wPairs, localEdgeThreshold = 0L)
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      println(s"[profile-cc] warm failed: ${e.getMessage}")
    }

    // window calibration brackets the timed cells (same gauge as
    // Bench/runProfile, r16) so cross-scale ProfileCC runs carry
    // their own window factor
    Harness.calibrationRun(spark)
    val calBefore = Harness.calibrationPoint(spark)
    var prod = (Double.MaxValue, null: Dedup.CcStats, -1L)
    var loop = (Double.MaxValue, null: Dedup.CcStats, -1L)
    (1 to passes).foreach { _ =>
      val p = timeCc(None)
      if (p._1 < prod._1) prod = p
      val l = timeCc(Some(0L))
      if (l._1 < loop._1) loop = l
    }
    require(prod._3 == loop._3,
      s"fast path and loop disagree on cluster count: ${prod._3} vs " +
        s"${loop._3}")
    val calAfter = Harness.calibrationPoint(spark)
    pairs.unpersist()

    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def cell(t: (Double, Dedup.CcStats, Long)): String = {
      val s = t._2
      s"""{"sec":${d3(t._1)},"fast_path":${s.fastPath},""" +
        s""""rounds":${s.rounds},"materializations":${s.materializations},""" +
        s""""clusters":${t._3}}"""
    }
    val cal = s""""calibration":{"points":[${d3(calBefore)},""" +
      s"""${d3(calAfter)}],"median":${d3(Harness.medianOf(
        Seq(calBefore, calAfter)))},"rows":${Harness.CalibrationRows}}"""
    val line = s"""{"metric":"profile_cc","unit":"sec",""" +
      s""""passes":$passes,"agg":"min",$cal,"sf":${Verify.q(dir)},""" +
      s""""edges":$nEdges,"production":${cell(prod)},""" +
      s""""loop_forced":${cell(loop)}}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PROFILE_CC.json"), line + "\n")
    spark.stop()
  }
}
