package graft

/** State-store PROVIDER A/B for the stateful streaming queries — the
  * r17 verdict's item 7 probe: does RocksDB move q34 (and the other
  * three stateful queries) at bench volume, where the remaining cost
  * after the r17 sink fix is per-batch state-store commits?
  *
  * Times the REAL SparkEntry queries (the exact plans the bench and
  * driver run — executor-written parquet sink included) at the bench
  * SF dir under each provider in `SPARK_GRAFT_STORE_SWEEP` (default
  * "hdfs,rocksdb"), interleaved within each pass so monotonic host
  * drift cannot masquerade as a provider effect; min-of-passes
  * (default 2, `SPARK_GRAFT_STATE_PASSES`). The provider conf is set
  * on the parent session; `StreamOps.withStatePartitions` copies the
  * parent conf into each query's session clone, so the override
  * reaches the streaming runs the same way every other runtime conf
  * does. One JSON line to stdout and `PROFILE_STATESTORE.json`
  * (absolute seconds — same-window readings only, like
  * PROFILE_STREAM).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain
  * graft.ProfileStateStore"`.
  */
object ProfileStateStore {

  private val Queries = Seq("q32_stream_resample", "q33_stream_sessionize",
    "q34_stream_range_join", "p60_stream_dedup")

  private val Providers = Map(
    "hdfs" -> ("org.apache.spark.sql.execution.streaming" +
      ".state.HDFSBackedStateStoreProvider"),
    "rocksdb" -> ("org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider"))

  def main(args: Array[String]): Unit = {
    val sweep = sys.env.getOrElse("SPARK_GRAFT_STORE_SWEEP", "hdfs,rocksdb")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq
    sweep.foreach(s => require(Providers.contains(s),
      s"unknown provider label '$s' (known: ${Providers.keys.mkString(",")})"))
    val passes = sys.env.getOrElse("SPARK_GRAFT_STATE_PASSES", "2").toInt
    val spark = Harness.session()
    val sfDir = Harness.sfDir
    val confKey = "spark.sql.streaming.stateStore.providerClass"

    def run(name: String, provider: String): Double = {
      spark.conf.set(confKey, Providers(provider))
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally spark.conf.unset(confKey)
    }

    // warm: Janino + JIT at the smallest tier, same rationale as Bench
    Queries.foreach(q => try {
      SparkEntry.queries(q)(spark, Harness.warmDir)
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      println(s"[profile-statestore] warm $q failed: ${e.getMessage}") })

    val cells = scala.collection.mutable.Map[(String, String), Double]()
    (1 to passes).foreach { _ =>
      for (p <- sweep; q <- Queries) {
        val sec =
          try run(q, p)
          catch { case e: Throwable =>
            println(s"[profile-statestore] $q/$p FAILED: ${e.getMessage}")
            Double.NaN
          }
        val k = (q, p)
        val prev = cells.getOrElse(k, Double.MaxValue)
        if (!sec.isNaN) cells(k) = math.min(prev, sec)
      }
    }
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val js = Queries.map { q =>
      Verify.q(q) + ":" + sweep.map { p =>
        val v = cells.get((q, p)).map(d3).getOrElse("null")
        s""""$p":$v"""
      }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"profile_statestore","unit":"sec",""" +
      s""""passes":$passes,"agg":"min","sf":${Verify.q(sfDir)},""" +
      s""""by_query":$js}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PROFILE_STATESTORE.json"), line + "\n")
    spark.stop()
  }
}
