package graft

/** State-store partition-count sweep for the stateful streaming
  * queries (q32 windowed resample, q33 session windows, q34
  * stream-stream range join) — the measurement behind the
  * [[graft.streaming.StreamOps.statePartitionsFor]] sizing rule.
  *
  * Round 12 recalibrated the per-partition target (16 Ki → 256 Ki
  * rows) from a q34-only probe; q32/q33 inherited the new derivation
  * untested. This main runs the REAL SparkEntry queries (the exact
  * plans the bench and driver time, memory sink included) at the
  * bench SF dir across a sweep of state-partition counts, via the
  * loud `graft.stream.statePartitions` system-property override that
  * [[graft.api.EventQueries]] reads per call; count 0 means "derived"
  * (the production path — whatever `statePartitionsFor` picks for
  * this input volume).
  *
  * Per (query, count): warm-free min-of-`passes` wall seconds, all
  * counts interleaved within a pass so monotonic host drift cannot
  * masquerade as a curve. One JSON line to stdout and to
  * `PROFILE_STREAM.json` — absolute seconds, the artifact STATUS
  * cites (ratios at this scale are window noise).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.ProfileStream"`;
  * sweep via SPARK_GRAFT_STATE_SWEEP (default "0,1,2,4,8,16,32"),
  * passes via SPARK_GRAFT_STATE_PASSES (default 2).
  */
object ProfileStream {

  private val Queries = Seq("q32_stream_resample", "q33_stream_sessionize",
    "q34_stream_range_join")

  def main(args: Array[String]): Unit = {
    val counts = sys.env.getOrElse("SPARK_GRAFT_STATE_SWEEP",
      "0,1,2,4,8,16,32").split(',').map(_.trim).filter(_.nonEmpty)
      .map(_.toInt).toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_STATE_PASSES", "2").toInt
    val spark = Harness.session()
    val sfDir = Harness.sfDir

    def run(name: String, count: Int): Double = {
      if (count == 0) sys.props.remove("graft.stream.statePartitions")
      else sys.props("graft.stream.statePartitions") = count.toString
      try {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally sys.props.remove("graft.stream.statePartitions")
    }

    // warm: Janino + JIT at the smallest tier, same rationale as Bench
    sys.props.remove("graft.stream.statePartitions")
    Queries.foreach(q => try {
      SparkEntry.queries(q)(spark, Harness.warmDir)
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      println(s"[profile-stream] warm $q failed: ${e.getMessage}") })

    val cells = scala.collection.mutable.Map[(String, Int), Double]()
    (1 to passes).foreach { _ =>
      for (c <- counts; q <- Queries) {
        val sec = run(q, c)
        val k = (q, c)
        cells(k) = math.min(cells.getOrElse(k, Double.MaxValue), sec)
      }
    }
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val js = Queries.map { q =>
      Verify.q(q) + ":" + counts.map { c =>
        val label = if (c == 0) "derived" else c.toString
        s""""$label":${d3(cells((q, c)))}"""
      }.mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"profile_stream","unit":"sec",""" +
      s""""passes":$passes,"agg":"min","sf":${Verify.q(sfDir)},""" +
      s""""by_query":$js}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PROFILE_STREAM.json"), line + "\n")
    spark.stop()
  }
}
