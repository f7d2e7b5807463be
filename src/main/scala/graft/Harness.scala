package graft

import org.apache.spark.sql.SparkSession

/** Shared measurement harness for the timing mains ([[Bench]],
  * [[ProfileDedup]], [[ProfileRetrieval]]): ONE definition of the
  * bench-standard session, the warm/measure directories, and the
  * warm-then-min-of-N aggregation, so profile numbers stay comparable
  * to bench numbers by construction — a harness change (conf, warm
  * default, pass count) edits one place instead of three mains that
  * must agree for cross-artifact comparisons to mean anything. */
object Harness {

  def sfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

  def warmDir: String =
    sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")

  /** The bench-standard local session: `local[N]` with N shuffle
    * partitions (N = SPARK_GRAFT_CPUS, default 32 — the stated bench
    * harness), UTC, UI off, WARN logs, [[graft.plans.DerivedDivBounds]]
    * registered, and the legacy parquet nanos flag the driver's events
    * layout needs. */
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.DerivedDivBounds.register(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** Profiler driver: warm once at [[warmDir]] (Janino + JIT — see
    * Bench's warm-pass note for the measured rationale), run `passes`
    * timed passes of `profile` at [[sfDir]], and print ONE JSON line
    * of per-stage minimums (min-of-passes: same host-contention
    * argument as Bench's min-of-3). */
  def runProfile(metric: String,
      profile: (SparkSession, String) => Seq[(String, Double)],
      passes: Int = 3): Unit = {
    val spark = session()
    profile(spark, warmDir)
    val runs = Seq.fill(passes)(profile(spark, sfDir))
    val names = runs.head.map(_._1)
    val best = names.map { n => n -> runs.map(_.toMap.apply(n)).min }
    // Locale.ROOT: the f interpolator honors the default locale, and a
    // comma-decimal locale would emit invalid JSON (ADVICE r12)
    val js = best.map { case (k, v) => Verify.q(k) + ":" +
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)) }
      .mkString("{", ",", "}")
    println(s"""{"metric":${Verify.q(metric)},"unit":"sec","stages":$js,""" +
      s""""passes":$passes,"agg":"min","sf":${Verify.q(sfDir)}}""")
    spark.stop()
  }
}
