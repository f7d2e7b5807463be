package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class CorpusSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "alpha beta", "en", "s0", 10L),
    (1L, "gamma", "fr", "s1", 5L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("jsonl round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("corpus-jsonl").toString
    CorpusSource.writeJsonl(docs, s"$dir/out")
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val CorpusSource.JsonlRead(clean, corrupt, release) =
      CorpusSource.readJsonl(spark, s"$dir/out")
    assert(corrupt.count() == 0)
    assert(clean.schema == CorpusSource.DocumentsSchema)
    assert(clean.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)
    // release drops the parse cache (a long-lived ingestion session
    // would otherwise pin one dead cached parse PER CALL); the frames
    // stay valid afterwards, merely recomputing
    def added = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    assert(added.nonEmpty, "readJsonl should have cached the parse")
    release()
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (added.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(added.isEmpty, s"release leaked the parse cache: $added")
    // released frames recompute for real-column queries (a bare
    // count() would be rejected — it prunes down to only _corrupt;
    // see the JsonlRead scaladoc)
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L))
  }

  test("malformed lines are quarantined, not dropped or poisoning") {
    val dir = java.nio.file.Files.createTempDirectory("corpus-bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mixed.jsonl"),
      """{"doc_id": 7, "text": "ok doc", "lang": "en", "source": "s", "n_chars": 6}
        |this line is not json at all
        |{"doc_id": 8, "text": "another", "lang": "fr", "source": "s", "n_chars": 7}
        |""".stripMargin)
    val r = CorpusSource.readJsonl(spark, s"$dir/mixed.jsonl")
    assert(r.clean.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(7L, 8L))
    val bad = r.corrupt.as[String].collect()
    assert(bad.length == 1 && bad.head.contains("not json"))
    r.release()
  }

  test("parquet read enforces the canonical schema") {
    val dir = java.nio.file.Files.createTempDirectory("corpus-pq").toString
    docs.withColumn("extra",
      org.apache.spark.sql.functions.lit("x")) // pruned on read
      .write.mode("overwrite").parquet(s"$dir/p")
    val r = CorpusSource.readParquet(spark, s"$dir/p")
    assert(r.schema == CorpusSource.DocumentsSchema)
    assert(r.count() == 2)
  }

  test("parquet read widens lossless types, rejects lossy ones") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("corpus-widen").toString
    // int32 doc_id / n_chars from an external producer: lossless widen
    docs.withColumn("doc_id", col("doc_id").cast("int"))
      .withColumn("n_chars", col("n_chars").cast("int"))
      .write.mode("overwrite").parquet(s"$dir/widen")
    val r = CorpusSource.readParquet(spark, s"$dir/widen")
    assert(r.schema == CorpusSource.DocumentsSchema)
    assert(r.select("doc_id").as[Long].collect().sorted.toSeq == Seq(0L, 1L))
    // string doc_id: lossy coercion must still fail loudly
    docs.withColumn("doc_id", col("doc_id").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/lossy")
    val e = intercept[IllegalArgumentException] {
      CorpusSource.readParquet(spark, s"$dir/lossy")
    }
    assert(e.getMessage.contains("doc_id"))
  }
}
