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
    val (clean, corrupt) = CorpusSource.readJsonl(spark, s"$dir/out")
    assert(corrupt.count() == 0)
    assert(clean.schema == CorpusSource.DocumentsSchema)
    assert(clean.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }

  test("malformed lines are quarantined, not dropped or poisoning") {
    val dir = java.nio.file.Files.createTempDirectory("corpus-bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mixed.jsonl"),
      """{"doc_id": 7, "text": "ok doc", "lang": "en", "source": "s", "n_chars": 6}
        |this line is not json at all
        |{"doc_id": 8, "text": "another", "lang": "fr", "source": "s", "n_chars": 7}
        |""".stripMargin)
    val (clean, corrupt) = CorpusSource.readJsonl(spark, s"$dir/mixed.jsonl")
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(7L, 8L))
    val bad = corrupt.as[String].collect()
    assert(bad.length == 1 && bad.head.contains("not json"))
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
