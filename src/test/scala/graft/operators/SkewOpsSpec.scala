package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SkewOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("saltedJoin matches the plain join and spreads the hot key") {
    // one hot key (90% of rows) + a tail
    val fact = ((1 to 900).map(i => (1, i.toLong)) ++
      (1 to 100).map(i => (i % 7 + 2, 1000L + i)))
      .toDF("key", "row_id")
    val dim = Seq((1, "hot"), (2, "a"), (3, "b"), (4, "c"), (5, "d"),
      (6, "e"), (7, "f"), (8, "g")).toDF("key", "label")
    val plain = fact.join(dim, "key").groupBy("label")
      .agg(count(lit(1)).as("n")).orderBy("label").collect()
    val salted = SkewOps.saltedJoin(fact, dim, "key", "row_id", 8)
      .groupBy("label").agg(count(lit(1)).as("n")).orderBy("label").collect()
    assert(plain.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      salted.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // the salt actually distributes the hot key over several buckets
    val saltSpread = fact.where(col("key") === 1)
      .withColumn("_salt", pmod(xxhash64(col("row_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(saltSpread >= 6)
  }

  test("saltedJoin: null salt-source rows still join (xxhash64(null) = seed)") {
    // the salted token joins feed doc_id as the salt source; a null
    // there must not DROP the row — xxhash64 of a null column yields
    // the seed (a stable long), so pmod still lands in [0, buckets)
    // and the row matches a replica of its dim key. Pinned so a future
    // hash/salt change cannot silently turn nulls into lost rows.
    val fact = Seq((1, Some(10L)), (1, None), (2, Some(20L)), (2, None))
      .toDF("key", "row_id")
    val dim = Seq((1, "x"), (2, "y")).toDF("key", "label")
    val r = SkewOps.saltedJoin(fact, dim, "key", "row_id", 8)
      .groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy("label").as[(String, Long)].collect().toSeq
    assert(r == Seq(("x", 2L), ("y", 2L)),
      s"null-salt rows dropped or duplicated: $r")
  }

  test("saltedAgg equals the direct aggregation") {
    val df = ((1 to 500).map(_ => ("hot", 1.0)) ++
      Seq(("a", 2.0), ("a", 4.0), ("b", 9.0))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").as[(String, Long, Double)].collect()
    val salted = SkewOps.saltedAgg(df, Seq("k"), "v", 4,
      partials = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      merges = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .orderBy("k").as[(String, Long, Double)].collect()
    assert(direct.toSeq == salted.toSeq)
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    (1 to 1000).map(i => (i % 50, i.toLong)).toDF("att_conf_id", "t")
      .write.bucketBy(8, "att_conf_id").sortBy("att_conf_id")
      .mode("overwrite").saveAsTable("pts_bucketed")
    (0 until 50).map(i => (i, s"attr$i")).toDF("att_conf_id", "att_name")
      .write.bucketBy(8, "att_conf_id")
      .mode("overwrite").saveAsTable("conf_bucketed")
    val joined = s.table("pts_bucketed")
      .join(s.table("conf_bucketed"), "att_conf_id")
    val physical = joined.queryExecution.executedPlan.toString()
    // both sides pre-bucketed on the join key → shuffle-free join
    assert(!physical.contains("Exchange"), physical.take(500))
    assert(joined.count() == 1000)
  }
}
