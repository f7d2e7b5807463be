package graft.render

import java.io.ByteArrayInputStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.api.ArchiveApi

class RenderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("CSV block format golden (K1, data.py:50-55)") {
    val s = Seq(
      Render.Series("r3/vac/p1/pressure",
        Seq((100.0, Some(1.5)), (200.0, None))),
      Render.Series("r3/mag/d1/current", Seq((150.5, Some(2.0)))))
    assert(Render.csv(s) ==
      "r3/vac/p1/pressure\nt[us],value_r\n100,1.5\n200,\n" +
        "\nr3/mag/d1/current\nt[us],value_r\n150.5,2.0\n")
  }

  test("Grafana JSON golden: NaN→null, ms timestamps (K2, data.py:58-75)") {
    val s = Seq(Render.Series("a/b/c/d",
      Seq((1704067200000000.0, Some(1.5)), (1704067260000000.0, None))))
    assert(Render.grafanaJson(s) ==
      """[{"target": "a/b/c/d", "datapoints": """ +
        """[[1.5, 1704067200000.0], [null, 1704067260000.0]]}]""")
  }

  test("shade maps counts to alpha, flipping y to PNG row order (K3)") {
    val px = Render.shade(Render.Grid("a", 0xff0000, 2, 2,
      Seq((0, 0, 2L), (1, 1, 1L))))
    // py=0 → bottom row (PNG row 1); py=1 → top row (PNG row 0)
    assert((px(2) >>> 24) == 255) // (0,0) full alpha at row1,col0
    assert((px(1) >>> 24) > 0 && (px(1) & 0xffffff) == 0xff0000)
    assert(px(0) == 0 && px(3) == 0)
  }

  test("shadeEqHist ranks counts by CDF, immune to heavy-tailed grids") {
    // counts 1,1,1000: linear washes the 1s to near-minimum alpha;
    // eq-hist gives them rank 1 of 2 → mid alpha, hot cell top alpha
    val g = Render.Grid("a", 0x00ff00, 4, 1,
      Seq((0, 0, 1L), (1, 0, 1L), (2, 0, 1000L)))
    val eq = Render.shadeEqHist(g)
    val lin = Render.shade(g)
    val aEq = (eq(0) >>> 24); val aHot = (eq(2) >>> 24)
    assert(aEq == 64 + 191 / 2 && aHot == 255)
    assert((lin(0) >>> 24) < aEq, "linear washes out the cold cells")
    assert(eq(3) == 0) // untouched pixel stays transparent
    // equal counts → identical mapping in both (single rank = max)
    val uni = Render.Grid("a", 0xff0000, 2, 1, Seq((0, 0, 3L), (1, 0, 3L)))
    assert(Render.shadeEqHist(uni).toSeq.take(2)
      .forall(p => (p >>> 24) == 255))
  }

  test("stack composites layers src-over and encodes a decodable PNG (U4/C10)") {
    val a = Render.shade(Render.Grid("a", 0xff0000, 2, 2, Seq((0, 0, 1L))))
    val b = Render.shade(Render.Grid("b", 0x0000ff, 2, 2, Seq((0, 0, 1L))))
    val img = Render.stack(Seq(a, b), 2, 2)
    val b64 = Render.pngBase64(img)
    val decoded = javax.imageio.ImageIO.read(new ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(b64)))
    assert(decoded.getWidth == 2 && decoded.getHeight == 2)
    val p = decoded.getRGB(0, 1) // py=0 → bottom row
    assert(((p >>> 24) & 0xff) > 0)
    assert((p & 0xff) > ((p >> 16) & 0xff)) // blue stacked over red
  }

  test("attributes route filters by cs, globs, and applies the max cap") {
    val names = Seq(
      ("cs1", "r3", "vac", "p1", "pressure"),
      ("cs1", "r3", "vac", "p2", "pressure"),
      ("cs1", "r3", "vac", "p3", "pressure"),
      ("cs2", "r3", "vac", "p4", "pressure"))
      .toDF("cs_name", "domain", "family", "member", "name")
    val r = ArchiveApi.attributes(names, "cs1", "*/vac/*", max = 2)
    assert(r.count() == 2) // cs2 filtered out, cap applied to cs1's 3
  }

  test("parameterAt and history route through the catalog operators") {
    val params = Seq((7, 100L, "label=a"), (7, 200L, "label=b"),
      (8, 150L, "label=c")).toDF("att_conf_id", "recv_time", "value")
    val p = ArchiveApi.parameterAt(params, 7, 250L).collect()
    assert(p.length == 1 && p.head.getString(2) == "label=b")
    val hist = Seq((7, 10L, "start"), (7, 20L, "pause"), (7, 30L, "start"),
      (9, 15L, "start")).toDF("att_conf_id", "time", "event")
    val h = ArchiveApi.history(hist, 7, 5L, 25L).collect()
    assert(h.map(_.getString(2)).toSeq == Seq("start", "pause"))
  }

  test("rawQuery renders CSV and Grafana JSON end-to-end (§3.2)") {
    val pts = Seq(
      ("u1/click", 1L, 100L, 1.0), ("u1/click", 2L, 200L, Double.NaN),
      ("u2/view", 3L, 150L, 3.0), ("u1/click", 4L, 900L, 9.9))
      .toDF("att_name", "point_id", "t", "value_r")
    val csv = ArchiveApi.rawQuery(pts, Seq("u1/click", "u2/view"),
      0L, 500L, None, asCsv = true)
    assert(csv == "u1/click\nt[us],value_r\n100,1.0\n200,\n" +
      "\nu2/view\nt[us],value_r\n150,3.0\n")
    val json = ArchiveApi.rawQuery(pts, Seq("u2/view"), 0L, 500L, None,
      asCsv = false)
    assert(json ==
      """[{"target": "u2/view", "datapoints": [[3.0, 0.15]]}]""")
  }

  test("rawQuery bounds an un-intervaled render with a real top-k cap") {
    // 5000 raw points, no interval — the reference path would collect
    // them all (data.py:63-66); the cap must keep the render bounded
    // AND deterministic: the k EARLIEST points, not arbitrary
    val pts = (0 until 5000)
      .map(i => ("big/attr", i.toLong, i.toLong * 3, i.toDouble))
      .toDF("att_name", "point_id", "t", "value_r")
    val csv = ArchiveApi.rawQuery(pts, Seq("big/attr"), 0L, 100000L,
      None, asCsv = true, maxRows = 7)
    val lines = csv.split("\n")
    assert(lines.length == 9) // series name + header + exactly 7 rows
    assert(lines.drop(2).map(_.split(",")(0).toDouble).toSeq ==
      (0 until 7).map(_ * 3.0))
    // the cap is a uniform TIME cut: an attribute sorting after the
    // whale must still appear (attr-first ordering would drop it
    // entirely — indistinguishable from no data)
    val two = pts.unionByName(Seq(("z/late", 9000L, 4L, 7.5))
      .toDF("att_name", "point_id", "t", "value_r"))
    val csv2 = ArchiveApi.rawQuery(two, Seq("big/attr", "z/late"),
      0L, 100000L, None, asCsv = true, maxRows = 7)
    assert(csv2.contains("z/late\nt[us],value_r\n4,7.5\n"),
      s"later-sorted attribute vanished under the cap:\n$csv2")
    val json = ArchiveApi.rawQuery(pts, Seq("big/attr"), 0L, 100000L,
      None, asCsv = false, maxRows = 5)
    val dps = graft.server.Json.arr(graft.server.Json.obj(
      graft.server.Json.arr(graft.server.Json.parse(json))(0))("datapoints"))
    assert(dps.length == 5)
    // the default cap leaves small results untouched
    val full = ArchiveApi.rawQuery(pts, Seq("big/attr"), 0L, 100000L,
      None, asCsv = true)
    assert(full.split("\n").length == 5002)
  }

  test("streaming raw render: peak driver buffer is ONE sort partition, " +
    "not the whole cap") {
    // the rawQuery scaladoc claims toLocalIterator holds one range
    // partition of the final sort at a time; this measures that claim
    // on the REAL frame (rawQueryFrame IS what rawQuery iterates).
    // Without rawQueryFrame's explicit repartitionByRange the claim is
    // VACUOUS: limit() emits one TakeOrderedAndProject partition,
    // which trivially satisfies the regroup sort's distribution, so
    // the whole cap would sit in a single local-sorted partition (this
    // test failed exactly that way before the operator fix). With it,
    // the capped rows must spread over ceil(cap/batchRows) range
    // partitions, none holding more than a balanced share — peak
    // driver state is one batch, not the cap — and partition order
    // must equal global render order so the stream is still in-order.
    val n = 40000
    val cap = 8000
    val pts = (0 until n)
      .map(i => (s"a${i % 4}/attr", i.toLong, i.toLong * 3, i.toDouble))
      .toDF("att_name", "point_id", "t", "value_r")
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val saved = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      val frame = ArchiveApi.rawQueryFrame(pts,
        Seq("a0/attr", "a1/attr", "a2/attr", "a3/attr"),
        0L, 1000000000L, None, cap, batchRows = 2000)
      val perPart = frame.rdd
        .mapPartitions(it => Iterator.single(it.toSeq)).collect()
      val sizes = perPart.map(_.size)
      assert(sizes.sum == cap)
      val nonEmpty = sizes.filter(_ > 0)
      assert(nonEmpty.length > 1,
        s"cap landed in one partition — peak buffer IS the cap: " +
          s"${sizes.mkString(",")}")
      val mean = cap.toDouble / nonEmpty.length
      assert(nonEmpty.max <= 2.0 * mean,
        s"range partitions unbalanced: max ${nonEmpty.max} vs mean $mean")
      // partition-concatenation order IS the render order: attr-major
      // (_ord), then time — flattening partitions in index order must
      // yield a globally sorted sequence
      val flat = perPart.flatten.map(r =>
        (r.getLong(3), r.getDouble(1), r.getDouble(2)))
      assert(flat.length == cap && flat.sameElements(flat.sorted),
        "partition order diverged from global render order")
      info(s"cap=$cap over ${nonEmpty.length} partition(s), " +
        s"peak buffered rows=${nonEmpty.max}")
    } finally spark.conf.set(coalesceKey, saved)
  }

  test("rawQuery with interval resamples before rendering (A1 + K2)") {
    val pts = Seq(("a", 1L, 400L, 2.0), ("a", 2L, 600L, 4.0),
      ("a", 3L, 1400L, 6.0)).toDF("att_name", "point_id", "t", "value_r")
    val json = ArchiveApi.rawQuery(pts, Seq("a"), 0L, 2000L, Some("1ms"),
      asCsv = false)
    // bucket 0 mean t=400; bucket 1000 mean t=1000, mean v=5.0
    assert(json == """[{"target": "a", "datapoints": """ +
      """[[2.0, 0.4], [5.0, 1.0]]}]""")
  }

  test("imageQuery produces per-axis PNGs and hover descs (§3.1)") {
    val pts = (0 until 50).map { i =>
      ("sensor/a", i.toLong, i.toLong * 20, 1.0 + (i % 10))
    } ++ Seq(("sensor/b", 100L, 500L, 42.0))
    val df = pts.toDF("att_name", "point_id", "t", "value_r")
    val res = ArchiveApi.imageQuery(df,
      Seq(ArchiveApi.AttrSpec("sensor/a", 0xff0000, 0),
        ArchiveApi.AttrSpec("sensor/b", 0x00ff00, 1)),
      0L, 1000L, 16, 8)
    assert(res.images.keySet == Set("0", "1"))
    val img0 = res.images("0")
    val decoded = javax.imageio.ImageIO.read(new ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(img0.imageBase64)))
    assert(decoded.getWidth == 16 && decoded.getHeight == 8)
    // axis 0: values 1..10 → padded 5% → (0.55, 10.45)
    assert(math.abs(img0.yRange._1 - 0.55) < 1e-9)
    assert(math.abs(img0.yRange._2 - 10.45) < 1e-9)
    // axis 1 is a constant 42 → invented range (21, 63)
    assert(res.images("1").yRange == (21.0, 63.0))
    val desc = res.descs("sensor/a")
    assert(desc.totalPoints == 50)
    assert(desc.indices.nonEmpty && desc.indices.forall(i => i >= 0 && i < 16))
    assert(desc.counts.sum == 50)
    // x range reported in ms
    assert(img0.xRangeMs == (0.0, 1.0))
  }

  test("imageQuery antialias opt-in renders a valid PNG, same envelope") {
    val pts = (0 until 50).map { i =>
      ("sensor/a", i.toLong, i.toLong * 20, 1.0 + (i % 10))
    }
    val df = pts.toDF("att_name", "point_id", "t", "value_r")
    val attrs = Seq(ArchiveApi.AttrSpec("sensor/a", 0xff0000, 0))
    val aa = ArchiveApi.imageQuery(df, attrs, 0L, 1000L, 16, 8,
      antialias = true)
    val plain = ArchiveApi.imageQuery(df, attrs, 0L, 1000L, 16, 8)
    // envelope identical (ranges, descs come from the same phases)…
    assert(aa.images("0").yRange == plain.images("0").yRange)
    assert(aa.descs("sensor/a").totalPoints == 50)
    val decoded = javax.imageio.ImageIO.read(new ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(aa.images("0").imageBase64)))
    assert(decoded.getWidth == 16 && decoded.getHeight == 8)
    // …and the AA render is deterministic across executions
    val aa2 = ArchiveApi.imageQuery(df, attrs, 0L, 1000L, 16, 8,
      antialias = true)
    assert(aa2.images("0").imageBase64 == aa.images("0").imageBase64)
  }

  test("imageQuery honors manual axis min/max overrides (plot.py:102-104)") {
    val df = (0 until 20).map(i => ("a", i.toLong, i.toLong * 50, 1.0 + i % 5))
      .toDF("att_name", "point_id", "t", "value_r")
    val res = ArchiveApi.imageQuery(df,
      Seq(ArchiveApi.AttrSpec("a", 0xff0000, 0)), 0L, 1000L, 8, 4,
      axes = Map(0 -> ArchiveApi.AxisSpec(min = Some(0.0), max = Some(10.0))))
    // manual range 0..10 padded 5% → (-0.5, 10.5), not the data's 1..5
    assert(res.images("0").yRange == (-0.5, 10.5))
  }

  test("imageQuery log axis: positive filter + log-space padding") {
    val df = Seq(("a", 1L, 100L, 1.0), ("a", 2L, 300L, 100.0),
      ("a", 3L, 500L, -5.0)) // negative dropped by the log filter
      .toDF("att_name", "point_id", "t", "value_r")
    val res = ArchiveApi.imageQuery(df,
      Seq(ArchiveApi.AttrSpec("a", 0xff0000, 0)), 0L, 1000L, 8, 4,
      axes = Map(0 -> ArchiveApi.AxisSpec(scale = Some("log"))))
    val (lo, hi) = res.images("0").yRange
    assert(math.abs(lo - math.pow(10, -0.1)) < 1e-9)
    assert(math.abs(hi - math.pow(10, 2.1)) < 1e-9)
  }

  test("imageQuery log axis + antialias: non-positive values break the " +
    "line, render stays valid") {
    // the q29 bug: under logScale a non-positive value's null py used
    // to clamp to the TOP row (least() skips nulls); with antialias on
    // the same guard must hold through the AA kernel on the route path
    val df = Seq(("a", 1L, 100L, 1.0), ("a", 2L, 300L, 100.0),
      ("a", 3L, 500L, -5.0), ("a", 4L, 700L, 10.0))
      .toDF("att_name", "point_id", "t", "value_r")
    val res = ArchiveApi.imageQuery(df,
      Seq(ArchiveApi.AttrSpec("a", 0xff0000, 0)), 0L, 1000L, 8, 4,
      axes = Map(0 -> ArchiveApi.AxisSpec(scale = Some("log"))),
      antialias = true)
    val decoded = javax.imageio.ImageIO.read(new ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(res.images("0").imageBase64)))
    assert(decoded.getWidth == 8 && decoded.getHeight == 4)
    // the top row must NOT be lit at the -5 point's pixel column: a
    // clamped py would paint px=4 row-top; a broken line leaves it
    val topRowAlpha = (0 until 8).map(x => (decoded.getRGB(x, 0) >>> 24))
    assert(topRowAlpha(4) == 0,
      s"non-positive value leaked onto the log-axis top row: $topRowAlpha")
    // determinism across executions (same AA + log path)
    val again = ArchiveApi.imageQuery(df,
      Seq(ArchiveApi.AttrSpec("a", 0xff0000, 0)), 0L, 1000L, 8, 4,
      axes = Map(0 -> ArchiveApi.AxisSpec(scale = Some("log"))),
      antialias = true)
    assert(again.images("0").imageBase64 == res.images("0").imageBase64)
  }

  test("imageQuery skips all-NaN attributes (nodata, plot.py:118-121)") {
    val df = Seq(("a", 1L, 100L, Double.NaN), ("a", 2L, 200L, Double.NaN),
      ("b", 3L, 100L, 5.0), ("b", 4L, 200L, 6.0))
      .toDF("att_name", "point_id", "t", "value_r")
    val res = ArchiveApi.imageQuery(df,
      Seq(ArchiveApi.AttrSpec("a", 0xff0000, 0),
        ArchiveApi.AttrSpec("b", 0x00ff00, 0)), 0L, 1000L, 8, 4)
    assert(res.images.contains("0"))
    assert(!res.descs.contains("a") && res.descs.contains("b"))
  }
}
