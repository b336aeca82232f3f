package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CmsSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = 4
  private val W = 64

  test("estimate never underestimates; exact when width dodges collisions") {
    // 8 distinct keys into width 1024: collisions are possible but the
    // min over 4 independent rows makes a collision on EVERY row
    // astronomically unlikely — estimates are exact here
    val df = (1 to 1000).map(i => Tuple1(s"k${i % 8}")).toDF("v")
    val sk = CmsSketch.sketch(df, "v", D, 1024)
    val probes = (0 until 8).map(i => Tuple1(s"k$i")).toDF("v")
    val est = sk.estimate(probes, "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 8).foreach { i =>
      val exact = (1 to 1000).count(_ % 8 == i)
      assert(est(s"k$i") === exact, s"k$i")
    }
    // under a deliberately tiny width, estimates only ever go UP
    val tiny = CmsSketch.sketch(df, "v", D, 4).estimate(probes, "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 8).foreach { i =>
      val exact = (1 to 1000).count(_ % 8 == i)
      assert(tiny(s"k$i") >= exact, s"k$i underestimated")
    }
  }

  test("merge of shard sketches equals the whole-corpus sketch") {
    val a = (1 to 400).map(i => Tuple1(s"u${i % 50}")).toDF("v")
    val b = (1 to 300).map(i => Tuple1(s"u${i % 70}")).toDF("v")
    def cells(c: CmsSketch.Cms) =
      c.cells.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = cells(CmsSketch.sketch(a, "v", D, W)
      .merge(CmsSketch.sketch(b, "v", D, W)))
    val whole = cells(CmsSketch.sketch(a.union(b), "v", D, W))
    assert(merged === whole)
  }

  test("unseen probe keys estimate 0 when their cells are empty; nulls excluded") {
    val df = Seq(Some("a"), Some("a"), None).map(Tuple1(_)).toDF("v")
    val sk = CmsSketch.sketch(df, "v", D, 1024)
    // only 'a' was counted: 4 cells, 2 each
    assert(sk.cells.agg(sum("cnt")).head().getLong(0) === 2L * D)
    val est = sk.estimate(Seq(Tuple1("zzz-not-there")).toDF("v"), "v")
      .head().getAs[Long]("cms_est")
    assert(est === 0L)
  }

  test("sketch is invariant to partitioning and row order") {
    val df = (1 to 5000).map(i => Tuple1(s"u${i * 7 % 300}")).toDF("v")
    def run(d: org.apache.spark.sql.DataFrame) =
      CmsSketch.sketch(d, "v", D, W).cells.collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(run(df.repartition(13)) === run(df.orderBy(col("v").desc)))
  }

  test("merging or probing sketches of different shapes fails loudly") {
    val df = Seq("a", "b").map(Tuple1(_)).toDF("v")
    val sk = CmsSketch.sketch(df, "v", D, W)
    intercept[IllegalArgumentException] {
      sk.merge(CmsSketch.sketch(df, "v", D, W * 2))
    }
    intercept[IllegalArgumentException] {
      sk.merge(CmsSketch.sketch(df, "v", D - 1, W))
    }
    intercept[IllegalArgumentException] {
      sk.merge(CmsSketch.sketch(df.withColumn("g", lit("x")), "v", D, W,
        groupCols = Seq("g")))
    }
  }

  test("grouped sketch: each group's table equals the filtered global sketch") {
    val df = (1 to 2000).map(i => (s"g${i % 3}", s"u${i % 40}")).toDF("g", "v")
    val grouped = CmsSketch.sketch(df, "v", D, W, groupCols = Seq("g"))
    (0 until 3).foreach { g =>
      val slice = grouped.cells.filter(col("g") === s"g$g").drop("g")
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val solo = CmsSketch.sketch(df.filter(col("g") === s"g$g"), "v", D, W)
        .cells.collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(slice === solo, s"group g$g")
    }
  }

  test("grouped estimate probes the probe row's OWN group table") {
    // 'u1' appears 10× in gA and 1× in gB: the grouped estimate must
    // keep them apart where a global sketch would blend them
    val df = ((1 to 10).map(_ => ("gA", "u1")) ++ Seq(("gB", "u1")))
      .toDF("g", "v")
    val sk = CmsSketch.sketch(df, "v", D, 1024, groupCols = Seq("g"))
    val probes = Seq(("gA", "u1"), ("gB", "u1"), ("gC", "u1")).toDF("g", "v")
    val est = sk.estimate(probes, "v")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("cms_est")).toMap
    assert(est === Map("gA" -> 10L, "gB" -> 1L, "gC" -> 0L))
  }

  test("grouped sketch is invariant to partitioning per group") {
    val df = (1 to 5000).map(i => (s"g${i % 5}", s"u${i * 7 % 300}")).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      CmsSketch.sketch(d, "v", D, W, groupCols = Seq("g")).cells.collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(run(df.repartition(13)) === run(df.orderBy(col("v").desc)))
  }

  test("grouped estimate join regimes: broadcast under the cap, shuffled over it, same result") {
    val df = (1 to 3000).map(i => (s"g${i % 6}", s"u${i % 80}")).toDF("g", "v")
    val sk = CmsSketch.sketch(df, "v", D, W, groupCols = Seq("g"))
    val probes = (0 until 30).map(i => (s"g${i % 6}", s"u$i")).toDF("g", "v")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[String]("g"), r.getAs[String]("v")) ->
        r.getAs[Long]("cms_est")).toMap

    val hinted = sk.estimate(probes, "v")
    hinted.count()
    assert(hinted.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "under-cap slices must broadcast")
    val expected = rows(hinted)

    // over-cap regime with every automatic broadcast disabled: the d
    // slice joins must shuffle and the estimates must not move
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = sk.estimate(probes, "v", maxBroadcastCells = 0L)
      assert(rows(shuffled) === expected)
      shuffled.count()
      val s = shuffled.queryExecution.executedPlan.toString
      assert(!s.contains("BroadcastHashJoin"),
        s"over-cap regime must not broadcast:\n$s")
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("joinSizeEstimate: exact when collision-free, one-sided under a tiny width") {
    // 20 distinct keys into width 4096: a collision on every one of the
    // 4 rows is astronomically unlikely, so the estimate is EXACT
    val a = (1 to 600).map(i => Tuple1(s"k${i % 20}")).toDF("v")
    val b = (1 to 450).map(i => Tuple1(s"k${i % 15}")).toDF("v")
    val exact = (0 until 20).map { k =>
      (1 to 600).count(_ % 20 == k).toLong * (1 to 450).count(_ % 15 == k)
    }.sum
    val wide = CmsSketch.sketch(a, "v", D, 4096)
      .joinSizeEstimate(CmsSketch.sketch(b, "v", D, 4096))
      .head().getAs[Long]("join_size_est")
    assert(wide === exact)
    // tiny width: collisions inflate the dot but NEVER deflate it
    val tiny = CmsSketch.sketch(a, "v", D, 4)
      .joinSizeEstimate(CmsSketch.sketch(b, "v", D, 4))
      .head().getAs[Long]("join_size_est")
    assert(tiny >= exact)
  }

  test("joinSizeEstimate: disjoint keys estimate 0 via the missing-row rule") {
    val a = (1 to 50).map(i => Tuple1(s"left$i")).toDF("v")
    val b = (1 to 50).map(i => Tuple1(s"right$i")).toDF("v")
    // width 2: row overlaps are certain, but any row with no shared
    // bucket forces the min to 0 — and with 50 keys over 2 buckets no
    // row can be empty on either side, so all 4 dots survive and the
    // estimate is a (nonzero) overestimate of the true 0; with width
    // 4096 and 50 keys, shared buckets are rare and at least one of
    // the 4 rows misses → 0
    val est = CmsSketch.sketch(a, "v", D, 65536)
      .joinSizeEstimate(CmsSketch.sketch(b, "v", D, 65536))
      .head().getAs[Long]("join_size_est")
    assert(est === 0L)
  }

  test("joinSizeEstimate grouped: per-group estimates, shape mismatch intercepted") {
    val a = Seq(("gA", "u1"), ("gA", "u1"), ("gA", "u2"), ("gB", "u9"))
      .toDF("g", "v")
    val b = Seq(("gA", "u1"), ("gA", "u3"), ("gB", "u9"), ("gB", "u9"))
      .toDF("g", "v")
    val G = Seq("g")
    val est = CmsSketch.sketch(a, "v", D, 4096, G)
      .joinSizeEstimate(CmsSketch.sketch(b, "v", D, 4096, G))
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("join_size_est"))
      .toMap
    // gA: u1 2×1 = 2 (u2/u3 unmatched); gB: u9 1×2 = 2
    assert(est === Map("gA" -> 2L, "gB" -> 2L))
    intercept[IllegalArgumentException] {
      CmsSketch.sketch(a, "v", D, 4096, G)
        .joinSizeEstimate(CmsSketch.sketch(b, "v", D, 1024, G))
    }
  }

  test("grouped merge rolls shards up cell-wise within every group") {
    val a = (1 to 400).map(i => (s"g${i % 2}", s"u${i % 50}")).toDF("g", "v")
    val b = (1 to 300).map(i => (s"g${i % 3}", s"u${i % 70}")).toDF("g", "v")
    val G = Seq("g")
    def cells(c: CmsSketch.Cms) = c.cells.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    val merged = cells(CmsSketch.sketch(a, "v", D, W, G)
      .merge(CmsSketch.sketch(b, "v", D, W, G)))
    val whole = cells(CmsSketch.sketch(a.union(b), "v", D, W, G))
    assert(merged === whole)
  }
}
