package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("avalancheKeyLocal is byte-identical to the column expression") {
    val keys = Seq("", "0:0:0", "5:9:3", "1023:0:1", "hello world",
      "é:2:0", "-7", "a" * 100)
    val fromCol = keys.map(Tuple1(_)).toDF("k")
      .select(col("k"), Sampling.avalancheKey(col("k")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(Sampling.avalancheKeyLocal(k) === fromCol(k), s"key=$k")
      assert(Sampling.avalancheKeyLocal(k) >= 0L)
    }
  }

  test("stratified split: exact per-stratum fraction, deterministic") {
    val df = (1L to 1000L).map(i => (i, (i % 7).toString)).toDF("key", "stratum")
    val a = Sampling.stratifiedSplit(df, "stratum", 0.1, Seq("key"))
    val b = Sampling.stratifiedSplit(df, "stratum", 0.1, Seq("key"))
    val counts = a.groupBy("stratum")
      .agg(count(lit(1)).as("n"),
           sum(when(col("split") === "training", 1).otherwise(0)).as("tr"))
      .collect()
    counts.foreach { r =>
      val n = r.getAs[Long]("n"); val tr = r.getAs[Long]("tr")
      assert(tr === math.ceil(0.1 * n).toLong, s"stratum ${r.getString(0)}")
    }
    // determinism
    assert(a.orderBy("key").collect().toSeq === b.orderBy("key").collect().toSeq)
  }

  test("filterTargetPresent drops null AND NaN") {
    val df = Seq(Some(1.0), None, Some(Double.NaN), Some(2.0)).toDF("t")
    assert(Sampling.filterTargetPresent(df, "t").count() === 2)
  }

  test("stride sample takes every n-th row of the order") {
    val df = (1L to 100L).toDF("id")
    val got = Sampling.strideSample(df, Seq("id"), 10).as[Long].collect().toSeq
    assert(got === Seq(1L, 11L, 21L, 31L, 41L, 51L, 61L, 71L, 81L, 91L))
  }

  test("stride sample's decomposed rank is invariant to input layout") {
    // the range-partitioned offsets must reproduce the exact global rank
    // however the input arrives (the decomposition replaced a
    // single-partition window — same answer, parallel plan)
    val df = (1L to 5000L).map(i => (i * 2654435761L % 9973L, i)).toDF("k", "id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.strideSample(d, Seq("k", "id"), 7)
        .select("k", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = run(df.repartition(17))
    val b = run(df.orderBy(col("id").desc))
    assert(a === b)
    assert(a.length === (5000 + 6) / 7)
  }

  test("rolling full-window-only counts non-null samples like polars") {
    import graft.functions.Rolling
    // null at position 3: every 5-row window containing it has only 4
    // non-null samples → null (polars min_samples counts valid values,
    // not rows); the first full-sample window ends at position 8
    val df = Seq(
      (1, Some(10.0)), (2, Some(20.0)), (3, None), (4, Some(40.0)),
      (5, Some(50.0)), (6, Some(60.0)), (7, Some(70.0)), (8, Some(80.0)))
      .toDF("pos", "v")
    val got = df.withColumn("r5",
        Rolling.rollingMeanFullWindowOnly(col("v"), Seq(lit(1)), Seq(col("pos")), 5))
      .orderBy("pos").select("r5").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.take(7).forall(_.isEmpty))
    assert(got(7) === Some((40.0 + 50 + 60 + 70 + 80) / 5))
  }

  test("knn join: nearest grid cell by haversine, k=1") {
    val stations = Seq(("s1", 28.61, 77.21), ("s2", 19.08, 72.88))
      .toDF("station_id", "lat", "lon")
    val grid = Seq((1L, 28.6, 77.2), (2L, 19.1, 72.9), (3L, 13.08, 80.27))
      .toDF("grid_id", "glat", "glon")
    val got = KnnJoin.nearest(stations, grid, 1,
        "station_id", "lat", "lon", "grid_id", "glat", "glon")
      .select("station_id", "grid_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("s1" -> 1L, "s2" -> 2L))
  }

  test("haversine: known distance Delhi-Mumbai ~1150km") {
    val d = Seq((28.61, 77.21, 19.08, 72.88)).toDF("a", "b", "c", "d")
      .select(KnnJoin.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .as[Double].head()
    assert(d > 1100 && d < 1200, s"got $d")
  }

  test("combine planner resolves keys and applies the fallback policy") {
    import CombinePlanner._
    val specs = Seq(
      DatasetSpec("era5", Monthly),
      DatasetSpec("modis", Yearly, CopyLatestAvailableBefore),
      DatasetSpec("srtm", Static))
    val available = Map(
      "era5" -> Seq("2023-01", "2023-02"),
      "modis" -> Seq("2021", "2022"), // 2023 missing → falls back to 2022
      "srtm" -> Seq("static"))
    val plan = planMonth("2023-02", specs, available, nGrids = 100)
    assert(plan.inputs === Seq(
      ResolvedInput("era5", "2023-02"),
      ResolvedInput("modis", "2022"),
      ResolvedInput("srtm", "static")))
    assert(plan.expectedRows === 2800)
    // no fallback for strict datasets
    assertThrows[IllegalStateException] {
      planMonth("2023-03", specs, available, 100)
    }
  }

  test("stage runner: skips valid months, recomputes missing, force reruns") {
    import graft.core.{StageRef, StageStorage}
    import graft.orchestration.StageRunner
    val tmp = java.nio.file.Files.createTempDirectory("graft-runner").toString
    val storage = new StageStorage(spark, tmp)
    val runner = new StageRunner(storage)
    val ref = StageRef("combined_monthly")
    var computes = 0
    def compute(month: String) = {
      computes += 1
      Seq((1L, s"$month-01", 1.0f), (2L, s"$month-01", 2.0f))
        .toDF("grid_id", "date", "v")
    }
    val r1 = runner.runMonths(ref, Seq("2023-01", "2023-02"), _ => 2L, compute)
    assert(r1.forall(_.ran) && computes === 2)
    val r2 = runner.runMonths(ref, Seq("2023-01", "2023-02"), _ => 2L, compute)
    assert(r2.forall(!_.ran) && computes === 2) // idempotent skip
    val r3 = runner.runMonths(ref, Seq("2023-01"), _ => 2L, compute, force = true)
    assert(r3.head.ran && computes === 3)
    // row-count mismatch → treated invalid → recompute; the rewrite still
    // can't satisfy the expectation, so the post-write validation throws
    assertThrows[IllegalStateException] {
      runner.runMonths(ref, Seq("2023-01"), _ => 99L, compute)
    }
    assert(computes === 4)
  }

  test("score-weighted sample: clamped rates, determinism, monotone scale") {
    val df = (1L to 2000L).map(i => (i, (i % 100) / 100.0)).toDF("key", "score")
    val a = Sampling.scoreWeightedSample(df, "key", "score").collect().toSet
    val b = Sampling.scoreWeightedSample(df, "key", "score").collect().toSet
    assert(a === b) // deterministic selection
    // kept fraction tracks the mean clamped score (≈0.495 here)
    assert(a.size > 800 && a.size < 1200, s"kept ${a.size} of 2000")
    // score 0 rows never survive; clamp caps oversized scores at 1.0
    assert(!a.exists(_.getDouble(1) == 0.0))
    val all = Sampling.scoreWeightedSample(df, "key", "score", scale = 1000.0)
      .count()
    assert(all === 1980L) // every nonzero-score row kept at huge scale
  }

  test("salted join equals the plain join on a hot-keyed fact table") {
    // one hot key (90% of rows) + a long tail
    val big = (1L to 1000L).map(i =>
      (if (i <= 900) 7L else i % 50, i, s"payload$i"))
      .toDF("k", "seq", "payload")
    val small = (0L until 50L).map(i => (i, s"dim$i")).toDF("k", "dim")
    val plain = big.join(small, Seq("k")).orderBy("seq")
      .collect().map(_.toSeq).toSeq
    val salted = SaltedJoin.saltedEquiJoin(big, small, Seq("k"), salt = 8)
      .orderBy("seq").collect().map(_.toSeq).toSeq
    assert(salted === plain)
    // hot-key rows really spread across salt buckets (the point of it)
    val spread = big.filter(col("k") === 7L)
      .select(pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(8L)).as("s"))
      .agg(countDistinct("s")).as[Long].head()
    assert(spread >= 6L)
  }

  test("salted left join preserves unmatched rows exactly once") {
    val big = Seq((1L, "a"), (2L, "b"), (99L, "no-match")).toDF("k", "v")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val got = SaltedJoin.saltedEquiJoin(big, small, Seq("k"), salt = 4, "left")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSeq
    assert(got === Seq((1L, "a", Some("x")), (2L, "b", Some("y")),
      (99L, "no-match", None)))
  }
  test("shuffleShards: deterministic balanced permutation, salt-sensitive") {
    val docs = (0L until 500L).toDF("doc_id")
    val a = Sampling.shuffleShards(docs, "doc_id", numShards = 8, salt = "epoch1")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val b = Sampling.shuffleShards(docs, "doc_id", numShards = 8, salt = "epoch1")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.toSeq === b.toSeq) // re-run reproduces the permutation exactly
    // shards balance (avalanche hash): 500/8 = 62.5 expected per shard
    val sizes = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.size === 8)
    sizes.values.foreach(n => assert(n > 35 && n < 90, s"skewed shard: $n"))
    // ranks are dense 1..n within each shard
    a.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length))
    }
    // a different salt yields a different permutation
    val c = Sampling.shuffleShards(docs, "doc_id", numShards = 8, salt = "epoch2")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(c.toSeq !== a.toSeq)
  }

  test("topKPerGroup: best k rows per group with dense ranks and tie-break") {
    val df = Seq(
      (1L, "a", 0.9), (2L, "a", 0.7), (3L, "a", 0.7), (4L, "a", 0.1),
      (5L, "b", 0.5), (6L, "b", 0.5)
    ).toDF("id", "grp", "score")
    val got = Sampling.topKPerGroup(df, Seq("grp"),
        Seq(col("score").desc, col("id").asc), k = 2)
      .select("id", "grp", "group_rank").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    // ties (2,3) break on id: 2 ranks ahead of 3, which falls outside k=2
    assert(got.toSeq === Seq((1L, "a", 1), (2L, "a", 2),
      (5L, "b", 1), (6L, "b", 2)))
  }

  test("tokenBudgetSelect: greedy best-first fill, exact running totals") {
    // best-first order: (0.9, d2)=40, (0.9, d5)=30, (0.8, d1)=50,
    // (0.5, d3)=100 — budget 120 keeps the first three (cum 40/70/120)
    val df = Seq(
      (1L, 0.8, 50L), (2L, 0.9, 40L), (3L, 0.5, 100L), (5L, 0.9, 30L)
    ).toDF("doc_id", "q", "n_tokens")
    val got = Sampling.tokenBudgetSelect(df, "doc_id", "q", "n_tokens", 120L)
      .select("doc_id", "cum_tokens").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 120L), (2L, 40L), (5L, 70L)))
    // a budget mid-document excludes it: 119 ends after d5
    val cut = Sampling.tokenBudgetSelect(df, "doc_id", "q", "n_tokens", 119L)
      .select("doc_id").orderBy("doc_id").as[Long].collect()
    assert(cut.toSeq === Seq(2L, 5L))
  }

  test("scoreTiers: quartile buckets, map-side assignment") {
    // scores 1..8: quartile boundaries 2.75 / 4.5 / 6.25
    val df = (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("id", "score")
    val got = Sampling.scoreTiers(df, "score")
      .select("id", "tier").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq === Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1),
      (5L, 2), (6L, 2), (7L, 3), (8L, 3)))
    // custom cuts: median only → two tiers
    val two = Sampling.scoreTiers(df, "score", Seq(0.5))
      .select("id", "tier").collect().map(r => r.getInt(1))
    assert(two.count(_ === 0) === 4 && two.count(_ === 1) === 4)
  }

  test("tableProfiler: per-column rows/nulls/distinct/min/max") {
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None),
      (Some(3L), Some("a")), (None, Some("a"))
    ).toDF("k", "s")
    val got = TableProfiler.profile(df).orderBy("column_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(got.toSeq === Seq(
      ("k", 4L, 1L, 2L, "1", "3"),   // nulls excluded from distinct/min/max
      ("s", 4L, 1L, 2L, "a", "b")))
    // approx path returns the same shape (values HLL-estimated)
    val approx = TableProfiler.profile(df, exact = false)
      .orderBy("column_name").collect()
    assert(approx.map(_.getString(0)).toSeq === Seq("k", "s"))
    assert(approx.forall(_.getLong(3) >= 2L))
  }

  test("winsorize clamps to exact group percentiles, nulls pass through") {
    // an ACTUAL null row: greatest/least SKIP nulls, so an unguarded
    // clamp would silently turn it into the lo boundary
    val df = ((1 to 99).map(i => ("g", Option(i.toDouble))) :+ ("g", None))
      .toDF("g", "v")
    val rows = Winsorize.winsorize(df, Seq("g"), "v", 0.10, 0.90)
      .select("v", "v_w").collect()
    val out = rows.filter(!_.isNullAt(0))
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // percentiles of 1..99: p10 = 10.8, p90 = 89.2 (linear interpolation)
    assert(math.abs(out(5.0) - 10.8) < 1e-9)   // below → clamped up
    assert(out(50.0) === 50.0)                 // inside → untouched
    assert(math.abs(out(95.0) - 89.2) < 1e-9)  // above → clamped down
    val nullRows = rows.filter(_.isNullAt(0))
    assert(nullRows.length === 1)
    assert(nullRows.head.isNullAt(1), "null value must stay null, not clamp")
  }

  test("winsorize approx boundary pass: clamp equal on quantized scores") {
    // quantized scores in runs of 10: both percentile positions land
    // strictly INSIDE a run of identical values, so exact interpolation
    // (between two equal neighbours) and the G-K sketch's member value
    // (rank error < 1 at accuracy=10000) give the SAME boundary — the
    // documented condition under which the approx swap changes nothing
    val df = (1 to 500).map(i => ("g", ((i - 1) / 10 + 1).toDouble)).toDF("g", "v")
    def runs(approx: Boolean) =
      Winsorize.winsorize(df, Seq("g"), "v", 0.05, 0.95, approx = approx)
        .select("v", "v_w").collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).sorted.toSeq
    val exact = runs(approx = false)
    val appr = runs(approx = true)
    assert(exact.map(_._2).min === 3.0 && exact.map(_._2).max === 48.0)
    assert(appr === exact)
  }

  test("globalPercentRank equals the window percent_rank; N=1 edge is 0") {
    val df = (1 to 4000).map(i => Tuple1((i * 7919) % 100000)).toDF("k")
      .distinct().repartition(11)
    val got = Sampling.globalPercentRank(df, Seq("k"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val exp = df.withColumn("pr",
        percent_rank().over(org.apache.spark.sql.expressions.Window.orderBy("k")))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got === exp)
    val one = Sampling.globalPercentRank(Seq(Tuple1(5)).toDF("k"), Seq("k"))
      .head().getDouble(1)
    assert(one === 0.0)
  }

  test("globalPercentRank rejects null order keys loudly") {
    // null sort position is engine-defined (Spark NULLS FIRST, DuckDB
    // NULLS LAST) — a null key must abort, never silently rank
    val df = Seq(Some(1), None, Some(3)).map(Tuple1(_)).toDF("k")
    val e = intercept[Exception] {
      Sampling.globalPercentRank(df, Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("null order key")), e.toString)
  }

  test("sampleKPerGroup: k per group, layout-invariant, salt-sensitive") {
    val df = (1 to 3000).map(i => (s"g${i % 5}", i.toLong)).toDF("g", "id")
    def run(d: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.sampleKPerGroup(d, Seq("g"), "id", k = 7, salt = salt)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val a = run(df, "s1")
    assert(a.size === 35 && a.groupBy(_._1).forall(_._2.size == 7))
    assert(run(df.repartition(13), "s1") === a, "must not depend on layout")
    assert(run(df, "s2") !== a, "a different salt must draw differently")
    // short group keeps everything (exact regime)
    val short = Sampling.sampleKPerGroup(
      (1 to 3).map(i => ("g", i.toLong)).toDF("g", "id"), Seq("g"), "id", 7)
    assert(short.count() === 3)
  }

  test("prioritySample: deterministic, weight-respecting, excludes w<=0") {
    val df = (1 to 2000).map { i =>
      (i.toLong, if (i == 77) 1e9 else if (i % 13 == 0) 0.0 else 1.0)
    }.toDF("id", "w")
    val a = Sampling.prioritySample(df, "id", "w", n = 50)
      .select("id").as[Long].collect().toSet
    val b = Sampling.prioritySample(df.repartition(7), "id", "w", n = 50)
      .select("id").as[Long].collect().toSet
    assert(a === b, "selection must not depend on partitioning")
    assert(a.size === 50)
    // the one 10^9-weight row is ~certain to be sampled: its priority
    // beats a unit weight unless its uniform draw is 10^9 times larger
    assert(a.contains(77L))
    // zero-weight rows are never sampled
    assert(a.forall(_ % 13 != 0))
    // a different salt draws a different (but equally deterministic) set
    val c = Sampling.prioritySample(df, "id", "w", n = 50, salt = "epoch2")
      .select("id").as[Long].collect().toSet
    assert(c !== a)
    assert(c.contains(77L))
  }
}
