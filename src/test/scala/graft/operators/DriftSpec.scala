package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical distributions give exactly zero PSI") {
    val df = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val psi = Drift.psi(df, df, "v", nBuckets = 10, lo = 0, hi = 100)
      .agg(sum("contrib")).head().getDouble(0)
    assert(psi === 0.0)
  }

  test("a shifted distribution crosses the action threshold") {
    val ref = (1 to 2000).map(i => (i % 50).toDouble).toDF("v")
    val cur = (1 to 2000).map(i => (50 + i % 50).toDouble).toDF("v")
    val psi = Drift.psi(ref, cur, "v", nBuckets = 10, lo = 0, hi = 100)
      .agg(sum("contrib")).head().getDouble(0)
    assert(psi > 0.25, s"disjoint supports must alarm, got $psi")
  }

  test("out-of-range values clamp to edge buckets; empty buckets smooth") {
    val ref = Seq(-5.0, 0.0, 99.0, 200.0).toDF("v")
    val rows = Drift.psi(ref, ref, "v", nBuckets = 4, lo = 0, hi = 100)
      .orderBy("bucket").collect()
    assert(rows.length === 4)
    // -5 clamps into bucket 0, 200 into bucket 3; middle buckets empty
    assert(rows(0).getAs[Double]("p_ref") === 0.5)
    assert(rows(3).getAs[Double]("p_ref") === 0.5)
    assert(rows(1).getAs[Double]("p_ref") === 0.0)
    // smoothing keeps every contribution finite
    assert(rows.forall(r => !r.getAs[Double]("contrib").isNaN &&
      !r.getAs[Double]("contrib").isInfinite))
  }

  test("KS gap matches a hand computation and is 0 on identical frames") {
    import spark.implicits._
    // ref: 1,1,2,3 — cur: 1,3,3,3  →  CDFs at v=1: .5 vs .25 (gap .25),
    // v=2: .75 vs .25 (gap .5), v=3: 1 vs 1 (gap 0) → KS = 0.5
    val ref = Seq(1L, 1L, 2L, 3L).toDF("v")
    val cur = Seq(1L, 3L, 3L, 3L).toDF("v")
    val rows = Drift.ksTable(ref, cur, "v").orderBy("v").collect()
    assert(rows.map(_.getAs[Double]("gap")).toSeq === Seq(0.25, 0.5, 0.0))
    val ks = Drift.ksTable(ref, cur, "v").agg(max(col("gap"))).head().getDouble(0)
    assert(ks === 0.5)
    val same = Drift.ksTable(ref, ref, "v")
      .agg(max(col("gap"))).head().getDouble(0)
    assert(same === 0.0)
  }

  test("KS: a value present on one side only still carries both CDFs") {
    import spark.implicits._
    val ref = Seq(1L, 2L).toDF("v")
    val cur = Seq(3L).toDF("v")
    val byV = Drift.ksTable(ref, cur, "v").collect()
      .map(r => r.getAs[Long]("v") ->
        (r.getAs[Double]("cdf_ref"), r.getAs[Double]("cdf_cur"))).toMap
    assert(byV(2L) === ((1.0, 0.0))) // all of ref seen, none of cur
    assert(byV(3L) === ((1.0, 1.0)))
  }

  test("grouped KS equals per-group filtered ungrouped KS tables") {
    import spark.implicits._
    val ref = Seq(("a", 1L), ("a", 2L), ("b", 5L), ("b", 5L), ("b", 9L))
      .toDF("g", "v")
    val cur = Seq(("a", 2L), ("a", 2L), ("b", 5L), ("b", 9L)).toDF("g", "v")
    val grouped = Drift.ksTable(ref, cur, "v", groupCols = Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Double]("cdf_ref"), r.getAs[Double]("cdf_cur"))).toMap
    for (g <- Seq("a", "b")) {
      val solo = Drift.ksTable(ref.where(col("g") === g),
          cur.where(col("g") === g), "v")
        .collect().map(r => r.getLong(0) ->
          (r.getAs[Double]("cdf_ref"), r.getAs[Double]("cdf_cur"))).toMap
      solo.foreach { case (v, cdfs) => assert(grouped((g, v)) === cdfs, s"$g/$v") }
    }
  }

  test("KS: an empty side yields null CDFs, not an ANSI divide error") {
    import spark.implicits._
    val ref = Seq(1L).toDF("v")
    val cur = ref.where(col("v") < 0)
    val row = Drift.ksTable(ref, cur, "v").head()
    assert(row.isNullAt(row.fieldIndex("cdf_cur")))
    assert(row.getAs[Double]("cdf_ref") === 1.0)
  }

  test("embedding drift: identical corpora are zero-shift; a planted dim-0 shift shows up") {
    import spark.implicits._
    val ref = (1 to 40).map(i =>
      (i.toLong, Array(1.0f, 0.5f + (i % 5) * 0.01f, -0.25f)))
      .toDF("vec_id", "embedding")
    val same = Drift.embeddingShift(ref, ref).head()
    assert(same.getInt(0) === 3)
    assert(same.getAs[Double]("centroid_cos") === 1.0)
    assert(same.getAs[Double]("shift_l2") === 0.0)
    // shift dimension 0 by +2 in the current snapshot
    val cur = ref.select(col("vec_id"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        (x, i) => org.apache.spark.sql.functions.when(i === 0, x + 2.0f)
          .otherwise(x)).as("embedding"))
    val means = Drift.embeddingMeans(ref, cur)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(math.abs(means(0) - 2.0) < 1e-6)
    assert(means(1) === 0.0 && means(2) === 0.0)
    val shifted = Drift.embeddingShift(ref, cur).head()
    assert(math.abs(shifted.getAs[Double]("shift_l2") - 2.0) < 1e-6)
    assert(shifted.getAs[Double]("centroid_cos") < 1.0)
  }

  // ------------------------------------------------------- rolling PSI

  private def tsRows(rows: Seq[(String, Double)]) =
    rows.toDF("d", "v").select(to_timestamp(col("d")).as("ts"), col("v"))

  test("rolling PSI: each window's rows equal a direct two-frame psi over that slice") {
    val cur = tsRows(Seq(
      ("2024-01-01", 5.0), ("2024-01-01", 15.0), ("2024-01-02", 25.0),
      ("2024-01-03", 5.0), ("2024-01-03", 35.0), ("2024-01-05", 45.0),
      ("2024-01-05", 5.0)))
    val ref = Seq(5.0, 15.0, 25.0, 35.0).toDF("v")
    val got = Drift.rollingPsi(cur, "ts", "v", ref, nBuckets = 5,
        lo = 0.0, hi = 50.0, windowDays = 3)
      .select(col("day").cast("string"), col("bucket"), col("p_ref"),
        col("p_cur"), col("contrib"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r =>
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet)
      .toMap
    // observed days only — 01-04 never emits
    assert(got.keySet === Set("2024-01-01", "2024-01-02", "2024-01-03",
      "2024-01-05"))
    for ((day, lastDay) <- Seq("2024-01-02" -> 2, "2024-01-03" -> 3,
                               "2024-01-05" -> 5)) {
      val slice = cur.filter(
        to_date(col("ts")) >= s"2024-01-0${math.max(1, lastDay - 2)}" &&
          to_date(col("ts")) <= s"2024-01-0$lastDay")
      val direct = Drift.psi(ref, slice, "v", nBuckets = 5,
          lo = 0.0, hi = 50.0)
        .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3))).toSet
      assert(got(day) === direct, s"window ending $day")
    }
  }

  test("rolling PSI summary: bucket-ordered fold of 6dp contribs, threshold statuses") {
    val cur = tsRows(Seq(
      ("2024-01-01", 5.0), ("2024-01-01", 15.0), ("2024-01-02", 25.0),
      ("2024-01-03", 45.0), ("2024-01-03", 45.0), ("2024-01-03", 45.0)))
    val ref = Seq(5.0, 15.0, 25.0, 35.0).toDF("v")
    val got = Drift.rollingPsiSummary(cur, "ts", "v", ref, nBuckets = 5,
        lo = 0.0, hi = 50.0, windowDays = 2)
      .collect()
      .map(r => r.getDate(0).toString -> ((r.getDouble(1), r.getString(2))))
      .toMap
    // expected = the per-bucket table's rounded contribs, folded in
    // bucket order
    val table = Drift.rollingPsi(cur, "ts", "v", ref, nBuckets = 5,
        lo = 0.0, hi = 50.0, windowDays = 2)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getDouble(4)))
      .groupBy(_._1)
    got.foreach { case (day, (psi, status)) =>
      val want = table(day).sortBy(_._2).map(t =>
        BigDecimal(t._3).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble).foldLeft(0.0)(_ + _)
      assert(psi === want, s"day $day")
      val wantStatus =
        if (psi < 0.1) "stable" else if (psi < 0.25) "watch" else "action"
      assert(status === wantStatus)
    }
    // the heavy 01-03 shift (all mass in the top bucket, absent from
    // ref) must page
    assert(got("2024-01-03")._2 === "action")
    assert(got.size === 3)
  }

  test("stacked rolling PSI equals per-feature rollingPsi with a feature tag") {
    val cur = Seq(
      ("2024-01-01", 5.0, 100.0), ("2024-01-01", 15.0, 300.0),
      ("2024-01-02", 25.0, 700.0), ("2024-01-03", 35.0, 100.0),
      ("2024-01-05", 45.0, 900.0))
      .toDF("d", "a", "b")
      .select(to_timestamp(col("d")).as("ts"), col("a"), col("b"))
    val ref = Seq((5.0, 100.0), (25.0, 500.0), (45.0, 900.0)).toDF("a", "b")
    val stacked = Drift.rollingPsiStacked(cur, "ts",
        features = Map("a" -> ((0.0, 50.0)), "b" -> ((0.0, 1000.0))),
        nBuckets = 5, ref = ref, windowDays = 3)
      .collect().map(r => (r.getString(1), r.getDate(0).toString, r.getInt(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val single = Seq(("a", 0.0, 50.0), ("b", 0.0, 1000.0)).flatMap {
      case (f, lo, hi) =>
        Drift.rollingPsi(cur, "ts", f, ref, nBuckets = 5, lo = lo, hi = hi,
            windowDays = 3)
          .collect().map(r => (f, r.getDate(0).toString, r.getInt(1),
            r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    }.toSet
    assert(stacked === single)
    assert(stacked.nonEmpty)
  }

  test("stacked rolling PSI: per-feature NULL days anchor each feature's own windows") {
    // feature b is NULL on 01-02 and 01-05: those days are observed for
    // a only — b must NOT emit rows there (its single-feature run
    // wouldn't), and days where ONLY b has data must not leak into a.
    val cur = Seq(
      ("2024-01-01", Some(5.0), Some(100.0)),
      ("2024-01-02", Some(25.0), None),
      ("2024-01-03", None, Some(700.0)),
      ("2024-01-05", Some(45.0), None),
      ("2024-01-06", None, Some(900.0)))
      .toDF("d", "a", "b")
      .select(to_timestamp(col("d")).as("ts"), col("a"), col("b"))
    val ref = Seq((5.0, 100.0), (25.0, 500.0), (45.0, 900.0)).toDF("a", "b")
    val stacked = Drift.rollingPsiStacked(cur, "ts",
        features = Map("a" -> ((0.0, 50.0)), "b" -> ((0.0, 1000.0))),
        nBuckets = 5, ref = ref, windowDays = 3)
      .collect().map(r => (r.getString(1), r.getDate(0).toString, r.getInt(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val single = Seq(("a", 0.0, 50.0), ("b", 0.0, 1000.0)).flatMap {
      case (f, lo, hi) =>
        Drift.rollingPsi(cur, "ts", f, ref, nBuckets = 5, lo = lo, hi = hi,
            windowDays = 3)
          .collect().map(r => (f, r.getDate(0).toString, r.getInt(1),
            r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    }.toSet
    assert(stacked === single)
    // b emits nothing on 01-02/01-05; a emits nothing on 01-06 (window
    // 01-04..01-06 holds only b data) — spot-check the day sets
    val daysOf = stacked.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    assert(daysOf("a") === Set("2024-01-01", "2024-01-02", "2024-01-05"))
    assert(daysOf("b") === Set("2024-01-01", "2024-01-03", "2024-01-06"))
  }

  test("categorical rolling PSI: ref categories + __other__, hand-checked shares") {
    val cur = Seq(
      ("2024-01-01", "a"), ("2024-01-01", "a"), ("2024-01-01", "b"),
      ("2024-01-02", "a"), ("2024-01-02", "c"))
      .toDF("d", "cat").select(to_timestamp(col("d")).as("ts"), col("cat"))
    val ref = Seq("a", "a", "b", "b").toDF("cat")
    val rows = Drift.rollingPsiCat(cur, "ts", "cat", ref, windowDays = 2)
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // grid = observed days × (ref cats ∪ __other__)
    assert(rows.keySet.map(_._2) === Set("a", "b", "__other__"))
    assert(rows.keySet.map(_._1) === Set("2024-01-01", "2024-01-02"))
    // day 1: window = {a:2, b:1}, tot 3
    assert(rows(("2024-01-01", "a"))._1 === 0.5) // p_ref
    assert(math.abs(rows(("2024-01-01", "a"))._2 - 2.0 / 3) < 1e-15)
    assert(rows(("2024-01-01", "__other__"))._2 === 0.0)
    // day 2: window = {a:3, b:1, c→other:1}, tot 5
    assert(rows(("2024-01-02", "a"))._2 === 0.6)
    assert(rows(("2024-01-02", "__other__"))._2 === 0.2)
    assert(rows(("2024-01-02", "__other__"))._1 === 0.0)
    // chi2 of a planted cell: obs 3, exp = 0.5 * 5
    assert(math.abs(rows(("2024-01-02", "a"))._4 -
      (3.0 - 2.5) * (3.0 - 2.5) / 2.5) < 1e-12)
    // per-day current shares always total 1 (the __other__ bucket keeps
    // novel categories in the denominator)
    Seq("2024-01-01", "2024-01-02").foreach { d =>
      val s = rows.collect { case ((`d`, _), v) => v._2 }.sum
      assert(math.abs(s - 1.0) < 1e-12, s"day $d shares sum to $s")
    }
  }

  test("categorical rolling PSI: the cardinality cap aborts eagerly") {
    val cur = tsRows(Seq(("2024-01-01", 1.0)))
      .select(col("ts"), col("v").cast("string").as("cat"))
    val ref = (1 to 100).map(_.toString).toDF("cat")
    val ex = intercept[IllegalArgumentException] {
      Drift.rollingPsiCat(cur, "ts", "cat", ref, windowDays = 2,
        maxCategories = 10)
    }
    assert(ex.getMessage.contains("exceed maxCategories"))
    val ex2 = intercept[IllegalArgumentException] {
      Drift.rollingPsiCat(cur, "ts", "cat",
        Seq("a", "__other__").toDF("cat"), windowDays = 2)
    }
    assert(ex2.getMessage.contains("reserved"))
  }

  test("rolling KS: per-day max gap equals the two-frame ksTable statistic") {
    val cur = tsRows(Seq(
      ("2024-01-01", 1.0), ("2024-01-01", 3.0), ("2024-01-02", 5.0),
      ("2024-01-03", 3.0), ("2024-01-03", 9.0), ("2024-01-05", 7.0)))
      .select(col("ts"), col("v").cast("long").as("v"))
    val ref = Seq(1L, 3L, 5L, 7L).toDF("v")
    val rolled = Drift.rollingKs(cur, "ts", "v", ref, windowDays = 3)
    val maxGaps = rolled.groupBy("day").agg(max("gap").as("g"))
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    assert(maxGaps.keySet === Set("2024-01-01", "2024-01-02", "2024-01-03",
      "2024-01-05"))
    for ((day, lastDay) <- Seq("2024-01-01" -> 1, "2024-01-03" -> 3,
                               "2024-01-05" -> 5)) {
      val slice = cur.filter(
        to_date(col("ts")) >= s"2024-01-0${math.max(1, lastDay - 2)}" &&
          to_date(col("ts")) <= s"2024-01-0$lastDay")
      val direct = Drift.ksTable(ref, slice, "v")
        .agg(max("gap")).head().getDouble(0)
      assert(math.abs(maxGaps(day) - direct) < 1e-15, s"day $day")
    }
    // CDFs are right-continuous step functions over the global support
    val row = rolled.filter(col("day") === "2024-01-01" && col("v") === 9L)
      .head()
    assert(row.getAs[Double]("cdf_ref") === 1.0)
    assert(row.getAs[Double]("cdf_cur") === 1.0)
  }

  test("rolling KS: empty reference aborts eagerly") {
    val cur = tsRows(Seq(("2024-01-01", 1.0)))
      .select(col("ts"), col("v").cast("long").as("v"))
    val ex = intercept[IllegalArgumentException] {
      Drift.rollingKs(cur, "ts", "v",
        spark.emptyDataFrame.withColumn("v", lit(null).cast("long")),
        windowDays = 3)
    }
    assert(ex.getMessage.contains("empty reference"))
  }

  test("grouped drift report equals the per-group union (shared ref)") {
    // three sources with DIFFERENT observed-day sets and value/category
    // mixes; the reference is one pinned global slice. Grouped leaves
    // must thread the key through days/totals/grids/window partitions,
    // so the grouped report is row-identical to filtering per group.
    val rows = Seq(
      ("a", "2024-01-01", 5.0, "x"), ("a", "2024-01-01", 45.0, "y"),
      ("a", "2024-01-03", 25.0, "x"), ("b", "2024-01-02", 15.0, "z"),
      ("b", "2024-01-02", 35.0, "x"), ("b", "2024-01-05", 5.0, "y"),
      ("c", "2024-01-04", 48.0, "w"), ("c", "2024-01-04", 2.0, "x"))
    val df = rows.toDF("src", "d", "v", "cat")
      .select(col("src"), to_timestamp(col("d")).as("ts"), col("v"),
        col("cat"), floor(col("v")).cast("long").as("kv"))
    val ref = df.filter(col("cat") =!= "w")
    def page(d: org.apache.spark.sql.DataFrame, groups: Seq[String]) =
      Drift.driftReport(d, "ts", "v", "cat", "kv", ref,
        nBuckets = 5, lo = 0.0, hi = 50.0, windowDays = 3,
        groupCols = groups)
    val grouped = page(df, Seq("src"))
      .select(col("src"), col("day").cast("string"), col("metric"),
        col("value"), col("status"))
      .collect().toSet
    val union = Seq("a", "b", "c").flatMap { g =>
      page(df.filter(col("src") === g), Nil)
        .select(lit(g).as("src"), col("day").cast("string"), col("metric"),
          col("value"), col("status"))
        .collect()
    }.toSet
    assert(grouped === union)
    assert(grouped.nonEmpty)
  }

  test("grouped rolling KS support stays per group") {
    // value 100 is observed ONLY by group b; group a's rows must not
    // gain a support point for it (per-group support = own ∪ ref)
    val df = Seq(
      ("a", "2024-01-01", 1L), ("a", "2024-01-01", 2L),
      ("b", "2024-01-01", 100L))
      .toDF("src", "d", "v")
      .select(col("src"), to_timestamp(col("d")).as("ts"), col("v"))
    val ref = Seq(1L, 2L).toDF("v")
    val got = Drift.rollingKs(df, "ts", "v", ref, windowDays = 2,
        groupCols = Seq("src"))
      .select(col("src"), col("v")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 1L), ("a", 2L),
      ("b", 1L), ("b", 2L), ("b", 100L)))
  }

  test("rolling PSI: NULL timestamps abort loudly") {
    val cur = Seq((null: String, 5.0), ("2024-01-01", 6.0)).toDF("d", "v")
      .select(to_timestamp(col("d")).as("ts"), col("v"))
    val ex = intercept[Exception] {
      Drift.rollingPsi(cur, "ts", "v", Seq(1.0).toDF("v"),
        nBuckets = 5, lo = 0.0, hi = 50.0, windowDays = 3).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("NULL ts")))
  }
}
