package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RollingQuantileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val L = 10; private val D = 4; private val W = 256

  private def events(rows: Seq[(String, Long)]) =
    rows.toDF("d", "v").select(to_timestamp(col("d")).as("ts"), col("v"))

  test("windowDays = 1 degenerates to the per-day sketch quantiles") {
    val df = events(Seq(
      ("2024-01-01", 10L), ("2024-01-01", 20L), ("2024-01-01", 30L),
      ("2024-01-02", 100L), ("2024-01-02", 200L)))
    val rolling = RollingQuantile.rollingQuantiles(
        df, "ts", "v", L, D, W, windowDays = 1, qs = Seq(0.5))
      .select(col("day").cast("string"), col("q_value"))
      .as[(String, Long)].collect().toMap
    val perDay = QuantileSketch.sketch(
        df.withColumn("__day", to_date(col("ts"))), "v", L, D, W,
        groupCols = Seq("__day"))
      .quantiles(Seq(0.5))
      .select(col("__day").cast("string"), col("q_value"))
      .as[(String, Long)].collect().toMap
    assert(rolling === perDay && rolling.nonEmpty)
  }

  test("grouped rolling quantiles equal per-group filtered ungrouped runs") {
    val df = Seq(
      ("a", "2024-01-01", 10L), ("a", "2024-01-02", 20L),
      ("a", "2024-01-04", 30L), ("b", "2024-01-01", 500L),
      ("b", "2024-01-03", 600L), ("b", "2024-01-03", 700L))
      .toDF("g", "d", "v")
      .select(col("g"), to_timestamp(col("d")).as("ts"), col("v"))
    val grouped = RollingQuantile.rollingQuantiles(df, "ts", "v", L, D, W,
        windowDays = 3, qs = Seq(0.5, 0.9), groupCols = Seq("g"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getLong(3))).toSet
    val single = Seq("a", "b").flatMap { g =>
      RollingQuantile.rollingQuantiles(df.filter(col("g") === g),
          "ts", "v", L, D, W, windowDays = 3, qs = Seq(0.5, 0.9))
        .collect().map(r => (g, r.getDate(0).toString, r.getDouble(1),
          r.getLong(2)))
    }.toSet
    assert(grouped === single)
    assert(grouped.map(t => (t._1, t._2)) === Set(
      ("a", "2024-01-01"), ("a", "2024-01-02"), ("a", "2024-01-04"),
      ("b", "2024-01-01"), ("b", "2024-01-03")))
  }

  test("a window's quantiles equal a batch sketch over exactly its days") {
    val df = events(
      (1 to 3).flatMap(d => (0 until 50).map(i =>
        (f"2024-01-0$d", (d * 100 + i).toLong))) ++
        (0 until 50).map(i => ("2024-01-07", i.toLong)))
    val rolled = RollingQuantile.rollingQuantiles(
      df, "ts", "v", L, D, W, windowDays = 3, qs = Seq(0.25, 0.75))
    val got = rolled.filter(col("day") === "2024-01-03")
      .select("q", "q_value").as[(Double, Long)].collect().toMap
    val batch = QuantileSketch.sketch(
        df.filter(to_date(col("ts")) <= "2024-01-03"), "v", L, D, W)
      .quantiles(Seq(0.25, 0.75))
      .select("q", "q_value").as[(Double, Long)].collect().toMap
    assert(got === batch)
  }

  test("rolling p-values track a level shift across the window horizon") {
    // 5 days at ~100 then 5 days at ~800: once the window holds only
    // high days, the median must move to the high regime
    val df = events((1 to 10).flatMap { d =>
      val base = if (d <= 5) 100L else 800L
      (0 until 40).map(i => (f"2024-01-$d%02d", base + i % 20))
    })
    val med = RollingQuantile.rollingQuantiles(
        df, "ts", "v", L, D, W, windowDays = 3, qs = Seq(0.5))
      .select(col("day").cast("string"), col("q_value"))
      .as[(String, Long)].collect().toMap
    assert(med("2024-01-05") < 200L)
    assert(med("2024-01-10") >= 800L)
    // the boundary window (days 5-7) mixes regimes
    assert(med("2024-01-07") >= 100L)
  }
}
