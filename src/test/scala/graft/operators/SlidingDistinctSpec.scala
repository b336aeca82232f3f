package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SlidingDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val P = 6

  private def events(rows: Seq[(String, Long)]) =
    rows.toDF("d", "v")
      .select(to_timestamp(col("d")).as("ts"), col("v"))

  test("windowDays = 1 degenerates to the per-day sketch estimate") {
    val df = events(Seq(
      ("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-02", 2L), ("2024-01-02", 3L)))
    val rolling = SlidingDistinct.rollingDistinct(df, "ts", "v", P, 1)
      .select(col("day").cast("string"), col("s_mass"))
      .as[(String, Long)].collect().toMap
    val perDay = HllSketch.sketch(
        df.withColumn("__day", to_date(col("ts"))), "v", P,
        groupCols = Seq("__day"))
      .estimate()
      .select(col("__day").cast("string"), col("s_mass"))
      .as[(String, Long)].collect().toMap
    assert(rolling === perDay)
  }

  test("a 3-day window merges exactly the trailing days' registers") {
    val df = events(Seq(
      ("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L),
      ("2024-01-05", 4L)))
    val rolled = SlidingDistinct.rollingDistinct(df, "ts", "v", P, 3)
    // window ending 01-03 covers days 1..3: its registers must equal a
    // batch sketch built over exactly those rows
    val got = rolled.filter(col("day") === "2024-01-03")
      .select("s_mass").as[Long].head()
    val batch = HllSketch.sketch(
        df.filter(to_date(col("ts")) <= "2024-01-03"), "v", P)
      .estimate().select("s_mass").as[Long].head()
    assert(got === batch)
    // window ending 01-05 covers only 01-03 (out of range) + 01-05:
    // days 03,04,05 → values {3, 4}
    val got5 = rolled.filter(col("day") === "2024-01-05")
      .select("s_mass").as[Long].head()
    val batch5 = HllSketch.sketch(
        df.filter(to_date(col("ts")) >= "2024-01-03"), "v", P)
      .estimate().select("s_mass").as[Long].head()
    assert(got5 === batch5)
  }

  test("grouped rolling distinct equals per-group filtered ungrouped runs") {
    val df = Seq(
      ("a", "2024-01-01", 1L), ("a", "2024-01-02", 2L),
      ("a", "2024-01-04", 1L), ("b", "2024-01-01", 9L),
      ("b", "2024-01-03", 8L), ("b", "2024-01-03", 9L))
      .toDF("g", "d", "v")
      .select(col("g"), to_timestamp(col("d")).as("ts"), col("v"))
    val grouped = SlidingDistinct.rollingDistinct(df, "ts", "v", P, 3,
        groupCols = Seq("g"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(4)))
      .toSet
    val single = Seq("a", "b").flatMap { g =>
      SlidingDistinct.rollingDistinct(df.filter(col("g") === g),
          "ts", "v", P, 3)
        .collect().map(r => (g, r.getDate(0).toString, r.getLong(3)))
    }.toSet
    assert(grouped === single)
    // each group's windows anchor to ITS OWN observed days
    assert(grouped.map(t => (t._1, t._2)) === Set(
      ("a", "2024-01-01"), ("a", "2024-01-02"), ("a", "2024-01-04"),
      ("b", "2024-01-01"), ("b", "2024-01-03")))
  }

  test("only observed days emit rows — no phantom horizon windows") {
    val df = events(Seq(("2024-01-01", 1L), ("2024-01-09", 2L)))
    val days = SlidingDistinct.rollingDistinct(df, "ts", "v", P, 7)
      .select(col("day").cast("string")).as[String].collect().sorted
    assert(days.toSeq === Seq("2024-01-01", "2024-01-09"))
  }

  test("estimates are accurate at realistic cardinalities") {
    val df = events((0 until 2000).map(i =>
      (f"2024-01-${1 + i % 10}%02d", i.toLong)))
    val out = SlidingDistinct.rollingDistinct(df, "ts", "v", 10, 10)
      .filter(col("day") === "2024-01-10")
      .select("est").as[Double].head()
    // all 2000 distinct values in the window; 1.04/sqrt(1024) ≈ 3.3%
    assert(math.abs(out - 2000.0) / 2000.0 < 0.12, s"est=$out")
  }
}
