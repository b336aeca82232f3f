package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TimeWeightedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def twa(rows: Seq[(String, Long, Long)]) =
    TimeWeighted.stepTwa(
        rows.toDF("k", "us", "v")
          .withColumn("ts", timestamp_micros(col("us"))),
        Seq("k"), Seq("ts"), "ts", "v")
      .orderBy("k")
      .select("k", "n", "span_us", "twa")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq

  test("golden: step function holds each value until the next sample") {
    // v=10 for 3 us, v=20 for 1 us → TWA = (30 + 20) / 4 = 12.5
    val out = twa(Seq(("a", 0L, 10L), ("a", 3L, 20L), ("a", 4L, 0L)))
    assert(out === Seq(("a", 3L, 4L, Some(12.5))))
  }

  test("uneven sampling does not overweight dense bursts (the AVG bug)") {
    // ten rapid-fire 100s in one µs each, then one 0 held for 1000 µs:
    // plain AVG ≈ 90.9, TWA ≈ 99 only over the burst + near-0 after
    val rows = (0L until 10L).map(i => ("a", i, 100L)) :+
      ("a", 10L, 0L) :+ ("a", 1010L, 0L)
    val out = twa(rows)
    // mass = 10 µs · 100 + 1000 µs · 0 = 1000 over span 1010
    assert(out === Seq(("a", 12L, 1010L, Some(1000.0 / 1010.0))))
  }

  test("single observation: no span, NULL average") {
    val out = twa(Seq(("solo", 5L, 42L)))
    assert(out === Seq(("solo", 1L, 0L, None)))
  }

  test("keys are independent") {
    val out = twa(Seq(
      ("a", 0L, 10L), ("a", 2L, 30L),
      ("b", 0L, 1L), ("b", 10L, 1L)))
    assert(out === Seq(
      ("a", 2L, 2L, Some(10.0)),
      ("b", 2L, 10L, Some(1.0))))
  }

  test("fractional values abort with quantize guidance") {
    val df = Seq(("a", 1L, 1.5), ("a", 2L, 2.5)).toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val ex = intercept[Exception] {
      TimeWeighted.stepTwa(df, Seq("k"), Seq("ts"), "ts", "v").collect()
    }
    assert(ex.getMessage.contains("quantize"))
  }
}
