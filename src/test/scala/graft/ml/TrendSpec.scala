package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TrendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("perfect line: slope, intercept exact, r2 = 1") {
    val df = (1L to 50L).map(x => ("g", x, 3 * x + 2)).toDF("g", "x", "y")
    val out = Trend.groupedOls(df, Seq("g"), "x", "y")
      .select("n", "slope", "intercept", "r2")
      .as[(Long, Double, Double, Double)].head()
    assert(out._1 === 50L)
    assert(math.abs(out._2 - 3.0) < 1e-12)
    assert(math.abs(out._3 - 2.0) < 1e-9)
    assert(math.abs(out._4 - 1.0) < 1e-12)
  }

  test("matches a local exact least-squares on pseudo-random integers") {
    val pts = (1 to 300).map { i =>
      val x = (i * 31L) % 97
      val y = (i * 2654435761L) % 1000
      (x, y)
    }
    val out = Trend.groupedOls(pts.map(p => ("g", p._1, p._2)).toDF("g", "x", "y"),
        Seq("g"), "x", "y")
      .select("slope", "intercept").as[(Double, Double)].head()
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(math.abs(out._1 - slope) < 1e-9)
    assert(math.abs(out._2 - icept) < 1e-9)
  }

  test("zero x-variance group reports NULL slope/intercept/r2") {
    val df = Seq(("g", 5L, 1L), ("g", 5L, 9L)).toDF("g", "x", "y")
    val r = Trend.groupedOls(df, Seq("g"), "x", "y")
      .select("slope", "intercept", "r2").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("zero y-variance group: slope 0, r2 NULL (0/0 undefined)") {
    val df = Seq(("g", 1L, 7L), ("g", 2L, 7L), ("g", 3L, 7L)).toDF("g", "x", "y")
    val r = Trend.groupedOls(df, Seq("g"), "x", "y")
      .select("slope", "r2").head()
    assert(r.getDouble(0) === 0.0)
    assert(r.isNullAt(1))
  }

  test("groups are independent; null rows excluded") {
    val df = Seq(
      ("a", Some(1L), Some(10L)), ("a", Some(2L), Some(20L)),
      ("a", None, Some(5L)), ("a", Some(9L), None),
      ("b", Some(1L), Some(5L)), ("b", Some(2L), Some(3L)))
      .toDF("g", "x", "y")
    val out = Trend.groupedOls(df, Seq("g"), "x", "y")
      .orderBy("g").select("g", "n", "slope")
      .as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(("a", 2L, 10.0), ("b", 2L, -2.0)))
  }

  test("fractional input aborts with quantize guidance") {
    val df = Seq(("g", 1.5, 2.0)).toDF("g", "x", "y")
    val ex = intercept[Exception] {
      Trend.groupedOls(df, Seq("g"), "x", "y").collect()
    }
    assert(ex.getMessage.contains("quantize"))
  }
}
