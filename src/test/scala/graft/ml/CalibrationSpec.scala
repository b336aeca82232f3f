package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CalibrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("perfectly calibrated bins: gap 0, ece 0; brier matches hand value") {
    // bin [0.2, 0.3): all p = 0.25, exactly 1 of 4 positive — calibrated
    val rows = Seq.tabulate(4)(i => (0.25, i == 0)) ++
      Seq.tabulate(2)(i => (0.5, i == 0))
    val tab = Calibration.reliabilityTable(rows.toDF("p", "y"), "p", "y")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(tab(2) === ((4L, 1L, 0.25, 0.25, 0.0)))
    assert(tab(5) === ((2L, 1L, 0.5, 0.5, 0.0)))
    val sum = Calibration.summary(rows.toDF("p", "y"), "p", "y").head()
    assert(sum.getDouble(3) === 0.0) // ece
    // brier by hand: 4 rows at 0.25 (1 pos, 3 neg) + 2 at 0.5
    val brier = (math.pow(0.75, 2) + 3 * math.pow(0.25, 2) +
      2 * math.pow(0.5, 2)) / 6.0
    // the operator publishes at 6 decimals — compare at that precision
    assert(math.abs(sum.getDouble(2) - brier) < 5e-7)
  }

  test("miscalibrated scorer: gap and ece expose it; p=1.0 joins the top bin") {
    // confident and wrong: p = 0.9, never positive
    val rows = Seq.tabulate(10)(_ => (0.9, false)) :+ ((1.0, true))
    val tab = Calibration.reliabilityTable(rows.toDF("p", "y"), "p", "y")
      .collect().map(r => r.getInt(0) -> r.getDouble(5)).toMap
    assert(tab.keySet === Set(9)) // 1.0 shares bin 9
    val sum = Calibration.summary(rows.toDF("p", "y"), "p", "y").head()
    // ece = |pos − Σp| / n = |1 − 10·0.9 − 1.0| / 11
    assert(math.abs(sum.getDouble(3) - 9.0 / 11) < 1e-6)
  }

  test("out-of-range probabilities abort loudly; nulls are excluded") {
    val bad = Seq((1.5, true)).toDF("p", "y")
    val e = intercept[Exception] {
      Calibration.summary(bad, "p", "y").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("[0, 1]")))
    val withNulls = Seq[(Option[Double], Option[Boolean])](
      (Some(0.5), Some(true)), (None, Some(false)), (Some(0.5), None))
      .toDF("p", "y")
    assert(Calibration.summary(withNulls, "p", "y").head().getLong(0) === 1L)
  }

  test("layout-invariant at the rounded precision") {
    val rows = (1 to 2000).map(i =>
      ((i * 2654435761L % 1000).toDouble / 1000.0, i % 3 == 0))
    def run(parts: Int) = Calibration
      .reliabilityTable(rows.toDF("p", "y").repartition(parts), "p", "y")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(run(1) === run(16))
  }

  test("grouped reliability equals the per-group filtered global table") {
    val rows = (1 to 900).map { i =>
      (s"g${i % 3}", (i * 2654435761L % 1000).toDouble / 1000.0, i % 4 == 0)
    }
    val df = rows.toDF("g", "p", "y").repartition(7)
    val grouped = Calibration
      .reliabilityTableByGroup(df, Seq("g"), "p", "y")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    (0 until 3).map(i => s"g$i").foreach { g =>
      val solo = Calibration.reliabilityTable(
          df.filter(org.apache.spark.sql.functions.col("g") === g), "p", "y")
        .collect().map(r => r.getInt(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
            r.getDouble(5)))).toMap
      solo.foreach { case (bin, v) => assert(grouped((g, bin)) === v, s"$g/$bin") }
    }
  }
}
