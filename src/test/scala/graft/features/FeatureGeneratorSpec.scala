package graft.features

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class FeatureGeneratorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // two grids × all days of 2022-12 + 2023-01; value = day-of-month for
  // grid 1, constant 10 for grid 2; one null hole
  private def slice = {
    val rows = for {
      gid <- Seq(1L, 2L)
      (ym, days) <- Seq(("2022-12", 31), ("2023-01", 31))
      d <- 1 to days
    } yield {
      val date = f"$ym-$d%02d"
      val v: Option[Double] =
        if (gid == 1L && date == "2023-01-03") None
        else if (gid == 1L) Some(d.toDouble)
        else Some(10.0)
      (gid, date, ym, v)
    }
    rows.toDF("grid_id", "date", "month", "v")
  }

  test("rolling 7d mean sees prior-month history and skips nulls") {
    val out = FeatureGenerator.generate(slice, 2023,
      FeatureGenerator.Config(baseColumns = Seq("v")))
    // only year-2023 rows survive
    assert(out.select(min("date")).as[String].head() === "2023-01-01")
    val g1 = out.filter(col("grid_id") === 1)
      .select("date", "v__mean_r7d").collect()
      .map(r => r.getString(0) -> r.getFloat(1)).toMap
    // 2023-01-01 window covers 2022-12-26..2023-01-01 → (26+27+28+29+30+31+1)/7
    assert(math.abs(g1("2023-01-01") - (26 + 27 + 28 + 29 + 30 + 31 + 1) / 7.0) < 1e-4)
    // 2023-01-05 window covers 12-30..01-05 with 01-03 null →
    // (30+31+1+2+4+5)/6 (min_samples=1 semantics: null skipped)
    assert(math.abs(g1("2023-01-05") - (30 + 31 + 1 + 2 + 4 + 5) / 6.0) < 1e-4)
  }

  test("mean_year and mean_all reproduce the reference's slice semantics") {
    val out = FeatureGenerator.generate(slice, 2023,
      FeatureGenerator.Config(baseColumns = Seq("v")))
    val r = out.filter(col("grid_id") === 1 && col("date") === "2023-01-10").head()
    // mean over year 2023 rows of grid 1: days 1..31 minus null day 3 →
    // (sum(1..31) - 3) / 30
    val meanYear = ((1 to 31).sum - 3).toDouble / 30
    assert(math.abs(r.getAs[Float]("v__mean_year") - meanYear) < 1e-4)
    // mean_all = mean over BOTH loaded months (the two-year slice!), not
    // just 2023 (ref: generate.py:99 computed pre-filter)
    val meanAll = ((1 to 31).sum + (1 to 31).sum - 3).toDouble / 61
    assert(math.abs(r.getAs[Float]("v__mean_all") - meanAll) < 1e-4)
  }

  test("calendar + physics columns") {
    val out = FeatureGenerator.generate(slice, 2023,
      FeatureGenerator.Config(baseColumns = Seq("v")))
    val r = out.filter(col("grid_id") === 2 && col("date") === "2023-01-15").head()
    assert(r.getAs[Int]("day_of_year") === 15)
    assert(r.getAs[Int]("month_of_year") === 1)
    assert(r.getAs[Int]("monsoon_season") === 0)
    assert(math.abs(r.getAs[Float]("cos_day_of_year") -
      math.cos(15 * 2 * math.Pi / 365)) < 1e-6)
  }

  test("constant series stays constant through every window family") {
    val out = FeatureGenerator.generate(slice, 2023,
      FeatureGenerator.Config(baseColumns = Seq("v")))
    val g2 = out.filter(col("grid_id") === 2)
    Seq("v__mean_r7d", "v__mean_r365d", "v__mean_year", "v__mean_all").foreach { c =>
      val vals = g2.select(c).as[Float].collect()
      assert(vals.forall(v => math.abs(v - 10.0) < 1e-5), c)
    }
  }
}
