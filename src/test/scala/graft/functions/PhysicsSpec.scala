package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PhysicsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("relative humidity: saturated air → 1, dew point below temp → <1") {
    val got = Seq((20.0, 20.0), (30.0, 10.0), (25.0, -5.0))
      .toDF("t", "td")
      .select(Physics.relativeHumidity(col("t"), col("td")).as("rh"))
      .as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) > 0.25 && got(1) < 0.35) // ~0.29 by Magnus formula
    assert(got(2) < got(1))
  }

  test("relative humidity Kelvin variant matches Celsius variant") {
    val c = Seq((25.0, 15.0)).toDF("t", "td")
      .select(Physics.relativeHumidity(col("t"), col("td"))).as[Double].head()
    val k = Seq((298.15, 288.15)).toDF("t", "td")
      .select(Physics.relativeHumidityK(col("t"), col("td"))).as[Double].head()
    assert(math.abs(c - k) < 1e-9)
  }

  test("wind degree: cardinal directions") {
    // meteorological convention: direction the wind comes FROM
    val got = Seq(
      (0.0, -1.0),  // wind blowing from north (v negative = southward flow)
      (-1.0, 0.0),  // from east
      (0.0, 1.0),   // from south
      (1.0, 0.0))   // from west
      .toDF("u", "v")
      .select(Physics.windDegree(col("u"), col("v")).as("d"))
      .as[Double].collect()
    assert(got.toSeq === Seq(0.0, 90.0, 180.0, 270.0))
  }

  test("monsoon flag: months 6-9 only") {
    val got = (1 to 12).toDF("m")
      .select(Physics.monsoonSeason(col("m")).as("f")).as[Int].collect()
    assert(got.toSeq === Seq(0, 0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0))
  }
}
