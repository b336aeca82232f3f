package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physics-derived column expressions from the reference's feature
  * generation (src/pm25ml/feature_generation/generate.py:12-69). All are
  * pure `Column` compositions — codegen'd by Catalyst, no UDFs.
  */
object Physics {
  /** Magnus-formula constants (ref: generate.py:12-14). */
  val MagnusA = 17.625
  val MagnusB = 234.04

  /** Relative humidity from temperature and dew point in °C
    * (ref: generate.py:47-53): exp(a·Td/(b+Td) − a·T/(b+T)).
    */
  def relativeHumidity(tempC: Column, dewC: Column): Column =
    exp(lit(MagnusA) * dewC / (lit(MagnusB) + dewC) -
        lit(MagnusA) * tempC / (lit(MagnusB) + tempC))

  /** Same, from Kelvin inputs as stored by ERA5 (ref: generate.py:47-49). */
  def relativeHumidityK(tempK: Column, dewK: Column): Column =
    relativeHumidity(tempK - 273.15, dewK - 273.15)

  /** Meteorological wind direction in degrees from u/v components
    * (ref: generate.py:55-63): (atan2(−u, −v)·180/π + 360) % 360.
    */
  def windDegree(u: Column, v: Column): Column =
    pmod(atan2(-u, -v) * 180.0 / math.Pi + 360.0, lit(360.0))

  /** Cyclic day-of-year encoding (ref: generate.py:139). */
  def cosDayOfYear(dayOfYear: Column): Column =
    cos(dayOfYear * 2.0 * math.Pi / 365.0)

  /** Monsoon-season indicator: month ∈ {6,7,8,9} (ref: generate.py:15,65-69). */
  def monsoonSeason(monthOfYear: Column): Column =
    when(monthOfYear.isin(6, 7, 8, 9), 1).otherwise(0)
}
