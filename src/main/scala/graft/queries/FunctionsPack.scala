package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.core.Tables.table
import graft.functions.Physics

/** Scalar-function surface from SURVEY.md §2.8 over the harness tables.
  *
  * Transcendentals (exp/atan2/cos) are rounded to 4–6 decimals: JVM vs C
  * libm may differ in the last ulp, but a rounding-boundary collision needs
  * the true value within ~1 ulp of a decimal tie — negligible.
  */
object FunctionsPack extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1: Magnus relative-humidity formula (ref: feature_generation/generate.py:12-14,47-53)
    // with temperature/dew-point proxies built from lineitem columns.
    "f1_relative_humidity" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .withColumn("t_c", col("l_quantity"))
        .withColumn("td_c", col("l_quantity") - col("l_tax") * 100)
        .select(col("l_orderkey"), col("l_linenumber"),
                round(Physics.relativeHumidity(col("t_c"), col("td_c")), 6)
                  .as("rh"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // F2: wind degree from u/v components: (atan2(-u,-v)·180/π + 360) % 360
    // (ref: feature_generation/generate.py:55-63).
    "f2_wind_degree" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .withColumn("u", col("l_discount") - 0.05)
        .withColumn("v", col("l_tax") - 0.04)
        .select(col("l_orderkey"), col("l_linenumber"),
                round(Physics.windDegree(col("u"), col("v")), 4).as("wind_deg"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // F3/F4/F5: calendar decomposition + cyclic encoding + season flag
    // (ref: generate.py:114-140).
    "f3_seasonal_features" -> ((s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"),
                year(col("o_orderdate")).as("yr"),
                month(col("o_orderdate")).as("mo"),
                dayofyear(col("o_orderdate")).as("doy"),
                round(Physics.cosDayOfYear(dayofyear(col("o_orderdate"))), 6)
                  .as("cos_doy"),
                when(month(col("o_orderdate")).isin(6, 7, 8, 9), 1).otherwise(0)
                  .as("monsoon"))
        .orderBy("o_orderkey")
    }),

    // F6/F7: string date normalization — first 10 chars of a timestamp
    // rendering (ref: combiners/archive/combiner.py:115-128).
    "f6_date_slice" -> ((s, dir) => {
      table(s, dir, "events")
        .select(col("event_id"),
                substring(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), 1, 10)
                  .as("day_s"))
        .orderBy("event_id")
    }),

    // F8: calendar scaffold via sequence/explode
    // (ref: pm25_pipeline.py:144-153; ned_export_pipeline.py:228-235).
    "f8_date_range" -> ((s, dir) => {
      s.range(1).select(explode(sequence(
          to_date(lit("2024-01-01")), to_date(lit("2024-03-31")),
          expr("interval 1 day"))).as("day"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day_s"))
        .orderBy("day_s")
    }),

    // F9: NaN→null normalization before aggregation (ref: generate.py:74-99)
    // — NaN injected deterministically; Spark aggs skip null but NOT NaN, so
    // nanvl is semantically load-bearing.
    "f9_nan_normalization" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .withColumn("v",
          when(col("l_linenumber") === 3, lit(Double.NaN))
            .otherwise(col("l_quantity")))
        .withColumn("v_clean", nanvl(col("v"), lit(null).cast(DoubleType)))
        .groupBy("l_returnflag")
        .agg(sum(col("v_clean").cast("decimal(18,2)")).cast("double").as("sum_clean"),
             count(col("v_clean")).as("cnt_clean"),
             count(lit(1)).as("cnt_all"))
        .orderBy("l_returnflag")
    }),

    // F13: JSON struct parse + field access (ref: collectors/pm25/data_source.py:99-113).
    "f13_struct_parse" -> ((s, dir) => {
      table(s, dir, "events")
        .withColumn("parsed",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG")))
        .select(col("event_id"), col("parsed").getField("k").as("k"))
        .orderBy("event_id")
    }),

    // F11/F12: float narrowing casts + all-null column rejection counts
    // (ref: combiner.py:92-98; gee_export_pipeline.py:186-196).
    "f11_cast_nullcount" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .withColumn("qty_f32", col("l_quantity").cast("float"))
        .groupBy("l_returnflag")
        .agg(sum(col("qty_f32").cast("decimal(18,2)")).cast("double").as("sum_f32"),
             count(col("qty_f32")).as("non_null"))
        .orderBy("l_returnflag")
    }))

  def oracles: Map[String, String] = Map(
    "f1_relative_humidity" ->
      """SELECT l_orderkey, l_linenumber,
         ROUND(EXP(17.625 * (l_quantity - l_tax * 100) / (234.04 + (l_quantity - l_tax * 100))
                 - 17.625 * l_quantity / (234.04 + l_quantity)), 6) AS rh
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "f2_wind_degree" ->
      """SELECT l_orderkey, l_linenumber,
         ROUND(FMOD(ATAN2(-(l_discount - 0.05) + 0.0, -(l_tax - 0.04) + 0.0) * 180 / PI() + 360, 360), 4)
           AS wind_deg
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "f3_seasonal_features" ->
      """SELECT o_orderkey,
         YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mo,
         DAYOFYEAR(o_orderdate) AS doy,
         ROUND(COS(DAYOFYEAR(o_orderdate) * 2 * PI() / 365), 6) AS cos_doy,
         CASE WHEN MONTH(o_orderdate) IN (6, 7, 8, 9) THEN 1 ELSE 0 END AS monsoon
         FROM orders ORDER BY o_orderkey""",
    "f6_date_slice" ->
      """SELECT event_id, SUBSTR(STRFTIME(ts, '%Y-%m-%d %H:%M:%S'), 1, 10) AS day_s
         FROM events ORDER BY event_id""",
    "f8_date_range" ->
      """SELECT CAST(CAST(day AS DATE) AS VARCHAR) AS day_s
         FROM (SELECT UNNEST(GENERATE_SERIES(DATE '2024-01-01', DATE '2024-03-31',
                                             INTERVAL 1 DAY)) AS day)
         ORDER BY day_s""",
    "f9_nan_normalization" ->
      """WITH t AS (SELECT l_returnflag,
             CASE WHEN l_linenumber = 3 THEN CAST('NaN' AS DOUBLE)
                  ELSE l_quantity END AS v FROM lineitem),
         c AS (SELECT l_returnflag,
             CASE WHEN ISNAN(v) THEN NULL ELSE v END AS v_clean FROM t)
         SELECT l_returnflag,
           CAST(SUM(CAST(v_clean AS DECIMAL(18,2))) AS DOUBLE) AS sum_clean,
           COUNT(v_clean) AS cnt_clean, COUNT(*) AS cnt_all
         FROM c GROUP BY l_returnflag ORDER BY l_returnflag""",
    "f13_struct_parse" ->
      """SELECT event_id, CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "f11_cast_nullcount" ->
      """SELECT l_returnflag,
         CAST(SUM(CAST(CAST(l_quantity AS FLOAT) AS DECIMAL(18,2))) AS DOUBLE) AS sum_f32,
         COUNT(CAST(l_quantity AS FLOAT)) AS non_null
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
