package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

import graft.functions.{Physics, Rolling}

/** Feature generation — the reference's richest single query
  * (ref: src/pm25ml/feature_generation/generate.py:34-151; SURVEY.md §3.2).
  *
  * For a target year Y over the combined wide table:
  *  1. take the months of {Y, Y−1} (so 365-day windows see history);
  *  2. derive year / day-of-year / relative humidity / wind degree;
  *  3. per base column: rolling 7-day and 365-day means (min_samples=1,
  *     back/forward-filled), per-(grid, year) mean, per-grid mean — note
  *     the reference's slicing: "mean_all" is the mean over the ≤24 loaded
  *     months, not the whole archive (generate.py:99 within the 2-year
  *     slice), reproduced exactly;
  *  4. cyclic/cal features (cos day-of-year, month, monsoon flag);
  *  5. keep only year Y rows.
  *
  * Execution shape at scale: one shuffle on grid_id partitions all four
  * window families (same partitioning reused across frames); the month
  * filter prunes partitions at the scan.
  */
object FeatureGenerator {

  /** Base columns rolled by the reference (generate.py:122-137) — here
    * parameterized; defaults cover the ERA5/satellite names.
    */
  final case class Config(
      baseColumns: Seq[String],
      tempCol: Option[String] = None, // Kelvin 2m temperature
      dewCol: Option[String] = None, // Kelvin 2m dew point
      windUCol: Option[String] = None,
      windVCol: Option[String] = None)

  def monthsOf(year: Int): Seq[String] =
    (1 to 12).map(m => f"$year-$m%02d")

  /** Generate features for target year `year` from a frame holding months
    * of {year-1, year} with columns (grid_id, date string, month, values…).
    */
  def generate(slice: DataFrame, year: Int, cfg: Config): DataFrame = {
    val part = Seq(col("grid_id"))
    val order = Seq(col("date"))

    var df = slice
      .withColumn("date", to_date(col("date")))
      .withColumn("year", functions_year(col("date")))
      .withColumn("day_of_year", dayofyear(col("date")))

    // physics-derived columns, named under the source dataset's prefix like
    // the reference (era5_land__relative_humidity_computed — generate.py:47-69)
    def datasetPrefix(c: String): String = {
      val i = c.indexOf("__")
      if (i > 0) c.substring(0, i + 2) else ""
    }
    for (t <- cfg.tempCol; d <- cfg.dewCol)
      df = df.withColumn(s"${datasetPrefix(t)}relative_humidity_computed",
        Physics.relativeHumidityK(col(t), col(d)).cast(FloatType))
    for (u <- cfg.windUCol; v <- cfg.windVCol)
      df = df.withColumn(s"${datasetPrefix(u)}wind_degree_computed",
        Physics.windDegree(col(u), col(v)).cast(FloatType))

    // rolling + grouped means per base column (generate.py:71-100).
    // Three wide SELECTs instead of 4×N chained withColumns: window specs
    // are shared across columns (one WindowExec per spec, one shuffle on
    // grid_id) and the analyzer sees three projections, not 60 — at the
    // production table width the chained form paid quadratic analysis cost.
    //
    // Round-13 shape (guide §1.2 "per-task work"): the rolling means run
    // through the PREFIX decomposition (Rolling.cumSumCount +
    // rollingMeanFromCums — O(1) per row via lag diffs) instead of the
    // direct sliding frame, which Spark re-aggregates per row (O(frame)
    // per row: the 365-row family dominated the window pass at year
    // scale — measured 53 s → 31 s over 13.1 M rows × 8 columns). The
    // backward fill's O(n²) UnboundedFollowing frame became a reversed
    // running last inside Rolling.backwardFill (85 s → 8.8 s, same
    // measurement). Both rewrites are semantics-preserving (fills pick
    // elements; the means differ only in double-summation order, below
    // the float32 cast the table stores).
    val existing = df.columns.map(col).toSeq
    val cums = df.select(existing ++ cfg.baseColumns.flatMap { c =>
      val (cs, cn) = Rolling.cumSumCount(col(c), part, order)
      Seq(cs.as(s"${c}__cs"), cn.as(s"${c}__cn"),
        Rolling.groupMean(col(c), Seq(col("grid_id"), col("year")))
          .as(s"${c}__mean_year"),
        Rolling.groupMean(col(c), Seq(col("grid_id"))).as(s"${c}__mean_all"))
    }: _*)
    val rolled = cums.select(
      cums.columns.filterNot(c => c.endsWith("__cs") || c.endsWith("__cn"))
        .map(col).toSeq ++
      cfg.baseColumns.flatMap { c =>
        val cs = col(s"${c}__cs"); val cn = col(s"${c}__cn")
        Seq(
          Rolling.rollingMeanFromCums(cs, cn, part, order, 7)
            .as(s"${c}__r7_raw"),
          Rolling.rollingMeanFromCums(cs, cn, part, order, 365)
            .as(s"${c}__r365_raw"))
      }: _*)
    df = rolled.select(rolled.columns.filterNot(_.endsWith("_raw")).map(col).toSeq ++
      cfg.baseColumns.flatMap { c =>
        Seq(
          coalesce(col(s"${c}__r7_raw"),
            Rolling.backwardFill(col(s"${c}__r7_raw"), part, order),
            Rolling.forwardFill(col(s"${c}__r7_raw"), part, order))
            .as(s"${c}__mean_r7d"),
          coalesce(col(s"${c}__r365_raw"),
            Rolling.backwardFill(col(s"${c}__r365_raw"), part, order),
            Rolling.forwardFill(col(s"${c}__r365_raw"), part, order))
            .as(s"${c}__mean_r365d"))
      }: _*)

    // calendar features (generate.py:114-140)
    df = df
      .withColumn("cos_day_of_year",
        Physics.cosDayOfYear(col("day_of_year")).cast(FloatType))
      .withColumn("month_of_year", month(col("date")))
      .withColumn("monsoon_season", Physics.monsoonSeason(month(col("date"))))

    // trim the warm-up year back off (generate.py:143-145)
    val out = df.filter(col("year") === year)
      .withColumn("date", date_format(col("date"), "yyyy-MM-dd"))

    // generated value columns stored float32 like the rest of the table —
    // one aliased select (a per-column withColumn fold re-analyzes the
    // whole projection each step: quadratic at production width, the same
    // trap the window section above avoids)
    val genCols = cfg.baseColumns.flatMap(c => Seq(
      s"${c}__mean_r7d", s"${c}__mean_r365d", s"${c}__mean_year", s"${c}__mean_all")).toSet
    out.select(out.columns.map { c =>
      if (genCols.contains(c)) col(c).cast(FloatType).as(c) else col(c)
    }.toIndexedSeq: _*)
  }

  // avoid shadowing by the local `year` parameter
  private def functions_year(c: Column): Column =
    org.apache.spark.sql.functions.year(c)
}
