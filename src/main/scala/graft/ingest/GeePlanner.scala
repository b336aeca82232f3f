package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gridded feature planning — the in-engine port of the reference's GEE
  * plan-construction logic (K5).
  *
  * The reference builds server-side Earth Engine computation plans
  * (`pm25ml/collectors/gee/feature_planner.py:53-295`): daily pixel-wise
  * composites reduced to per-grid-cell means, single-image regrids, and
  * annual shares of classified pixels. The *service* is external and out
  * of scope (SURVEY §2.9), but the plan semantics — band→column mapping,
  * per-day composite + date carry, classified-pixel `remap` to boolean
  * bands, two-level mean reduction — are pure logic, re-expressed here
  * over pixel DataFrames so the same feature tables can be computed
  * in-engine from any raster already landed as rows.
  *
  * Pixel model: one row per (image) sample with `date` (for collections),
  * planar `x`/`y` sample-site coordinates, and one column per band. The
  * grid is a bounded table of axis-aligned cells (grid_id, xmin, ymin,
  * xmax, ymax) — `reduceRegions` becomes a broadcast bin-bucketed
  * containment join, so pixels (the 100 TB side) never shuffle for the
  * assignment; the only shuffles are the two genuine mean reductions.
  *
  * Semantics preserved from the reference, in order:
  *   1. composite: mean across the image stack per sample site
  *      (`Reducer.mean()` over the day's/year's images,
  *      feature_planner.py:100,253) — days with no images simply produce
  *      no rows ("may skip days", feature_planner.py:37);
  *   2. regionize: mean across sample sites per grid cell
  *      (`reduceRegions(Reducer.mean())`, feature_planner.py:121-127),
  *      with the composite date carried onto every output row
  *      (`carry_date_through`, feature_planner.py:118-119).
  * Mean-of-means is NOT mean-of-rows — both levels are explicit.
  */
object GeePlanner {

  /** The id keys a plan's export can carry (export_pipeline.py:12-13). */
  val AvailableIdKeyNames: Set[String] = Set("date", "grid_id")

  /** A planned feature computation: the frame to run, plus the
    * exported→wanted column contract the downstream adapter renames by
    * ([[GeeCsvAdapter]] consumes exactly this mapping shape).
    * Mirrors `FeaturePlan` (feature_planner.py:342-421).
    */
  final case class FeaturePlan(
      featureName: String,
      frame: DataFrame,
      columnMappings: Seq[(String, String)],
      expectedNRows: Long,
      availabilityChecker: Option[() => Boolean] = None) {
    def intermediateColumns: Seq[String] = columnMappings.map(_._1)
    def wantedColumns: Seq[String] = columnMappings.map(_._2)
    def expectedIdColumns: Set[String] =
      columnMappings.map(_._1).filter(AvailableIdKeyNames).toSet
    def expectedValueColumns: Set[String] = columnMappings
      .filterNot { case (k, _) => AvailableIdKeyNames(k) }.map(_._2).toSet
    def isDataAvailable: Boolean = availabilityChecker.forall(_())
  }

  /** Exported band-column names: a single band exports as bare "mean",
    * multiple bands as "<band>_mean" (feature_planner.py:77-79).
    */
  def exportedBandNames(bands: Seq[String]): Seq[String] =
    if (bands.length > 1) bands.map(b => s"${b}_mean") else Seq("mean")

  /** Feature-name cleaning: lowercase, spaces/slashes/underscores to
    * dashes, parts joined by "__" (feature_planner.py:311-316).
    */
  def cleanName(parts: String*): String = parts.map(
    _.replace(" ", "-").replace("/", "-").replace("_", "-").toLowerCase).mkString("__")

  /** Date-list granularity summary for feature names: the finest of
    * year/month/day shared by ALL dates, "x" if years differ
    * (feature_planner.py:318-332). Dates are ISO `yyyy-MM-dd` strings.
    */
  def commonGranularity(dates: Seq[String]): String = {
    require(dates.nonEmpty, "granularity of an empty date list")
    if (!dates.forall(_.take(4) == dates.head.take(4))) "x"
    else if (!dates.forall(_.take(7) == dates.head.take(7))) dates.head.take(4)
    else if (!dates.forall(_ == dates.head)) dates.head.take(7)
    else dates.head
  }
}

/** Planner instance bound to one grid, like the reference's
  * `GriddedFeatureCollectionPlanner(grid)` (feature_planner.py:29-50).
  *
  * @param grid bounded table of cells: grid_id, xmin, ymin, xmax, ymax
  *             (half-open [min, max) extents). Broadcast in every join —
  *             grids are thousands-to-millions of cells, never pixel-scale.
  */
final class GriddedFeatureCollectionPlanner(grid: DataFrame) {
  import GeePlanner._

  /** Cached driver-side grid count (`_get_n_grids`,
    * feature_planner.py:334-339): one count over the bounded grid table.
    */
  lazy val nGrids: Long = grid.count()

  /** Bin edge lengths for the bucketed containment join: the largest cell
    * extent, so every cell overlaps at most 4 bins. One tiny aggregate
    * over the bounded grid (the reference pays the same class of
    * driver-side probe in `nominalScale()`, feature_planner.py:298-309).
    */
  private lazy val (binW, binH) = {
    val r = grid.agg(
      max(col("xmax") - col("xmin")), max(col("ymax") - col("ymin"))).head()
    (math.max(r.getDouble(0), 1e-9), math.max(r.getDouble(1), 1e-9))
  }

  /** Assign each sample row its containing grid cell — the engine's
    * `reduceRegions` membership step. Grid cells are exploded to every
    * bin they overlap and broadcast; rows join on their single bin key
    * and filter exact containment. Equi-join on the bin key keeps the
    * broadcast hash join codegen'd (a bare bbox theta-join would plan a
    * BroadcastNestedLoopJoin — per-row scans of all cells); the big side
    * never shuffles. Rows outside every cell drop (reduceRegions
    * semantics: regions collect, they don't outer-join).
    */
  private def assignGrid(rows: DataFrame): DataFrame = {
    val cells = grid.select(col("grid_id"), col("xmin"), col("ymin"),
      col("xmax"), col("ymax"),
      explode(sequence(floor(col("xmin") / binW).cast("long"),
        floor((col("xmax") - lit(1e-12)) / binW).cast("long"))).as("bx"))
      .select(col("*"), explode(sequence(floor(col("ymin") / binH).cast("long"),
        floor((col("ymax") - lit(1e-12)) / binH).cast("long"))).as("by"))
    rows
      .withColumn("bx", floor(col("x") / binW).cast("long"))
      .withColumn("by", floor(col("y") / binH).cast("long"))
      .join(broadcast(cells), Seq("bx", "by"))
      .filter(col("x") >= col("xmin") && col("x") < col("xmax") &&
              col("y") >= col("ymin") && col("y") < col("ymax"))
      .drop("bx", "by", "xmin", "ymin", "xmax", "ymax")
  }

  private def avgAll(names: Seq[String], as: Seq[String]): Seq[Column] =
    names.zip(as).map { case (n, a) => avg(col(n)).as(a) }

  /** Daily grid averages of a collection (`plan_daily_average`,
    * feature_planner.py:53-143): per requested date, the pixel-wise mean
    * across that day's images, then the per-cell mean of those composite
    * values, with the date carried through to every output row.
    *
    * @param pixels collection samples: date (yyyy-MM-dd), x, y, bands...
    */
  def planDailyAverage(pixels: DataFrame, collectionName: String,
                       selectedBands: Seq[String],
                       dates: Seq[String]): FeaturePlan = {
    val exported = exportedBandNames(selectedBands)
    val compositeAggs = avgAll(selectedBands, selectedBands)
    val composite = pixels
      .filter(col("date").isin(dates: _*))
      .select(col("date") +: col("x") +: col("y") +:
        selectedBands.map(col): _*)
      .groupBy("date", "x", "y")
      .agg(compositeAggs.head, compositeAggs.tail: _*)
    val regionAggs = avgAll(selectedBands, exported)
    val frame = assignGrid(composite)
      .groupBy("date", "grid_id")
      .agg(regionAggs.head, regionAggs.tail: _*)
    FeaturePlan(
      featureName = cleanName("grid-daily-average", collectionName,
        commonGranularity(dates)),
      frame = frame,
      columnMappings = Seq("date" -> "date", "grid_id" -> "grid_id") ++
        exported.zip(selectedBands),
      expectedNRows = nGrids * dates.length)
  }

  /** Static single-image regrid (`plan_static_feature`,
    * feature_planner.py:145-188): per-cell mean of one image's samples.
    *
    * @param pixels one image's samples: x, y, bands...
    */
  def planStaticFeature(pixels: DataFrame, imageName: String,
                        selectedBands: Seq[String]): FeaturePlan = {
    val exported = exportedBandNames(selectedBands)
    val regionAggs = avgAll(selectedBands, exported)
    val frame = assignGrid(
      pixels.select(col("x") +: col("y") +: selectedBands.map(col): _*))
      .groupBy("grid_id")
      .agg(regionAggs.head, regionAggs.tail: _*)
    FeaturePlan(
      featureName = cleanName("single-image-grid", imageName),
      frame = frame,
      columnMappings = Seq("grid_id" -> "grid_id") ++
        exported.zip(selectedBands),
      expectedNRows = nGrids)
  }

  /** Annual classified-pixel shares
    * (`plan_summarise_annual_classified_pixels`,
    * feature_planner.py:190-295): each class list remaps to a 0/1 band
    * (`remap(class_values, [1]*n, 0)`, feature_planner.py:229-234), the
    * year's image stack averages per sample site — the share of the year
    * each site carried that class — then cells average their sites.
    * Availability mirrors `images.size() >= 1` (feature_planner.py:283),
    * deferred behind the checker exactly like the reference's.
    *
    * @param pixels collection samples: date, x, y, classificationBand
    */
  def planAnnualClassifiedPixels(pixels: DataFrame, collectionName: String,
                                 classificationBand: String,
                                 outputNamesToClassValues: Seq[(String, Seq[Int])],
                                 year: Int): FeaturePlan = {
    val names = outputNamesToClassValues.map(_._1)
    val exported = names.map(n => s"${n}_mean")
    val inYear = pixels.filter(
      col("date") >= f"$year%04d-01-01" && col("date") < f"${year + 1}%04d-01-01")
    val booleans = inYear.select(
      col("x") +: col("y") +: outputNamesToClassValues.map { case (name, classes) =>
        when(col(classificationBand).isin(classes: _*), 1.0).otherwise(0.0).as(name)
      }: _*)
    val siteAggs = avgAll(names, names)
    val perSite = booleans.groupBy("x", "y")
      .agg(siteAggs.head, siteAggs.tail: _*)
    val regionAggs = avgAll(names, exported)
    val frame = assignGrid(perSite)
      .groupBy("grid_id")
      .agg(regionAggs.head, regionAggs.tail: _*)
    FeaturePlan(
      featureName = cleanName("annual-classified-pixels", collectionName,
        year.toString),
      frame = frame,
      columnMappings = Seq("grid_id" -> "grid_id") ++ exported.zip(names),
      expectedNRows = nGrids,
      availabilityChecker = Some(() => !inYear.isEmpty))
  }
}
