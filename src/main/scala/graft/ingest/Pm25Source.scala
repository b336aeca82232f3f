package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.KnnJoin

/** The ground-measurement ingest chain
  * (ref: src/pm25ml/collectors/pm25/data_source.py and pm25_pipeline.py):
  * station metadata with python-dict coordinate strings, per-station
  * robust statistics, quality-filter markers, nearest-grid attachment,
  * and the daily per-cell mean.
  */
object Pm25Source {

  /** F13 — parse `"{'longitude': 77.2, 'latitude': 28.6}"`-style coordinate
    * strings (python dict repr; ref: data_source.py:99-113) without a UDF.
    */
  def parseLongitude(c: Column): Column =
    regexp_extract(c, "'longitude'\\s*:\\s*(-?[0-9.]+)", 1).cast("double")
  def parseLatitude(c: Column): Column =
    regexp_extract(c, "'latitude'\\s*:\\s*(-?[0-9.]+)", 1).cast("double")

  /** Nearest-rank quantile (polars' default interpolation="nearest" —
    * SURVEY.md A2 requires matching it, not Spark's linear `percentile`):
    * the sample at index round(p·(n−1)), half rounding up.
    */
  def quantileNearest(valueCol: String, p: Double): Column = {
    val sorted = sort_array(collect_list(col(valueCol)))
    element_at(sorted,
      (floor(lit(p) * (size(sorted) - 1) + 0.5) + 1).cast("int"))
  }

  /** Scale path for A2 (the SURVEY §7 "quantile memory at 100 TB" hook):
    * [[quantileNearest]] buffers each group's full sample — exact, and
    * fine at the reference's per-station group sizes, but unbounded in
    * general. This variant is Spark's GK-sketch `percentile_approx`:
    * memory O(`accuracy`) per group regardless of group size, rank error
    * ≤ n/`accuracy`, and it returns an actual sample point (nearest-rank
    * flavored, like the polars semantics A2 matches). Groups smaller
    * than `accuracy` are answered from a complete buffer, so the switch
    * is lossless until groups outgrow it — IngestSpec pins that.
    */
  def quantileApprox(valueCol: String, p: Double,
                     accuracy: Int = 10000): Column =
    expr(s"percentile_approx($valueCol, $p, $accuracy)")

  /** A2/F15 — per-station quartiles + IQR (ref: data_source.py:63-78),
    * nearest interpolation for polars parity.
    */
  def stationStats(measurements: DataFrame): DataFrame =
    measurements.groupBy("location_id")
      .agg(quantileNearest("value", 0.25).as("station_q1"),
           quantileNearest("value", 0.75).as("station_q3"))
      .withColumn("station_iqr", col("station_q3") - col("station_q1"))

  /** P7/P8/W6 — the marker filter chain (ref: setup/pm25_filters.py:7-82):
    * max-value, IQR-anomaly and repeating-value (full-5-window rolling
    * mean) markers; rows marked drop are removed.
    */
  def applyQualityFilters(measurements: DataFrame, stats: DataFrame,
                          maxValue: Double = 999.99,
                          iqrFactor: Double = 15.0,
                          repeatTolerance: Double = 0.05): DataFrame = {
    val w5 = Window.partitionBy("location_id").orderBy("date")
      .rowsBetween(-4, 0)
    measurements.join(stats, Seq("location_id"))
      .withColumn("__rmean5",
        when(count(col("value")).over(w5) === 5, avg(col("value")).over(w5)))
      .withColumn("__label", lit("keep"))
      .withColumn("__label",
        when(col("value") >= maxValue, "drop").otherwise(col("__label")))
      // reference semantics: value > 15·IQR (setup/pm25_filters.py
      // AnomalyMarker), NOT the more common q3 + k·IQR fence
      .withColumn("__label",
        when(col("value") > lit(iqrFactor) * col("station_iqr"),
          "drop").otherwise(col("__label")))
      .withColumn("__label",
        when(abs(col("value") - col("__rmean5")) < repeatTolerance, "drop")
          .otherwise(col("__label")))
      .filter(col("__label") === "keep")
      .drop("__label", "__rmean5", "station_q1", "station_q3", "station_iqr")
  }

  /** J6/K3 — attach each station to its nearest grid cell (haversine k=1,
    * broadcast grid; ref: pm25_pipeline.py:166-189).
    */
  def attachNearestGrid(stations: DataFrame, grid: DataFrame): DataFrame =
    KnnJoin.nearest(
      stations.select(col("id"),
        parseLatitude(col("coordinates")).as("s_lat"),
        parseLongitude(col("coordinates")).as("s_lon")),
      grid.select(col("grid_id"), col("lat"), col("lon")),
      k = 1, "id", "s_lat", "s_lon", "grid_id", "lat", "lon")
      .select(col("id").as("location_id"), col("grid_id"), col("dist_km"))

  /** A1 — filtered measurements × station→grid map → per (grid_id, date)
    * mean named pm25 (ref: pm25_pipeline.py:64-70,100-107).
    */
  def dailyGridMeans(filtered: DataFrame, stationGrid: DataFrame): DataFrame =
    filtered.join(stationGrid, Seq("location_id"))
      .groupBy("grid_id", "date")
      .agg(avg("value").as("pm25"))

  /** S9 — one measurements-API URL per month, date range inclusive on
    * both ends (ref: data_source.py:41-58). `months` are "YYYY-MM".
    */
  def measurementUrls(baseUri: String, months: Seq[String],
                      source: String = "cpcb",
                      pollutant: String = "pm25"): Seq[String] =
    months.map { m =>
      val start = java.time.LocalDate.parse(s"$m-01")
      val end = start.plusMonths(1).minusDays(1)
      s"$baseUri/v1/measurements?format=csv&process_id=station_day_mad" +
        s"&date_from=$start&date_to=$end&source=$source&pollutant=$pollutant"
    }

  /** Split a CSV body into complete logical records: a newline only ends
    * a record when the running count of quote characters is even, so
    * quoted fields containing newlines stay inside one record (RFC 4180
    * quoting, `""` escapes included — an escaped quote flips the parity
    * twice, a no-op). Trailing `\r` of CRLF records is trimmed.
    */
  private[ingest] def csvRecords(body: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder
    var quotes = 0
    var i = 0
    def flush(): Unit = {
      val len = if (cur.length > 0 && cur.charAt(cur.length - 1) == '\r')
        cur.length - 1 else cur.length
      val rec = cur.substring(0, len)
      if (rec.nonEmpty) out += rec
      cur.setLength(0)
    }
    while (i < body.length) {
      val ch = body.charAt(i)
      if (ch == '"') { quotes += 1; cur.append(ch) }
      else if (ch == '\n' && quotes % 2 == 0) flush()
      else cur.append(ch)
      i += 1
    }
    flush()
    out.result()
  }

  /** S9 — `pl.scan_csv([urls])` equivalent: every URL is fetched in its
    * own executor task (http(s)/file via `java.net.URL`), record streams
    * union into one `Dataset[String]`, and Spark's CSV reader parses with
    * the shared header — multi-file CSV semantics over sources
    * `spark.read.csv` cannot address directly.
    *
    * The header is detected by CONTENT, not position: each non-empty
    * URL's first record is its header; all observed headers must agree
    * (mismatched month schemas fail loudly instead of promoting a data
    * row to header), and empty responses contribute nothing — an empty
    * FIRST response does not lose the header. Records are split
    * quote-aware ([[csvRecords]]), so quoted fields containing newlines
    * survive the union. Fetched bodies are persisted so the header pass
    * and the parse pass hit each URL once; only the tiny per-URL header
    * set is collected, a month-URL is one task, matching the reference's
    * per-month files.
    */
  def fetchCsv(spark: org.apache.spark.sql.SparkSession,
               urls: Seq[String]): DataFrame = {
    import spark.implicits._
    require(urls.nonEmpty, "no urls to fetch")
    val tagged = spark.sparkContext
      .parallelize(urls.zipWithIndex, urls.size)
      .flatMap { case (u, idx) =>
        val in = new java.net.URL(u).openStream()
        val body =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        csvRecords(body).zipWithIndex.map { case (rec, rn) =>
          (idx, rn == 0, rec)
        }
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val headers = tagged.filter(_._2).map(t => (t._1, t._3)).collect().sortBy(_._1)
      require(headers.nonEmpty, s"all ${urls.size} fetched urls were empty")
      val distinct = headers.map(_._2).distinct
      require(distinct.length == 1,
        s"fetched urls disagree on CSV header: ${distinct.mkString(" | ")}")
      val records = spark.createDataset(
        spark.sparkContext.parallelize(Seq(distinct.head), 1)
          .union(tagged.filter(!_._2).map(_._3)))
      // parse eagerly while the fetched bodies are still persisted
      val parsed = spark.read.option("header", "true").csv(records)
      parsed.cache().count()
      parsed
    } finally tagged.unpersist()
  }
}
