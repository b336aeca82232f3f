package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gee csv adapter: rename, coerce, drop extras, reject all-null") {
    val raw = Seq(
      ("1", "2023-01-01T00:00:00", "1.5", "x", "junk"),
      ("2", "2023-01-02", "oops", "y", "junk"))
      .toDF("grid_id", "date", "CO_mean", "rogue", "rogue2")
    val out = GeeCsvAdapter.normalize(raw, Map("CO_mean" -> "co"))
    assert(out.columns.toSet === Set("grid_id", "date", "co"))
    val rows = out.orderBy("grid_id").collect()
    assert(rows(0).getLong(0) === 1L)
    assert(rows(0).getString(1) === "2023-01-01") // ISO suffix sliced
    assert(rows(0).getFloat(2) === 1.5f)
    assert(rows(1).isNullAt(2)) // non-strict coercion: "oops" → null

    val allNull = Seq(("1", "2023-01-01", "bad"), ("2", "2023-01-02", "worse"))
      .toDF("grid_id", "date", "v")
    assertThrows[GeeCsvAdapter.AllNullColumn] {
      GeeCsvAdapter.normalize(allNull, Map("v" -> "v")).collect()
    }

    // id columns are validated too (reference checks value ∪ id columns):
    // a grid_id column that entirely fails the int64 cast must error here
    val badIds = Seq(("not-an-id", "2023-01-01", "1.0"),
        ("also-bad", "2023-01-02", "2.0"))
      .toDF("grid_id", "date", "v")
    val ex = intercept[GeeCsvAdapter.AllNullColumn] {
      GeeCsvAdapter.normalize(badIds, Map("v" -> "v")).collect()
    }
    assert(ex.column === "grid_id")
  }

  // ref: gee_export_pipeline__test.py::test_GeeExportPipeline_upload_missingColumns
  test("gee csv adapter rejects missing expected columns") {
    val raw = Seq(("1", "2023-01-01", "1.0")).toDF("grid_id", "date", "col1")
    val ex = intercept[GeeCsvAdapter.MissingColumns] {
      GeeCsvAdapter.normalize(raw, Map("col1" -> "a", "col2" -> "b", "col0" -> "c"))
    }
    assert(ex.columns === Seq("col0", "col2")) // sorted, col1 present
  }

  // ref: gee_export_pipeline__test.py::
  //   test_GeeExportPipeline_process_tableFillingWithNullValues and
  //   test_GeeExportPipeline_process_tableSortingByDateAndGridId_outOfOrder
  test("gee csv adapter scaffolds the full date×grid index and sorts") {
    val raw = Seq(
      ("2", "2025-06-01T00:00:00", "2.0"), // out of order on purpose
      ("1", "2025-06-02T00:00:00", "1.5"),
      ("1", "2025-06-01T00:00:00", "1.0"))
      .toDF("grid_id", "date", "val_mean")
    val dates = Seq("2025-06-01T00:00:00", "2025-06-02T00:00:00",
      "2025-06-03T00:00:00", "2025-06-04T00:00:00")
    val out = GeeCsvAdapter.normalize(raw, Map("val_mean" -> "v"), dates)
    val rows = out.collect()
    // full index: 4 dates × 2 observed grids
    assert(rows.length === 8)
    // artifact is sorted (date, grid_id) — reference's preferred order
    val keys = rows.map(r => (r.getAs[String]("date"), r.getAs[Long]("grid_id")))
    assert(keys.toSeq === keys.toSeq.sorted)
    // observed cells keep values, scaffolded cells are null
    val byKey = rows.map(r =>
      (r.getAs[String]("date"), r.getAs[Long]("grid_id")) ->
        Option(r.getAs[Float]("v")).filterNot(_ => r.isNullAt(r.fieldIndex("v")))).toMap
    assert(byKey(("2025-06-01", 1L)) === Some(1.0f))
    assert(byKey(("2025-06-01", 2L)) === Some(2.0f))
    assert(byKey(("2025-06-03", 1L)) === None)
    assert(byKey(("2025-06-04", 2L)) === None)
  }

  // ref: collectors/pm25/data_source.py:41-78 — per-month URL construction
  // and pl.scan_csv([urls]) over the monthly API responses.
  test("pm25 source: month URL builder and multi-url csv fetch") {
    val urls = Pm25Source.measurementUrls("https://api.example.org",
      Seq("2023-01", "2023-02", "2024-02"))
    assert(urls.head === "https://api.example.org/v1/measurements?format=csv" +
      "&process_id=station_day_mad&date_from=2023-01-01&date_to=2023-01-31" +
      "&source=cpcb&pollutant=pm25")
    // inclusive month end, leap year honored
    assert(urls(1).contains("date_from=2023-02-01&date_to=2023-02-28"))
    assert(urls(2).contains("date_from=2024-02-01&date_to=2024-02-29"))

    // fetch: two "monthly responses" as file:// urls, shared header
    val dir = java.nio.file.Files.createTempDirectory("pm25csv")
    java.nio.file.Files.write(dir.resolve("m1.csv"),
      "location_id,value\ns1,10.5\ns2,20.0\n".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("m2.csv"),
      "location_id,value\ns1,11.0\n".getBytes("UTF-8"))
    val df = Pm25Source.fetchCsv(spark,
      Seq(s"file://$dir/m1.csv", s"file://$dir/m2.csv"))
    assert(df.columns.toSeq === Seq("location_id", "value"))
    assert(df.count() === 3) // second file's header dropped, not a data row
    assert(df.filter(col("location_id") === "s1").count() === 2)

    // header is found by content, not position: an EMPTY first response
    // (a month with no measurements) must not promote month 2's first
    // data row to header
    java.nio.file.Files.write(dir.resolve("empty.csv"), Array.empty[Byte])
    val df2 = Pm25Source.fetchCsv(spark,
      Seq(s"file://$dir/empty.csv", s"file://$dir/m1.csv"))
    assert(df2.columns.toSeq === Seq("location_id", "value"))
    assert(df2.count() === 2)

    // quoted fields containing newlines stay one record through the union
    java.nio.file.Files.write(dir.resolve("m3.csv"),
      "location_id,value\n\"s3\nannex\",7.5\n".getBytes("UTF-8"))
    val df3 = Pm25Source.fetchCsv(spark,
      Seq(s"file://$dir/m1.csv", s"file://$dir/m3.csv"))
    assert(df3.count() === 3)
    assert(df3.filter(col("location_id") === "s3\nannex").count() === 1)

    // disagreeing month schemas fail loudly instead of misparsing
    java.nio.file.Files.write(dir.resolve("bad.csv"),
      "station,reading\ns1,1.0\n".getBytes("UTF-8"))
    assertThrows[Exception] {
      Pm25Source.fetchCsv(spark, Seq(s"file://$dir/m1.csv", s"file://$dir/bad.csv"))
    }
  }

  test("csvRecords splits quote-aware and trims CRLF") {
    assert(Pm25Source.csvRecords("a,b\r\n1,2\r\n") === Vector("a,b", "1,2"))
    assert(Pm25Source.csvRecords("a,b\n\"x\ny\",2\n") ===
      Vector("a,b", "\"x\ny\",2"))
    // escaped quotes ("") don't flip record-splitting parity
    assert(Pm25Source.csvRecords("a\n\"he said \"\"hi\"\"\",1\n") ===
      Vector("a", "\"he said \"\"hi\"\"\",1"))
    assert(Pm25Source.csvRecords("") === Vector.empty)
  }

  test("pm25 chain: coordinates parse, stats, filters, knn, daily means") {
    val stations = Seq(
      ("s1", "{'longitude': 77.2, 'latitude': 28.6}"),
      ("s2", "{'longitude': 72.9, 'latitude': 19.1}"))
      .toDF("id", "coordinates")
    val grid = Seq((1L, 28.61, 77.21), (2L, 19.08, 72.88), (3L, 13.0, 80.2))
      .toDF("grid_id", "lat", "lon")

    val sg = Pm25Source.attachNearestGrid(stations, grid)
    val byStation = sg.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStation === Map("s1" -> 1L, "s2" -> 2L))

    // measurements: a spike above 15×IQR at s1; a varied series at s2
    // (note: reference semantics value > 15·IQR means a zero-IQR station
    // drops every positive measurement — s2 needs spread to survive)
    val meas = ((1 to 10).map(d => ("s1", f"2023-01-$d%02d", d * 7.0 % 13 + 10)) :+
      (("s1", "2023-01-11", 5000.0))) ++
      (1 to 5).map(d => ("s2", f"2023-01-$d%02d", 20.0 + d * 10))
    val measDf = meas.toDF("location_id", "date", "value")
    val stats = Pm25Source.stationStats(measDf)
    assert(stats.columns.toSet ===
      Set("location_id", "station_q1", "station_q3", "station_iqr"))
    // nearest-rank quantiles: s2 values {30..70} → q1=40, q3=60, iqr=20
    val s2stats = stats.filter(col("location_id") === "s2").head()
    assert(s2stats.getAs[Double]("station_q1") === 40.0)
    assert(s2stats.getAs[Double]("station_q3") === 60.0)
    val filtered = Pm25Source.applyQualityFilters(measDf, stats)
    assert(filtered.filter(col("value") === 5000.0).isEmpty) // spike dropped
    assert(filtered.filter(col("location_id") === "s2").count() === 5)

    val daily = Pm25Source.dailyGridMeans(filtered, sg)
    assert(daily.columns.toSet === Set("grid_id", "date", "pm25"))
    assert(daily.filter(col("grid_id") === 2 && col("date") === "2023-01-03")
      .select("pm25").as[Double].head() === 50.0)
  }

  test("approx quantile scale path agrees with exact under its accuracy") {
    // 3 groups × 1000 samples each, shuffled values; accuracy 10000 ≫ n
    // so the GK sketch buffers every point and the switch is lossless
    // up to rank convention (± 1 rank of the nearest-rank exact answer)
    val df = (0 until 3000).map(i => (i % 3, ((i * 7919) % 1000).toDouble))
      .toDF("g", "value")
    val rows = df.groupBy("g").agg(
        Pm25Source.quantileNearest("value", 0.25).as("exact"),
        Pm25Source.quantileApprox("value", 0.25).as("approx"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 1.0,
        s"group ${r.getInt(0)}: exact=${r.getDouble(1)} approx=${r.getDouble(2)}")
    }
  }

  test("jsonl corpus: explicit schema, corrupt capture, gzip transparency") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val good1 = """{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}"""
    val good2 = """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7}"""
    val partial = """{"doc_id": 3, "text": "no lang field"}"""
    val corrupt = """{"doc_id": 4, "text": "unterminated"""
    Files.write(Paths.get(s"$dir/shard-0.jsonl"),
      s"$good1\n$corrupt\n".getBytes("UTF-8"))
    // second shard gzip'd — must read transparently in the same pass
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/shard-1.jsonl.gz"))
    gz.write(s"$good2\n$partial\n".getBytes("UTF-8")); gz.close()

    val (valid, bad) = JsonlCorpus.readSplit(spark, dir)
    val rows = valid.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // missing fields are null, not corrupt
    assert(rows(2).isNullAt(rows(2).fieldIndex("lang")))
    val badLines = bad.collect().map(_.getAs[String](JsonlCorpus.CorruptCol))
    assert(badLines.length === 1 && badLines.head.startsWith("""{"doc_id": 4"""))
  }
}
