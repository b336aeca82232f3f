package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType
import graft.TestSpark

class CombineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def monthly = Seq(
    (1L, "2023-01-01T00:00:00", 10.0), (1L, "2023-01-02", 11.0),
    (2L, "2023-01-01", 20.0), (2L, "2023-01-02", 21.0)
  ).toDF("grid_id", "date", "temperature")

  private def monthly2 = Seq(
    (1L, "2023-01-01", 0.5), (1L, "2023-01-02", 0.6),
    (2L, "2023-01-01", 0.7), (2L, "2023-01-02", 0.8),
    (3L, "2023-01-01", 0.9) // grid 3 missing from monthly → inner join drops
  ).toDF("grid_id", "date", "aot")

  private def static = Seq((1L, 100.0), (2L, 200.0), (3L, 300.0))
    .toDF("grid_id", "elevation")

  test("wide combine: prefixing, date normalization, key intersection, f32 cast") {
    val out = WideCombiner.combine(Seq(
      "era5" -> monthly, "merra" -> monthly2, "srtm" -> static))
    assert(out.columns.toSet === Set("grid_id", "date",
      "era5__temperature", "merra__aot", "srtm__elevation"))
    // inner join on (grid_id, date): grid 3 dropped; static joined on grid only
    assert(out.count() === 4)
    // ISO timestamp suffix sliced off
    assert(out.select("date").as[String].collect().forall(_.length === 10))
    // all value columns are float32
    val types = out.schema.fields.filter(f => f.name.contains("__")).map(_.dataType)
    assert(types.forall(_ === FloatType))
    val r = out.filter(col("grid_id") === 1 && col("date") === "2023-01-01").head()
    assert(r.getAs[Float]("era5__temperature") === 10.0f)
    assert(r.getAs[Float]("srtm__elevation") === 100.0f)
  }

  // ref: combiners/archive/combiner__test.py::test__combine__no_files__raises_error
  test("combine with no tables raises") {
    assertThrows[IllegalArgumentException] { WideCombiner.combine(Seq.empty) }
  }

  // ref: combiner__test.py::test__combine__no_matching_merge__empty_dataset —
  // disjoint key spaces merge to an EMPTY frame that still carries the
  // full combined schema (downstream scaffold/recombine rely on it).
  test("combine with no matching keys yields empty frame with full schema") {
    val p1 = Seq((1L, "2023-01-01", 10.0), (2L, "2023-01-02", 20.0), (3L, "2023-01-03", 30.0))
      .toDF("grid_id", "date", "col_1")
    val p2 = Seq((4L, 40.0), (5L, 50.0), (6L, 60.0)).toDF("grid_id", "col_2")
    val out = WideCombiner.combine(Seq("partial_1" -> p1, "partial_2" -> p2))
    assert(out.columns.toSet ===
      Set("grid_id", "date", "partial_1__col_1", "partial_2__col_2"))
    assert(out.count() === 0)
  }

  // ref: combiner__test.py::test__combine__with_date_and_time_for_one —
  // hourly ISO timestamps collapse to the day and join against the
  // day-keyed side, one output row per hourly input row.
  test("hourly timestamps collapse to dates and join on the day") {
    val withTime = Seq(
      (1L, "2023-01-01T00:00:00", 10.0), (1L, "2023-01-01T01:00:00", 11.0),
      (1L, "2023-01-01T02:00:00", 12.0)).toDF("grid_id", "date", "col_1")
    val withoutTime = Seq((1L, "2023-01-01", 40.0), (1L, "2023-01-02", 41.0),
      (1L, "2023-01-03", 42.0)).toDF("grid_id", "date", "col_2")
    val out = WideCombiner.combine(Seq(
      "with_time" -> withTime, "without_time" -> withoutTime))
    val rows = out.orderBy("with_time__col_1").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getAs[String]("date") === "2023-01-01"))
    assert(rows.forall(_.getAs[Float]("without_time__col_2") === 40.0f))
    assert(rows.map(_.getAs[Float]("with_time__col_1")).toSeq ===
      Seq(10.0f, 11.0f, 12.0f))
  }

  test("recombine: full outer with key coalescing and overwrite") {
    val a = Seq((1L, "2023-01-01", 1.0f, 5.0f), (2L, "2023-01-01", 2.0f, 6.0f))
      .toDF("grid_id", "date", "x", "keepme")
    val b = Seq((2L, "2023-01-01", 20.0f), (3L, "2023-01-01", 30.0f))
      .toDF("grid_id", "date", "x")
    val out = Recombiner.recombine(Seq(a, b), overwriteColumns = true)
      .orderBy("grid_id")
    assert(out.columns.toSet === Set("grid_id", "date", "x", "keepme"))
    val rows = out.collect()
    assert(rows.length === 3) // full outer keeps grid 1, 2, 3
    // grid 2: x overwritten by b
    assert(rows(1).getAs[Float]("x") === 20.0f)
    // grid 3: from b only; keys coalesced, keepme null
    assert(rows(2).getLong(0) === 3L && rows(2).isNullAt(rows(2).fieldIndex("keepme")))
    // grid 1: x dropped from a (overwrite) → null, keepme intact
    assert(rows(0).isNullAt(rows(0).fieldIndex("x")))
    assert(rows(0).getAs[Float]("keepme") === 5.0f)
  }

  test("recombine overwrite chains left-to-right across three frames") {
    val a = Seq((1L, "2023-01-01", 1.0f), (2L, "2023-01-01", 2.0f))
      .toDF("grid_id", "date", "x")
    val b = Seq((2L, "2023-01-01", 20.0f)).toDF("grid_id", "date", "x")
    val c = Seq((2L, "2023-01-01", 200.0f), (4L, "2023-01-01", 400.0f))
      .toDF("grid_id", "date", "x")
    val rows = Recombiner.recombine(Seq(a, b, c), overwriteColumns = true)
      .orderBy("grid_id").collect()
    assert(rows.length === 3) // grids 1, 2, 4
    // grid 1: x only in a, dropped by the overwrite of b then c → null
    assert(rows(0).isNullAt(rows(0).fieldIndex("x")))
    // grid 2: the LAST frame wins the overwrite chain
    assert(rows(1).getAs[Float]("x") === 200.0f)
    // grid 4: appears only in c, keys coalesced through the outer joins
    assert(rows(2).getLong(0) === 4L && rows(2).getAs[Float]("x") === 400.0f)
  }

  test("recombine without overwrite rejects clashing columns") {
    val a = Seq((1L, "2023-01-01", 1.0f)).toDF("grid_id", "date", "x")
    val b = Seq((1L, "2023-01-01", 2.0f)).toDF("grid_id", "date", "x")
    assertThrows[IllegalArgumentException] {
      Recombiner.recombine(Seq(a, b), overwriteColumns = false)
    }
  }

  test("scaffold completion: full (grid × dates) coverage with null gaps") {
    val grid = Seq(1L, 2L, 3L).toDF("grid_id")
    val data = Seq((1L, "2023-02-01", 1.0)).toDF("grid_id", "date", "v")
    val out = Scaffold.completeForMonth(data, grid, "2023-02")
    assert(out.count() === 3 * 28)
    assert(out.filter(col("v").isNotNull).count() === 1)
    // exactly one row per (grid_id, date)
    assert(out.select("grid_id", "date").distinct().count() === 3 * 28)
  }

  test("prefixColumns is one projection at production width (no quadratic analysis)") {
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val wide = spark.range(10).select(
      (col("id").as("grid_id") +:
        (0 until 120).map(i => (col("id") * i).as(s"c$i"))): _*)
    val baseProjects = wide.queryExecution.analyzed.collect { case p: Project => p }.length
    val prefixed = WideCombiner.prefixColumns(wide, "ds")
    val got = prefixed.queryExecution.analyzed.collect { case p: Project => p }.length
    // a withColumnRenamed fold would add one Project PER COLUMN (120);
    // the single-select rewrite adds exactly one
    assert(got === baseProjects + 1)
    assert(prefixed.columns.count(_.startsWith("ds__")) === 120)
    assert(prefixed.columns.contains("grid_id"))
  }
}
