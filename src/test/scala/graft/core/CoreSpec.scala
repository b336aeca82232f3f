package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hive path parse/render round trip") {
    val p = HivePath.parse("gs://bucket/country=india/dataset=era5/month=2023-01/data.parquet")
    assert(p.metadata === Map("country" -> "india", "dataset" -> "era5", "month" -> "2023-01"))
    assert(p.path === "country=india/dataset=era5/month=2023-01")
    assert(p.child("k", "v").get("k") === Some("v"))
  }

  test("temporal config: month list spans year boundary") {
    val tc = TemporalConfig.ofMonths("2022-11", "2023-02")
    assert(tc.months === Seq("2022-11", "2022-12", "2023-01", "2023-02"))
    assert(tc.years === Seq(2022, 2023))
    assert(tc.daysInMonth("2023-02") === 28)
  }

  test("contracts: expected rows from path metadata; violations reported") {
    import Contracts._
    assert(expectedRowsFor(HivePath.parse("dataset=x/month=2023-02"), 10) === 280)
    assert(expectedRowsFor(HivePath.parse("dataset=x/type=static"), 10) === 10)

    val cfg = PipelineConfig("era5", Set("grid_id", "date"),
      Map("temperature" -> FloatValue), expectedRows = 4)
    val good = Seq((1L, "2023-01-01", 1.0f)).toDF("grid_id", "date", "temperature")
    assert(validate(good, cfg, actualRows = 4).isEmpty)
    assert(validate(good, cfg, actualRows = 3).exists(_.msg.startsWith("rows")))
    val badType = Seq((1, "2023-01-01", 1.0f)).toDF("grid_id", "date", "temperature")
    assert(validate(badType, cfg, 4).exists(_.msg.contains("grid_id")))
    val extra = good.withColumn("rogue", lit(1))
    assert(validate(extra, cfg, 4).exists(_.msg.contains("unexpected")))
  }

  test("stage storage: write/read/exists/rowCount/months round trip") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-storage").toString
    val st = new StageStorage(spark, tmp)
    val ref = StageRef("combined_monthly")
    val df = Seq((1L, "2023-01-01", 1.0f), (2L, "2023-01-01", 2.0f))
      .toDF("grid_id", "date", "v")
    st.writeMonth(df, ref, "2023-01")
    assert(st.exists(ref, "2023-01"))
    assert(!st.exists(ref, "2023-02"))
    assert(st.rowCount(ref, "2023-01") === 2L)
    assert(st.readMonth(ref, "2023-01").count() === 2L)
    st.writeMonth(df, ref, "2023-02")
    assert(st.months(ref) === Seq("2023-01", "2023-02"))
    // sub-artifact naming
    assert(StageRef("sampled", Some("aod")).name === "sampled+aod")
    // hive scan carries the month partition column and prunes on it
    val scan = st.scanStage(ref)
    assert(scan.columns.contains("month"))
    val pruned = scan.filter(col("month") === "2023-01")
    assert(pruned.count() === 2L)
    // the month predicate must reach the scan as a PartitionFilter (pruning
    // at the source), not a post-scan Filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("month"), s"month not pruned at source:\n$plan")
  }
}
