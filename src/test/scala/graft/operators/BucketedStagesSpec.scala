package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.TestSpark

/** The SURVEY §7 scale lever: stage outputs bucketed by grid_id make the
  * N-way monthly combine plan WITHOUT shuffle exchanges.
  */
class BucketedStagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed combine: zero shuffle exchanges, same combine semantics") {
    val dirA = java.nio.file.Files.createTempDirectory("bkt_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("bkt_b").toString
    val a = Seq((1L, "2023-01-01", 10.0), (1L, "2023-01-02", 11.0),
      (2L, "2023-01-01", 20.0)).toDF("grid_id", "date", "temperature")
    val b = Seq((1L, "2023-01-01", 0.5), (1L, "2023-01-02", 0.6),
      (2L, "2023-01-01", 0.7)).toDF("grid_id", "date", "aot")
    BucketedStages.writeBucketed(a, "bkt_era5", dirA, nBuckets = 4)
    BucketedStages.writeBucketed(b, "bkt_merra", dirB, nBuckets = 4)

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge plan so co-location (not broadcast) is what
      // eliminates the exchange; AQE off so the initial plan is final
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val combined = BucketedStages.combineBucketed(spark,
        Seq("era5" -> "bkt_era5", "merra" -> "bkt_merra"))
      val plan = combined.queryExecution.executedPlan
      val shuffles = plan.collectWithSubqueries {
        case s: ShuffleExchangeExec => s
        case a: AdaptiveSparkPlanExec => a // AQE disabled — must not appear
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed combine, got:\n$plan")
      // semantics identical to the plain combine
      val rows = combined.orderBy("grid_id", "date").collect()
      assert(rows.length === 3)
      assert(rows.map(_.getAs[Float]("era5__temperature")).toSeq ===
        Seq(10.0f, 11.0f, 20.0f))
      assert(rows.map(_.getAs[Float]("merra__aot")).toSeq ===
        Seq(0.5f, 0.6f, 0.7f))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bkt_era5")
      spark.sql("DROP TABLE IF EXISTS bkt_merra")
    }
  }
}
