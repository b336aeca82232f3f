package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical distributions give exactly zero PSI") {
    val df = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val psi = Drift.psi(df, df, "v", nBuckets = 10, lo = 0, hi = 100)
      .agg(sum("contrib")).head().getDouble(0)
    assert(psi === 0.0)
  }

  test("a shifted distribution crosses the action threshold") {
    val ref = (1 to 2000).map(i => (i % 50).toDouble).toDF("v")
    val cur = (1 to 2000).map(i => (50 + i % 50).toDouble).toDF("v")
    val psi = Drift.psi(ref, cur, "v", nBuckets = 10, lo = 0, hi = 100)
      .agg(sum("contrib")).head().getDouble(0)
    assert(psi > 0.25, s"disjoint supports must alarm, got $psi")
  }

  test("out-of-range values clamp to edge buckets; empty buckets smooth") {
    val ref = Seq(-5.0, 0.0, 99.0, 200.0).toDF("v")
    val rows = Drift.psi(ref, ref, "v", nBuckets = 4, lo = 0, hi = 100)
      .orderBy("bucket").collect()
    assert(rows.length === 4)
    // -5 clamps into bucket 0, 200 into bucket 3; middle buckets empty
    assert(rows(0).getAs[Double]("p_ref") === 0.5)
    assert(rows(3).getAs[Double]("p_ref") === 0.5)
    assert(rows(1).getAs[Double]("p_ref") === 0.0)
    // smoothing keeps every contribution finite
    assert(rows.forall(r => !r.getAs[Double]("contrib").isNaN &&
      !r.getAs[Double]("contrib").isInfinite))
  }
}
