package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TemporalCvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (1 to 300).map { i =>
    (i.toLong, f"2024-${1 + (i % 10) / 4}%02d-${1 + i % 28}%02d")
  }.toDF("id", "day")

  test("no fold sees the future: max train day < min test day") {
    val folds = TemporalCv.rollingOriginFolds(df, "day", k = 4)
    val summary = folds.groupBy("fold", "role")
      .agg(max("day").as("mx"), min("day").as("mn"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getString(2), r.getString(3))).toMap
    (1 to 4).foreach { f =>
      assert(summary((f, "train"))._1 < summary((f, "test"))._2,
        s"fold $f leaks: train max ${summary((f, "train"))._1} !< " +
          s"test min ${summary((f, "test"))._2}")
    }
  }

  test("train windows grow with the fold; every fold tests a fresh slice") {
    val folds = TemporalCv.rollingOriginFolds(df, "day", k = 4)
    val trainCounts = folds.filter(col("role") === "train")
      .groupBy("fold").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((1 to 3).forall(f => trainCounts(f) < trainCounts(f + 1)))
    val testDays = folds.filter(col("role") === "test")
      .select("fold", "day").distinct().collect()
      .map(r => r.getInt(0) -> r.getString(1))
    // a day tested in fold f never re-tests in another fold
    assert(testDays.groupBy(_._2).values.forall(_.map(_._1).distinct.size == 1))
  }
}
