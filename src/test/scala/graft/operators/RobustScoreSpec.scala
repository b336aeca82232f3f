package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RobustScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("median/MAD/z match a hand computation") {
    // group g: values 1..9 plus outlier 1000 → med = 5.5, offsets
    // |v-5.5| = 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5 → mad = 2.5
    val df = ((1 to 9).map(v => ("g", v.toLong)) :+ ("g", 1000L)).toDF("k", "v")
    val rows = RobustScore.robustZ(df, Seq("k"), "v")
      .collect().map(r => r.getAs[Long]("v") ->
        (r.getAs[Double]("v_med"), r.getAs[Double]("v_mad"),
          r.getAs[Double]("v_rz"))).toMap
    val (med, mad, _) = rows(1000L)
    assert(med === 5.5)
    assert(mad === 2.5)
    assert(math.abs(rows(1000L)._3 - (1000.0 - 5.5) / (1.4826 * 2.5)) < 1e-9)
    assert(math.abs(rows(5L)._3 - (5.0 - 5.5) / (1.4826 * 2.5)) < 1e-9)
  }

  test("zero-MAD group yields null z, not infinity") {
    val df = Seq(("c", 7L), ("c", 7L), ("c", 7L), ("c", 99L)).toDF("k", "v")
    val rows = RobustScore.robustZ(df, Seq("k"), "v").collect()
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("v_rz"))))
  }

  test("cullOutliers drops the planted outlier and keeps the body") {
    val df = ((1 to 20).map(v => ("g", v.toLong)) :+ ("g", 100000L))
      .toDF("k", "v")
    val kept = RobustScore.cullOutliers(df, Seq("k"), "v", cutoff = 3.5)
      .select("v").as[Long].collect().toSet
    assert(!kept.contains(100000L))
    assert((1 to 20).forall(v => kept.contains(v.toLong)))
  }

  test("null group keys are scored as their own group, not dropped") {
    val df = Seq((Some("g"), 1L), (Some("g"), 2L), (None, 5L), (None, 6L),
      (None, 100L)).toDF("k", "v")
    val out = RobustScore.robustZ(df, Seq("k"), "v")
    assert(out.count() === 5, "null-keyed rows must survive the joins")
    val nullG = out.filter(col("k").isNull).collect()
    assert(nullG.length === 3)
    assert(nullG.forall(_.getAs[Double]("v_med") === 6.0))
  }

  test("null values pass through with null scores") {
    val df = Seq(("g", Some(1L)), ("g", Some(2L)), ("g", Some(30L)),
      ("g", None)).toDF("k", "v")
    val nullRow = RobustScore.robustZ(df, Seq("k"), "v")
      .filter(col("v").isNull).head()
    assert(nullRow.isNullAt(nullRow.fieldIndex("v_rz")))
  }
}
