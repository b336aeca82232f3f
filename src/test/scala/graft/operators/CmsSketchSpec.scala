package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CmsSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = 4
  private val W = 64

  test("estimate never underestimates; exact when width dodges collisions") {
    // 8 distinct keys into width 1024: collisions are possible but the
    // min over 4 independent rows makes a collision on EVERY row
    // astronomically unlikely — estimates are exact here
    val df = (1 to 1000).map(i => Tuple1(s"k${i % 8}")).toDF("v")
    val sk = CmsSketch.sketch(df, "v", D, 1024)
    val probes = (0 until 8).map(i => Tuple1(s"k$i")).toDF("v")
    val est = CmsSketch.estimate(sk, probes, "v", D, 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 8).foreach { i =>
      val exact = (1 to 1000).count(_ % 8 == i)
      assert(est(s"k$i") === exact, s"k$i")
    }
    // under a deliberately tiny width, estimates only ever go UP
    val tiny = CmsSketch.estimate(CmsSketch.sketch(df, "v", D, 4),
        probes, "v", D, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (0 until 8).foreach { i =>
      val exact = (1 to 1000).count(_ % 8 == i)
      assert(tiny(s"k$i") >= exact, s"k$i underestimated")
    }
  }

  test("merge of shard sketches equals the whole-corpus sketch") {
    val a = (1 to 400).map(i => Tuple1(s"u${i % 50}")).toDF("v")
    val b = (1 to 300).map(i => Tuple1(s"u${i % 70}")).toDF("v")
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = cells(CmsSketch.merge(
      CmsSketch.sketch(a, "v", D, W), CmsSketch.sketch(b, "v", D, W)))
    val whole = cells(CmsSketch.sketch(a.union(b), "v", D, W))
    assert(merged === whole)
  }

  test("unseen probe keys estimate 0 when their cells are empty; nulls excluded") {
    val df = Seq(Some("a"), Some("a"), None).map(Tuple1(_)).toDF("v")
    val sk = CmsSketch.sketch(df, "v", D, 1024)
    // only 'a' was counted: 4 cells, 2 each
    assert(sk.agg(sum("cnt")).head().getLong(0) === 2L * D)
    val est = CmsSketch.estimate(sk, Seq(Tuple1("zzz-not-there")).toDF("v"),
      "v", D, 1024).head().getAs[Long]("cms_est")
    assert(est === 0L)
  }

  test("sketch is invariant to partitioning and row order") {
    val df = (1 to 5000).map(i => Tuple1(s"u${i * 7 % 300}")).toDF("v")
    def run(d: org.apache.spark.sql.DataFrame) =
      CmsSketch.sketch(d, "v", D, W).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(run(df.repartition(13)) === run(df.orderBy(col("v").desc)))
  }
}
