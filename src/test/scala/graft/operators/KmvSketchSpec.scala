package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class KmvSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 32

  test("below k distinct values the sketch is exact") {
    val df = (1 to 500).map(i => ("g", s"v${i % 20}")).toDF("g", "v")
    val row = KmvSketch.sketch(df, Seq("g"), "v", K)
      .select(size(col("kmv")).as("sz"),
        KmvSketch.estimate(col("kmv"), K).as("est"))
      .head()
    assert(row.getInt(0) === 20)
    assert(row.getDouble(1) === 20.0)
  }

  test("estimate lands within the KMV error bound on a large set") {
    val k = 256
    val n = 20000
    val df = (1 to n).map(i => ("g", s"user$i")).toDF("g", "v")
    val est = KmvSketch.sketch(df, Seq("g"), "v", k)
      .select(KmvSketch.estimate(col("kmv"), k)).head().getDouble(0)
    // standard KMV relative error ~1/sqrt(k-2); allow 4 sigma
    val tol = 4.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - n) / n < tol, s"est=$est vs n=$n (tol $tol)")
  }

  test("merge of shard sketches equals the sketch of the union") {
    val a = (1 to 3000).map(i => ("g", s"u${i}")).toDF("g", "v")
    val b = (2000 to 6000).map(i => ("g", s"u${i}")).toDF("g", "v")
    val whole = KmvSketch.sketch(a.union(b), Seq("g"), "v", K)
      .select("kmv").head().getSeq[Long](0)
    val sa = KmvSketch.sketch(a, Seq("g"), "v", K).select(col("kmv").as("ka"))
    val sb = KmvSketch.sketch(b, Seq("g"), "v", K).select(col("kmv").as("kb"))
    val merged = sa.crossJoin(sb)
      .select(KmvSketch.merge(col("ka"), col("kb"), K).as("kmv"))
      .head().getSeq[Long](0)
    assert(merged === whole)
  }

  test("sketch is invariant to partitioning and row order") {
    val df = (1 to 5000).map(i => (s"g${i % 3}", s"u${i * 7 % 1200}"))
      .toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      KmvSketch.sketch(d, Seq("g"), "v", K)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(run(df.repartition(13)) === run(df.orderBy(col("v").desc)))
  }
}
