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

  test("intersection estimate tracks the true overlap (incl-excl)") {
    val k = 256
    val a = (1 to 8000).map(i => ("a", s"u$i")).toDF("g", "v")
    val b = (6001 to 14000).map(i => ("a", s"u$i")).toDF("g", "v")
    val sa = KmvSketch.sketch(a, Seq("g"), "v", k).select(col("kmv").as("ka"))
    val sb = KmvSketch.sketch(b, Seq("g"), "v", k).select(col("kmv").as("kb"))
    val row = sa.crossJoin(sb).select(
      KmvSketch.unionEstimate(col("ka"), col("kb"), k).as("u"),
      KmvSketch.intersectionEstimate(col("ka"), col("kb"), k).as("i")).head()
    val (u, i) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(u - 14000) / 14000 < 4.0 / math.sqrt(k - 2.0))
    // intersection error compounds three estimates — allow a wider band
    assert(math.abs(i - 2000) < 14000 * 3 * (4.0 / math.sqrt(k - 2.0)))
    // exact regime: small disjoint sets give exact 0 intersection
    val xa = (1 to 10).map(i => ("a", s"x$i")).toDF("g", "v")
    val xb = (11 to 25).map(i => ("a", s"y$i")).toDF("g", "v")
    val r2 = KmvSketch.sketch(xa, Seq("g"), "v", K)
      .select(col("kmv").as("ka"))
      .crossJoin(KmvSketch.sketch(xb, Seq("g"), "v", K)
        .select(col("kmv").as("kb")))
      .select(KmvSketch.intersectionEstimate(col("ka"), col("kb"), K)).head()
    assert(r2.getDouble(0) === 0.0)
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
