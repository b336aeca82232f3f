package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AmsSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D = 9

  private def exactF2(vs: Seq[String]): Long = {
    val c = vs.groupBy(identity).map(_._2.size.toLong)
    c.map(x => x * x).sum
  }

  test("counters replay the local avalanche sign sum exactly") {
    val vs = (1 to 500).map(i => s"u${i % 37}")
    val cells = AmsSketch.sketch(vs.map(Tuple1(_)).toDF("v"), "v", D)
      .cells.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until D).foreach { i =>
      val want = vs.map { v =>
        Sampling.avalancheKeyLocal(s"$v:$i") % 2 * 2 - 1
      }.sum
      assert(cells(i) === want, s"counter $i")
    }
  }

  test("estimate is unbiased-ish: within 3 std of exact on a skewed stream") {
    // one heavy key + a long tail; F2 is dominated by the heavy key and
    // the 9-counter median must land within the AMS concentration bound
    val vs = (1 to 3000).map(i => if (i % 3 == 0) "HOT" else s"u${i % 200}")
    val est = AmsSketch.sketch(vs.map(Tuple1(_)).toDF("v"), "v", D)
      .f2Estimate().head().getAs[Long]("f2_est")
    val exact = exactF2(vs)
    // Var[z²] ≤ 2·F2² ⇒ a single counter is within ~2.8·F2 at 3σ; the
    // median tightens this — assert the loose single-counter bound
    assert(math.abs(est - exact).toDouble <= 2.9 * exact,
      s"est $est vs exact $exact")
  }

  test("a distinct-only stream has F2 = N; sketch gets it within bound") {
    val vs = (1 to 1000).map(i => s"unique$i")
    val est = AmsSketch.sketch(vs.map(Tuple1(_)).toDF("v"), "v", D)
      .f2Estimate().head().getAs[Long]("f2_est")
    assert(est >= 0L && est <= 5L * 1000L)
  }

  test("merge of shards equals the whole-stream sketch; shape mismatch loud") {
    val a = (1 to 400).map(i => Tuple1(s"u${i % 50}")).toDF("v")
    val b = (1 to 300).map(i => Tuple1(s"u${i % 70}")).toDF("v")
    def cells(s: AmsSketch.Ams) =
      s.cells.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val merged = cells(AmsSketch.sketch(a, "v", D)
      .merge(AmsSketch.sketch(b, "v", D)))
    val whole = cells(AmsSketch.sketch(a.union(b), "v", D))
    assert(merged === whole)
    intercept[IllegalArgumentException] {
      AmsSketch.sketch(a, "v", D).merge(AmsSketch.sketch(b, "v", D + 2))
    }
  }

  test("grouped: each group's counters equal the filtered solo sketch") {
    val df = (1 to 2000).map(i => (s"g${i % 3}", s"u${i % 40}")).toDF("g", "v")
    val grouped = AmsSketch.sketch(df, "v", D, groupCols = Seq("g"))
    (0 until 3).foreach { g =>
      val slice = grouped.cells.filter(col("g") === s"g$g").drop("g")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val solo = AmsSketch.sketch(df.filter(col("g") === s"g$g"), "v", D)
        .cells.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(slice === solo, s"group g$g")
    }
  }

  test("invariant to partitioning and row order") {
    val df = (1 to 5000).map(i => Tuple1(s"u${i * 7 % 300}")).toDF("v")
    def run(d: org.apache.spark.sql.DataFrame) =
      AmsSketch.sketch(d, "v", D).cells.collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(run(df.repartition(13)) === run(df.orderBy(col("v").desc)))
  }
}
