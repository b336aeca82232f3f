package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class FrequentPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rel: Seq[(Long, String)], frac: Double,
                  cap: Int = 4096): Map[(String, String), (Long, Long, Long, Long)] =
    FrequentPairs.frequentPairs(rel.toDF("b", "i"), "b", "i", frac, cap)
      .collect()
      .map(r => (r.getAs[String]("item_a"), r.getAs[String]("item_b")) ->
        ((r.getAs[Long]("pair_cnt"), r.getAs[Long]("cnt_a"),
          r.getAs[Long]("cnt_b"), r.getAs[Long]("n_baskets"))))
      .toMap

  test("hand corpus: counts, threshold floor and a-priori prune") {
    // 5 baskets; {x,y} in 3, {x,z} in 2, z alone twice; w once
    val rel = Seq(
      1L -> "x", 1L -> "y", 1L -> "z",
      2L -> "x", 2L -> "y",
      3L -> "x", 3L -> "y",
      4L -> "x", 4L -> "z",
      5L -> "w", 5L -> "z")
    // frac 0.5 → min_cnt = ceil(2.5) = 3: x (4), y (3), z (3) frequent,
    // w (1) pruned; only (x,y) has pair support ≥ 3
    val got = run(rel, 0.5)
    assert(got === Map(("x", "y") -> ((3L, 4L, 3L, 5L))))
    // frac 0.4 → min_cnt = 2: (x,z) at 2 now clears; (y,z) at 1 doesn't
    val loose = run(rel, 0.4)
    assert(loose.keySet === Set(("x", "y"), ("x", "z")))
    assert(loose(("x", "z")) === ((2L, 4L, 3L, 5L)))
  }

  test("duplicate items within a basket count once; nulls drop") {
    val rel = Seq(1L -> "a", 1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b")
    val got = FrequentPairs.frequentPairs(
      rel.toDF("b", "i").unionByName(
        Seq((Option.empty[Long], Option("a")), (Option(3L), Option.empty[String]))
          .toDF("b", "i")),
      "b", "i", 0.9)
    val m = got.collect().map(r =>
      (r.getAs[String]("item_a"), r.getAs[String]("item_b")) ->
        r.getAs[Long]("pair_cnt")).toMap
    assert(m === Map(("a", "b") -> 2L))
  }

  test("support and lift are the pinned single-tree IEEE values") {
    val rel = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b", 3L -> "a",
      4L -> "b")
    val row = FrequentPairs.frequentPairs(rel.toDF("b", "i"), "b", "i", 0.5)
      .head()
    assert(row.getAs[Long]("pair_cnt") === 2L)
    assert(row.getAs[Double]("support") === 2.0 / 4.0)
    assert(row.getAs[Double]("lift") === (2.0 * 4.0) / (3.0 * 3.0))
  }

  test("a basket wider than maxBasketItems aborts loudly") {
    val wide = (1 to 30).map(i => 1L -> s"i$i") ++
      (1 to 30).flatMap(i => Seq(2L -> s"i$i", 3L -> s"i$i"))
    val ex = intercept[Exception] {
      FrequentPairs.frequentPairs(wide.toDF("b", "i"), "b", "i",
        minSupportFrac = 0.5, maxBasketItems = 8).count()
    }
    assert(ex.getMessage.contains("frequentPairs") ||
      ex.getCause != null && ex.getCause.getMessage.contains("frequentPairs"))
  }

  test("result is invariant to partitioning and row order") {
    val rel = (1 to 400).map { k =>
      val h = k * 2654435761L
      ((h >>> 7) % 40) -> s"i${(h >>> 35) % 12}"
    }
    def m(d: org.apache.spark.sql.DataFrame) =
      FrequentPairs.frequentPairs(d, "b", "i", 0.1).collect()
        .map(r => (r.getAs[String]("item_a"), r.getAs[String]("item_b")) ->
          r.getAs[Long]("pair_cnt")).toMap
    assert(m(rel.toDF("b", "i").repartition(13)) ===
      m(rel.reverse.toDF("b", "i").coalesce(1)))
  }
}
