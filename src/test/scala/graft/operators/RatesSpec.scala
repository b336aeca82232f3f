package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RatesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wilson(rows: Seq[(String, Boolean)], z: Double = 1.96) =
    Rates.wilson(rows.toDF("g", "s"), Seq("g"), col("s"), z)
      .orderBy("g")
      .select("g", "n", "k", "rate", "lo", "hi")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq

  /** Local reference replicating the operator's exact IEEE tree. */
  private def localWilson(n: Long, k: Long, z: Double): (Double, Double) = {
    val nd = n.toDouble; val p = k.toDouble / nd; val z2 = z * z
    val denom = 1.0 + z2 / nd
    val center = (p + z2 / (2.0 * nd)) / denom
    val half = (z * math.sqrt(p * (1.0 - p) / nd +
      z2 / (4.0 * nd * nd))) / denom
    (math.max(center - half, 0.0), math.min(center + half, 1.0))
  }

  test("textbook check: 8/10 successes at 95%") {
    val rows = Seq.fill(8)(("g", true)) ++ Seq.fill(2)(("g", false))
    val out = wilson(rows).head
    assert(out._2 === 10L && out._3 === 8L && out._4 === 0.8)
    // Wilson 95% for 8/10 ≈ [0.4901, 0.9433] (textbook value)
    assert(math.abs(out._5 - 0.4901) < 5e-4)
    assert(math.abs(out._6 - 0.9433) < 5e-4)
    val (lo, hi) = localWilson(10, 8, 1.96)
    assert(out._5 === lo && out._6 === hi) // bit equality with the tree
  }

  test("small n has a wide interval; large n a narrow one at the same rate") {
    val small = wilson(Seq.fill(4)(("g", true)) ++ Seq.fill(4)(("g", false))).head
    val rowsBig = Seq.fill(4000)(("g", true)) ++ Seq.fill(4000)(("g", false))
    val big = wilson(rowsBig).head
    assert(small._4 === 0.5 && big._4 === 0.5)
    assert((small._6 - small._5) > 5 * (big._6 - big._5))
  }

  test("degenerate rates stay inside [0, 1] (the Wald interval would not)") {
    val all = wilson(Seq.fill(5)(("g", true))).head
    assert(all._4 === 1.0 && all._6 <= 1.0 && all._5 > 0.5)
    val none = wilson(Seq.fill(5)(("g", false))).head
    assert(none._4 === 0.0 && none._5 >= 0.0 && none._6 < 0.5)
  }

  test("null successes count as failures, not dropped trials") {
    val df = Seq(("g", Some(true)), ("g", None), ("g", Some(false)))
      .toDF("g", "s")
    val out = Rates.wilson(df, Seq("g"), col("s"))
      .select("n", "k").as[(Long, Long)].head()
    assert(out === ((3L, 1L)))
  }

  test("groups are independent and exact") {
    val out = wilson(Seq(("a", true), ("a", false), ("b", true)))
    assert(out.map(r => (r._1, r._2, r._3)) ===
      Seq(("a", 2L, 1L), ("b", 1L, 1L)))
  }
}
