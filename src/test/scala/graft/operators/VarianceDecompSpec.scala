package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class VarianceDecompSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eta(rows: Seq[(String, Long)]) =
    VarianceDecomp.etaSquared(rows.toDF("g", "y"), "g", "y")
      .select("n", "k_groups", "sst_n", "ssb_n", "eta_sq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .head

  test("grouping explains everything: eta² = 1") {
    val out = eta(Seq(("a", 1L), ("a", 1L), ("b", 5L), ("b", 5L)))
    assert(out._5 === Some(1.0))
  }

  test("grouping explains nothing: eta² = 0") {
    val out = eta(Seq(("a", 1L), ("a", 5L), ("b", 1L), ("b", 5L)))
    assert(out._5 === Some(0.0))
  }

  test("textbook one-way ANOVA decomposition on unbalanced groups") {
    // groups: a = {1, 2, 3}, b = {6, 8} → means 2 and 7, grand 4
    // SST = Σ(y−4)² = 9+4+1+4+16 = 34; SSB = 3·4 + 2·9 = 30
    val out = eta(Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 6L), ("b", 8L)))
    assert(out._1 === 5L && out._2 === 2L)
    // masses are N-scaled: sst_n = N·SST, ssb_n = N·SSB
    assert(math.abs(out._3 - 5 * 34.0) < 1e-9)
    assert(math.abs(out._4 - 5 * 30.0) < 1e-9)
    assert(math.abs(out._5.get - 30.0 / 34.0) < 1e-12)
  }

  test("constant signal: zero total variance, NULL eta²") {
    val out = eta(Seq(("a", 7L), ("b", 7L), ("c", 7L)))
    assert(out._5 === None)
  }

  test("fold order is pinned: layout invariance") {
    val rows = (1 to 500).map(i => (s"g${i % 23}", (i * 2654435761L) % 1000))
    val a = VarianceDecomp.etaSquared(rows.toDF("g", "y"), "g", "y")
      .select("eta_sq").as[Double].head()
    val b = VarianceDecomp.etaSquared(
        rows.toDF("g", "y").repartition(16), "g", "y")
      .select("eta_sq").as[Double].head()
    assert(a === b) // bit-identical, not just close
  }

  test("aborts in-plan past the group cap (a raw id is not a factor)") {
    val df = (1 to 60).map(i => (s"g$i", i.toLong)).toDF("g", "y")
    val ex = intercept[Exception] {
      VarianceDecomp.etaSquared(df, "g", "y", maxGroups = 20).collect()
    }
    assert(ex.getMessage.contains("maxGroups"))
  }

  test("fractional y aborts with quantize guidance") {
    val df = Seq(("a", 1.5)).toDF("g", "y")
    val ex = intercept[Exception] {
      VarianceDecomp.etaSquared(df, "g", "y").collect()
    }
    assert(ex.getMessage.contains("quantize"))
  }
}
