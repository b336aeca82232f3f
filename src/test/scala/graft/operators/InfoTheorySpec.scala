package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class InfoTheorySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MI cells: independent columns contribute ~0, dependent ones ln-scaled") {
    // perfectly dependent: y = x over two symbols, 4 rows
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val depRows = InfoTheory.miTable(dep, "x", "y")
      .select("x", "y", "nxy", "n", "mi_term")
      .as[(String, String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // each cell: (2/4)·ln(2·4/(2·2)) = 0.5·ln 2
    val expTerm = math.rint(0.5 * math.log(2.0) * 1e6) / 1e6
    assert(depRows.map(_._5) === Seq(expTerm, expTerm))
    // total MI = ln 2 (1 bit) as the sum of the cells
    assert(math.abs(depRows.map(_._5).sum - math.log(2.0)) < 1e-5)

    // independent: every (x, y) cell has nxy·n = nx·ny → ln 1 = 0
    val ind = Seq(("a", "u"), ("a", "v"), ("b", "u"), ("b", "v"))
      .toDF("x", "y")
    val indRows = InfoTheory.miTable(ind, "x", "y")
      .select("mi_term").as[Double].collect()
    assert(indRows.forall(_ === 0.0))
  }

  test("MI marginals derive from the cells: masses are exact") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 2)).toDF("x", "y")
    val rows = InfoTheory.miTable(df, "x", "y")
      .select("x", "y", "nxy", "nx", "ny", "n")
      .as[(String, Int, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(rows(("a", 1)) === ((2L, 3L, 2L, 4L)))
    assert(rows(("a", 2)) === ((1L, 3L, 2L, 4L)))
    assert(rows(("b", 2)) === ((1L, 1L, 2L, 4L)))
  }

  test("gini: pure slice 0, uniform k-way 1 - 1/k, exact values") {
    val df = Seq(
      ("pure", "l1"), ("pure", "l1"), ("pure", "l1"),
      ("mix2", "l1"), ("mix2", "l2"),
      ("mix4", "l1"), ("mix4", "l2"), ("mix4", "l3"), ("mix4", "l4"))
      .toDF("g", "label")
    val out = InfoTheory.giniByGroup(df, Seq("g"), "label")
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("mix2", 2L, 0.5), ("mix4", 4L, 0.75), ("pure", 3L, 0.0)))
  }

  test("gini skewed: exact rational value") {
    // counts 3 and 1: 1 − (9+1)/16 = 0.375
    val df = Seq.fill(3)(("g", "a")).++(Seq(("g", "b"))).toDF("g", "label")
    val out = InfoTheory.giniByGroup(df, Seq("g"), "label")
      .as[(String, Long, Double)].head()
    assert(out === (("g", 4L, 0.375)))
  }

  test("MI aborts in-plan past the cell cap (enforced, not advisory)") {
    val df = (1 to 50).map(i => (i, i)).toDF("x", "y")
    val ex = intercept[Exception] {
      InfoTheory.miTable(df, "x", "y", maxCells = 10).collect()
    }
    assert(ex.getMessage.contains("maxCells"))
  }

  test("nulls are excluded from both operators") {
    val df = Seq(("g", Some("a")), ("g", None), ("g", Some("a")))
      .toDF("g", "label")
    val out = InfoTheory.giniByGroup(df, Seq("g"), "label")
      .as[(String, Long, Double)].head()
    assert(out === (("g", 2L, 0.0)))
  }
}
