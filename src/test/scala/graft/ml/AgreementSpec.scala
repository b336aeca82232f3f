package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AgreementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, String)]): org.apache.spark.sql.Row =
    Agreement.cohensKappa(rows.toDF("a", "b").repartition(3), "a", "b").head()

  test("perfect agreement is kappa 1; constant raters are NULL") {
    val perfect = Seq("x" -> "x", "y" -> "y", "x" -> "x", "z" -> "z")
    assert(run(perfect).getAs[Double]("kappa") === 1.0)
    // both raters constant on the SAME label: chance mass equals N² —
    // chance explains everything, kappa undefined (NULL, not 0/0)
    val constant = Seq("x" -> "x", "x" -> "x", "x" -> "x")
    val r = run(constant)
    assert(r.isNullAt(r.fieldIndex("kappa")))
    // one rater constant on a label the other never uses: zero chance
    // mass, zero agreement — kappa is a defined 0
    val disjoint = Seq("x" -> "p", "x" -> "q", "x" -> "p")
    assert(run(disjoint).getAs[Double]("kappa") === 0.0)
  }

  test("textbook 2x2 example matches the hand-computed kappa") {
    // classic: raters agree on 20 yes + 15 no of 50; marginals 25/25
    // and 30/20 → po = 0.7, pe = 0.5, kappa = 0.4
    val rows = Seq.fill(20)("yes" -> "yes") ++ Seq.fill(15)("no" -> "no") ++
      Seq.fill(5)("yes" -> "no") ++ Seq.fill(10)("no" -> "yes")
    val r = run(rows)
    assert(r.getAs[Long]("n") === 50L)
    assert(r.getAs[Long]("agree") === 35L)
    // A=35, B = r_yes*c_yes + r_no*c_no = 25*30 + 25*20 = 1250
    assert(r.getAs[Long]("chance_mass") === 1250L)
    assert(r.getAs[Double]("kappa") === (50.0 * 35 - 1250) / (2500.0 - 1250))
  }

  test("independent raters with balanced marginals land near 0") {
    val rows = (1 to 400).map { i =>
      val h = i * 2654435761L
      (if ((h >>> 7) % 2 == 0) "p" else "q",
        if ((h >>> 39) % 2 == 0) "p" else "q")
    }
    val k = run(rows).getAs[Double]("kappa")
    assert(math.abs(k) < 0.15, s"kappa=$k")
  }

  test("null labels are excluded; categorical labels of any type cast in") {
    val df = Seq[(Option[Int], Option[Int])](
      (Some(1), Some(1)), (Some(2), Some(2)), (None, Some(1)),
      (Some(1), None)).toDF("a", "b")
    val r = Agreement.cohensKappa(df, "a", "b").head()
    assert(r.getAs[Long]("n") === 2L)
    assert(r.getAs[Double]("kappa") === 1.0)
  }
}
