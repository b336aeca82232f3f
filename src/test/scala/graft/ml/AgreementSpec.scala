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

  /** Independent local Fleiss kappa over (item, category) rows. */
  private def localFleiss(rows: Seq[(Long, String)]): Option[Double] = {
    val byItem = rows.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val n = byItem.head.size
    val nItems = byItem.size.toLong
    val q = byItem.map(_.groupBy(identity).values
      .map(g => g.size.toLong * g.size).sum).sum
    val t = rows.groupBy(_._2).values
      .map(g => g.size.toLong * g.size).sum
    val m = nItems * n
    val num = (q - m) * m - t * (n - 1)
    val den = (m * m - t) * (n - 1)
    if (den == 0) None else Some(num.toDouble / den.toDouble)
  }

  test("fleiss: perfect panel agreement is 1; constant category is NULL") {
    val perfect = (1L to 6L).flatMap(i =>
      Seq.fill(3)((i, if (i % 2 == 0) "x" else "y")))
    val r = Agreement.fleissKappa(perfect.toDF("i", "c"), "i", "c").head()
    assert(r.getAs[Long]("n_items") === 6L)
    assert(r.getAs[Long]("n_raters") === 3L)
    assert(r.getAs[Double]("kappa") === 1.0)
    val constant = (1L to 4L).flatMap(i => Seq.fill(3)((i, "x")))
    val k = Agreement.fleissKappa(constant.toDF("i", "c"), "i", "c").head()
    assert(k.isNullAt(k.fieldIndex("kappa")))
  }

  test("fleiss: matches the independent local computation on a mixed panel") {
    val rows = (1L to 40L).flatMap { i =>
      (0 until 4).map(r => (i, s"cat${(i * 7 + r * r) % 3}"))
    }
    val got = Agreement.fleissKappa(
        rows.toDF("i", "c").repartition(5), "i", "c").head()
    val expect = localFleiss(rows).get
    assert(math.abs(got.getAs[Double]("kappa") - expect) < 1e-12)
    // two-rater Fleiss on the same data differs from Cohen (different
    // chance models) but both must see the same panel shape
    assert(got.getAs[Long]("n_raters") === 4L)
  }

  test("fleiss: ragged panel aborts loudly; nulls excluded first") {
    val ragged = Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("i", "c")
    val e = intercept[Exception] {
      Agreement.fleissKappa(ragged, "i", "c").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ragged panel")))
    // a null category removed BEFORE the count would unbalance item 1 —
    // so this aborts too (the null carried no rating)
    val withNull = Seq[(Long, Option[String])](
      (1L, Some("x")), (1L, None), (2L, Some("x")), (2L, Some("y")))
      .toDF("i", "c")
    val e2 = intercept[Exception] {
      Agreement.fleissKappa(withNull, "i", "c").collect()
    }
    assert(msgs(e2).exists(_.contains("ragged panel")))
    val single = Seq((1L, "x"), (2L, "y")).toDF("i", "c")
    val e3 = intercept[Exception] {
      Agreement.fleissKappa(single, "i", "c").collect()
    }
    assert(msgs(e3).exists(_.contains("at least 2 raters")))
  }
}
