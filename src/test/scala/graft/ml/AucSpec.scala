package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AucSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Double, Boolean)], parts: Int = 3)
      : org.apache.spark.sql.Row =
    Auc.rocAuc(rows.toDF("s", "y").repartition(parts), "s", "y").head()

  /** Reference AUC: probability a random positive outranks a random
    * negative, ties counting half — the direct pairwise definition.
    */
  private def ref(rows: Seq[(Double, Boolean)]): Double = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    wins / (pos.size * neg.size)
  }

  test("perfect, inverted and random separations") {
    val perfect = Seq(0.9 -> true, 0.8 -> true, 0.2 -> false, 0.1 -> false)
    assert(run(perfect).getAs[Double]("auc") === 1.0)
    val inverted = perfect.map { case (s, y) => s -> !y }
    assert(run(inverted).getAs[Double]("auc") === 0.0)
    val coin = Seq(0.5 -> true, 0.5 -> false)
    assert(run(coin).getAs[Double]("auc") === 0.5)
  }

  test("ties take midranks: matches the pairwise definition exactly") {
    val rows = Seq(0.3 -> true, 0.3 -> false, 0.3 -> false, 0.7 -> true,
      0.1 -> false, 0.7 -> false, 0.9 -> true)
    val r = run(rows)
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Long]("n_neg") === 4L)
    assert(r.getAs[Double]("auc") === ref(rows))
  }

  test("pseudo-random scores match the pairwise reference; layout-invariant") {
    val rows = (1 to 500).map { i =>
      val h = i * 2654435761L
      (((h >>> 13) % 97).toDouble / 97.0, (h >>> 40) % 3 == 0)
    }
    val want = ref(rows)
    assert(run(rows, parts = 1).getAs[Double]("auc") === want)
    assert(run(rows.reverse, parts = 17).getAs[Double]("auc") === want)
  }

  test("grouped AUC equals the per-group filtered global computation") {
    val rows = (1 to 300).map { i =>
      val h = i * 2654435761L
      (s"g${(h >>> 5) % 3}", ((h >>> 13) % 50).toDouble / 50.0,
        (h >>> 23) % 3 == 0)
    }
    val grouped = Auc.rocAucByGroup(
        rows.toDF("g", "s", "y").repartition(7), Seq("g"), "s", "y")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("auc"))
      .toMap
    (0 until 3).foreach { g =>
      val solo = Auc.rocAuc(rows.filter(_._1 == s"g$g")
          .map(t => (t._2, t._3)).toDF("s", "y"), "s", "y")
        .head().getAs[Double]("auc")
      assert(grouped(s"g$g") === solo, s"group g$g")
    }
  }

  test("degenerate single-class input reports NULL, not 0/0") {
    val r = run(Seq(0.4 -> true, 0.6 -> true))
    assert(r.getAs[Long]("n_neg") === 0L)
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("null scores and labels are excluded") {
    val df = Seq[(Option[Double], Option[Boolean])](
      (Some(0.9), Some(true)), (Some(0.1), Some(false)),
      (None, Some(true)), (Some(0.5), None)).toDF("s", "y")
    val r = Auc.rocAuc(df, "s", "y").head()
    assert(r.getAs[Long]("n_pos") === 1L && r.getAs[Long]("n_neg") === 1L)
    assert(r.getAs[Double]("auc") === 1.0)
  }
}
