package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jacobi eigensolve recovers a known 2x2 spectrum") {
    val (values, vectors) = Pca.jacobiEigSym(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = values.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12)
    assert(math.abs(sorted(1) - 3.0) < 1e-12)
    // eigen property: C v = lambda v for each column
    for (j <- 0 until 2) {
      val v = Array(vectors(0)(j), vectors(1)(j))
      val cv = Array(2 * v(0) + v(1), v(0) + 2 * v(1))
      assert(math.abs(cv(0) - values(j) * v(0)) < 1e-10)
      assert(math.abs(cv(1) - values(j) * v(1)) < 1e-10)
    }
  }

  test("covariance matches a local computation") {
    val rows = Seq(
      (1L, Array(1.0f, 2.0f, 0.0f)),
      (2L, Array(2.0f, 1.0f, 1.0f)),
      (3L, Array(3.0f, 0.0f, 0.5f)),
      (4L, Array(0.0f, 3.0f, 0.25f)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Pca.covariance(df, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val data = rows.map(_._2.map(_.toDouble))
    val n = data.length
    for (i <- 0 until 3; j <- 0 until 3) {
      val mi = data.map(_(i)).sum / n
      val mj = data.map(_(j)).sum / n
      val exp = data.map(r => (r(i) - mi) * (r(j) - mj)).sum / (n - 1)
      assert(math.abs(got((i, j)) - exp) < 1e-9, s"cov($i,$j)")
    }
  }

  test("gate covariance query is invariant to partitioning (r5 flake)") {
    // Replays the ann_pca_covariance gate query shape: two-pass centered
    // covariance rounded at 4 decimals must not depend on the partition
    // delivery order of the unordered double sums.
    val rnd = new scala.util.Random(7)
    val df = (1 to 400).map { k =>
      (k.toLong, Array.fill(16)((rnd.nextGaussian() * 3).toFloat))
    }.toDF("vec_id", "embedding")
    def gate(parts: Int): Seq[(Int, Int, Double)] =
      Pca.covariance(df.repartition(parts), "embedding")
        .select(col("i"), col("j"), round(col("cov"), 4).as("cov"))
        .orderBy("i", "j")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSeq
    assert(gate(3) == gate(17))
  }

  test("fit finds a planted dominant direction; projections decorrelate") {
    val rnd = new scala.util.Random(3)
    val d = 8
    val s8 = 1.0 / math.sqrt(8.0)
    val u = Array.tabulate(d)(i => if (i < 4) s8 else -s8) // planted unit axis
    val vecs = (1 to 200).map { k =>
      val t = rnd.nextGaussian() * 10 // large variance along u
      (k.toLong, Array.tabulate(d)(i =>
        (t * u(i) + rnd.nextGaussian() * 0.1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", k = 2)
    assert(model.eigenvalues(0) > 10 * model.eigenvalues(1))
    // top component aligns with the planted axis (up to sign, fixed
    // positive by convention)
    val dot = model.components(0).zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(math.abs(dot) - 1.0) < 0.05)
    // component orthonormality
    val c0 = model.components(0); val c1 = model.components(1)
    assert(math.abs(c0.map(x => x * x).sum - 1.0) < 1e-9)
    assert(math.abs(c0.zip(c1).map { case (a, b) => a * b }.sum) < 1e-9)
    // projected variance along pc0 ~ eigenvalue0, and pc0/pc1 decorrelated
    val proj = Pca.project(df, "embedding", model)
      .select("pc0", "pc1").as[(Double, Double)].collect()
    val v0 = variance(proj.map(_._1)); val v1 = variance(proj.map(_._2))
    assert(math.abs(v0 - model.eigenvalues(0)) / model.eigenvalues(0) < 0.05)
    assert(v1 < v0 / 10)
  }

  private def variance(xs: Array[Double]): Double = {
    val m = xs.sum / xs.length
    xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
  }
}
