package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SeasonalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Int, Long)], k: Int = 3) =
    Seasonal.outliers(rows.toDF("slot", "i", "v"), Seq("slot"), "v", k)
      .orderBy("slot", "i")
      .select("slot", "i", "v", "slot_cnt", "dev_scaled", "outlier", "z")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))
      .toSeq

  test("an out-of-rhythm spike flags only against its own slot") {
    // "mon": nine 10s + one 100 → z(100) = 3.0 exactly (pop σ = 27);
    // "sat": alternating 35/45 → every |z| = 1, HIGH values are normal
    val mon = (0 until 9).map(i => ("mon", i, 10L)) :+ (("mon", 9, 100L))
    val sat = (0 until 10).map(i => ("sat", i, if (i % 2 == 0) 35L else 45L))
    val out = run(mon ++ sat, k = 2)
    val monOut = out.filter(_._1 == "mon")
    val satOut = out.filter(_._1 == "sat")
    assert(monOut.count(_._6 == 1) === 1 &&
      monOut.find(_._6 == 1).get._3 === 100L)
    assert(math.abs(monOut.find(_._6 == 1).get._7.get - 3.0) < 1e-12)
    assert(satOut.forall(_._6 == 0))
  }

  test("the z and flag agree with a local float reference") {
    val vals = (0 until 60).map(i => ("s", i, ((i * 37) % 23).toLong))
    val out = run(vals, k = 2)
    val xs = vals.map(_._3.toDouble)
    val mu = xs.sum / xs.size
    val sigma = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.size)
    out.foreach { r =>
      val zRef = (r._3 - mu) / sigma
      assert(math.abs(r._7.get - zRef) < 1e-9, s"row $r")
      assert((r._6 == 1) === (math.abs(zRef) > 2.0 + 1e-12), s"row $r")
    }
  }

  test("constant slot: zero variance, no flags, NULL z") {
    val out = run(Seq(("c", 0, 5L), ("c", 1, 5L), ("c", 2, 5L)))
    assert(out.forall(r => r._6 == 0 && r._7.isEmpty))
  }

  test("singleton slot never flags") {
    val out = run(Seq(("solo", 0, 999L)))
    assert(out.head._6 === 0)
  }

  test("flag is exact-integer: a boundary case does not flap") {
    // slot: 0, 0, 6 → μ=2, σ²=8, vt = 3·36 − 36 = 72; dev(6) = 18−6=12;
    // dev² = 144, k=1: 1·72 < 144 → flag; k=2: 4·72=288 > 144 → no flag
    val rows = Seq(("b", 0, 0L), ("b", 1, 0L), ("b", 2, 6L))
    assert(run(rows, k = 1).count(_._6 == 1) === 1)
    assert(run(rows, k = 2).count(_._6 == 1) === 0)
  }
}
