package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class LeadLagSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def xcorr(a: Seq[(Long, Long)], b: Seq[(Long, Long)], maxLag: Int) =
    LeadLag.crossCorrelation(
        a.toDF("t", "v"), b.toDF("t", "v"), "t", "v", maxLag)
      .orderBy("lag")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toSeq

  test("a shifted copy correlates perfectly at exactly its shift") {
    // b_t = a_{t-3} (B trails A by 3): the scan peaks at lag +3 —
    // A at time t pairs with B at t+3
    val a = (0L until 40L).map(t => (t, (t * 37) % 11))
    val b = a.map { case (t, v) => (t + 3, v) }
    val out = xcorr(a, b, maxLag = 5)
    val byLag = out.map(r => r._1 -> r._3).toMap
    assert(byLag(3L) === Some(1.0) ||
      math.abs(byLag(3L).get - 1.0) < 1e-12)
    out.filter(r => r._1 != 3L && r._3.isDefined).foreach { r =>
      assert(r._3.get < 0.99, s"lag ${r._1} should not be the peak")
    }
  }

  test("anti-correlated at lag 0, overlap counts shrink with |lag|") {
    val a = (0L until 30L).map(t => (t, t % 7))
    val b = a.map { case (t, v) => (t, 6 - v) }
    val out = xcorr(a, b, maxLag = 2)
    val at0 = out.find(_._1 == 0L).get
    assert(at0._2 === 30L)
    assert(math.abs(at0._3.get + 1.0) < 1e-12)
    // overlap: at |lag| = 2 only 28 indexes align
    assert(out.find(_._1 == 2L).get._2 === 28L)
    assert(out.find(_._1 == -2L).get._2 === 28L)
  }

  test("constant side yields NULL, not 0/0") {
    val a = (0L until 10L).map(t => (t, 5L))
    val b = (0L until 10L).map(t => (t, t))
    val out = xcorr(a, b, maxLag = 1)
    assert(out.forall(_._3.isEmpty))
  }

  test("missing time indexes drop pairs (inner alignment)") {
    val a = Seq((0L, 1L), (1L, 2L), (3L, 3L)) // t = 2 missing
    val b = Seq((0L, 1L), (1L, 2L), (2L, 9L), (3L, 3L))
    val out = xcorr(a, b, maxLag = 0)
    assert(out.head._2 === 3L) // only t ∈ {0, 1, 3} align at lag 0
  }

  test("fractional values abort with quantize guidance") {
    val a = Seq((1L, 1.5)).toDF("t", "v")
    val b = Seq((1L, 2L)).toDF("t", "v")
    val ex = intercept[Exception] {
      LeadLag.crossCorrelation(a, b, "t", "v", 1).collect()
    }
    assert(ex.getMessage.contains("quantize"))
  }
}
