package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ChangepointSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(values: Seq[Long], k: Long, h: Long) =
    Changepoint.cusum(
        values.zipWithIndex.map { case (v, i) => ("s", i, v) }
          .toDF("key", "t", "v"),
        Seq("key"), Seq("t"), "v", driftK = k, threshold = h)
      .orderBy("t")
      .select("cusum_pos", "cusum_neg", "alarm")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

  test("upward step shift accumulates on the positive side and alarms") {
    val out = run(Seq(10L, 10L, 10L, 10L, 30L, 30L, 30L), k = 10L, h = 25L)
    assert(out.map(_._1).toSeq === Seq(0L, 0L, 0L, 0L, 20L, 40L, 60L))
    assert(out.map(_._2).toSeq === Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(out.map(_._3).toSeq === Seq(0, 0, 0, 0, 0, 1, 1))
  }

  test("downward shift mirrors on the negative side") {
    val out = run(Seq(10L, 10L, 10L, 2L, 2L, 2L), k = 10L, h = 15L)
    assert(out.map(_._1).forall(_ == 0L))
    assert(out.map(_._2).toSeq === Seq(0L, 0L, 0L, 8L, 16L, 24L))
    assert(out.map(_._3).toSeq === Seq(0, 0, 0, 0, 1, 1))
  }

  test("prefix form equals the textbook recursion on pseudo-random data") {
    val xs = (1 to 200).map(i =>
      (math.abs(i * 2654435761L) % 37) + (if (i > 120) 25L else 0L))
    val k = 20L
    // textbook: S⁺ = max(0, S⁺ + (x − k)); S⁻ = max(0, S⁻ + (k − x))
    var sp = 0L; var sn = 0L
    val exp = xs.map { x =>
      sp = math.max(0L, sp + (x - k)); sn = math.max(0L, sn + (k - x))
      (sp, sn)
    }
    val got = run(xs, k, h = 100L).map(t => (t._1, t._2)).toSeq
    assert(got === exp)
  }

  test("negative running sums: the empty-prefix zero floor is honored") {
    // first value below k drives P negative immediately; S⁺ must be 0,
    // not P − P (which the min-without-zero form would give)
    val out = run(Seq(1L, 100L), k = 10L, h = 1000L)
    assert(out.map(_._1).toSeq === Seq(0L, 90L))
  }

  test("debounce: a lone breach cannot page; a streak of m can") {
    // values: one isolated spike, then a sustained shift
    val vals = Seq(10L, 60L, 10L, 10L, 60L, 60L, 60L)
    val df = vals.zipWithIndex.map { case (v, i) => ("s", i, v) }
      .toDF("key", "t", "v")
    val out = Changepoint.cusumDebounced(df, Seq("key"), Seq("t"), "v",
        driftK = 10L, threshold = 20L, consecutive = 2)
      .orderBy("t").select("alarm", "alarm_streak", "alarm_debounced")
      .as[(Int, Long, Int)].collect().toSeq
    // S⁺ = prefix of (x−10) = 0,50,50,50,100,150,200: the t=1 spike
    // breaches immediately, but the DEBOUNCED page waits for the
    // second consecutive breaching row (t=2)
    assert(out.map(_._1) === Seq(0, 1, 1, 1, 1, 1, 1))
    assert(out.map(_._3) === Seq(0, 0, 1, 1, 1, 1, 1))
    assert(out.map(_._2) === Seq(0L, 1L, 2L, 2L, 2L, 2L, 2L))
  }

  test("fractional values abort with quantize guidance") {
    val df = Seq(("s", 1, 1.5)).toDF("key", "t", "v")
    val ex = intercept[Exception] {
      Changepoint.cusum(df, Seq("key"), Seq("t"), "v", 1L, 1L).collect()
    }
    assert(ex.getMessage.contains("quantize"))
  }

  test("series are independent across keys") {
    val df = Seq(("a", 1, 100L), ("b", 1, 0L), ("a", 2, 100L), ("b", 2, 0L))
      .toDF("key", "t", "v")
    val out = Changepoint.cusum(df, Seq("key"), Seq("t"), "v", 10L, 50L)
      .orderBy("key", "t").select("key", "cusum_pos").as[(String, Long)]
      .collect()
    assert(out.toSeq === Seq(("a", 90L), ("a", 180L), ("b", 0L), ("b", 0L)))
  }
}
