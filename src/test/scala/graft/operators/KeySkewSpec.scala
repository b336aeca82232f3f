package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class KeySkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def profile(keys: Seq[Long]) =
    KeySkew.loadProfile(keys.map(Tuple1(_)).toDF("k"), Seq("k"))
      .select("n_keys", "n_rows", "max_cnt", "top_share", "gini_load")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .head

  /** Local reference: exact integer masses, then the operator's pinned
    * final tree — so equality below is BIT equality, not tolerance.
    */
  private def localGini(counts: Seq[Long]): Double = {
    val sorted = counts.sorted
    val kk = BigInt(sorted.size)
    val t = BigInt(sorted.sum)
    val s2 = sorted.zipWithIndex
      .map { case (c, i) => BigInt(2) * (i + 1) * c }.sum
    s2.toDouble / (kk.toDouble * t.toDouble) -
      (kk + 1).toDouble / kk.toDouble
  }

  test("uniform load: gini exactly 0") {
    val out = profile((1L to 40L).flatMap(k => Seq(k, k)))
    assert(out === ((40L, 80L, 2L, 2.0 / 80.0, Some(0.0))))
  }

  test("one hot key dominating: gini approaches 1, top_share exact") {
    val keys = Seq.fill(900)(0L) ++ (1L to 100L)
    val out = profile(keys)
    assert(out._1 === 101L && out._2 === 1000L && out._3 === 900L)
    assert(out._4 === 900.0 / 1000.0)
    assert(out._5.get === localGini(Seq.fill(100)(1L) :+ 900L))
    assert(out._5.get > 0.85)
  }

  test("matches the local rank-sum reference bit-for-bit on skewed data") {
    val keys = (0 until 3000).map(i => (i * i) % 173L)
    val counts = keys.groupBy(identity).values.map(_.size.toLong).toSeq
    val out = profile(keys)
    assert(out._5.get === localGini(counts))
  }

  test("single key: gini undefined (NULL), shares still exact") {
    val out = profile(Seq.fill(7)(42L))
    assert(out === ((1L, 7L, 7L, 1.0, None)))
  }

  test("null keys are excluded from the profile") {
    val df = Seq(Some(1L), Some(1L), None, Some(2L)).toDF("k")
    val out = KeySkew.loadProfile(df, Seq("k"))
      .select("n_keys", "n_rows").as[(Long, Long)].head()
    assert(out === ((2L, 3L)))
  }

  test("layout invariance: repartitioned input gives bit-identical gini") {
    val keys = (0 until 2000).map(i => (i * 31L) % 97L)
    val df1 = keys.map(Tuple1(_)).toDF("k")
    val a = KeySkew.loadProfile(df1.repartition(1), Seq("k"))
      .select("gini_load").as[Double].head()
    val b = KeySkew.loadProfile(df1.repartition(16), Seq("k"))
      .select("gini_load").as[Double].head()
    assert(a === b)
  }
}
