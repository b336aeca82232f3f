package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def zipfItems(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // zipf-ish: item id ~ floor(1/u) capped — few heavy, long light tail
    (1 to n).map { _ =>
      val u = rnd.nextDouble().max(1e-6)
      s"item${math.min((1 / u).toInt, 5000)}"
    }.toDF("token")
  }

  test("topKExact equals the exact top-k on a skewed corpus") {
    val items = zipfItems(20000, seed = 5).repartition(8)
    val exact = items.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = HeavyHitters.topKExact(items, "token", k = 10, counters = 256)
      .orderBy(col("cnt").desc, col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exact)
  }

  test("certificate fails loudly on a flat corpus with too few counters") {
    // 4000 distinct items, one occurrence each — no item is heavy, so
    // the k-th count (1) cannot clear the N/(counters+1) bound
    val flat = (1 to 4000).map(i => s"u$i").toDF("token").repartition(4)
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topKExact(flat, "token", k = 5, counters = 16)
    }
    assert(e.getMessage.contains("certificate failed"))
  }

  test("candidates is a superset of every provably-heavy item") {
    val items = zipfItems(30000, seed = 9).repartition(16)
    val counters = 128
    val n = items.count()
    val bound = n / (counters + 1)
    val heavy = items.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > bound)
      .select("token").as[String].collect().toSet
    val cand = HeavyHitters.candidates(items, "token", counters)
      .as[String].collect().toSet
    assert(heavy.subsetOf(cand),
      s"missing provably-heavy items: ${(heavy -- cand).take(5)}")
  }
}
