package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("reduceJoin equals the plain join (no false negatives)") {
    val rnd = new scala.util.Random(11)
    val fact = (1 to 5000).map(i => (rnd.nextInt(2000).toLong, i.toDouble))
      .toDF("k", "v")
    val dim = (1 to 150).map(i => (rnd.nextInt(2000).toLong, s"d$i"))
      .toDF("k", "name").distinct()
    val plain = fact.join(dim, Seq("k"))
      .select("k", "v", "name").collect().toSet
    val reduced = BloomJoin.reduceJoin(fact, dim, Seq("k"),
        expectedItems = 1000L)
      .select("k", "v", "name").collect().toSet
    assert(reduced === plain)
  }

  test("prune keeps every true match and drops most non-matches") {
    val fact = (1L to 100000L).map(k => (k, k * 2)).toDF("k", "v")
    val dim = (1L to 100L).map(k => (k * 997L) % 100000L).toDF("k")
    val trueKeys = dim.as[Long].collect().toSet
    val pruned = BloomJoin.prune(fact, dim, Seq("k"),
        expectedItems = 200L, fpp = 0.01)
      .select("k").as[Long].collect()
    assert(trueKeys.subsetOf(pruned.toSet), "a true match was dropped")
    // at 1% fpp the pruned set should be a tiny fraction of the fact side
    assert(pruned.length < 5000,
      s"pruning kept ${pruned.length} of 100k rows — filter ineffective")
  }

  test("multi-column keys hash consistently on both sides") {
    val fact = (1 to 1000).map(i => (i.toLong % 50, s"g${i % 7}", i))
      .toDF("a", "b", "v")
    val dim = Seq((3L, "g1", "x"), (10L, "g4", "y"), (999L, "g0", "z"))
      .toDF("a", "b", "tag")
    val plain = fact.join(dim, Seq("a", "b")).select("a", "b", "v", "tag")
      .collect().toSet
    val reduced = BloomJoin.reduceJoin(fact, dim, Seq("a", "b"), 100L)
      .select("a", "b", "v", "tag").collect().toSet
    assert(reduced === plain)
    assert(plain.nonEmpty)
  }
}
