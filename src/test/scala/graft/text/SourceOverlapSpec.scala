package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SourceOverlapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def overlap(rows: Seq[(String, String)], maxGroups: Int = 256) =
    SourceOverlap.vocabOverlap(rows.toDF("src", "text"), "src", "text",
        maxGroups)
      .orderBy("g_a", "g_b")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq

  test("golden: jaccard and containment by hand") {
    val out = overlap(Seq(
      ("s1", "a b c"), ("s1", "c d"),      // vocab s1 = {a,b,c,d}
      ("s2", "c d e"),                     // vocab s2 = {c,d,e}
      ("s3", "x y")))                      // disjoint
    assert(out === Seq(
      ("s1", "s2", 2L, 4L, 3L, 2.0 / 5.0, 2.0 / 3.0)))
  }

  test("presence semantics: repeated tokens inflate nothing") {
    val a = overlap(Seq(("p", "w w w w v"), ("q", "w")))
    val b = overlap(Seq(("p", "w v"), ("q", "w")))
    assert(a === b)
  }

  test("subset vocabulary: containment 1, jaccard < 1") {
    val out = overlap(Seq(("big", "a b c d"), ("sub", "b c")))
    assert(out.size === 1)
    val r = out.head
    assert(r._7 === 1.0)
    assert(r._6 === 0.5)
  }

  test("pair order is canonical: g_a < g_b regardless of input order") {
    val out = overlap(Seq(("zzz", "t u"), ("aaa", "u v")))
    assert(out.map(r => (r._1, r._2)) === Seq(("aaa", "zzz")))
  }

  test("the maxGroups cap aborts loudly before the quadratic join") {
    val rows = (1 to 5).map(i => (s"s$i", "shared tok"))
    val ex = intercept[Exception] { overlap(rows, maxGroups = 3) }
    assert(ex.getMessage.contains("maxGroups"))
  }
}
