package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CollocationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def table(docs: Seq[String], minCount: Long = 1) =
    Collocations.pmiTable(docs.zipWithIndex.map(_.swap).toDF("id", "text"),
        "text", minCount)
      .orderBy("a", "b")
      .as[(String, String, Long, Long, Long, Long, Double)]
      .collect().toSeq

  test("golden: counts and pmi ratios by hand") {
    // doc1 tokens: a b a b  -> pairs (a,b) (b,a) (a,b)
    // doc2 tokens: b c      -> pair (b,c)
    // unigrams: a=2, b=3, c=1; N=6
    val out = table(Seq("a b a b", "b c"))
    assert(out === Seq(
      ("a", "b", 2L, 2L, 3L, 6L, 2.0 * 6 / (2 * 3)),
      ("b", "a", 1L, 3L, 2L, 6L, 1.0 * 6 / (3 * 2)),
      ("b", "c", 1L, 3L, 1L, 6L, 1.0 * 6 / (3 * 1))))
  }

  test("case folding and whitespace runs normalize before pairing") {
    val out = table(Seq("The  THE\tthe"))
    assert(out === Seq(("the", "the", 2L, 3L, 3L, 3L, 2.0 * 3 / (3 * 3))))
  }

  test("blank and single-token docs contribute no pairs") {
    val out = table(Seq("", "   ", "solo", "x y"))
    assert(out.map(p => (p._1, p._2)) === Seq(("x", "y")))
    // but the solo token still counts in unigrams and N
    assert(out.head._6 === 3L) // N: solo, x, y
  }

  test("minCount culls hapax pairs") {
    val out = table(Seq("p q p q", "p q", "r s"), minCount = 3)
    assert(out.map(p => (p._1, p._2, p._3)) === Seq(("p", "q", 3L)))
  }

  test("adjacent order matters: (a,b) and (b,a) are distinct pairs") {
    val out = table(Seq("u v", "v u"))
    assert(out.map(p => (p._1, p._2, p._3)) ===
      Seq(("u", "v", 1L), ("v", "u", 1L)))
  }
}
