package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PrefixJaccardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)], t: Double)
      : Map[(Long, Long), Double] =
    Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        shingleSize = 3, threshold = t)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard"))
      .toMap

  /** Brute-force reference over distinct word 3-shingle sets. */
  private def brute(docs: Seq[(Long, String)], t: Double)
      : Map[(Long, Long), Double] = {
    def sh(s: String): Set[String] = {
      val w = s.trim.split("\\s+").filter(_.nonEmpty)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val ss = docs.map { case (id, txt) => id -> sh(txt) }
    (for {
      (a, sa) <- ss; (b, sb) <- ss
      if a < b && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= t
    } yield (a, b) -> j).toMap
  }

  private val corpus: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog while rain " +
      "falls on the quiet gray town in early november morning light"
    Seq(
      1L -> base,
      2L -> (base + " extra tail words here"),
      3L -> base.replace("quiet", "noisy"),
      4L -> ("completely different text about spark catalyst plans and " +
        "shuffle exchanges in distributed query execution engines today"),
      5L -> base, // exact duplicate of 1
      6L -> "the quick brown fox jumps over the lazy dog",
      7L -> "short text only",
      8L -> ("unrelated " * 20).trim)
  }

  test("matches the brute-force pair set exactly at several thresholds") {
    Seq(0.3, 0.5, 0.8).foreach { t =>
      val got = pairs(corpus, t)
      val want = brute(corpus, t)
      assert(got.keySet === want.keySet, s"t=$t")
      want.foreach { case (k, j) =>
        assert(math.abs(got(k) - j) < 1e-12, s"t=$t pair $k")
      }
    }
  }

  test("LOSSLESS where the df-capped index gives up: shared boilerplate") {
    // every doc is boilerplate + one rare word: all shared shingles are
    // high-df, so a df cap of 4 drops every posting — ngramJaccardPairs
    // with maxShingleDf=4 must lose the pairs; the prefix filter keeps
    // them because each doc still posts its RAREST shingles
    val boiler = "all rights reserved contact us for terms of service and " +
      "privacy policy information on this website"
    val docs = (1L to 12L).map(i => i -> s"$boiler page$i")
    val want = brute(docs, 0.5)
    assert(want.nonEmpty)
    assert(pairs(docs, 0.5) === want)
    val capped = Dedup.ngramJaccardPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingleSize = 3, threshold = 0.5, maxShingleDf = 4)
      .count()
    assert(capped < want.size, "the cap should actually bite here")
  }

  test("exact duplicates expand over members at jaccard 1.0") {
    val got = pairs(corpus, 0.9)
    assert(got((1L, 5L)) === 1.0)
  }

  test("size filter and prefixes: disjoint docs produce no candidates") {
    val got = pairs(Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven eight nine ten"), 0.3)
    assert(got.isEmpty)
  }

  test("invariant to partitioning and layout") {
    def run(parts: Int, rev: Boolean) = {
      val d = (if (rev) corpus.reverse else corpus).toDF("doc_id", "text")
      Dedup.prefixJaccardPairs(d.repartition(parts), "doc_id", "text",
          threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(run(1, rev = false) === run(17, rev = true))
  }
}
