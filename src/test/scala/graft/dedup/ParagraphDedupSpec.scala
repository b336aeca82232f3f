package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ParagraphDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val boiler = "subscribe now"

  private def corpus = Seq(
    (1L, s"$boiler\nalpha beta\ngamma delta"),
    (2L, s"$boiler\nepsilon zeta"),
    (3L, s"$boiler\nalpha beta\n\n  \ntheta iota"),
    (4L, "kappa lambda")
  ).toDF("doc_id", "text")

  test("removeRepeated drops only paragraphs above the df threshold, in order") {
    val out = ParagraphDedup.removeRepeated(corpus, "doc_id", "text", maxDocFreq = 2L)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    // boiler has df 3 (> 2) and is removed; "alpha beta" has df 2 and stays;
    // blank paragraphs in doc 3 vanish without affecting order
    assert(out === Seq(
      (1L, "alpha beta\ngamma delta", 1L),
      (2L, "epsilon zeta", 1L),
      (3L, "alpha beta\ntheta iota", 1L),
      (4L, "kappa lambda", 0L)))
  }

  test("an all-boilerplate doc survives as an empty-text row") {
    val docs = Seq((1L, boiler), (2L, boiler), (3L, s"$boiler\nunique tail"))
      .toDF("doc_id", "text")
    val out = ParagraphDedup.removeRepeated(docs, "doc_id", "text", maxDocFreq = 1L)
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((1L, "", 1L), (2L, "", 1L), (3L, "unique tail", 1L)))
  }

  test("paragraphFrequencies profiles df and skips blank paragraphs") {
    val freqs = ParagraphDedup.paragraphFrequencies(corpus, "doc_id", "text")
      .orderBy(desc("doc_freq"), col("example"))
      .as[(Long, Long, String)].collect().toSeq
    assert(freqs.head._2 === 3L)
    assert(freqs.head._3 === boiler)
    assert(!freqs.map(_._3).contains(""))
    assert(freqs.count(_._2 === 2L) === 1) // "alpha beta"
  }
}
