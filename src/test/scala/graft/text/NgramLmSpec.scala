package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class NgramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigrams carry a BOS context and drop trim-empty texts") {
    val df = Seq((1L, "A b  c"), (2L, "solo"), (3L, "   ")).toDF("id", "text")
    val got = df.select(col("id"), NgramLm.bigrams(col("text")).as("bg"))
      .as[(Long, Seq[(String, String)])].collect().toMap
    assert(got(1L) === Seq("<s>" -> "a", "a" -> "b", "b" -> "c"))
    assert(got(2L) === Seq("<s>" -> "solo"))
    assert(got(3L) === Seq.empty)
  }

  test("hand-computed add-k perplexity on a three-doc corpus") {
    // train on both docs: bigrams (<s>,a) x2, (a,b), (a,a); V = {a,b} = 2
    val docs = Seq((1L, "a b"), (2L, "a a")).toDF("doc_id", "text")
    val model = NgramLm.train(docs, "text")
    assert(model.vocabSize === 2L)
    val got = NgramLm.score(docs, "doc_id", "text", model, k = 0.5, roundTo = 6)
      .as[(Long, Long, Double)].collect()
      .map { case (id, nb, ppl) => id -> ((nb, ppl)) }.toMap
    // doc1: p(a|<s>) = (2+.5)/(2+1) = 5/6 ; p(b|a) = (1+.5)/(2+1) = 1/2
    val nll1 = -(math.log(5.0 / 6) + math.log(0.5)) / 2
    // doc2: p(a|<s>) = 5/6 ; p(a|a) = 1/2
    val exp1 = BigDecimal(math.exp(nll1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((2L, exp1)))
    assert(got(2L) === ((2L, exp1)))
  }

  test("unseen bigrams raise perplexity; df-cap drops tail bigrams but keeps smoothing mass") {
    val trusted = (1 to 50).map(i => (i.toLong, "the quick fox jumps"))
    val rare = Seq((100L, "the slow fox naps"))
    val docs = (trusted ++ rare).toDF("doc_id", "text")
    val full = NgramLm.train(docs, "text")
    val capped = NgramLm.train(docs, "text", minCount = 2)
    // the rare doc's bigrams survive only in the uncapped model
    assert(full.bigramCounts.count() > capped.bigramCounts.count())
    // context totals and V identical — smoothing denominator unchanged
    assert(full.vocabSize === capped.vocabSize)
    val scored = NgramLm.score(
      Seq((1L, "the quick fox jumps"), (2L, "zz yy xx ww")).toDF("doc_id", "text"),
      "doc_id", "text", full)
      .as[(Long, Long, Double)].collect()
      .map { case (id, nb, ppl) => id -> ((nb, ppl)) }.toMap
    assert(scored(1L)._2 < scored(2L)._2)
  }
}
