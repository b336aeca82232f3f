package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("literal-array and broadcast-table inference paths agree exactly") {
    val m = 32
    val weights = (0 until m).map(j => (j % 7 - 3) * 0.1)
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta"),
      (3L, "alpha alpha alpha")
    ).toDF("doc_id", "text")
    val viaLiteral = docs.select(col("doc_id"),
      QualityClassifier.scoreText(col("text"), weights, bias = 0.2,
        numBuckets = m).as("p_lit"))
    val wtab = weights.zipWithIndex.map { case (w, i) => (i, w) }
      .toDF("bucket", "weight")
    val viaTable = QualityClassifier.scoreWithTable(docs, "doc_id", "text",
      wtab, bias = 0.2, numBuckets = m)
    val joined = viaLiteral.join(viaTable, "doc_id")
      .select(col("doc_id"), abs(col("p_lit") - col("quality_prob")).as("diff"))
      .collect()
    assert(joined.length === 3)
    joined.foreach(r => assert(r.getDouble(1) < 1e-12))
  }

  test("trained weights separate planted quality classes and match MLlib pooling") {
    val m = 128
    val good = Seq("clear structured prose with genuine information content",
      "well researched article citing primary sources throughout",
      "thoughtful analysis of the underlying mechanism involved")
    val bad = Seq("buy cheap pills now click here limited offer",
      "winner winner claim your free prize today click",
      "cheap cheap cheap discount offer offer click now")
    val docs = (0 until 30).map { i =>
      val (txt, lbl) = if (i % 2 == 0) (good(i % 3), 1.0) else (bad(i % 3), 0.0)
      (i.toLong, s"$txt variant$i", lbl)
    }.toDF("doc_id", "text", "label")
    val (w, b) = QualityClassifier.trainWeights(docs, "text", "label", m)
    assert(w.length === m)
    val scored = docs.select(col("label"),
      QualityClassifier.scoreText(col("text"), w.toIndexedSeq, b, m).as("p"))
      .collect()
    // every good doc above 0.5, every bad below — the planted vocabularies
    // are disjoint, so a correctly-wired hashing+pooling pipeline separates
    scored.foreach { r =>
      if (r.getDouble(0) == 1.0) assert(r.getDouble(1) > 0.5)
      else assert(r.getDouble(1) < 0.5)
    }
  }

  test("fnv_buckets is SQL-registered and deterministic") {
    graft.functions.GraftFunctions.registerAll(spark)
    val got = spark.sql(
      "SELECT fnv_buckets(array('alpha','beta'), 64) AS b")
      .collect().head.getSeq[Int](0)
    assert(got.length === 2)
    assert(got.forall(x => x >= 0 && x < 64))
    val again = spark.sql(
      "SELECT fnv_buckets(array('alpha','beta'), 64) AS b")
      .collect().head.getSeq[Int](0)
    assert(got === again)
  }
}
