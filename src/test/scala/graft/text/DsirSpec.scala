package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val m = 64

  test("weights favor buckets over-represented in the target") {
    val target = Seq.fill(20)((1L, "alpha alpha beta")).toDF("id", "text")
    val raw = (target.as[(Long, String)].collect().toSeq ++
      Seq.fill(20)((2L, "spam spam click here"))).toDF("id", "text")
    val w = Dsir.bucketWeights(target, raw, "text", m).as[(Int, Double)]
      .collect().toMap
    val bucketOf = target.select(explode(
      QualityClassifier.tokenBuckets(lit("alpha"), m))).as[Int].head()
    val spamBucket = target.select(explode(
      QualityClassifier.tokenBuckets(lit("spam"), m))).as[Int].head()
    assert(w(bucketOf) > 0.0)
    assert(w(spamBucket) < 0.0)
  }

  test("target-like docs rank above off-target docs and exact selection keeps the fraction") {
    val target = (1 to 10).map(i => (i.toLong, "alpha beta gamma delta")).toDF("id", "text")
    val noise = (11 to 30).map(i => (i.toLong, "click free prize winner"))
    val raw = (target.as[(Long, String)].collect().toSeq ++ noise).toDF("id", "text")
    val w = Dsir.bucketWeights(target, raw, "text", m)
    val sel = Dsir.select(Dsir.score(raw, "id", "text", w, m), "id", 0.5)
      .as[(Long, Double, Boolean)].collect()
    assert(sel.count(_._3) === 15) // ceil(30 * 0.5)
    // all 10 target docs make the kept half
    assert(sel.filter(_._1 <= 10).forall(_._3))
  }

  test("threshold selection agrees with exact selection away from the boundary") {
    val docs = (1 to 100).map(i =>
      (i.toLong, if (i <= 30) "alpha beta gamma" else "click free prize")).toDF("id", "text")
    val target = docs.filter(col("id") <= 30)
    val w = Dsir.bucketWeights(target, docs, "text", m)
    val scored = Dsir.score(docs, "id", "text", w, m).cache()
    val exact = Dsir.select(scored, "id", 0.3).filter(col("kept"))
      .select("id").as[Long].collect().toSet
    val approx = Dsir.keptByThreshold(scored, 0.3).filter(col("kept"))
      .select("id").as[Long].collect().toSet
    // two clean score clusters — both paths pick exactly the target docs
    assert(exact === (1L to 30L).toSet)
    assert(approx === exact)
    scored.unpersist()
  }
}
