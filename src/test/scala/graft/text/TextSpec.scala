package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.expressions.TextExpressions

class TextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token count: whitespace runs, blanks, empties") {
    val df = Seq("one two  three", "", "   ", "single", "a b c d")
      .toDF("text")
      .select(TextFunctions.tokenCount(col("text")).as("n"))
    assert(df.as[Int].collect().toSeq === Seq(3, 0, 0, 1, 4))
  }

  test("bpeish tokens segment letters/digits/symbols") {
    val got = Seq("hello world42 x!y")
      .toDF("text")
      .select(TextFunctions.bpeishTokens(col("text")).as("t"))
      .as[Seq[String]].head()
    assert(got === Seq("hello", " world", "42", " x", "!", "y"))
  }

  test("quality score bounded in [0,1] and ranks richer text higher") {
    val df = Seq(
      ("good", "the cat sat on the mat and it was a good day for all of us to be here"),
      ("junk", "!!! ??? *** ### @@@ %%%"))
      .toDF("k", "text")
      .select(col("k"), TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(df("good") > df("junk"))
    assert(df.values.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("langId picks marker-dominant language, falls back to en") {
    val df = Seq(
      ("the cat and the dog of it", "en"),
      ("el perro y la casa de que", "es"),
      ("der hund und die katze ist", "de"),
      ("xyzzy plugh qwerty", "en") // no markers → fallback
    ).toDF("text", "expected")
    val got = df.select(TextFunctions.langId(col("text")).as("got"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("winnow fingerprint: deterministic, shift-tolerant, edit-local") {
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "PREFIX " + a // shifted copy
    val c = "completely unrelated text with other characters"
    val fa = Winnow.fingerprint(a).toSet
    val fb = Winnow.fingerprint(b).toSet
    val fc = Winnow.fingerprint(c).toSet
    assert(Winnow.fingerprint(a).toSeq === Winnow.fingerprint(a).toSeq)
    // shared suffix → substantial fingerprint overlap
    assert((fa & fb).size.toDouble / fa.size > 0.5)
    // unrelated text → little overlap
    assert((fa & fc).size.toDouble / fa.size < 0.2)
  }

  test("winnow expression matches the JVM kernel through codegen") {
    val texts = Seq("some document text for fingerprinting", "ab", "")
    val got = texts.toDF("text")
      .select(TextExpressions.winnow_fingerprint(col("text")).as("fp"))
      .as[Seq[Long]].collect()
    val want = texts.map(t => Winnow.fingerprint(t).toSeq)
    assert(got.toSeq === want)
  }

  test("simhash expression matches the JVM kernel; near-dups are close") {
    import graft.dedup.SimHash
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "the quick brown fox jumps over the lazy dog again and often"
    val got = Seq(t1, t2).toDF("text")
      .select(TextExpressions.simhash64(TextFunctions.wsTokens(col("text"))).as("h"))
      .as[Long].collect()
    assert(got(0) === SimHash.simhash64(t1.split("\\s+").iterator))
    assert(got(1) === SimHash.simhash64(t2.split("\\s+").iterator))
    assert(SimHash.hamming(got(0), got(1)) <= 16)
  }
}
