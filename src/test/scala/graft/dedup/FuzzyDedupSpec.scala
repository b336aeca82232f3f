package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class FuzzyDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("symmetric-delete pairs equal the brute-force scan (complete)") {
    // random words with planted near-misses
    val rnd = new scala.util.Random(17)
    val base = (1 to 120).map(_ =>
      (1 to (4 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    val mutated = base.take(40).map { w =>
      val i = rnd.nextInt(w.length)
      w.substring(0, i) + ('a' + rnd.nextInt(6)).toChar + w.substring(i + 1)
    }
    val words = (base ++ mutated).distinct
    val df = words.map(Tuple1(_)).toDF("w")
    for (d <- Seq(1, 2)) {
      val expected = (for {
        a <- words; b <- words if a < b && lev(a, b) <= d
      } yield (a, b, lev(a, b))).toSet
      val got = FuzzyDedup.pairsWithinEdit(df, "w", maxEdit = d)
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got === expected, s"maxEdit=$d")
      assert(got.nonEmpty)
    }
  }

  test("deletion variants: counts and membership") {
    val vs = Seq(Tuple1("abc")).toDF("w")
      .select(graft.functions.expressions.TextExpressions
        .deletion_variants(col("w"), 2).as("v"))
      .head().getSeq[String](0).toSet
    // d=2 over "abc": itself, 3 one-deletes, 3 two-deletes
    assert(vs === Set("abc", "ab", "ac", "bc", "a", "b", "c"))
  }

  test("df-capped variant buckets drop candidates, never corrupt them") {
    val df = Seq("aa", "ab", "zz", "zy").map(Tuple1(_)).toDF("w")
    // cap 2: the empty-string variant bucket (all 4 words at d=2) is
    // dropped, but pair-local variants survive
    val got = FuzzyDedup.pairsWithinEdit(df, "w", maxEdit = 1, maxBucket = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("aa", "ab"), ("zy", "zz")))
  }

  test("hostile-length keys fail loudly instead of exploding variants") {
    // a 100-char key at maxEdit=3 would emit ~166k deletion variants —
    // the guard must abort with the offending value, not truncate
    // (truncation changes which pairs match) and not hang
    val df = (Seq("short", "a" * 100)).map(Tuple1(_)).toDF("w")
    val e = intercept[Exception] {
      FuzzyDedup.pairsWithinEdit(df, "w", maxEdit = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("maxLen")), s"got: ${e.getMessage}")
    // raising maxLen admits the key again
    val ok = FuzzyDedup.pairsWithinEdit(
      Seq("abcd", "abce").map(Tuple1(_)).toDF("w"), "w", maxEdit = 1, maxLen = 64)
    assert(ok.count() === 1)
  }

  test("canonicalizeSpellings maps variants to the dominant form") {
    // "color" dominates its cluster {color, colour, colr}; "table"
    // dominates {table, tables}; "spark" is a singleton
    val occ = (Seq.fill(10)("color") ++ Seq.fill(4)("colour") ++
      Seq.fill(2)("colr") ++ Seq.fill(5)("table") ++ Seq.fill(3)("tables") ++
      Seq.fill(7)("spark")).map(Tuple1(_))
    val got = FuzzyDedup.canonicalizeSpellings(
        occ.toDF("w").repartition(5), "w", maxEdit = 1)
      .collect()
      .map(r => r.getAs[String]("word") ->
        ((r.getAs[String]("canonical"), r.getAs[Long]("cnt")))).toMap
    assert(got("color") === (("color", 10L)))
    assert(got("colour") === (("color", 4L)))
    assert(got("colr") === (("color", 2L)))
    assert(got("table") === (("table", 5L)))
    assert(got("tables") === (("table", 3L)))
    assert(got("spark") === (("spark", 7L)))
  }

  test("canonicalizeSpellings: reliable checkpoint mode is bit-identical to local") {
    val occ = (Seq.fill(10)("color") ++ Seq.fill(4)("colour") ++
      Seq.fill(2)("colr") ++ Seq.fill(5)("table") ++ Seq.fill(3)("tables") ++
      Seq.fill(7)("spark")).map(Tuple1(_))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-canon-ckpt").toString
    try {
      val local = FuzzyDedup.canonicalizeSpellings(
          occ.toDF("w"), "w", maxEdit = 1)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      val durable = FuzzyDedup.canonicalizeSpellings(
          occ.toDF("w"), "w", maxEdit = 1, checkpointDir = Some(dir))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(durable === local)
      assert(new java.io.File(dir).listFiles != null &&
        new java.io.File(dir).listFiles.nonEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(dir))
  }

  test("canonicalizeSpellings breaks frequency ties lexicographically LAST") {
    val occ = (Seq.fill(3)("gray") ++ Seq.fill(3)("grey")).map(Tuple1(_))
    val got = FuzzyDedup.canonicalizeSpellings(occ.toDF("w"), "w")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map("gray" -> "grey", "grey" -> "grey"))
  }

  test("nfc normalization composes decomposed sequences (native expr)") {
    // explicit escapes: input decomposed (e+U+0301, o+U+0302), output composed
    val out = Seq(Tuple1("e\u0301 o\u0302 plain")).toDF("s")
      .select(graft.functions.expressions.TextExpressions
        .nfc_normalize(col("s")).as("n"))
      .head().getString(0)
    assert(out === "\u00e9 \u00f4 plain")
    assert(out.length === 9)
  }
}
