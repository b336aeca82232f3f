package graft.dedup

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ExactSubstrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def spans(docs: org.apache.spark.sql.DataFrame, l: Int) =
    ExactSubstr.maximalSharedSpans(docs, "doc_id", "text", spanTokens = l)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4))).toSet

  test("a planted span is reported once, maximal, with exact extents") {
    // docs share tokens s1..s9 (9 tokens) at positions 3..11 of A and
    // 1..9 of B; nothing else overlaps
    val a = "x1 x2 s1 s2 s3 s4 s5 s6 s7 s8 s9 x3 x4"
    val b = "s1 s2 s3 s4 s5 s6 s7 s8 s9 y1 y2 y3"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    assert(spans(docs, 4) === Set((1L, 2L, 3, 1, 9)))
    // raising L above the span length hides it
    assert(spans(docs, 10) === Set.empty)
    // L equal to the span length: exactly the one seed
    assert(spans(docs, 9) === Set((1L, 2L, 3, 1, 9)))
  }

  test("two disjoint shared spans on different diagonals stay separate") {
    val a = "p1 p2 p3 p4 z1 z2 q1 q2 q3 q4 q5"
    val b = "q1 q2 q3 q4 q5 w1 w2 w3 p1 p2 p3 p4"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    assert(spans(docs, 4) === Set((1L, 2L, 1, 9, 4), (1L, 2L, 7, 1, 5)))
  }

  test("a gap splits one diagonal into two maximal spans") {
    // same diagonal (aligned docs), one differing token in the middle
    val a = "t1 t2 t3 t4 t5 DIFF t7 t8 t9 t10 t11"
    val b = "t1 t2 t3 t4 t5 OTHER t7 t8 t9 t10 t11"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    assert(spans(docs, 3) === Set((1L, 2L, 1, 1, 5), (1L, 2L, 7, 7, 5)))
  }

  test("three docs sharing a span report all three pairs") {
    val t = "c1 c2 c3 c4 c5"
    val docs = Seq((1L, s"a0 $t"), (2L, s"$t b0"), (3L, t))
      .toDF("doc_id", "text")
    assert(spans(docs, 5) === Set(
      (1L, 2L, 2, 1, 5), (1L, 3L, 2, 1, 5), (2L, 3L, 1, 1, 5)))
  }

  test("result is invariant to partitioning and row order") {
    val rnd = new scala.util.Random(7)
    val frag = (1 to 30).map(i => s"f$i").mkString(" ")
    val docs = (1L to 60L).map { i =>
      val noise = (1 to 20).map(_ => s"n${rnd.nextInt(5000)}").mkString(" ")
      val text = if (i % 3 == 0) s"$noise $frag" else s"$noise x$i $noise"
      (i, text)
    }.toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      ExactSubstr.maximalSharedSpans(d, "doc_id", "text", spanTokens = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getInt(3), r.getInt(4))).toSet
    val s1 = run(docs.repartition(13))
    val s2 = run(docs.orderBy($"doc_id".desc))
    assert(s1 === s2)
    // every doc pair from the i%3==0 family shares the 30-token tail
    assert(s1.count(t => t._5 >= 30) === 20 * 19 / 2)
  }

  test("hash collisions are rejected by the exact verify, never reported as spans") {
    // a deliberately degenerate seed key (constant) collides EVERY
    // window into one bucket: docs 1/2 share a real 6-token span, docs
    // 3/4 share nothing — under the collision-only key the 3/4 seed
    // pairs are pure hash noise and the verify step must kill them all,
    // leaving exactly the text-keyed answer
    val docs = Seq(
      (1L, "u1 u2 m1 m2 m3 m4 m5 m6"),
      (2L, "m1 m2 m3 m4 m5 m6 v1"),
      (3L, "w1 w2 w3 w4 w5 w6 w7"),
      (4L, "z1 z2 z3 z4 z5 z6 z7")).toDF("doc_id", "text")
    val collideAll = ExactSubstr.maximalSharedSpans(docs, "doc_id", "text",
        spanTokens = 4, maxSeedDf = 10000,
        seedKey = _ => org.apache.spark.sql.functions.lit(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSet
    assert(collideAll === Set((1L, 2L, 3, 1, 6)))
    // and the default 64-bit key agrees
    assert(spans(docs, 4) === Set((1L, 2L, 3, 1, 6)))
  }

  test("a near-miss window pair (same length, one differing token) is rejected") {
    // under a length-based key these windows collide; the verify must
    // compare the actual text and reject the off-by-one-token match
    val docs = Seq(
      (1L, "k1 k2 k3 k4 k5"),
      (2L, "k1 k2 XX k4 k5")).toDF("doc_id", "text")
    val got = ExactSubstr.maximalSharedSpans(docs, "doc_id", "text",
        spanTokens = 5, maxSeedDf = 10000,
        seedKey = w => org.apache.spark.sql.functions.length(w).cast("long"))
      .collect()
    assert(got.isEmpty)
  }

  test("reliable checkpointDir is bit-identical to the local cut") {
    val docs = Seq(
      (1L, "x1 x2 s1 s2 s3 s4 s5 s6 s7 s8 s9 x3 x4"),
      (2L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 y1 y2 y3"),
      (3L, "z1 s3 s4 s5 s6 s7 z2 z3 z4 z5 z6 z7")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-substr-ckpt").toString
    def collect(d: Option[String]) =
      ExactSubstr.maximalSharedSpans(docs, "doc_id", "text", spanTokens = 4,
          checkpointDir = d)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
          r.getInt(4))).toSet
    val local = collect(None)
    val reliable = collect(Some(dir))
    assert(local === reliable)
    assert(local.nonEmpty)
    // the reliable cut actually wrote state to the dir
    assert(new java.io.File(dir).listFiles().nonEmpty,
      "reliable checkpoint left no files")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("crossSpans reports only train×eval pairs, never train×train") {
    // train docs 1 and 2 share a span with EACH OTHER and doc 1 also
    // shares one with eval doc 10 — only the cross pair may surface
    val train = Seq(
      (1L, "t1 t2 e1 e2 e3 e4 e5 s1 s2 s3 s4 s5"),
      (2L, "s1 s2 s3 s4 s5 zz")).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "e1 e2 e3 e4 e5 qq")).toDF("doc_id", "text")
    val got = ExactSubstr.crossSpans(train, eval, "doc_id", "text",
        spanTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSet
    assert(got === Set((1L, 10L, 3, 1, 5)))
  }

  test("spanOverlap flags exactly the train docs containing an eval span") {
    val train = Seq(
      (1L, "a1 a2 m1 m2 m3 m4 m5 m6 a3"), // 6-token eval span
      (2L, "m1 m2 m3 XX m5 m6 b1"),       // broken — no 5-window survives
      (3L, "c1 c2 c3 c4 c5 c6 c7")).toDF("doc_id", "text")
    val eval = Seq((10L, "m1 m2 m3 m4 m5 m6")).toDF("doc_id", "text")
    val got = graft.text.Decontaminate.spanOverlap(train, eval, spanTokens = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(got === Map(
      1L -> ((1L, 6, true)),
      2L -> ((0L, 0, false)),
      3L -> ((0L, 0, false))))
  }

  private def cut(docs: org.apache.spark.sql.DataFrame, l: Int) = {
    val spans = ExactSubstr.maximalSharedSpans(docs, "doc_id", "text", l)
    ExactSubstr.cutSpans(docs, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
  }

  test("cutSpans removes covered tokens from the later doc only") {
    val a = "x1 x2 s1 s2 s3 s4 s5 x3"
    val b = "s1 s2 s3 s4 s5 y1"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = cut(docs, 5)
    assert(got(1L) === ((8, a)), "first occurrence must stay intact")
    assert(got(2L) === ((1, "y1")))
  }

  test("cutSpans unions overlapping coverage from different pairs") {
    val d1 = "a1 a2 a3 a4 a5 zz"
    val d2 = "a3 a4 a5 a6 a7 ww"
    val d3 = "a1 a2 a3 a4 a5 a6 a7" // covered [1,5] by d1 and [3,7] by d2
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = cut(docs, 5)
    assert(got(1L) === ((6, d1)))
    assert(got(2L) === ((6, d2)))
    assert(got(3L) === ((0, "")), "union of [1,5] and [3,7] covers all 7 tokens")
  }

  test("cutSpans reports n_kept = 0 for empty and whitespace-only docs") {
    val docs = Seq((1L, "a1 a2 a3 a4 a5"), (2L, "a1 a2 a3 a4 a5 b"),
      (3L, ""), (4L, "   ")).toDF("doc_id", "text")
    val got = cut(docs, 5)
    assert(got(3L) === ((0, "")), "empty doc must not report a phantom token")
    assert(got(4L) === ((0, "")), "whitespace-only doc must not report a phantom token")
    assert(got(2L) === ((1, "b")))
  }
}
