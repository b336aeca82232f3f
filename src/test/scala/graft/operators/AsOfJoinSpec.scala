package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, 10L, ts("2024-01-01 00:00:05")),
    (2L, 10L, ts("2024-01-01 00:00:10")), // equal to a right ts — inclusive
    (3L, 10L, ts("2024-01-01 00:00:02")), // before any right row
    (4L, 20L, ts("2024-01-01 00:00:30")),
    (5L, 30L, ts("2024-01-01 00:00:30"))  // key with no right rows
  ).toDF("id", "k", "ts")

  private lazy val right = Seq(
    (10L, ts("2024-01-01 00:00:04"), 1.0),
    (10L, ts("2024-01-01 00:00:10"), 2.0),
    (10L, ts("2024-01-01 00:00:20"), 3.0),
    (20L, ts("2024-01-01 00:00:01"), 9.0)
  ).toDF("k", "rts", "v")

  test("backward as-of attaches the latest right row at-or-before, inclusive") {
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "matched_ts", "v")
      .as[(Long, Option[java.sql.Timestamp], Option[Double])]
      .collect().map(r => r._1 -> ((r._2.map(_.toString), r._3))).toMap
    assert(got(1L) === ((Some("2024-01-01 00:00:04.0"), Some(1.0))))
    assert(got(2L) === ((Some("2024-01-01 00:00:10.0"), Some(2.0)))) // ties include
    assert(got(3L) === ((None, None)))
    assert(got(4L) === ((Some("2024-01-01 00:00:01.0"), Some(9.0))))
    assert(got(5L) === ((None, None)))
  }

  test("tolerance nulls out matches older than the lookback") {
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"),
        toleranceMicros = Some(5000000L)) // 5 s
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === Some(1.0))  // 1s old
    assert(got(4L) === None)       // 29s old > 5s
  }

  test("tolerance compares at full microsecond precision") {
    // a seconds-truncated cutoff would keep the 5.1s-old match below
    val l = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05.500")),
      (2L, 10L, ts("2024-01-01 00:00:05.300"))).toDF("id", "k", "ts")
    val r = Seq((10L, ts("2024-01-01 00:00:00.400"), 1.0))
      .toDF("k", "rts", "v")
    val got = AsOfJoin.backward(l, r, Seq("k"), "ts", "rts", Seq("v"),
        toleranceMicros = Some(5000000L)) // 5 s
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === None)       // 5.1 s old > 5 s
    assert(got(2L) === Some(1.0))  // 4.9 s old <= 5 s
  }

  test("bucketed variant is bit-identical to the plain plan") {
    // randomized timeline across many keys and bucket boundaries
    val r = new scala.util.Random(7)
    val lv = (1 to 400).map { i =>
      (i.toLong, (r.nextInt(5) + 1).toLong,
        new java.sql.Timestamp(1700000000000L + r.nextInt(1000000) * 1000L))
    }
    val rv = (1 to 300).map { i =>
      ((r.nextInt(5) + 1).toLong,
        new java.sql.Timestamp(1700000000000L + r.nextInt(1000000) * 1000L),
        i.toDouble)
    }
    val l = lv.toDF("id", "k", "ts")
    val rt = rv.toDF("k", "rts", "v")
    val plain = AsOfJoin.backward(l, rt, Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "matched_ts", "v").collect().toSet
    // 100-second buckets → many boundary carries exercised
    val bucketed = AsOfJoin.backwardBucketed(l, rt, Seq("k"), "ts", "rts",
        Seq("v"), bucketWidth = 100L * 1000000L)
      .select("id", "matched_ts", "v").collect().toSet
    assert(bucketed === plain)
  }

  test("forward as-of attaches the earliest right row at-or-after, inclusive") {
    val got = AsOfJoin.forward(left, right, Seq("k"), "ts", "rts", Seq("v"))
      .select("id", "v").as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === Some(2.0)) // next at 00:10
    assert(got(2L) === Some(2.0)) // equal ts includes
    assert(got(3L) === Some(1.0)) // earliest right at 00:04
    assert(got(4L) === None)      // no right at-or-after 00:30 for k=20
    assert(got(5L) === None)
  }

  test("left rows keep all their columns and cardinality") {
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"))
    assert(out.columns.toSeq === Seq("id", "k", "ts", "matched_ts", "v"))
    assert(out.count() === left.count())
  }
}
