package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed join equals the naive cross-product filter, endpoints inclusive") {
    val r = new scala.util.Random(11)
    val base = 1700000000000L
    val points = (1 to 300).map { i =>
      (i.toLong, (r.nextInt(4) + 1).toLong,
        new java.sql.Timestamp(base + r.nextInt(500000) * 1000L))
    }.toDF("pid", "k", "t")
    val intervals = (1 to 60).map { i =>
      val s = base + r.nextInt(500000) * 1000L
      (i.toLong, (r.nextInt(4) + 1).toLong,
        new java.sql.Timestamp(s),
        new java.sql.Timestamp(s + (r.nextInt(120) + 1) * 1000000L))
    }.toDF("iid", "k2", "s", "e")

    val naive = points.join(intervals, col("k") === col("k2") &&
        col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").collect().toSet
    // rename key for the operator (shared key name required)
    val iv = intervals.withColumnRenamed("k2", "k")
    val got = RangeJoin.bucketed(points, iv, Seq("k"), "t", "s", "e",
        bucketWidth = 60L * 1000000L)
      .select("pid", "iid").collect().toSet
    assert(got === naive)
    assert(got.nonEmpty)
    val bc = RangeJoin.broadcastSide(points, iv, Seq("k"), "t", "s", "e")
      .select("pid", "iid").collect().toSet
    assert(bc === naive)
  }

  test("a point on an exact bucket boundary still matches intervals ending there") {
    val w = 1000000L // 1s buckets
    val points = Seq((1L, 1L, new java.sql.Timestamp(1700000002000L)))
      .toDF("pid", "k", "t")
    val intervals = Seq(
      (1L, 1L, new java.sql.Timestamp(1700000000000L),
        new java.sql.Timestamp(1700000002000L)), // ends exactly at the point
      (2L, 1L, new java.sql.Timestamp(1700000002000L),
        new java.sql.Timestamp(1700000003000L))  // starts exactly at the point
    ).toDF("iid", "k", "s", "e")
    val got = RangeJoin.bucketed(points, intervals, Seq("k"), "t", "s", "e", w)
      .select("iid").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }
}
