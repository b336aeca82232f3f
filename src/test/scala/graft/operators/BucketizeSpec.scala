package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BucketizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quartiles on 1..8: two values per bucket, boundaries inclusive-left") {
    val df = (1L to 8L).map(v => ("g", v)).toDF("g", "v")
    val got = Bucketize.equiDepth(df, Seq("g"), "v", nBuckets = 4)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Int]("v_bucket"))
      .toMap
    // cuts at q25/q50/q75 of 1..8 = 2.75, 4.5, 6.25
    assert(got === Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 2,
      6L -> 2, 7L -> 3, 8L -> 3))
  }

  test("ties share a bucket (the anti-ntile contract)") {
    val df = (Seq.fill(6)(5L) ++ Seq(1L, 9L)).map(v => ("g", v)).toDF("g", "v")
    val buckets = Bucketize.equiDepth(df, Seq("g"), "v", nBuckets = 4)
      .filter(col("v") === 5L)
      .select("v_bucket").distinct().collect()
    assert(buckets.length === 1, "equal values must share a bucket")
  }

  test("grouped: each group gets its own cuts; nulls bucket null") {
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", Some(3L)),
      ("a", Some(4L)), ("b", Some(100L)), ("b", Some(200L)),
      ("b", Some(300L)), ("b", Some(400L)), ("a", None)).toDF("g", "v")
    val got = Bucketize.equiDepth(df, Seq("g"), "v", nBuckets = 2)
      .collect()
      .map(r => (r.getAs[String]("g"), Option(r.get(r.fieldIndex("v")))) ->
        Option(r.get(r.fieldIndex("v_bucket")))).toMap
    assert(got(("a", Some(1L))) === Some(0))
    assert(got(("a", Some(4L))) === Some(1))
    assert(got(("b", Some(100L))) === Some(0))
    assert(got(("b", Some(400L))) === Some(1))
    assert(got(("a", None)) === None)
  }

  test("invariant to partitioning and row order") {
    val rows = (1 to 1000).map { i =>
      val h = i * 2654435761L
      (s"g${(h >>> 5) % 3}", ((h >>> 33) % 50).toLong)
    }
    def run(d: org.apache.spark.sql.DataFrame) =
      Bucketize.equiDepth(d, Seq("g"), "v", 10)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          r.getAs[Int]("v_bucket")).toMap
    assert(run(rows.toDF("g", "v").repartition(13)) ===
      run(rows.reverse.toDF("g", "v").coalesce(1)))
  }

  test("oracleSql select list is well-formed for every carry/group combo") {
    // empty carryCols (and empty groupCols) used to leave a dangling
    // comma: "SELECT r.g, , CASE …"
    val combos = Seq(
      (Seq("g"), Seq("id")), (Seq("g"), Nil),
      (Nil, Seq("id")), (Nil, Nil))
    combos.foreach { case (g, c) =>
      val sql = Bucketize.oracleSql("SELECT 1", g, nBuckets = 4, carryCols = c)
      assert(!sql.matches("(?s).*SELECT\\s*,.*"), s"leading comma in:\n$sql")
      assert(!sql.matches("(?s).*,\\s*,.*"), s"double comma in:\n$sql")
      assert(!sql.matches("(?s).*,\\s*FROM.*"), s"trailing comma in:\n$sql")
    }
  }
}
