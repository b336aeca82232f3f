package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MomentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sums and derived stats match a local exact computation") {
    val vals = Seq(1L, 2L, 2L, 3L, 7L, 10L, 10L, 10L, -4L, 0L)
    val row = Moments.summarize(vals.map(Tuple1(_)).toDF("v"), "v")
      .derived().head()
    val n = vals.size.toDouble
    val mean = vals.sum / n
    val ex2 = vals.map(v => v.toDouble * v).sum / n
    val vr = ex2 - mean * mean
    assert(row.getAs[Long]("n") === vals.size.toLong)
    assert(row.getAs[Long]("s1") === vals.sum)
    assert(row.getAs[Long]("s2") === vals.map(v => v * v).sum)
    assert(row.getAs[Long]("s3") === vals.map(v => v * v * v).sum)
    assert(row.getAs[Long]("s4") === vals.map(v => v * v * v * v).sum)
    assert(math.abs(row.getAs[Double]("mean") - mean) < 1e-12)
    assert(math.abs(row.getAs[Double]("var_pop") - vr) < 1e-9)
    // skewness sign: the tail is to the left here (mean < median)
    assert(row.getAs[Double]("skew") < 0.5)
  }

  test("merge of shard summaries equals the whole-corpus summary") {
    val a = (1 to 400).map(i => ((i % 3).toString, (i % 17).toLong))
      .toDF("g", "v")
    val b = (1 to 300).map(i => ((i % 3).toString, (i % 23).toLong))
      .toDF("g", "v")
    def asMap(m: Moments.Mom) = m.sums.collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val whole = Moments.summarize(a.unionAll(b), "v", Seq("g"))
    val merged = Moments.summarize(a, "v", Seq("g"))
      .merge(Moments.summarize(b, "v", Seq("g")))
    assert(asMap(merged) === asMap(whole))
  }

  test("partition invariance: identical sums under 1 and 16 partitions") {
    val df = (1 to 999).map(i => Tuple1((i % 101).toLong))
    val one = Moments.summarize(df.toDF("v").coalesce(1), "v").sums.head()
    val many = Moments.summarize(df.toDF("v").repartition(16), "v").sums.head()
    assert(one === many)
  }

  test("group mismatch on merge fails loudly") {
    val df = Seq(("a", 1L)).toDF("g", "v")
    val ex = intercept[IllegalArgumentException] {
      Moments.summarize(df, "v", Seq("g"))
        .merge(Moments.summarize(df, "v"))
    }
    assert(ex.getMessage.contains("moments group mismatch"))
  }

  test("fractional input aborts loudly instead of silently truncating") {
    val ex = intercept[Exception] {
      Moments.summarize(Seq(1.0, 2.5).map(Tuple1(_)).toDF("v"), "v")
        .sums.collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("integral values")), ex.toString)
  }

  test("constant group: zero variance, null skew/kurt (guarded, not NaN)") {
    val row = Moments.summarize(Seq(5L, 5L, 5L).map(Tuple1(_)).toDF("v"), "v")
      .derived().head()
    assert(row.getAs[Double]("var_pop") === 0.0)
    assert(row.isNullAt(row.fieldIndex("skew")))
    assert(row.isNullAt(row.fieldIndex("kurt")))
  }
}
