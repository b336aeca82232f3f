package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.TestSpark

/** Pins the round-13 window rewrites to the forms they replaced:
  *
  *  - [[Rolling.backwardFill]] became a reversed running
  *    `last(ignoreNulls)` (O(1)/row) — must select EXACTLY the element
  *    the old `first(...) ROWS CURRENT→UNBOUNDED FOLLOWING` frame did;
  *  - [[Rolling.rollingMeanFromCums]] (prefix decomposition, O(1)/row)
  *    — must agree with the direct sliding [[Rolling.rollingMean]] up
  *    to double-summation order, and EXACTLY on null placement
  *    (min_samples=1: null iff the frame holds no non-null sample).
  */
class RollingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // gappy frame: 3 keys × 40 positions, nulls in runs (leading, mid,
  // trailing, and one all-null key) plus NaN holes
  private def frame = {
    val rows = for (k <- 1 to 3; p <- 1 to 40) yield {
      val v: Option[Double] =
        if (k == 3) None // all-null key
        else if (p <= 4 && k == 1) None // leading run
        else if (p % 7 == 0) None // mid gaps
        else if (p >= 38 && k == 2) None // trailing run
        else if (p % 11 == 0) Some(Double.NaN) // NaN treated as null
        else Some(math.sin(k * 100 + p) * 50 + 100)
      (k, p, v)
    }
    rows.toDF("k", "p", "v")
  }

  private val part = Seq(col("k"))
  private val order = Seq(col("p"))

  test("backwardFill equals the UnboundedFollowing first() it replaced") {
    val legacy = first(col("v"), ignoreNulls = true).over(
      Window.partitionBy("k").orderBy("p")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val got = frame
      .withColumn("bf_new", Rolling.backwardFill(col("v"), part, order))
      .withColumn("bf_old", legacy)
    // NaN is a legitimate fill VALUE here (backwardFill picks elements,
    // it does not skip NaN — only nulls), so compare with <=> semantics
    assert(got.filter(!(col("bf_new") <=> col("bf_old"))).count() === 0)
  }

  test("prefix rolling mean: exact null placement, values within 1e-12") {
    val (cs, cn) = Rolling.cumSumCount(col("v"), part, order)
    val got = frame
      .withColumn("cs", cs).withColumn("cn", cn)
      .withColumn("direct", Rolling.rollingMean(col("v"), part, order, 7))
      .withColumn("prefix",
        Rolling.rollingMeanFromCums(col("cs"), col("cn"), part, order, 7))
      .select("k", "p", "direct", "prefix").collect()
    got.foreach { r =>
      val d = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      val p = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      assert(d.isDefined === p.isDefined, s"null placement at ${r.get(0)},${r.get(1)}")
      for (dv <- d; pv <- p)
        assert(math.abs(dv - pv) <= 1e-12 * math.max(1.0, math.abs(dv)),
          s"value at ${r.get(0)},${r.get(1)}: $dv vs $pv")
    }
  }

  test("prefix rolling mean: window shorter than n matches (partition head)") {
    val (cs, cn) = Rolling.cumSumCount(col("v"), part, order)
    val got = frame
      .withColumn("cs", cs).withColumn("cn", cn)
      .withColumn("direct", Rolling.rollingMean(col("v"), part, order, 365))
      .withColumn("prefix",
        Rolling.rollingMeanFromCums(col("cs"), col("cn"), part, order, 365))
      .filter(col("direct").isNotNull =!= col("prefix").isNotNull)
    assert(got.count() === 0)
  }
}
