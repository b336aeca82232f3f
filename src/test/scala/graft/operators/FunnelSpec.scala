package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("chains advance only strictly forward through the steps") {
    val ev = Seq(
      // user 1: full chain, with decoys (click before signup ignored,
      // later duplicate steps ignored)
      (1L, ts(50), "click"), (1L, ts(100), "signup"), (1L, ts(200), "click"),
      (1L, ts(150), "purchase"), // purchase BEFORE the click → not step 3
      (1L, ts(300), "purchase"), (1L, ts(400), "click"),
      // user 2: signup only
      (2L, ts(100), "signup"),
      // user 3: clicks and purchases but never signed up
      (3L, ts(10), "click"), (3L, ts(20), "purchase"),
      // user 4: step-2 at the SAME ms as step-1 → strictness blocks it
      (4L, ts(100), "signup"), (4L, ts(100), "click"), (4L, ts(200), "click")
    ).toDF("user_id", "t", "event_type")
    val got = Funnel.funnel(ev, Seq("user_id"), "t", "event_type",
        Seq("signup", "click", "purchase"))
      .as[(Long, Int, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) === ((3, Some(100L), Some(200L), Some(300L))))
    assert(got(2L) === ((1, Some(100L), None, None)))
    assert(got(3L) === ((0, None, None, None)))
    assert(got(4L) === ((2, Some(100L), Some(200L), None)))
  }
}
