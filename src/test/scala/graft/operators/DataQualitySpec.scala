package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import DataQuality._

class DataQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("check").as[(String, Long, Long, Int)].collect().toSeq

  test("predicate gates: all gates from one scan, exact counts") {
    val df = Seq((1, 5.0), (2, -1.0), (3, 99.0), (4, -2.0)).toDF("id", "v")
    val out = rows(predicateGates(df, Seq(
      Gate("v_nonneg", col("v") < 0),
      Gate("v_under_50", col("v") > 50),
      Gate("id_positive", col("id") <= 0))))
    assert(out === Seq(
      ("id_positive", 0L, 4L, 1),
      ("v_nonneg", 2L, 4L, 0),
      ("v_under_50", 1L, 4L, 0)))
  }

  test("predicate gates evaluate in a single aggregation (plan shape)") {
    val df = Seq((1, 2.0)).toDF("id", "v")
    val plan = predicateGates(df, Seq(
        Gate("g1", col("v") < 0), Gate("g2", col("v") > 1)))
      .queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size === 1, s"expected one Aggregate, got:\n$plan")
  }

  test("uniqueness gate counts rows beyond the first per key tuple") {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a"), (1, "a"))
      .toDF("k1", "k2")
    val out = rows(uniquenessGate(df, Seq("k1", "k2"), "uniq"))
    assert(out === Seq(("uniq", 2L, 5L, 0)))
    val clean = rows(uniquenessGate(df.distinct(), Seq("k1", "k2"), "uniq"))
    assert(clean === Seq(("uniq", 0L, 3L, 1)))
  }

  test("fk gate counts unmatched and NULL foreign keys as orphans") {
    val child = Seq(Some(1), Some(2), Some(9), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val out = rows(fkGate(child, "fk", parent, "pk", "fk_check"))
    assert(out === Seq(("fk_check", 2L, 4L, 0)))
  }

  test("gates union into one report frame") {
    val df = Seq((1, 1.0)).toDF("id", "v")
    val rep = predicateGates(df, Seq(Gate("a", col("v") < 0)))
      .unionAll(uniquenessGate(df, Seq("id"), "b"))
    assert(rep.columns.toSeq === Seq("check", "violations", "total", "pass"))
    assert(rep.count() === 2L)
  }
}
