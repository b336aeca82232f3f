package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.TestSpark

/** Plan-shape regression tests: the scale arguments each operator's
  * scaladoc makes are asserted against the actual physical plan, so a
  * refactor that silently reintroduces a shuffle (or drops a broadcast,
  * or un-pushes the Bloom probe) fails CI rather than a 100 TB run.
  * Counts are structural lower/upper bounds, not golden plans — AQE and
  * Catalyst version drift may renumber nodes but not add exchanges.
  */
class PlanHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def shuffles(df: DataFrame): Int = {
    // materialize so AQE finalizes its plan, then count the exchanges the
    // run actually executed
    df.count()
    val plan = df.queryExecution.executedPlan
    def strip(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children ++ other.subqueries
    }
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeExec => 1; case _ => 0 }
      self + strip(p).map(count).sum
    }
    count(plan)
  }

  test("chunking is map-side: only the final orderBy shuffles") {
    val df = graft.SparkEntry.queries("t_chunk_windows")(spark, sf)
    assert(shuffles(df) <= 1)
  }

  test("vocab top-k has one count shuffle and no global sort exchange") {
    val df = graft.SparkEntry.queries("t_vocab_topk")(spark, sf)
    // partial agg → 1 exchange → final agg → TakeOrdered (no sort shuffle)
    assert(shuffles(df) <= 1)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"))
  }

  test("incremental dedup probes the bloom filter natively, map-side") {
    val df = graft.SparkEntry.queries("dedup_incremental")(spark, sf)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("bloom_probe"),
      "bloom probe should be the codegen'd broadcast-backed BloomProbeExpr " +
        "(a plan-literal might_contain would embed the whole bit array)")
  }

  test("decontamination broadcasts the eval grams — corpus never shuffles whole") {
    val df = graft.SparkEntry.queries("t_decontaminate")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"))
  }

  test("brute-force ANN broadcasts queries; corpus side has no join shuffle") {
    val df = graft.SparkEntry.queries("ann_topk_brute")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"))
  }
}
