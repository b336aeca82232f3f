package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The decomposed global prefix sum that replaced the partition-less
  * `Window.orderBy` in the eval operators (AUC / Spearman midranks /
  * token-budget offsets): bit-equal to the windowed form on any
  * layout, and the plan must show the range-partitioned regime.
  */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keysValues(n: Int): Seq[(Long, Long)] = {
    // deterministic scrambled distinct keys with varied values
    (1 to n).map { i =>
      val k = (i.toLong * 2654435761L) % 100003L
      (k, (i % 17).toLong + 1L)
    }.distinctBy(_._1)
  }

  test("exclusive sum equals the single-task window form, asc and desc") {
    val rows = keysValues(5000)
    val df = rows.toDF("k", "v").repartition(7)
    val gotAsc = PrefixSum.exclusive(df, Seq(col("k")), col("v"), "ps")
      .select("k", "ps").as[(Long, Long)].collect().toMap
    val gotDesc = PrefixSum.exclusive(df, Seq(col("k").desc), col("v"), "ps")
      .select("k", "ps").as[(Long, Long)].collect().toMap
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    val wd = Window.orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val refAsc = df.withColumn("ps", coalesce(sum(col("v")).over(w), lit(0L)))
      .select("k", "ps").as[(Long, Long)].collect().toMap
    val refDesc = df.withColumn("ps", coalesce(sum(col("v")).over(wd), lit(0L)))
      .select("k", "ps").as[(Long, Long)].collect().toMap
    assert(gotAsc === refAsc)
    assert(gotDesc === refDesc)
  }

  test("layout-invariant: 1 and 32 input partitions give identical sums") {
    val rows = keysValues(2000)
    def run(parts: Int) =
      PrefixSum.exclusive(rows.toDF("k", "v").repartition(parts),
          Seq(col("k")), col("v"), "ps")
        .select("k", "ps").as[(Long, Long)].collect().toMap
    assert(run(1) === run(32))
  }

  test("plan regime: the frame reaches its window via range partitioning") {
    val df = keysValues(1000).toDF("k", "v").repartition(5)
    val out = PrefixSum.exclusive(df, Seq(col("k")), col("v"), "ps")
    out.count()
    val s = out.queryExecution.executedPlan.toString
    assert(s.contains("rangepartitioning"),
      s"expected the range-partitioned decomposition in:\n$s")
    // the frame itself must never sort globally in one task: the only
    // global sort order in the plan is over the __pid summary (the
    // ≤ numShufflePartitions offsets frame), whose window partitions
    // nothing — so every Sort over the data's key k is non-global
    val globalKSort = "Sort \\[k#\\d+[^\\]]*\\], true".r.findFirstIn(s)
    assert(globalKSort.isEmpty,
      s"frame must not be globally sorted in one task:\n$s")
  }

  test("operators that adopted the decomposition plan it (AUC, Spearman, token budget)") {
    val scored = (1 to 500)
      .map(i => ((i * 37 % 101).toDouble / 7.0, i % 3 == 0, i.toLong, (i % 50 + 1).toLong))
      .toDF("s", "y", "id", "tokens")
    val auc = graft.ml.Auc.rocAuc(scored, "s", "y")
    auc.count()
    assert(auc.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    val sp = graft.ml.Correlation.spearman(
      scored.select(col("s").as("x"), (col("id") % 13).cast("double").as("y")),
      "x", "y")
    sp.count()
    assert(sp.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    val tb = Sampling.tokenBudgetSelect(scored, "id", "s", "tokens", 4000L)
    tb.count()
    assert(tb.queryExecution.executedPlan.toString.contains("rangepartitioning"))
  }
}
