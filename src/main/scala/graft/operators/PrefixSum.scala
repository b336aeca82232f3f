package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decomposed global running sums — the engine's answer to the one
  * plan shape that cannot survive a 100× scale-up: a partition-less
  * `Window.orderBy(...)` whose input is the frame being summed. Spark
  * plans that window as a SINGLE task sorting the whole input, so it is
  * only safe when the input is provably bounded (the [[Quantized]]
  * contract [[Drift.ksTable]] enforces). The eval operators
  * ([[graft.ml.Auc]], [[graft.ml.Correlation]],
  * [[Sampling.tokenBudgetSelect]]) run their prefix sums over
  * DISTINCT-VALUE frames whose size is merely ADVISORY-bounded — a raw
  * continuous double score over 10¹⁰ docs has a distinct frame the size
  * of the corpus — so they use this decomposition instead: the same
  * construction as [[Sampling.globalPercentRank]], with the running
  * COUNT generalized to a running SUM.
  *
  * Shape: range-partition on the order key; per-partition totals (≤
  * `spark.sql.shuffle.partitions` rows) take the only partition-less
  * window; exact per-range offsets broadcast back; the within-range
  * running sum partitions by range id. Integer sums are
  * partitioning-invariant, so the result is bit-identical to the
  * single-task window whatever ranges the sampler picks.
  */
object PrefixSum {

  /** Append `outCol` = the EXCLUSIVE running sum of `valueCol` over all
    * rows strictly before the current one in `order` order (0 for the
    * first row) — `SUM(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING TO
    * 1 PRECEDING)` without the single-task global sort.
    *
    * `order` keys must be DISTINCT per row (callers pass per-value
    * group frames, where this holds by construction) and non-null-safe
    * ordered the way the caller's SQL replay orders them; a tie would
    * make "strictly before" ill-defined under any engine.
    */
  def exclusive(df: DataFrame, order: Seq[Column], valueCol: Column,
                outCol: String): DataFrame = {
    require(order.nonEmpty, "order must be non-empty")
    val ranged = df.repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
    val parts = ranged.groupBy("__pid").agg(sum(valueCol).as("__psum"))
    // the only partition-less window: ≤ numShufflePartitions rows
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parts
      .withColumn("__off", coalesce(sum(col("__psum")).over(offW), lit(0L)))
      .select("__pid", "__off")
    val inW = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol,
        col("__off") + coalesce(sum(valueCol).over(inW), lit(0L)))
      .drop("__pid", "__off")
  }
}
