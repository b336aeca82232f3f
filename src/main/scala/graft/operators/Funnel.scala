package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis: for each key, find the earliest strictly-ordered
  * chain of step events (step 1 at t₁, step 2 first occurrence after
  * t₁, …) and report how deep the chain got. The event-analytics
  * staple (signup → activate → purchase conversion).
  *
  * One shuffle: groupBy(key) collects each key's (ts, step) pairs,
  * sort_array orders them, and a higher-order `aggregate` threads the
  * per-step timestamps through a single left fold — no per-step join
  * cascade (k passes over the fact table), no UDF, no state store.
  * Per-key memory is bounded by that key's event count, the same bound
  * any sessionization carries; at 100 TB pre-filter to the step event
  * types (done here) so the collected arrays hold only funnel-relevant
  * rows.
  *
  * The fold's lambda touches only its bound accumulator/element
  * variables, so the no-CSE lambda pathology does not apply.
  */
object Funnel {

  /** `steps(i)` is the event-type name of funnel step i. Output:
    * (keys…, reached, step1_ms .. stepK_ms) with epoch-millis
    * timestamps, null from the first unreached step on.
    */
  def funnel(events: DataFrame, keys: Seq[String], tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs steps")
    val k = steps.length
    // map step name → 1-based index; non-step events drop before the shuffle
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(null).cast("int")) { case (acc, (name, i)) =>
        when(col(typeCol) === name, lit(i + 1)).otherwise(acc)
      }
    val ms = floor(unix_micros(col(tsCol)) / 1000).cast("long")
    val collected = events
      .withColumn("__step", stepIdx)
      .filter(col("__step").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(ms.as("ms"), col("__step").as("s"))))
        .as("__ev"))
    // left fold: acc = array of k matched timestamps (null = unmatched);
    // event e advances the chain iff its step is the first unmatched one
    // and it happens strictly after the previous step's match
    val init = array(Seq.fill(k)(lit(null).cast("long")): _*)
    val folded = aggregate(col("__ev"), init, (acc, e) => {
      val s = e.getField("s")
      val t = e.getField("ms")
      val prevOk = when(s === 1, lit(true))
        .otherwise(element_at(acc, s - 1).isNotNull &&
          t > element_at(acc, s - 1))
      when(element_at(acc, s).isNull && prevOk,
        // replace position s with t
        concat(slice(acc, lit(1), s - 1), array(t),
          slice(acc, s + 1, lit(k) - s)))
        .otherwise(acc)
    })
    val withF = collected.withColumn("__f", folded)
    val stepCols = (1 to k).map(i =>
      element_at(col("__f"), i).as(s"step${i}_ms"))
    val reached = aggregate(col("__f"), lit(0),
      (acc, t) => when(t.isNotNull, acc + 1).otherwise(acc))
    withF.select((keys.map(col) :+ reached.as("reached")) ++ stepCols: _*)
  }
}
