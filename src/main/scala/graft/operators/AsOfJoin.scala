package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: each left row picks the latest right row with
  * the same key and `rightTs <= leftTs` — the point-in-time attach every
  * event/feature pipeline needs (DuckDB/kdb ASOF JOIN, pandas
  * merge_asof). Spark has no built-in; the naive theta-join
  * (`l.key = r.key AND r.ts <= l.ts` + argmax) explodes to the full
  * per-key cross product before pruning.
  *
  * Implementation is the union-window plan: tag both sides, shuffle
  * ONCE on the key, sort each key's merged timeline by (ts, side) with
  * right rows ordered before left rows at equal ts (inclusive
  * semantics), and carry the last right payload forward with
  * `last(ignoreNulls)`. Cost is one exchange + one in-partition sort —
  * the same shape as a groupBy, with no join blowup at any data size.
  *
  * Skew: one key's whole timeline sorts in one task. For a hot key at
  * 100 TB (billions of rows under a single key) use [[backwardBucketed]]
  * — it splits each timeline into coarse time buckets, pre-computes each
  * bucket's closing right row (one linear agg), prefix-carries closings
  * across buckets (a window over the tiny per-(key,bucket) summary), and
  * runs the in-bucket pass with (key × bucket)-way parallelism. Spec
  * asserts it bit-identical to the plain plan.
  */
object AsOfJoin {

  /** Backward as-of join. Right columns `valueCols` (plus the matched
    * right timestamp as `matchedTsName`) attach to every left row; left
    * rows with no match at-or-before get nulls. `toleranceMicros`
    * (optional, MICROSECONDS — the same unit as [[backwardBucketed]]'s
    * `bucketWidth`) nulls out matches strictly older than
    * `leftTs − tolerance`, compared at full `unix_micros` precision.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, valueCols: Seq[String],
               matchedTsName: String = "matched_ts",
               toleranceMicros: Option[Long] = None): DataFrame = {
    val merged = tagAndUnion(left, right, keys, leftTs, rightTs, valueCols)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    finish(merged.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w)),
      left, keys, leftTs, valueCols, matchedTsName, toleranceMicros)
  }

  /** Forward as-of join: each left row picks the EARLIEST right row with
    * `rightTs >= leftTs` (inclusive) — the "next event after" attach.
    * Same union-window plan, timeline walked in descending order so the
    * carried payload is the smallest right timestamp at-or-after.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, valueCols: Seq[String],
              matchedTsName: String = "matched_ts"): DataFrame = {
    val merged = tagAndUnion(left, right, keys, leftTs, rightTs, valueCols)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    finish(merged.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w)),
      left, keys, leftTs, valueCols, matchedTsName, None)
  }

  /** Skew-immune variant: identical output, (key × bucket)-way parallel.
    * `bucketWidth` and `toleranceMicros` are both in MICROSECONDS (the
    * unit of `unix_micros(ts)`, e.g. 86400e6 for daily buckets); pick
    * the width so one key-bucket fits a task.
    */
  def backwardBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String,
                       valueCols: Seq[String], bucketWidth: Long,
                       matchedTsName: String = "matched_ts",
                       toleranceMicros: Option[Long] = None): DataFrame = {
    val merged = tagAndUnion(left, right, keys, leftTs, rightTs, valueCols)
      .withColumn("__bkt", floor(unix_micros(col("__ts")) / bucketWidth))
    // each bucket's closing right payload: tiny summary, one linear agg
    val closings = merged.filter(col("__ord") === 0)
      .groupBy((keys.map(col) :+ col("__bkt")): _*)
      .agg(max_by(col("__r"), struct(col("__ts"), col("__ord"))).as("__close"))
    // carry the latest closing from any STRICTLY EARLIER bucket — a
    // window over the per-(key,bucket) summary, rows ~ #buckets not
    // #rows. The summary must span every OBSERVED bucket (left-only
    // buckets still need the carry), hence the distinct + left join.
    val wc = Window.partitionBy(keys.map(col): _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = merged
      .select((keys.map(col) :+ col("__bkt")): _*).distinct()
      .join(closings, keys :+ "__bkt", "left")
      .withColumn("__carry", last(col("__close"), ignoreNulls = true).over(wc))
      .select((keys.map(col) :+ col("__bkt") :+ col("__carry")): _*)
    // in-bucket pass, parallel in (key, bucket); seed with the carry
    val wb = Window.partitionBy((keys.map(col) :+ col("__bkt")): _*)
      .orderBy(col("__ts"), col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = merged
      .join(carries, keys :+ "__bkt", "left")
      .withColumn("__m",
        coalesce(last(col("__r"), ignoreNulls = true).over(wb), col("__carry")))
    finish(attached, left, keys, leftTs, valueCols, matchedTsName,
      toleranceMicros)
  }

  /** Right rows as (keys, __ts, __ord=0, payload struct); left rows as
    * (keys, __ts, __ord=1, full-row struct). __ord sorts right first at
    * equal ts → inclusive `rightTs <= leftTs`.
    */
  private def tagAndUnion(left: DataFrame, right: DataFrame,
                          keys: Seq[String], leftTs: String, rightTs: String,
                          valueCols: Seq[String]): DataFrame = {
    val clash = valueCols.filter(left.columns.contains)
    require(clash.isEmpty,
      s"right value columns ${clash.mkString(",")} collide with left " +
        "columns — rename the right side before joining")
    val rPayload = struct((col(rightTs).as("__rts") +: valueCols.map(col)): _*)
    val r = right.select((keys.map(col) :+ col(rightTs).as("__ts") :+
      lit(0).as("__ord") :+ rPayload.as("__r")): _*)
    val lPayload = struct(left.columns.map(col): _*)
    val rType = r.schema("__r").dataType
    val lDf = left.select((keys.map(col) :+ col(leftTs).as("__ts") :+
      lit(1).as("__ord") :+ lit(null).cast(rType).as("__r") :+
      lPayload.as("__l")): _*)
    val rDf = r.withColumn("__l", lit(null).cast(lDf.schema("__l").dataType))
    rDf.unionByName(lDf)
  }

  private def finish(attached: DataFrame, left: DataFrame, keys: Seq[String],
                     leftTs: String, valueCols: Seq[String],
                     matchedTsName: String,
                     toleranceMicros: Option[Long]): DataFrame = {
    val inWindow = toleranceMicros match {
      // full-precision micros on both sides: no truncation window at
      // sub-second timestamps (a cast-to-long cutoff rounded to seconds)
      case Some(tol) => col("__m").isNotNull &&
        unix_micros(col("__m.__rts")) >= unix_micros(col("__ts")) - tol
      case None => col("__m").isNotNull
    }
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    attached.filter(col("__ord") === 1)
      .select(leftCols ++
        (when(inWindow, col("__m.__rts")).as(matchedTsName) +:
          valueCols.map(c => when(inWindow, col(s"__m.$c")).as(c))): _*)
  }
}
