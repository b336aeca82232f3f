package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: match each point row to every
  * interval row with the same key whose `[start, end]` contains the
  * point — log windows to outage spans, trades to quote validity
  * ranges, reads to transaction snapshots. Spark's own planner executes
  * `p.key = i.key AND p.t BETWEEN i.s AND i.e` as an equi-join on the
  * key with the range as a post-filter — fine until one key holds many
  * intervals, where the per-key cross product dominates.
  *
  * [[bucketed]] avoids the blowup: intervals explode into the coarse
  * time buckets they overlap (`sequence(floor(s/w), floor(e/w))`), each
  * point maps to exactly ONE bucket, and the equi-join runs on
  * (key, bucket) — so candidate pairs are bounded by bucket
  * co-residency, not per-key interval count, and since a point owns a
  * single bucket no dedup pass is needed. Pick `bucketWidth` near the
  * typical interval length: much wider re-grows the per-bucket cross
  * product, much narrower multiplies the interval explode factor.
  */
object RangeJoin {

  /** Bucketed interval-containment join (inner). `pointTs`, `startCol`,
    * `endCol` are timestamp columns; `bucketWidth` is in microseconds.
    * Column names must be disjoint across the two inputs (pre-rename).
    * Inclusive on both interval endpoints.
    */
  def bucketed(points: DataFrame, intervals: DataFrame, keys: Seq[String],
               pointTs: String, startCol: String, endCol: String,
               bucketWidth: Long): DataFrame = {
    val iv = intervals.withColumn("__bkt",
      explode(sequence(floor(unix_micros(col(startCol)) / bucketWidth),
                       floor(unix_micros(col(endCol)) / bucketWidth))))
    val pt = points.withColumn("__bkt",
      floor(unix_micros(col(pointTs)) / bucketWidth))
    pt.join(iv, keys :+ "__bkt")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
      .drop("__bkt")
  }

  /** Small-intervals path: broadcast the interval side and let the range
    * predicate evaluate in the broadcast hash join on the key — right
    * when the interval table fits a broadcast (dimension-sized).
    */
  def broadcastSide(points: DataFrame, intervals: DataFrame,
                    keys: Seq[String], pointTs: String, startCol: String,
                    endCol: String): DataFrame =
    points.join(broadcast(intervals), keys)
      .filter(col(pointTs) >= col(startCol) && col(pointTs) <= col(endCol))
}
