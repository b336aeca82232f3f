package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the gaps-and-islands pattern: a user's events
  * split into sessions wherever the gap to the previous event exceeds
  * `gapMs`. The declarative plan is one shuffle on the user key feeding
  * two window passes over the same partitioning (lag → break flags,
  * running sum → session ids) and a final aggregate: no state store, no
  * iteration, scale-bounded by per-user event counts exactly like any
  * keyed window.
  *
  * [[graft.streaming.EventsStream.sessionize]] is the streaming twin
  * (explicit flatMapGroupsWithState state + processing-time timeouts);
  * StreamingSpec pins the two to the same closed-session results.
  */
object Sessions {

  /** Every input row plus its within-key session sequence number
    * (`session_seq`, 0-based in event-time order) and the epoch-millis
    * timestamp (`__ms`) — the per-EVENT face of the gaps-and-islands
    * pass, for composing session-scoped analytics (co-occurrence
    * baskets, per-session funnels) without re-deriving the windows.
    */
  def assignIds(events: DataFrame, keys: Seq[String], tsCol: String,
                gapMs: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val ms = floor(unix_micros(col(tsCol)) / 1000).cast("long")
    events
      .withColumn("__ms", ms)
      .withColumn("__brk",
        when(col("__ms") - lag(col("__ms"), 1).over(w) > gapMs, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_seq", sum(col("__brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__brk")
  }

  /** Per-session rollup: (key…, session_start, session_end, n_events),
    * timestamps in epoch millis. `tsCol` must be a TimestampType column.
    */
  def sessionize(events: DataFrame, keys: Seq[String], tsCol: String,
                 gapMs: Long): DataFrame =
    assignIds(events, keys, tsCol, gapMs)
      .groupBy((keys.map(col) :+ col("session_seq")): _*)
      .agg(min(col("__ms")).as("session_start"),
        max(col("__ms")).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("session_seq")
}
