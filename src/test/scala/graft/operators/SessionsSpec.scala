package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SessionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events(rows: Seq[(Long, Long)]) =
    rows.toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us") * 1000).as("ts"))

  test("assignIds: gaps split, session_seq is 0-based per key") {
    val df = events(Seq(
      (1L, 0L), (1L, 1000L), (1L, 100000L), // gap 99s > 60s -> new session
      (2L, 0L)))
    val out = Sessions.assignIds(df, Seq("user_id"), "ts", gapMs = 60000L)
      .select("user_id", "__ms", "session_seq")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(out === Seq((1L, 0L, 0L), (1L, 1000L, 0L), (1L, 100000L, 1L),
      (2L, 0L, 0L)))
  }

  test("sessionize rollup equals a manual rollup of assignIds") {
    val df = events((0 until 200).map(i =>
      (i % 7L, (i * 37L) % 5000L * 1000L)))
    val viaIds = Sessions.assignIds(df, Seq("user_id"), "ts", gapMs = 500L)
      .groupBy("user_id", "session_seq")
      .agg(min(col("__ms")).as("session_start"),
        max(col("__ms")).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("session_seq")
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val direct = Sessions.sessionize(df, Seq("user_id"), "ts", gapMs = 500L)
      .orderBy("user_id", "session_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(viaIds === direct)
  }

  test("equal-timestamp rows share a session regardless of tie order") {
    // two rows at the same instant after a break: both must land in the
    // NEW session whatever order the window visits them in
    val df = events(Seq((1L, 0L), (1L, 200000L), (1L, 200000L)))
    val seqs = Sessions.assignIds(df, Seq("user_id"), "ts", gapMs = 60000L)
      .select("session_seq").as[Long].collect().sorted.toSeq
    assert(seqs === Seq(0L, 1L, 1L))
  }
}
