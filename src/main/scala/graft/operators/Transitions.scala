package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition mining over keyed event sequences —
  * the "what happens after X" question ([[Sessions]] asks "when does
  * the visit end", [[Funnel]] "how far along the prescribed path";
  * this asks for the full empirical next-step matrix). Feeds churn /
  * navigation analysis and sequence-model sanity checks (does the
  * synthetic log's transition structure match production's).
  *
  * One keyed window pass (lag of the state column) turns each row
  * into a (prev → next) observation; one aggregation counts them; the
  * row-conditional probability is a single IEEE division of two exact
  * BIGINTs, so the oracle replays it bit-for-bit. Sequence order must
  * be made unique by `orderCols` (end with a tie-breaking id — a
  * timestamp alone is not a deterministic sequence).
  *
  * 100 TB shape: one shuffle on the sequence key into the lag window,
  * one shuffle of (prev, next) pairs into the count — both standard
  * keyed-window scale contracts. The output is |states|² rows at
  * most, a driver-safe summary by construction.
  */
object Transitions {

  /** Transition counts and conditional probabilities:
    * `(prev, next, cnt, row_total, prob)`, one row per observed
    * ordered state pair. The first event of each sequence has no
    * predecessor and contributes nothing.
    */
  def transitionMatrix(df: DataFrame, keyCols: Seq[String],
                       orderCols: Seq[String], stateCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val pairs = df
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNotNull && col(stateCol).isNotNull)
      .select(col("__prev").as("prev"), col(stateCol).as("next"))
    val counts = pairs.groupBy("prev", "next").agg(count(lit(1)).as("cnt"))
    val wRow = Window.partitionBy("prev")
    counts
      .withColumn("row_total", sum(col("cnt")).over(wRow))
      .withColumn("prob",
        col("cnt").cast("double") / col("row_total").cast("double"))
  }

  /** DuckDB replay of [[transitionMatrix]]: same lag window, same
    * exact counts, same single-division probability tree.
    */
  def oracleSql(inputSql: String, keyCols: Seq[String],
                orderCols: Seq[String], stateCol: String): String = {
    val part = keyCols.mkString(", ")
    val ord = orderCols.mkString(", ")
    s"""WITH src AS ($inputSql),
       lagged AS (
         SELECT $stateCol AS next,
           LAG($stateCol, 1) OVER (PARTITION BY $part ORDER BY $ord) AS prev
         FROM src),
       counts AS (
         SELECT prev, next, COUNT(*) AS cnt FROM lagged
         WHERE prev IS NOT NULL AND next IS NOT NULL
         GROUP BY prev, next)
       SELECT prev, next, CAST(cnt AS BIGINT) AS cnt,
         CAST(SUM(cnt) OVER (PARTITION BY prev) AS BIGINT) AS row_total,
         CAST(cnt AS DOUBLE) /
           CAST(SUM(cnt) OVER (PARTITION BY prev) AS DOUBLE) AS prob
       FROM counts"""
  }
}
