package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot delta — the lakehouse reconciliation question between two
  * versions of the same keyed table: which rows were added, removed,
  * changed, or carried unchanged. The audit companion to
  * [[graft.dedup.Incremental]] (which asks "is this NEW row a
  * duplicate of the corpus"; this asks "what happened to EVERY key
  * between two versions") and to [[DataQuality]] (whose gates judge
  * one snapshot; this judges the transition).
  *
  * One FULL OUTER join on the key columns; change detection is
  * null-safe column equality over `compareCols` (exact, engine-
  * portable). At 100 TB the join is the unavoidable cost and shuffles
  * both sides once on the key — co-locate via bucketed storage
  * ([[graft.dedup.CorpusStorage]] posture) to make recurring diffs
  * zero-exchange; for very wide rows, pre-compute a fingerprint
  * column with the shared avalanche key
  * ([[Sampling.avalancheKey]] — md5-based, SQL-mirrored) and compare
  * that single column instead of N.
  */
object SnapshotDiff {

  /** Per-key verdicts: `(keys…, status)` with status ∈
    * {added, removed, changed, unchanged}. NULL key rows are dropped
    * (a keyless row cannot be tracked across versions).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "SnapshotDiff.diff needs key and compare columns")
    def clean(df: DataFrame, tag: String) = df
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select((keyCols ++ compareCols).map(c => col(c).as(s"${tag}_$c")): _*)
    val o = clean(oldDf, "o")
    val n = clean(newDf, "n")
    val joinCond = keyCols.map(k => col(s"o_$k") === col(s"n_$k"))
      .reduce(_ && _)
    val allEqual = compareCols
      .map(c => col(s"o_$c") <=> col(s"n_$c")).reduce(_ && _)
    val present = col(s"o_${keyCols.head}").isNotNull
    val presentNew = col(s"n_${keyCols.head}").isNotNull
    o.join(n, joinCond, "full_outer")
      .withColumn("status",
        when(!present, lit("added"))
          .when(!presentNew, lit("removed"))
          .when(allEqual, lit("unchanged"))
          .otherwise(lit("changed")))
      .select((keyCols.map(k =>
        coalesce(col(s"o_$k"), col(s"n_$k")).as(k)) :+ col("status")): _*)
  }

  /** Status rollup: `(status, n)` — the 4-row reconciliation report. */
  def summary(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
              compareCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, keyCols, compareCols)
      .groupBy("status").agg(count(lit(1)).as("n"))

  /** DuckDB replay of [[summary]]: same full outer join and null-safe
    * comparisons. `oldSql`/`newSql` must yield the key and compare
    * columns.
    */
  def summaryOracleSql(oldSql: String, newSql: String, keyCols: Seq[String],
                       compareCols: Seq[String]): String = {
    val on = keyCols.map(k => s"n.$k IS NOT DISTINCT FROM o.$k")
      .mkString(" AND ")
    val eq = compareCols.map(c => s"o.$c IS NOT DISTINCT FROM n.$c")
      .mkString(" AND ")
    val kOld = keyCols.map(k => s"o.$k IS NOT NULL").mkString(" AND ")
    val kNew = keyCols.map(k => s"n.$k IS NOT NULL").mkString(" AND ")
    s"""WITH o AS (SELECT * FROM ($oldSql) o0 WHERE ${keyCols.map(k =>
          s"o0.$k IS NOT NULL").mkString(" AND ")}),
       n AS (SELECT * FROM ($newSql) n0 WHERE ${keyCols.map(k =>
          s"n0.$k IS NOT NULL").mkString(" AND ")}),
       verdicts AS (
         SELECT CASE
           WHEN NOT ($kOld) THEN 'added'
           WHEN NOT ($kNew) THEN 'removed'
           WHEN $eq THEN 'unchanged'
           ELSE 'changed' END AS status
         FROM o FULL OUTER JOIN n ON $on)
       SELECT status, CAST(COUNT(*) AS BIGINT) AS n
       FROM verdicts GROUP BY status"""
  }
}
