package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling — one row of data-quality stats per
  * column (row/null/distinct counts, min/max): the observability pass a
  * pipeline runs before trusting a new corpus drop, and the input to
  * ingestion gates like [[graft.ingest.GeeCsvAdapter]]'s all-null
  * rejection.
  *
  * One aggregation pass over the table: every metric is an agg with
  * map-side partials, so the single shuffle carries one partial row per
  * task. Min/max evaluate in the column's native type and are cast to
  * string only for the uniform report schema.
  *
  * Scale note: `exact = true` uses COUNT(DISTINCT) — Catalyst expands
  * the input once per distinct aggregate (an Expand of ×columns), fine
  * into the tens of columns. For very wide tables at 100 TB, pass
  * `exact = false` for one-pass HLL `approx_count_distinct` (±5%
  * default) — deterministic but algorithm-specific, so the driver
  * oracle covers the exact path only.
  */
object TableProfiler {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    val distinctOf: String => org.apache.spark.sql.Column =
      if (exact) c => countDistinct(col(c))
      else c => approx_count_distinct(col(c))
    val aggExprs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls__$c"),
        distinctOf(c).as(s"__dist__$c"),
        min(col(c)).cast("string").as(s"__min__$c"),
        max(col(c)).cast("string").as(s"__max__$c"))
    }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column_name"), col("__n").as("n_rows"),
        col(s"__nulls__$c").as("n_nulls"),
        col(s"__dist__$c").as("n_distinct"),
        col(s"__min__$c").as("min_value"), col(s"__max__$c").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** DuckDB SQL replaying [[profile]] (exact path) over `tableName`
    * with the given columns, for oracle construction.
    */
  def oracleSql(tableName: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
          CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
          CAST(MIN($c) AS VARCHAR) AS min_value,
          CAST(MAX($c) AS VARCHAR) AS max_value
        FROM $tableName"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY column_name")
}
