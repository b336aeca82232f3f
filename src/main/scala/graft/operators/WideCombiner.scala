package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

/** The monthly wide combine: N per-dataset tables → one wide table keyed by
  * (grid_id, date) (ref: src/pm25ml/combiners/archive/combiner.py:36-208).
  *
  * Reference mechanics reproduced:
  *  - value columns are namespaced `{dataset}__{col}` before joining (P2,
  *    combiner.py:181-208);
  *  - `date` strings are normalized to their first 10 chars (F6,
  *    combiner.py:115-128);
  *  - joins are INNER on the *intersection* of {grid_id, date} present on
  *    both sides (J1, combiner.py:154-156) — static/yearly tables join on
  *    grid_id only and therefore broadcast onto the monthly spine;
  *  - all value columns are cast to float32 after the combine (F11,
  *    combiner.py:92-98).
  *
  * Spark-first departures: the reference reduces pairwise with a thread
  * pool; here the N-way join is declared in one plan and Catalyst orders
  * it, broadcasting sub-spine-sized sides (grid-keyed tables are ~33k rows
  * — far under the broadcast threshold even at production scale).
  */
object WideCombiner {
  val KeyColumns: Set[String] = Set("grid_id", "date")

  /** Namespace non-key columns with the dataset prefix — ONE select, not
    * a `withColumnRenamed` fold: each fold step is its own analyzer
    * projection, so the fold's analysis cost is quadratic in width (the
    * production combine is ~100 columns wide across ~10 datasets).
    */
  def prefixColumns(df: DataFrame, dataset: String): DataFrame =
    df.select(df.columns.map { c =>
      if (KeyColumns.contains(c)) col(c) else col(c).as(s"${dataset}__$c")
    }.toIndexedSeq: _*)

  /** Normalize date strings `YYYY-MM-DDT...` → `YYYY-MM-DD`. */
  def normalizeDate(df: DataFrame): DataFrame =
    if (df.columns.contains("date"))
      df.withColumn("date", substring(col("date").cast("string"), 1, 10))
    else df

  /** Combine prefixed dataset tables; each input is (datasetName, frame).
    * Frames keyed by grid_id only (static/yearly) are broadcast.
    */
  def combine(tables: Seq[(String, DataFrame)]): DataFrame = {
    require(tables.nonEmpty, "no tables to combine")
    val prepared = tables.map { case (name, df) =>
      val p = normalizeDate(prefixColumns(df, name))
      // grid-only tables are dimension-sized: broadcast them onto the spine
      if (p.columns.contains("date")) p else broadcast(p)
    }
    val joined = prepared.reduce { (a, b) =>
      val keys = KeyColumns.intersect(a.columns.toSet)
        .intersect(b.columns.toSet).toSeq.sorted
      require(keys.nonEmpty, "tables share no join key")
      a.join(b, keys, "inner")
    }
    castValuesToFloat(joined)
  }

  /** Cast every non-key column to float32 (ref: combiner.py:92-98). */
  def castValuesToFloat(df: DataFrame): DataFrame = {
    val cols = df.columns.map { c =>
      if (KeyColumns.contains(c)) col(c)
      else col(c).cast(FloatType).as(c)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
