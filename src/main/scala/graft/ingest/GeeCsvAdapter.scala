package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, LongType}

/** S8/P1/F11/F12 — adapter for GEE-exported CSVs
  * (ref: src/pm25ml/collectors/gee/intermediate_storage.py:22-27,
  * gee_export_pipeline.py:139-196):
  *
  *  - header CSV read;
  *  - column selection/rename via mapping, extra columns dropped;
  *  - non-strict float coercion (malformed → null, like polars
  *    strict=False — Spark's non-ANSI try_cast);
  *  - all-null value columns rejected;
  *  - grid_id cast to int64.
  */
object GeeCsvAdapter {

  final case class AllNullColumn(column: String)
    extends RuntimeException(s"column $column is entirely null")

  def read(spark: SparkSession, path: String,
           renames: Map[String, String]): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    normalize(raw, renames)
  }

  /** The transform step, separated for testing against in-memory frames. */
  def normalize(raw: DataFrame, renames: Map[String, String]): DataFrame = {
    val keep = raw.columns.filter(c => renames.contains(c) || c == "grid_id" || c == "date")
    val selected = raw.select(keep.map(col).toIndexedSeq: _*)
    val renamed = renames.foldLeft(selected) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val valueCols = renamed.columns.filterNot(Set("grid_id", "date"))
    val coerced = valueCols.foldLeft(renamed)((d, c) =>
      d.withColumn(c, tryCastFloat(c)))
      .withColumn("grid_id", col("grid_id").cast(LongType))
      .withColumn("date", substring(col("date").cast("string"), 1, 10))
    // F12: reject all-null value columns in one aggregation pass
    val counts = coerced.select(
      (count(lit(1)) +: valueCols.map(c => count(col(c)).as(c))).toIndexedSeq: _*)
      .head()
    valueCols.zipWithIndex.foreach { case (c, i) =>
      if (counts.getLong(0) > 0 && counts.getLong(i + 1) == 0)
        throw AllNullColumn(c)
    }
    coerced
  }

  /** Non-strict float coercion: unparseable strings become null instead of
    * raising (Spark 4 runs ANSI, so a plain cast would throw).
    */
  private def tryCastFloat(name: String) =
    expr(s"try_cast(`$name` AS FLOAT)")
}
