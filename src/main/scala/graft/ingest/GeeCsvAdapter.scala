package graft.ingest

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** S8/P1/F11/F12 — adapter for GEE-exported CSVs
  * (ref: src/pm25ml/collectors/gee/intermediate_storage.py:22-27,
  * gee_export_pipeline.py:133-208):
  *
  *  - header CSV read;
  *  - missing expected source columns rejected
  *    (gee_export_pipeline.py:139-142);
  *  - column selection/rename via mapping, extra columns dropped;
  *  - grid_id cast to int64;
  *  - optional scaffold completion: the full (plan dates × observed
  *    grid_ids) index with null gaps (gee_export_pipeline.py:157-177);
  *  - non-strict float coercion (malformed → null, like polars
  *    strict=False — Spark's non-ANSI try_cast);
  *  - all-null value columns rejected;
  *  - deterministic (date, grid_id) sort of the artifact
  *    (gee_export_pipeline.py:198-208).
  */
object GeeCsvAdapter {

  final case class AllNullColumn(column: String)
    extends RuntimeException(s"column $column is entirely null")

  final case class MissingColumns(columns: Seq[String])
    extends RuntimeException(
      s"table is missing expected columns: ${columns.mkString(", ")}")

  def read(spark: SparkSession, path: String, renames: Map[String, String],
           scaffoldDates: Seq[String] = Nil): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    normalize(raw, renames, scaffoldDates)
  }

  /** The transform step, separated for testing against in-memory frames.
    * `scaffoldDates`: when non-empty and the frame is (grid_id, date)
    * keyed, complete to the full dates × observed-grid_ids index with
    * null value gaps (the reference takes these dates from the feature
    * plan).
    */
  def normalize(raw: DataFrame, renames: Map[String, String],
                scaffoldDates: Seq[String] = Nil): DataFrame = {
    val missing = renames.keys.filterNot(raw.columns.contains).toSeq.sorted
    if (missing.nonEmpty) throw MissingColumns(missing)
    val keep = raw.columns.filter(c => renames.contains(c) || c == "grid_id" || c == "date")
    val selected = raw.select(keep.map(col).toIndexedSeq: _*)
    val renamed = renames.foldLeft(selected) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    val valueCols = renamed.columns.filterNot(Set("grid_id", "date"))
    val typed = renamed
      // non-strict like the value coercion (ANSI cast would throw on the
      // first malformed id); systematically bad ids surface as
      // AllNullColumn("grid_id") below instead
      .withColumn("grid_id", expr("try_cast(grid_id AS BIGINT)"))
      .withColumn("date", substring(col("date").cast("string"), 1, 10))
    val scaffolded =
      if (scaffoldDates.nonEmpty && typed.columns.contains("date") &&
          typed.columns.contains("grid_id")) {
        val spark = typed.sparkSession
        val index = spark.createDataset(scaffoldDates.map(_.take(10)))(Encoders.STRING)
          .toDF("date")
          .crossJoin(typed.select("grid_id").distinct())
        // full outer on the using-columns coalesces the keys
        typed.join(index, Seq("date", "grid_id"), "full")
      } else typed
    val coerced = valueCols.foldLeft(scaffolded)((d, c) =>
      d.withColumn(c, tryCastFloat(c)))
    // F12: reject all-null columns in one aggregation pass — the
    // reference validates expected value columns UNION id columns
    // (gee_export_pipeline.py _process), so an all-null grid_id/date
    // (e.g. a malformed export whose ids failed the int64 cast) errors
    // here too, not downstream
    val checkedCols =
      valueCols ++ Seq("grid_id", "date").filter(coerced.columns.contains)
    val counts = coerced.select(
      (count(lit(1)) +: checkedCols.map(c => count(col(c)).as(c))).toIndexedSeq: _*)
      .head()
    checkedCols.zipWithIndex.foreach { case (c, i) =>
      if (counts.getLong(0) > 0 && counts.getLong(i + 1) == 0)
        throw AllNullColumn(c)
    }
    val sortKeys = Seq("date", "grid_id").filter(coerced.columns.contains)
    if (sortKeys.nonEmpty) coerced.orderBy(sortKeys.map(col): _*) else coerced
  }

  /** Non-strict float coercion: unparseable strings become null instead of
    * raising (Spark 4 runs ANSI, so a plain cast would throw).
    */
  private def tryCastFloat(name: String) =
    expr(s"try_cast(`$name` AS FLOAT)")
}
