package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed stage storage — the SURVEY §7 shuffle lever for the monthly
  * wide combine at cluster scale.
  *
  * The N-way combine joins every dataset on (grid_id, date) (or grid_id
  * for dims); with plain parquet stages each join shuffles the month
  * spine. Writing stage outputs BUCKETED on the join keys (same bucket
  * count everywhere) makes every side hash-partitioned at rest, so
  * Catalyst plans the whole N-way combine with ZERO shuffle exchanges
  * (asserted in BucketedStagesSpec). At the reference's production shape
  * (~33k grids × 80+ months × ~10 datasets) this removes the only
  * all-data shuffle in s01.
  *
  * Two rules make the co-location stick, both encoded here rather than
  * left to callers:
  *   - date strings are normalized at WRITE time — the plain combiner's
  *     re-normalization would project a new `date` attribute and discard
  *     the at-rest partitioning;
  *   - fact stages bucket by BOTH join keys (grid_id, date): Spark's
  *     default `requireAllClusterKeysForCoPartition` only elides the
  *     exchange when the partitioning covers every join key. Grid-keyed
  *     dimension stages bucket by grid_id and broadcast in the combine
  *     anyway.
  *
  * Bucketing rides the session catalog (bucket metadata cannot live in
  * bare parquet paths), with data at an explicit external `path` — the
  * same hive-style stage layout, plus bucket metadata.
  */
object BucketedStages {

  /** Callers tune per deployment; 32 keeps local tests honest. */
  val DefaultBuckets = 32

  /** Write `df` as an external bucketed table at `path`, normalized and
    * bucketed on its join keys.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    nBuckets: Int = DefaultBuckets): Unit = {
    val spark = df.sparkSession
    val normalized = WideCombiner.normalizeDate(df)
    val keys = Seq("grid_id", "date").filter(normalized.columns.contains)
    require(keys.nonEmpty, s"$table has neither grid_id nor date")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    normalized.write
      .format("parquet")
      .mode("overwrite") // re-entrant: replaces stale files at the path
      .option("path", path)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Scan a bucketed stage (bucket metadata comes from the catalog). */
  def scanBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Wide-combine bucketed stage tables: same semantics as
    * [[WideCombiner.combine]] over pre-normalized stages — prefixing,
    * key-intersection inner joins, dim broadcast, float32 cast — minus
    * the date re-normalization that would break the at-rest partitioning.
    */
  def combineBucketed(spark: SparkSession,
                      tables: Seq[(String, String)]): DataFrame = {
    require(tables.nonEmpty, "no tables to combine")
    val prepared = tables.map { case (name, table) =>
      val p = WideCombiner.prefixColumns(scanBucketed(spark, table), name)
      if (p.columns.contains("date")) p else broadcast(p)
    }
    val joined = prepared.reduce { (a, b) =>
      // key order (grid_id, date) matches the bucket sortBy — the
      // sort-merge join then consumes the at-rest order with neither an
      // exchange nor a re-sort
      val keys = Seq("grid_id", "date").filter(k =>
        a.columns.contains(k) && b.columns.contains(k))
      require(keys.nonEmpty, "tables share no join key")
      a.join(b, keys, "inner")
    }
    WideCombiner.castValuesToFloat(joined)
  }
}
