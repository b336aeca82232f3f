package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Stage-partitioned Parquet storage under a root directory:
  * `root/stage=<name>/month=<YYYY-MM>/...parquet`
  * (ref: src/pm25ml/combiners/combined_storage.py:39-183 and
  * data_artifact.py:11-44 — the GCS bucket becomes any Hadoop FS).
  *
  * Differences from the reference, by design:
  *  - a partition may hold multiple part-files (Spark-native layout);
  *    validators operate on the partition directory, not a single file;
  *  - reads go through partition discovery so `month` pruning is pushed
  *    into the scan automatically.
  */
final case class StageRef(stage: String, subArtifact: Option[String] = None) {
  /** `sampled+aod`-style composite stage names (ref: data_artifact.py:25-34). */
  def name: String = subArtifact.fold(stage)(s => s"$stage+$s")
}

final class StageStorage(spark: SparkSession, root: String) {
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def stagePath(ref: StageRef): String = s"$root/stage=${ref.name}"
  def partitionPath(ref: StageRef, month: String): String =
    s"${stagePath(ref)}/month=$month"

  /** Hive-partitioned lazy scan of a whole stage; `month` arrives as a
    * partition column and `filter(month ∈ ...)` prunes at the source
    * (ref: combined_storage.py:130-160).
    */
  def scanStage(ref: StageRef): DataFrame =
    spark.read
      .option("basePath", stagePath(ref))
      .parquet(stagePath(ref))

  /** Eager read of one month partition (no `month` column). */
  def readMonth(ref: StageRef, month: String): DataFrame =
    spark.read.parquet(partitionPath(ref, month))

  /** Write one month partition (overwrite). */
  def writeMonth(df: DataFrame, ref: StageRef, month: String): Unit =
    df.write.mode("overwrite").parquet(partitionPath(ref, month))

  /** Partitioned write of a multi-month frame in one job
    * (ref: combined_storage.py:162-183 sink_parquet(PartitionParted)).
    */
  def writePartitioned(df: DataFrame, ref: StageRef): Unit =
    df.write.mode("overwrite")
      .partitionBy("month")
      .parquet(stagePath(ref))

  def exists(ref: StageRef, month: String): Boolean =
    fs.exists(new Path(partitionPath(ref, month)))

  /** Footer-only row count of a partition — parquet metadata, no data scan
    * (ref: combined_storage.py:74-88).
    */
  def rowCount(ref: StageRef, month: String): Long = {
    val dir = new Path(partitionPath(ref, month))
    if (!fs.exists(dir)) return -1L
    val parts = fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
    parts.map { st =>
      val in = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          st.getPath, spark.sparkContext.hadoopConfiguration))
      try in.getRecordCount finally in.close()
    }.sum
  }

  /** Schema of a partition from footers only. */
  def schemaOf(ref: StageRef, month: String): StructType =
    spark.read.parquet(partitionPath(ref, month)).schema

  /** List the months materialized for a stage. */
  def months(ref: StageRef): Seq[String] = {
    val dir = new Path(stagePath(ref))
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("month="))
      .map(_.stripPrefix("month="))
      .sorted
  }
}
