package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Contracts
import graft.core.Contracts.{FloatValue, PipelineConfig}
import graft.ingest.Connectors.NedDatasetDescriptor
import graft.operators.Scaffold

/** The full NED export composition (ref: ned_export_pipeline.py:98-297):
  * retriever → granule decode → daily regrid onto the grid centroids →
  * variable rename → missing-row scaffold over the date range × grid →
  * declared contract. The retriever is injected as a function delivering
  * local granule paths (the network transport lives outside the engine —
  * S16/S17 run at NASA in the reference too); everything downstream is
  * the real distributed path: one executor task per granule through
  * [[NedGranule]]/[[OmiGranule]], [[NedAdapter]] regrid, broadcast spine
  * completion.
  */
final class NedExportPipeline(
    grid: DataFrame,
    descriptor: NedDatasetDescriptor,
    streamGranules: NedDatasetDescriptor => Seq[String],
    readLong: (SparkSession, Seq[String]) => DataFrame,
    nGrids: Long) extends ExportPipeline {

  def dataset: String = descriptor.datasetName

  /** Contract: one float value column per mapped variable, one row per
    * (grid_id, date) over the descriptor's full range
    * (ref: ned_export_pipeline.py:260-271).
    */
  def config(partition: String): PipelineConfig =
    PipelineConfig(
      dataset = dataset,
      idColumns = Set("grid_id", "date"),
      valueColumnTypes =
        descriptor.variableMapping.values.map(_ -> FloatValue).toMap,
      expectedRows = nGrids * descriptor.daysInRange)

  /** Calendar spine for the descriptor's [start, end] range. */
  private def rangeDates(spark: SparkSession): DataFrame =
    spark.range(1).select(
      explode(sequence(
        to_date(lit(descriptor.startDate.toString)),
        to_date(lit(descriptor.endDate.toString)),
        expr("interval 1 day"))).as("d"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("date"))

  /** Produce the archive frame: granule gate, decode, regrid, rename,
    * scaffold (ref: ned_export_pipeline.py:171-258). Throws on gate
    * rejection — the reference's NedMissingDataError.
    */
  def read(spark: SparkSession, partition: String): DataFrame = {
    val paths = streamGranules(descriptor)
    Connectors.checkExpectedGranules(paths.size, descriptor) match {
      case Left(err) => throw new IllegalStateException(err)
      case Right(_) => ()
    }
    require(descriptor.variableMapping.size == 1,
      s"one variable per NED dataset (got ${descriptor.variableMapping.keys})")
    val outVar = descriptor.variableMapping.values.head
    // filter bounds are (W, S, E, N); the adapter takes (latMin, latMax,
    // lonMin, lonMax)
    val (w, s, e, n) = descriptor.filterBounds
    val long = readLong(spark, paths)
    val regridded = NedAdapter.toArchive(long, grid, outVar,
      method = descriptor.interpolationMethod, bbox = Some((s, n, w, e)))
    Scaffold.complete(
      regridded, grid, rangeDates(spark))
      .select(col("grid_id"), col("date"),
        col(outVar).cast("float").as(outVar))
  }

  /** Run the export end-to-end and validate the written-shape contract
    * before handing the frame to storage (the reference validates after
    * the write via archived_file_validator; here the frame is validated
    * and returned so any storage sink — [[graft.core.StageStorage]],
    * partitioned parquet — can land it).
    */
  def readValidated(spark: SparkSession, partition: String): DataFrame = {
    val df = read(spark, partition)
    val cfg = config(partition)
    val violations = Contracts.validate(df, cfg, df.count())
    if (violations.nonEmpty)
      throw new IllegalStateException(
        s"dataset $dataset violates its contract: " +
          violations.map(_.msg).mkString("; "))
    df
  }
}
