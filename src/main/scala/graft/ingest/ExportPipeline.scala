package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Contracts.PipelineConfig

/** The ingest contract every dataset source implements
  * (ref: src/pm25ml/collectors/export_pipeline.py:112-179): a pipeline
  * declares its schema/row expectations up front and produces one archive
  * partition per (dataset, partition-key) on demand.
  *
  * External-system connectors (GEE batch exports S15, EarthData S16,
  * Harmony S17) live OUTSIDE the engine: their job is to deliver files
  * (CSV/NetCDF) that the in-engine adapters below consume. The trait
  * captures the contract those connectors must satisfy; tests implement it
  * with in-memory frames.
  */
trait ExportPipeline {
  /** Dataset name — becomes the `{dataset}__` column prefix. */
  def dataset: String

  /** Declared output contract, validated after every write
    * (the reference's primary correctness mechanism).
    */
  def config(partition: String): PipelineConfig

  /** Produce the archive frame for one partition
    * (`YYYY-MM`, `YYYY`, or "static").
    */
  def read(spark: SparkSession, partition: String): DataFrame
}
