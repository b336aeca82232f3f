package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness testdata tables (TESTDATA.md): one parquet per
  * table under an sf directory. Partition/column pruning and filter pushdown
  * happen in Catalyst; nothing is cached here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Normalize the events `ts` column to TimestampType micros regardless
    * of the at-rest representation, branching on the READ schema so every
    * generation of testdata keeps working (the old unconditional
    * `ts div 1000` broke analysis on native timestamps):
    *   - legacy TIMESTAMP(NANOS), readable only as a raw long via
    *     `nanosAsLong` → convert nanos to a micros timestamp;
    *   - current timestamp[us] files, which Spark reads as TIMESTAMP_NTZ
    *     → cast to TIMESTAMP. Value-preserving under the UTC session
    *     timezone every entry point sets, and required twice over: event
    *     -time watermarks reject NTZ outright, and TimestampType is the
    *     representation the round-3 oracle comparisons validated.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    if (!df.schema.fieldNames.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // nanosAsLong lets a legacy TIMESTAMP(NANOS) file load at all; it is a
    // no-op for files already written as micros.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }
}
