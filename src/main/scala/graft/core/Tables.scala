package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness testdata tables (TESTDATA.md): one parquet per
  * table under an sf directory. Partition/column pruning and filter pushdown
  * happen in Catalyst; nothing is cached here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The harness events table stores TIMESTAMP(NANOS) which Spark's parquet
    // reader rejects; read nanos as long and convert to a micros timestamp
    // (DuckDB keeps full ns — equality holds for any date/second-level use).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
