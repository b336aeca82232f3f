package graft.core

import org.apache.spark.sql.SparkSession

/** Catalog plumbing shared by the at-rest bucketed storages
  * ([[graft.dedup.MinHashStorage]], [[graft.multimodal.ImageStorage]],
  * [[graft.similarity.VectorStorage]]): their tables are EXTERNAL
  * (path-backed, bucket ids in the parquet file names), so a fresh
  * session re-attaches the same files with the same declared bucket
  * spec instead of rewriting anything — the production restart path
  * without which "amortized at write time" would mean "paid once per
  * JVM".
  *
  * A `_GRAFT_SCHEMA` sidecar written next to the files makes the
  * re-attach schema-exact even for an EMPTY corpus (no parquet footers
  * to infer from — and the empty corpus is precisely the
  * incremental-bootstrap case the storages' readers support).
  */
object BucketedCatalog {

  val SchemaSidecar = "_GRAFT_SCHEMA"

  /** Write the sidecar for a just-written table directory. Call AFTER
    * the bucketed write (overwrite mode clears the directory first).
    */
  def writeSidecar(spark: SparkSession, table: String, path: String): Unit = {
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, SchemaSidecar),
      spark.table(table).schema.toDDL.getBytes("UTF-8"))
    ()
  }

  /** Re-attach one external bucketed table. `nBuckets` and the key
    * columns must equal the write-time spec — a mismatched declaration
    * would silently mis-bucket reads, so pass the write-time values.
    */
  def register(spark: SparkSession, table: String, path: String,
               bucketCols: Seq[String], nBuckets: Int): Unit = {
    require(table.split('.').forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"invalid table identifier '$table' — use [A-Za-z_][A-Za-z0-9_]* " +
        "segments")
    require(!path.contains("'"), s"path must not contain quotes: $path")
    val sidecar = java.nio.file.Paths.get(path, SchemaSidecar)
    // the sidecar is authoritative; inference covers corpora written
    // before it existed
    val ddl =
      if (java.nio.file.Files.exists(sidecar))
        new String(java.nio.file.Files.readAllBytes(sidecar), "UTF-8")
      else spark.read.parquet(path).schema.toDDL
    val cols = bucketCols.mkString(", ")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"""CREATE TABLE $table ($ddl) USING PARQUET
      CLUSTERED BY ($cols) SORTED BY ($cols) INTO $nBuckets BUCKETS
      LOCATION '$path'""")
    ()
  }
}
