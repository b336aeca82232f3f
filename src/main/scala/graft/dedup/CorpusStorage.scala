package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed at-rest corpus layout — the dedup twin of
  * [[graft.operators.BucketedStages]]'s combine lever.
  *
  * Corpus dedup is re-run constantly (every snapshot refresh, every
  * batch merge), and its only all-data shuffle is the groupBy/join on
  * the 64-bit content hash. Writing the corpus BUCKETED on
  * `content_hash` makes that partitioning a property of the storage:
  * every subsequent exact-dedup pass, dup-count report, or
  * hash-keyed confirmation join plans with ZERO shuffle exchanges
  * (asserted in DedupSpec), reading each bucket as one co-located
  * partition. At 100 TB that converts the recurring cost of corpus
  * maintenance from a full-corpus shuffle to a scan.
  *
  * The hash column is materialized at write time (so the stored sort
  * and bucketing agree with what queries group on), via the catalog —
  * bucket metadata cannot live in bare parquet paths.
  */
object CorpusStorage {

  val HashCol = "content_hash"

  /** Identifiers reach catalog SQL verbatim, so gate them hard: plain or
    * dot-qualified `[A-Za-z_][A-Za-z0-9_]*` only — anything else (quotes,
    * spaces, semicolons) throws instead of being interpolated.
    */
  private def validateIdentifier(table: String): Unit =
    require(table.split('.').forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"invalid table identifier '$table' — use [A-Za-z_][A-Za-z0-9_]* segments")

  /** Write `docs` bucketed+sorted by the content hash of `textCol` as
    * an external table at `path`.
    *
    * The replace is handled by `mode(overwrite)` inside `saveAsTable`
    * alone — no pre-emptive DROP: a write that fails partway must leave
    * the catalog still holding the previous snapshot rather than no
    * table at all (the recurring-dedup consumers read `scan(table)`
    * unconditionally).
    */
  def writeBucketed(docs: DataFrame, textCol: String, table: String,
                    path: String, nBuckets: Int = 32): Unit = {
    validateIdentifier(table)
    docs.withColumn(HashCol, xxhash64(col(textCol)))
      .write.format("parquet").mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, HashCol)
      .sortBy(HashCol)
      .saveAsTable(table)
  }

  def scan(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** [[Dedup.exact]] over an at-rest bucketed corpus: same result, but
    * the groupBy consumes the storage partitioning — no exchange.
    */
  def exactDedup(spark: SparkSession, table: String, idCol: String): DataFrame =
    scan(spark, table).groupBy(col(HashCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
}
