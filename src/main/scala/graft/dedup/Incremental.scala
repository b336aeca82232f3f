package graft.dedup

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Incremental (batch-vs-snapshot) exact deduplication.
  *
  * The continuous-ingest shape of corpus dedup: a huge at-rest corpus
  * snapshot (billions of docs) and a stream of small-to-medium incoming
  * batches that must be checked against it. Re-running the full-corpus
  * groupBy per batch ([[Dedup.exact]]) would re-shuffle the snapshot
  * every time; instead the snapshot is summarized ONCE into two
  * artifacts, both linear one-pass builds that amortize over every
  * subsequent batch:
  *
  *   - a Bloom filter over 64-bit content hashes (`spark.util.sketch`,
  *     the same sketch Spark's runtime row-filter joins use), persisted
  *     next to the snapshot and broadcast to executors at check time;
  *   - a narrow md5 content-key index (16 bytes/doc), hash-partitioned
  *     on disk so the confirmation join never re-shuffles the snapshot.
  *
  * A batch row whose hash misses the Bloom filter is DEFINITELY new —
  * that's a map-side drop with zero shuffle, and at fpp=1% it settles
  * ~99% of a mostly-novel batch. Only Bloom hits (true dups + fpp false
  * positives) enter the confirmation anti-join against the md5 index,
  * so the only shuffle carries `|dups| + fpp·|batch|` rows. Semantics
  * are exact text equality (md5 keys — collision-free at any realistic
  * corpus size, same argument as [[Dedup]]'s exact-content collapse);
  * the Bloom filter only ever routes rows, it never decides membership,
  * so false positives cost a join row, not a wrong answer.
  *
  * The membership probe is a codegen'd native expression over a
  * broadcast of the filter ([[graft.functions.expressions.BloomProbeExpr]])
  * rather than a boxing Scala UDF — and rather than Spark's own
  * `BloomFilterMightContain`, whose literal child would embed the whole
  * bit array in the logical plan.
  *
  * [[checkBatch]] is narrow ops + a stream-static join, so the same
  * operator runs unchanged over a `readStream` batch feed (continuous
  * ingest-vs-snapshot dedup) — StreamingSpec exercises that path.
  */
object Incremental {

  /** 64-bit routing hash of the content (bloom side). */
  private def contentHash(text: Column): Column = xxhash64(text)

  /** Build the snapshot Bloom filter over content hashes in one pass.
    * `expectedItems` sizes the bit array (~9.6 bits/item at fpp=0.01);
    * overshooting degrades fpp gracefully, never correctness.
    */
  def buildBloom(corpus: DataFrame, textCol: String,
                 expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    corpus.select(contentHash(col(textCol)).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)

  /** Persist / reload the snapshot filter (Hadoop FS, so the artifact
    * lives next to the snapshot parquet on any supported store).
    */
  def saveBloom(spark: SparkSession, bf: BloomFilter, path: String): Unit = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(out.toByteArray) finally os.close()
  }

  def loadBloom(spark: SparkSession, path: String): BloomFilter = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val is = fs.open(p)
    try BloomFilter.readFrom(is) finally is.close()
  }

  /** The narrow exact-membership index of a snapshot: one md5 key per
    * distinct content. Written bucketed in practice (see scaladoc); the
    * anti-join side of [[checkBatch]].
    */
  def snapshotIndex(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(md5(col(textCol)).as("ch")).distinct()

  /** Codegen'd Bloom membership probe of `text`'s content hash. The
    * filter ships as a broadcast variable (fetched once per executor),
    * NOT as a plan literal — a snapshot-scale filter embedded in the
    * logical plan would bloat every plan copy and task binary and risk
    * driver OOM (see [[graft.functions.expressions.BloomProbeExpr]]).
    */
  def mightContain(bf: BloomFilter, text: Column): Column = {
    val spark = SparkSession.active
    val bc = spark.sparkContext.broadcast(bf)
    graft.functions.expressions.BloomExpressions
      .mightContainLong(bc, contentHash(text))
  }

  /** Flag each batch row against the snapshot: `(batch columns…, is_new)`.
    *
    * Bloom misses are new with no shuffle; Bloom hits are confirmed
    * against the md5 `index` with a left-semi/anti pair that Catalyst
    * plans as one join of the (small) hit set. Rows carry only
    * `idCol` + md5 through that join.
    */
  def checkBatch(batch: DataFrame, index: DataFrame, bf: BloomFilter,
                 idCol: String, textCol: String): DataFrame = {
    val keyed = batch.withColumn("__bloom_hit", mightContain(bf, col(textCol)))
      .withColumn("__ch", md5(col(textCol)))
    val misses = keyed.filter(!col("__bloom_hit"))
      .withColumn("is_new", lit(true))
    val hits = keyed.filter(col("__bloom_hit"))
    val confirmed = hits.join(
        index.select(col("ch").as("__ch"), lit(false).as("is_new")),
        Seq("__ch"), "left")
      .withColumn("is_new", coalesce(col("is_new"), lit(true)))
    misses.unionByName(confirmed)
      .drop("__bloom_hit", "__ch")
  }

  /** Convenience: only the genuinely-new batch rows. */
  def newDocs(batch: DataFrame, index: DataFrame, bf: BloomFilter,
              idCol: String, textCol: String): DataFrame =
    checkBatch(batch, index, bf, idCol, textCol)
      .filter(col("is_new")).drop("is_new")
}
