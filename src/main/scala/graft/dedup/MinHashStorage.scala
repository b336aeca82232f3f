package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed at-rest MinHash-LSH corpus — the NEAR-DUP text twin of
  * [[CorpusStorage]] (exact text), [[graft.similarity.VectorStorage]]
  * (vectors) and [[graft.multimodal.ImageStorage]] (perceptual
  * hashes), closing the last modality without an at-rest lane.
  *
  * The recurring text near-dup passes (full-corpus sweep per snapshot)
  * share two expensive steps the ad-hoc [[Dedup.minhashLsh]] pays
  * every run: shingling + 128-hash MinHash signatures over every
  * document (the dominant CPU), and the banded (band, bucket) shuffle
  * that co-locates candidates (the only corpus-sized exchange).
  * Persisting the banded index BUCKETED ON THE BAND KEY makes both a
  * property of the storage: signatures are computed exactly once (at
  * write), and the banded candidate self-join plans with ZERO shuffle
  * exchanges (asserted in DedupSpec). At 100 TB of text that converts
  * each recurring pass from shingle-everything + shuffle-everything
  * into a co-located scan of ~20-byte band rows plus pair-bounded
  * verification joins.
  *
  * Layout (three tables, one shingling pass over the corpus):
  *
  *   - `table` — BAND rows of one REPRESENTATIVE per distinct text:
  *     `(band, bucket, doc)`, bucketed+sorted by `(band, bucket)`.
  *     The exact-collapse-before-banding discipline of
  *     [[Dedup.minhashLsh]] is baked into the layout: mass-duplicated
  *     boilerplate occupies ONE band row set however many copies.
  *   - `table_shingles` — the representatives' shingle sets
  *     `(doc, ch, sh)`, bucketed by `doc`, so candidate verification
  *     fetches sets with the corpus side exchange-free (only the
  *     pair-bounded candidate rows shuffle into the buckets).
  *   - `table_members` — the collapse map `(ch, rep, doc)`, bucketed
  *     by `ch`, for re-expanding representative pairs onto members.
  *
  * The band split (`numHashes`, `bands`, `shingleSize`) is pinned at
  * write time; readers never re-band, so there is no reader-side
  * parameter to mismatch — only `threshold` is a read-time choice.
  */
object MinHashStorage {

  private def validateIdentifier(table: String): Unit =
    require(table.split('.').forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"invalid table identifier '$table' — use [A-Za-z_][A-Za-z0-9_]* segments")

  def shinglesTable(table: String): String = table + "_shingles"
  def membersTable(table: String): String = table + "_members"

  /** Write `docs` (`idCol`, `textCol`) as the three bucketed tables.
    * Overwrite semantics match the sibling storages: no pre-emptive
    * DROP — a failed write leaves the previous snapshot readable.
    */
  def writeBucketed(docs: DataFrame, idCol: String, textCol: String,
                    table: String, path: String, shingleSize: Int = 3,
                    numHashes: Int = 128, bands: Int = 32,
                    nBuckets: Int = 32): Unit = {
    validateIdentifier(table)
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val (member, repIds) = Dedup.exactGroups(docs, idCol, textCol)
    // cut BEFORE the fan-out: bands and shingles both derive from the
    // shingled representatives, and an uncut lineage would run the
    // shingling (the expensive pass this layout amortizes) per table
    val sh = Dedup.repDocs(docs, idCol, textCol, repIds)
      .select(col("doc"), col("ch"),
        Dedup.wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    sh.select(col("doc"), posexplode(
        graft.functions.expressions.MinHashExpressions
          .minhash_bands(col("sh"), numHashes, bands)))
      .select(col("pos").as("band"), col("col").as("bucket"), col("doc"))
      .write.format("parquet").mode("overwrite")
      .option("path", s"$path/bands")
      .bucketBy(nBuckets, "band", "bucket")
      .sortBy("band", "bucket")
      .saveAsTable(table)
    sh.write.format("parquet").mode("overwrite")
      .option("path", s"$path/shingles")
      .bucketBy(nBuckets, "doc")
      .sortBy("doc")
      .saveAsTable(shinglesTable(table))
    member.join(repIds.select(col("ch"), col("doc").as("rep")), Seq("ch"))
      .select(col("ch"), col("rep"), col("doc"))
      .write.format("parquet").mode("overwrite")
      .option("path", s"$path/members")
      .bucketBy(nBuckets, "ch")
      .sortBy("ch")
      .saveAsTable(membersTable(table))
    // schema sidecars, written AFTER each table (overwrite clears the
    // dir first): an EMPTY corpus writes no parquet footers, so
    // [[register]] in a fresh session would have nothing to infer a
    // schema from — and the empty corpus is exactly the bootstrap case
    // requireSameBands exists to serve
    val spark = docs.sparkSession
    graft.core.BucketedCatalog.writeSidecar(spark, table, s"$path/bands")
    graft.core.BucketedCatalog.writeSidecar(spark, shinglesTable(table),
      s"$path/shingles")
    graft.core.BucketedCatalog.writeSidecar(spark, membersTable(table),
      s"$path/members")
  }

  def scan(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Re-ATTACH the catalog entries for a corpus previously written by
    * [[writeBucketed]] at `path` — the tables are external
    * (path-backed) and bucket ids ride the parquet file names, so a
    * new session re-registers the same files with the same declared
    * bucket spec instead of re-shingling anything. This is the
    * production restart path: the at-rest layout must survive the
    * session that wrote it, or "amortized at write time" would really
    * mean "paid once per JVM". `nBuckets` must match the write —
    * a mismatched declaration would silently mis-bucket reads, so
    * pass the write-time value (the [[ImageStorage]] maxHamming
    * posture).
    */
  def register(spark: SparkSession, table: String, path: String,
               nBuckets: Int = 32): Unit = {
    validateIdentifier(table)
    graft.core.BucketedCatalog.register(spark, table, s"$path/bands",
      Seq("band", "bucket"), nBuckets)
    graft.core.BucketedCatalog.register(spark, shinglesTable(table),
      s"$path/shingles", Seq("doc"), nBuckets)
    graft.core.BucketedCatalog.register(spark, membersTable(table),
      s"$path/members", Seq("ch"), nBuckets)
  }

  /** The corpus-sized banded candidate self-join BEFORE its
    * pair-bounded dedupe — exposed so the plan contract (the join
    * consumes the storage bucketing: ZERO shuffle exchanges) is
    * assertable in DedupSpec without downstream exchanges muddying
    * the count.
    */
  def candidatePlan(spark: SparkSession, table: String): DataFrame = {
    val bands = scan(spark, table)
    val l = bands.select(col("band"), col("bucket"), col("doc").as("id_a"))
    val r = bands.select(col("band"), col("bucket"), col("doc").as("id_b"))
    // merge hint: both sides are the corpus — broadcasting it is what
    // the bucketing exists to avoid
    l.hint("merge").join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  /** [[Dedup.minhashLsh]]'s exact contract `(id_a < id_b, jaccard)`
    * off the at-rest layout: banded candidates (exchange-free), exact
    * Jaccard verification on the stored shingle sets (pair-bounded
    * fetches against the doc-bucketed table), representative pairs
    * re-expanded onto exact-duplicate members at jaccard 1.0.
    */
  def pairs(spark: SparkSession, table: String,
            threshold: Double = 0.8): DataFrame = {
    val candidates = candidatePlan(spark, table).distinct()
    val sh = scan(spark, shinglesTable(table))
    val repPairs = candidates
      .join(sh.select(col("doc").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(sh.select(col("doc").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val members = scan(spark, membersTable(table))
    val member = members.select(col("ch"), col("doc"))
    val repIds = members.select(col("ch"), col("rep").as("doc")).distinct()
    // intra pairs only for groups with a non-empty shingle set — the
    // write filtered those, so the stored ch list IS that set
    val intra = sh.select(col("ch"), lit(1.0).as("jaccard"))
    Dedup.expandExactGroups(member, repIds, repPairs, intra)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** The stored band fan-out must match the reader's `bands` — a
    * probe banded differently would silently miss candidates. One
    * cheap aggregation over the band table (the [[ImageStorage]]
    * requireSameSplit posture); `shingleSize`/`numHashes` cannot be
    * observed from the fan-out, so they are a documented contract:
    * pass the write-time values.
    */
  private def requireSameBands(bandRows: DataFrame, bands: Int): Unit = {
    val stored = bandRows.agg(countDistinct(col("band"))).head().getLong(0)
    // stored == 0 is a legitimately EMPTY corpus (first deployment):
    // reads must return zero hits so an incremental pipeline can
    // bootstrap, not abort
    require(stored == 0 || stored == bands,
      s"MinHashStorage: table stores $stored bands but the reader asked " +
        s"for $bands — rewrite the corpus or pass the write-time bands")
  }

  /** Incremental batch check — which at-rest docs a NEW batch
    * near-duplicates (`(batch_id, id, jaccard)` with jaccard ≥
    * `threshold`), the text twin of [[graft.multimodal.ImageStorage
    * .checkBatch]] / [[Incremental.checkBatch]] (which answers the
    * EXACT-dup question; this answers the near-dup one). The batch is
    * ingestion-sized, so its shingling+signing is the cheap side.
    *
    * Scale shape: the corpus side is the bucketed band scan — never
    * shuffled, never re-shingled; the batch band probes broadcast
    * size-conditionally (measured count vs `maxBroadcastBatchRows`,
    * shuffle fallback above), so the recurring per-batch check plans
    * with ZERO corpus-side shuffle exchanges in the common case.
    * Verification fetches shingle sets only for candidate reps
    * (pair-bounded), and rep hits expand onto exact-duplicate members
    * at the same jaccard (identical text). `shingleSize`, `numHashes`
    * and `bands` must equal the write-time values; recall is the
    * [[Dedup.minhashLsh]] argument (≥ 1 − 5·10⁻⁸ at threshold 0.8
    * with 128 hashes / 32 bands — don't lower the threshold past the
    * banding's recall knee).
    */
  def checkBatch(spark: SparkSession, table: String, batchDocs: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text",
                 shingleSize: Int = 3, numHashes: Int = 128,
                 bands: Int = 32, threshold: Double = 0.8,
                 maxBroadcastBatchRows: Long = 4000000L): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val bandRows = scan(spark, table)
    requireSameBands(bandRows, bands)
    // cut: the size probe counts the batch, and an uncut lineage would
    // shingle the batch once per read below
    val bsh = batchDocs
      .select(col(idCol).as("batch_id"),
        Dedup.wordShingles(col(textCol), shingleSize).as("bsh"))
      .filter(size(col("bsh")) > 0)
      .localCheckpoint()
    val probes0 = bsh
      .select(col("batch_id"), posexplode(
        graft.functions.expressions.MinHashExpressions
          .minhash_bands(col("bsh"), numHashes, bands)))
      .select(col("pos").as("band"), col("col").as("bucket"),
        col("batch_id"))
    val probes =
      if (bsh.count() * bands <= maxBroadcastBatchRows) broadcast(probes0)
      else probes0
    val repHits = bandRows.join(probes, Seq("band", "bucket"))
      .select(col("batch_id"), col("doc"))
      .dropDuplicates("batch_id", "doc")
    val sh = scan(spark, shinglesTable(table))
    val verified = repHits
      .join(sh.select(col("doc"), col("sh")), Seq("doc"))
      .join(bsh, Seq("batch_id"))
      .withColumn("jaccard", Dedup.jaccard(col("sh"), col("bsh")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("doc").as("rep"), col("jaccard"))
    val members = scan(spark, membersTable(table))
    verified
      .join(members.select(col("rep"), col("doc").as("id")), Seq("rep"))
      .select(col("batch_id"), col("id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** [[Dedup.deduplicate]] off the at-rest corpus: same survivor
    * semantics (every doc minus non-canonical near-dup cluster
    * members, min-id canonical, shared large-star/small-star closure
    * with [[graft.core.Durable]] cuts via `checkpointDir`), but no
    * shingling and no corpus-sized band shuffle.
    */
  def deduplicate(spark: SparkSession, table: String,
                  threshold: Double = 0.8,
                  checkpointDir: Option[String] = None): DataFrame = {
    val p = pairs(spark, table, threshold).select(col("id_a"), col("id_b"))
    val comps = Dedup.connectedComponents(p, checkpointDir = checkpointDir)
    scan(spark, membersTable(table)).select(col("doc"))
      .join(comps.filter(col("id") =!= col("canonical_id"))
        .select(col("id").as("doc")), Seq("doc"), "left_anti")
  }
}
