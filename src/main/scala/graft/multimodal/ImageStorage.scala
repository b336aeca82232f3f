package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed at-rest perceptual-hash corpus — the IMAGE twin of
  * [[graft.similarity.VectorStorage]] (vectors) and
  * [[graft.dedup.Incremental]] (text).
  *
  * The recurring image-dedup passes (full-corpus near-dup sweep on
  * every snapshot, new-batch containment check per ingestion) share two
  * expensive steps: decoding pixels to a perceptual hash, and shuffling
  * band chunks to co-locate Hamming candidates. Run ad hoc
  * ([[ImageHash.deduplicate]]), every pass re-decodes the corpus AND
  * re-shuffles the banded fingerprints. Persisting the hash corpus
  * bucketed ON THE BAND KEY makes both a property of the storage:
  * pixels are decoded exactly once (at write), and the banded
  * candidate self-join — the only corpus-sized exchange the ad-hoc
  * pass plans — becomes exchange-free (asserted in ImageStorageSpec).
  * At 100 TB of images that converts each recurring pass from
  * decode-everything + shuffle-everything into a co-located scan of
  * ~32-byte rows.
  *
  * Layout (two tables, both written in one pass over the hashes):
  *
  *   - `table` — BAND rows of one REPRESENTATIVE per distinct
  *     fingerprint: `(chunk, v, rep, fp)`, bucketed+sorted by
  *     `(chunk, v)`. The exact-collapse-before-banding discipline of
  *     [[ImageHash.hammingPairs]] is thus baked into the layout:
  *     re-encoded exact copies (the worst band skew) occupy ONE band
  *     row set however many there are.
  *   - `table_members` — the collapse map `(fp, rep, id)`, bucketed by
  *     `fp`, so hamming-0 expansion self-joins exchange-free and
  *     cross-cluster expansion ships only pair-bounded rows.
  *
  * The band split is pinned at write time by `maxHamming` (chunks =
  * maxHamming + 1 — the pigeonhole bound); readers must pass the same
  * value, and [[pairs]]/[[checkBatch]] verify it against the stored
  * chunk fan-out before planning anything expensive.
  */
object ImageStorage {

  private def validateIdentifier(table: String): Unit =
    require(table.split('.').forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"invalid table identifier '$table' — use [A-Za-z_][A-Za-z0-9_]* segments")

  def membersTable(table: String): String = table + "_members"

  /** The id column as LONG, failing LOUD on anything the cast would
    * silently null (non-numeric strings, nulls, overflowing decimals) —
    * a nulled id here would persist null reps/members and corrupt the
    * at-rest corpus for every later reader, the opposite of the repo's
    * raise_error posture (the [[ImageHash.packKeyframeHashes]] guard
    * pattern). The guard IS the emitted column, so it cannot be pruned
    * out of the plan.
    */
  private def idAsLong(idCol: String): org.apache.spark.sql.Column = {
    val casted = col(idCol).cast("long")
    when(casted.isNotNull, casted).otherwise(raise_error(concat(
      lit(s"ImageStorage: id column '$idCol' does not cast to long (got "),
      coalesce(col(idCol).cast("string"), lit("null")),
      lit(") — a silently-nulled id would corrupt the at-rest corpus"))))
  }

  /** Band-explode a fingerprint into `(chunk, v)` rows — the
    * [[ImageHash.hammingPairs]] split: `maxHamming + 1` chunks of
    * `64 / (maxHamming + 1)` bits each.
    */
  private def bandCols(fp: org.apache.spark.sql.Column,
                       maxHamming: Int): org.apache.spark.sql.Column = {
    val chunks = maxHamming + 1
    val bits = 64 / chunks
    explode(array((0 until chunks).map { i =>
      struct(lit(i).as("chunk"),
        (shiftrightunsigned(fp, i * bits) bitwiseAND
          lit((1L << bits) - 1)).as("v"))
    }: _*))
  }

  /** Write a hash corpus (`idCol`, `fpCol` — e.g. [[ImageHash
    * .imageHashes]] output, so decode happens exactly once, here) as
    * the two bucketed tables. Overwrite semantics match
    * [[graft.similarity.VectorStorage.writeBucketed]]: no pre-emptive
    * DROP — a failed write leaves the previous snapshot readable.
    */
  def writeBucketed(hashes: DataFrame, table: String, path: String,
                    maxHamming: Int = 3, nBuckets: Int = 32,
                    idCol: String = "media_id",
                    fpCol: String = "dhash"): Unit = {
    validateIdentifier(table)
    require(maxHamming >= 1 && maxHamming <= 15,
      s"maxHamming out of [1,15]: $maxHamming")
    // cut BEFORE the fan-out: both tables derive from the hash frame,
    // and an uncut lineage would run the upstream decode (the expensive
    // pass this layout exists to amortize) once per table write
    val h = hashes.select(idAsLong(idCol).as("id"),
        col(fpCol).as("fp"))
      .localCheckpoint()
    // one corpus-sized reduction: the exact-fingerprint collapse
    val groups = h.groupBy("fp").agg(min(col("id")).as("rep"))
      .localCheckpoint()
    groups
      .select(col("rep"), col("fp"), bandCols(col("fp"), maxHamming).as("ck"))
      .select(col("ck.chunk").as("chunk"), col("ck.v").as("v"),
        col("rep"), col("fp"))
      .write.format("parquet").mode("overwrite")
      .option("path", s"$path/bands")
      .bucketBy(nBuckets, "chunk", "v")
      .sortBy("chunk", "v")
      .saveAsTable(table)
    h.join(groups, Seq("fp"))
      .select(col("fp"), col("rep"), col("id"))
      .write.format("parquet").mode("overwrite")
      .option("path", s"$path/members")
      .bucketBy(nBuckets, "fp")
      .sortBy("fp")
      .saveAsTable(membersTable(table))
    // schema sidecars so [[register]] re-attaches even an empty corpus
    val spark = hashes.sparkSession
    graft.core.BucketedCatalog.writeSidecar(spark, table, s"$path/bands")
    graft.core.BucketedCatalog.writeSidecar(spark, membersTable(table),
      s"$path/members")
  }

  /** Re-attach a corpus previously written by [[writeBucketed]] at
    * `path` in a fresh session — the [[graft.core.BucketedCatalog]]
    * restart path (declared bucket specs over the external files, no
    * re-decode, no rewrite). `nBuckets` must equal the write-time
    * value.
    */
  def register(spark: SparkSession, table: String, path: String,
               nBuckets: Int = 32): Unit = {
    validateIdentifier(table)
    graft.core.BucketedCatalog.register(spark, table, s"$path/bands",
      Seq("chunk", "v"), nBuckets)
    graft.core.BucketedCatalog.register(spark, membersTable(table),
      s"$path/members", Seq("fp"), nBuckets)
  }

  def scan(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** The stored band fan-out must match the reader's `maxHamming` — a
    * mismatched split would silently miss pairs (too few chunks read)
    * or fabricate band hits (too many). One cheap aggregation over the
    * (distinct-fp × chunks)-sized band table.
    */
  private def requireSameSplit(bands: DataFrame, maxHamming: Int): Unit = {
    val stored = bands.agg(countDistinct(col("chunk"))).head().getLong(0)
    // stored == 0 is a legitimately EMPTY corpus (first deployment, a
    // filtered-to-nothing snapshot): reads must return zero pairs/hits
    // so an incremental pipeline can bootstrap, not abort
    require(stored == 0 || stored == maxHamming + 1,
      s"ImageStorage: table stores ${stored} band chunks but maxHamming=" +
        s"$maxHamming needs ${maxHamming + 1} — rewrite the corpus or pass " +
        "the write-time maxHamming")
  }

  /** All id pairs within `maxHamming` — [[ImageHash.hammingPairs]]'s
    * exact contract `(id_a < id_b, hamming)` — off the at-rest layout.
    * The banded candidate self-join consumes the storage bucketing
    * (ZERO shuffle exchanges under it, asserted in ImageStorageSpec);
    * everything that does exchange afterward is pair-bounded
    * (candidate dedupe) or id-sized (member expansion).
    */
  def pairs(spark: SparkSession, table: String,
            maxHamming: Int = 3): DataFrame = {
    val bands = scan(spark, table)
    requireSameSplit(bands, maxHamming)
    val member = scan(spark, membersTable(table))
    val repPairs = candidatePlan(spark, table, maxHamming)
      .dropDuplicates("ra", "rb")
    val ma = member.select(col("rep").as("ra"), col("id").as("__ia"))
    val mb = member.select(col("rep").as("rb"), col("id").as("__ib"))
    val cross = repPairs.join(ma, Seq("ra")).join(mb, Seq("rb"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"), col("hamming"))
    // hamming-0 within-fingerprint pairs: the members table is bucketed
    // by fp, so this self-join is exchange-free too
    val within = member.select(col("fp"), col("id").as("id_a")).as("x")
      .join(member.select(col("fp"), col("id").as("id_b")).as("y"),
        Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).cast("int").as("hamming"))
    cross.unionByName(within)
  }

  /** The rep-level banded candidate join of [[pairs]] BEFORE its
    * pair-bounded dedupe — exposed so the plan contract (the
    * corpus-sized self-join consumes the storage bucketing: ZERO
    * shuffle exchanges) is assertable in ImageStorageSpec without the
    * downstream dedupe exchange muddying the count. Skips the
    * band-split validation (the caller ran it).
    */
  def candidatePlan(spark: SparkSession, table: String,
                    maxHamming: Int): DataFrame = {
    val bands = scan(spark, table)
    val l = bands.select(col("chunk"), col("v"), col("rep").as("ra"),
      col("fp").as("fa"))
    val r = bands.select(col("chunk"), col("v"), col("rep").as("rb"),
      col("fp").as("fb"))
    // merge hint: both sides are the corpus — broadcasting it is what
    // the bucketing exists to avoid
    l.hint("merge").join(r, Seq("chunk", "v"))
      .filter(col("ra") < col("rb"))
      .withColumn("hamming",
        bit_count(col("fa") bitwiseXOR col("fb")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("ra", "rb", "hamming")
  }

  /** [[ImageHash.deduplicate]] off the at-rest corpus: same verdicts
    * (`(media_id, cluster, kept)`, min-id canonical, transitive
    * closure via the shared large-star/small-star loop), but no
    * decode and no corpus-sized band shuffle.
    */
  def deduplicate(spark: SparkSession, table: String, maxHamming: Int = 3,
                  checkpointDir: Option[String] = None): DataFrame = {
    val p = pairs(spark, table, maxHamming).select(col("id_a"), col("id_b"))
    val comps = graft.dedup.Dedup.connectedComponents(p,
      checkpointDir = checkpointDir)
    scan(spark, membersTable(table)).select(col("id").as("media_id"))
      .join(comps.withColumnRenamed("id", "media_id"), Seq("media_id"),
        "left")
      .select(col("media_id"),
        coalesce(col("canonical_id"), col("media_id")).as("cluster"))
      .withColumn("kept", col("media_id") === col("cluster"))
  }

  /** Incremental batch check — which images of a NEW batch are within
    * `maxHamming` of something already at rest (`(batch_id, id,
    * hamming)` pairs), the image twin of [[graft.similarity
    * .VectorStorage.checkBatch]]. `batchHashes` is the hashed batch
    * (`idCol`, `fpCol` — hash it with [[ImageHash.imageHashes]]; the
    * batch is ingestion-sized, so its decode is the cheap side).
    *
    * Scale shape: the corpus side is the bucketed band scan — it never
    * shuffles and is never decoded; the batch band rows broadcast
    * size-conditionally (measured count vs `maxBroadcastBatchRows`,
    * shuffle fallback above), so the recurring per-batch check plans
    * with ZERO shuffle exchanges on the corpus side in the common case
    * (asserted in ImageStorageSpec). A batch hash identical to a
    * stored one shares every chunk, so exact re-ingests surface at
    * hamming 0 without a separate lane.
    */
  def checkBatch(spark: SparkSession, table: String, batchHashes: DataFrame,
                 maxHamming: Int = 3, idCol: String = "media_id",
                 fpCol: String = "dhash",
                 maxBroadcastBatchRows: Long = 4000000L): DataFrame = {
    val bands = scan(spark, table)
    requireSameSplit(bands, maxHamming)
    val member = scan(spark, membersTable(table))
    // cut: the size probe below counts b, and an uncut lineage would
    // run the batch's decode twice (once for the count, once for the
    // band join)
    val b = batchHashes.select(idAsLong(idCol).as("batch_id"),
        col(fpCol).as("bfp"))
      .localCheckpoint()
    val probes0 = b
      .select(col("batch_id"), col("bfp"),
        bandCols(col("bfp"), maxHamming).as("ck"))
      .select(col("ck.chunk").as("chunk"), col("ck.v").as("v"),
        col("batch_id"), col("bfp"))
    val probes =
      if (b.count() * (maxHamming + 1) <= maxBroadcastBatchRows)
        broadcast(probes0)
      else probes0
    val repHits = bands.join(probes, Seq("chunk", "v"))
      .dropDuplicates("batch_id", "rep")
      .withColumn("hamming",
        bit_count(col("fp") bitwiseXOR col("bfp")).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("batch_id"), col("rep"), col("hamming"))
    repHits.join(member.select(col("rep"), col("id")), Seq("rep"))
      .select(col("batch_id"), col("id"), col("hamming"))
  }
}
