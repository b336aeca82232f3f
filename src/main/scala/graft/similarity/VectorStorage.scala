package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed at-rest embedding-corpus layout — the vector twin of
  * [[graft.dedup.CorpusStorage]]'s content-hash lever.
  *
  * The ANN family's recurring passes (SemDeDup on every snapshot,
  * hard-negative refresh per training round, mutual-NN alignment) all
  * share one expensive step: co-locating each vector with its IVF
  * cell-mates, then comparing within the cell. Run ad hoc, every pass
  * re-casts the float corpus to doubles, re-assigns cells, re-computes
  * norms, and SHUFFLES the corpus on the cell id. Writing the corpus
  * BUCKETED on `cell` makes that partitioning a property of the
  * storage: the within-cell candidate join — the only corpus-sized
  * exchange any of these passes plans — becomes exchange-free
  * (asserted in VectorStorageSpec), and the remaining shuffles carry
  * only id-sized aggregation rows. At 100 TB that converts each
  * recurring pass from a full-corpus shuffle to a co-located scan.
  *
  * Stored columns, per vector: `(id, cell, codes, scale, nm, v)` —
  * the int8 quantization (`codes` + per-vector `scale`,
  * [[Ann.quantizeInt8]]) is the 4×-smaller representation a recurring
  * candidate-scoring pass keeps hot; `nm` the full-precision norm; `v`
  * the full-precision doubles for the exact verify/re-rank step.
  * Parquet is columnar, so a pass that scores on codes never reads
  * `v`'s bytes; a deployment can also split `v` into a second table
  * bucketed the same way. `carryCols` ride along for key-aware passes
  * (hard negatives need the anchor key).
  *
  * Cell assignment is pinned at write time by the SAME [[Ann.IvfIndex]]
  * the readers probe with — persist the index alongside the corpus
  * ([[IvfStore]]) so recurring sessions reuse both.
  */
object VectorStorage {

  val CellCol = "cell"

  private def validateIdentifier(table: String): Unit =
    require(table.split('.').forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"invalid table identifier '$table' — use [A-Za-z_][A-Za-z0-9_]* segments")

  /** Write `vectors` bucketed+sorted by IVF cell as an external table at
    * `path`. Ids are cast to long (the celled-ANN contract). Overwrite
    * semantics match [[graft.dedup.CorpusStorage.writeBucketed]]: no
    * pre-emptive DROP — a failed write leaves the previous snapshot.
    */
  def writeBucketed(vectors: DataFrame, index: Ann.IvfIndex, table: String,
                    path: String, nBuckets: Int = 32,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    carryCols: Seq[String] = Nil): Unit = {
    validateIdentifier(table)
    val v = Ann.asDouble(col(vecCol))
    vectors
      .select((col(idCol).cast("long").as("id") +: v.as("v") +:
        carryCols.map(col)): _*)
      .withColumn(CellCol, Ann.ivfCell(col("v"), index))
      .withColumn("nm", Ann.norm(col("v")))
      .withColumn("q", Ann.quantizeInt8(col("v")))
      .select((Seq(col("id"), col(CellCol), col("q.codes").as("codes"),
        col("q.scale").as("scale"), col("nm"), col("v")) ++
        carryCols.map(col)): _*)
      .write.format("parquet").mode("overwrite")
      .option("path", path)
      .bucketBy(nBuckets, CellCol)
      .sortBy(CellCol)
      .saveAsTable(table)
    // schema sidecar so [[register]] re-attaches even an empty corpus
    graft.core.BucketedCatalog.writeSidecar(vectors.sparkSession, table,
      path)
  }

  /** Re-attach a corpus previously written by [[writeBucketed]] at
    * `path` in a fresh session — the [[graft.core.BucketedCatalog]]
    * restart path (declared bucket spec over the external files, no
    * re-quantize, no rewrite); pair with [[IvfStore]] for the index
    * itself. `nBuckets` must equal the write-time value.
    */
  def register(spark: SparkSession, table: String, path: String,
               nBuckets: Int = 32): Unit = {
    validateIdentifier(table)
    graft.core.BucketedCatalog.register(spark, table, path, Seq(CellCol),
      nBuckets)
  }

  def scan(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** All cell-co-resident candidate pairs `(id_a < id_b, cell, cos)` at
    * full precision — the quadratic step every recurring pass shares.
    * Both sides read the SAME bucketed table, so the self-join on
    * `cell` plans with ZERO shuffle exchanges (asserted in
    * VectorStorageSpec): the candidate product never crosses the wire.
    */
  def cellPairs(spark: SparkSession, table: String): DataFrame = {
    val t = scan(spark, table)
    val l = t.select(col(CellCol), col("id").as("id_a"),
      col("v").as("va"), col("nm").as("na"))
    val r = t.select(col(CellCol), col("id").as("id_b"),
      col("v").as("vb"), col("nm").as("nb"))
    // merge hint: both sides are the corpus — a broadcast would ship it
    // whole to every executor, exactly what the bucketing exists to avoid
    l.hint("merge").join(r, Seq(CellCol))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col(CellCol),
        when(col("na") * col("nb") === 0.0, 0.0)
          .otherwise(Ann.dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .as("cos"))
  }

  /** [[Ann.semDedup]] over the at-rest corpus: same verdicts (the cell
    * assignment was pinned by the same index at write time), but the
    * within-cell pair compare consumes the storage bucketing — the only
    * remaining exchanges carry dominated IDS, never vectors.
    */
  def semDedup(spark: SparkSession, table: String,
               threshold: Double): DataFrame = {
    val dominated = cellPairs(spark, table)
      .filter(col("cos") >= threshold)
      .select(col("id_b").as("id")).distinct()
      .withColumn("kept", lit(false))
    scan(spark, table).select("id", CellCol)
      .join(dominated, Seq("id"), "left")
      .select(col("id"), col(CellCol),
        coalesce(col("kept"), lit(true)).as("kept"))
  }

  /** [[Ann.mutualNearestNeighbors]] restricted to cell co-residents
    * (the `nprobe = 1` celled semantics — recurring alignment over an
    * indexed corpus probes the home cell). Candidates are scored and
    * projected to `(query_id, neighbor_id, cos)` inside the
    * (exchange-free) candidate join's stage; rank-1 per query is one
    * map-side-combining [[graft.functions.expressions.ArgMinScoreIdAgg]]
    * — a whole-stage-codegen HashAggregate over a primitive buffer
    * (see [[Ann]]'s resolveScored note for the measured history: the
    * aggregation now costs ~0.2 s above the scoring floor where the
    * earlier struct-min SortAggregate cost ~7 s) — so the only
    * exchange after the candidate join carries one partial row per
    * query per partition.
    */
  def mutualNearestNeighbors(spark: SparkSession, table: String,
                             checkpointDir: Option[String] = None): DataFrame = {
    val nn = new graft.core.Durable(checkpointDir)
      .cut(mnnRank1Plan(spark, table))
    nn.as("p").join(nn.as("q"),
        col("p.ida") === col("q.idb") && col("p.idb") === col("q.ida"))
      .filter(col("p.ida") < col("p.idb"))
      .select(col("p.ida").as("id_a"), col("p.idb").as("id_b"),
        round(col("p.cos"), 6).as("cos"))
  }

  /** The rank-1 stage of [[mutualNearestNeighbors]] BEFORE its
    * checkpoint cut — exposed so the plan contract (candidate join
    * exchange-free off the bucketing, exactly one id-sized exchange
    * for the rank-1 aggregation) is assertable in VectorStorageSpec;
    * a localCheckpoint would truncate the lineage being asserted.
    */
  def mnnRank1Plan(spark: SparkSession, table: String): DataFrame = {
    val t = scan(spark, table)
    val l = t.select(col(CellCol), col("id").as("qid"),
      col("v").as("qv"), col("nm").as("qn"))
    val r = t.select(col(CellCol), col("id").as("nid"),
      col("v").as("cv"), col("nm").as("cn"))
    val scored = l.hint("merge").join(r, Seq(CellCol))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid").as("query_id"), col("nid").as("neighbor_id"),
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(Ann.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cos"))
    scored
      .select(col("query_id"), col("neighbor_id"),
        (col("cos") * -1.0).as("negcos"))
      .groupBy("query_id").agg(graft.functions.expressions.VectorExpressions
        .argmin_score_id(col("negcos"), col("neighbor_id")).as("best"))
      .select(col("query_id").as("ida"), col("best.id").as("idb"),
        (col("best.score") * -1.0).as("cos"))
  }

  /** Incremental batch check — the vector twin of the text side's
    * bloom-prefiltered incremental dedup: which vectors of a NEW batch
    * near-duplicate something already at rest. The batch is assigned
    * cells with the SAME index the table was written under (anything
    * else silently mis-routes — persist the index via [[IvfStore]]),
    * joined cell-co-resident against storage, and every candidate is
    * verified with the exact cosine. `nprobe` cells per batch vector
    * (1 = home cell; `= nlist` makes the check exhaustive — the
    * oracle setting).
    *
    * Scale shape: the corpus side is the bucketed scan (never
    * shuffles); the batch side is ingestion-sized and broadcasts
    * size-conditionally (measured count vs `maxBroadcastBatchRows`,
    * shuffle fallback above) — so the recurring per-batch check plans
    * with ZERO shuffle exchanges in the common case (asserted in
    * VectorStorageSpec). Returns `(batch_id, id, cos)` pairs at
    * `threshold` or above; ids cast to long per the celled contract.
    */
  def checkBatch(spark: SparkSession, table: String, batch: DataFrame,
                 index: Ann.IvfIndex, threshold: Double, nprobe: Int = 1,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 maxBroadcastBatchRows: Long = 1000000L): DataFrame = {
    import spark.implicits._
    val base = batch.select(col(idCol).cast("long").as("batch_id"),
        Ann.asDouble(col(vecCol)).as("bv"))
      .withColumn("bn", Ann.norm(col("bv")))
    val probes0 = base.as[(Long, Array[Double], Double)]
      .flatMap { case (id, v, n) =>
        index.nearestCentroids(v, nprobe).map(cell => (id, v, n, cell))
      }.toDF("batch_id", "bv", "bn", CellCol)
    val probes =
      if (batch.count() * nprobe <= maxBroadcastBatchRows) broadcast(probes0)
      else probes0
    val paired = scan(spark, table)
      .select(col(CellCol), col("id"), col("v"), col("nm"))
      .join(probes, Seq(CellCol))
      .select(col("batch_id"), col("id"),
        when(col("bn") * col("nm") === 0.0, 0.0)
          .otherwise(Ann.dot(col("bv"), col("v")) / (col("bn") * col("nm")))
          .as("cos"))
    // a pair can meet through two probed cells — but only when probing
    // more than one (the dedupe is a shuffle; home-cell checks skip it
    // and stay exchange-free)
    val unique =
      if (nprobe > 1) paired.dropDuplicates("batch_id", "id") else paired
    unique
      .filter(col("cos") >= threshold)
      .select(col("batch_id"), col("id"), round(col("cos"), 6).as("cos"))
  }

  /** [[Ann.hardNegativeTopK]] with `nprobe = 1` semantics over the
    * at-rest corpus (`keyCol` must have been carried at write time):
    * candidates cell-co-resident via the storage bucketing, per-anchor
    * top-k through the k-bounded heap aggregator (map-side combined —
    * a hot anchor ships k rows per partition, never its candidates).
    */
  def hardNegatives(spark: SparkSession, table: String, k: Int,
                    keyCol: String): DataFrame = {
    val t = scan(spark, table)
    val l = t.select(col(CellCol), col("id").as("query_id"),
      col("v").as("qv"), col("nm").as("qn"), col(keyCol).as("qkey"))
    val r = t.select(col(CellCol), col("id").as("neighbor_id"),
      col("v").as("cv"), col("nm").as("cn"), col(keyCol).as("ckey"))
    val cand = l.hint("merge").join(r, Seq(CellCol))
      .filter(col("qkey") =!= col("ckey"))
      .select(col("query_id"), col("qkey"), col("neighbor_id"), col("ckey"),
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(Ann.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .as("cos"))
    graft.operators.Sampling.topKPerGroupSkewSafe(cand, Seq("query_id"),
        struct((col("cos") * -1.0).as("negcos"), col("neighbor_id")), k)
      .select(col("query_id"), col("group_rank").as("rk"),
        col("neighbor_id"), col("qkey").as("anchor_key"),
        col("ckey").as("negative_key"), round(col("cos"), 6).as("cos"))
  }
}
