package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score the corpus in one codegen'd map stage, rank per query. Scale
  * path: random-hyperplane LSH bucketing — deterministic hyperplanes,
  * bucket join instead of full cross product; recall is tunable by the
  * number of planes / probes.
  *
  * All arithmetic is element-order-deterministic (`aggregate` over
  * `zip_with` folds left in index order), which keeps results bit-stable
  * across engines and runs.
  */
object Ann {

  /** Element-wise double view of a float embedding. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Index-order dot product of two double arrays — native kernel (the
    * `aggregate(zip_with(...))` composition pays per-element lambda
    * dispatch; see [[graft.functions.expressions.DotProductExpr]]).
    * Identical left-to-right summation order either way.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.dot_product(a, b)

  /** Index-order L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** Brute-force exact cosine top-k: for each row of `queries`, the k
    * highest-cosine rows of `corpus` (ties broken by corpus id). The query
    * side is broadcast — the corpus is scanned once, no shuffle of the
    * corpus itself; the only exchange is the per-query top-k rank.
    *
    * At cluster scale, replace the rank window with a per-partition
    * top-k + merge (TakeOrdered) if k·|queries| is large.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     queryId: String = "query_id", corpusId: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    // norms hoisted to the per-vector frames: computing them inside the
    // pair expression would re-traverse both arrays for every pair
    val q = queries.select(col(queryId).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(corpusId).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .withColumn("cos",
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Mutual nearest neighbors — pairs where each vector is the OTHER's
    * single nearest non-self neighbor (ties by smaller neighbor id):
    * the bitext-mining / cross-corpus alignment idiom, far stricter
    * than one-directional top-1 (a hub vector is "nearest" to many
    * points but mutual with at most one). Exact duplicates are handled
    * by excluding self BEFORE ranking, so a duplicated vector's mutual
    * partner is its twin, not itself.
    *
    * Exhaustive form: a plain (UNHINTED) cartesian candidate product —
    * exact at any corpus size the quadratic is affordable for, and
    * nothing corpus-sized is broadcast: CartesianProduct parallelizes
    * over left×right partition pairs instead of shipping the whole
    * corpus to every executor (AQE may still choose a broadcast when
    * one side measures small — the size-conditional decision the
    * engine always delegates). At corpus scale use
    * [[mutualNearestNeighborsCelled]], the same composition with the
    * candidate product confined to IVF cells. Output: `(id_a, id_b,
    * cos)` with id_a < id_b, cosine rounded at 6 per the pack
    * convention.
    */
  def mutualNearestNeighbors(corpus: DataFrame, idCol: String,
                             vecCol: String,
                             checkpointDir: Option[String] = None): DataFrame = {
    val v = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("nm", norm(col("v")))
    mutualResolve(
      v.select(col("id").as("neighbor_id"), col("v").as("cv"),
          col("nm").as("cn"))
        .crossJoin(v.select(col("id").as("query_id"), col("v").as("qv"),
          col("nm").as("qn"))),
      checkpointDir)
  }

  /** [[mutualNearestNeighbors]] at corpus scale: both sides assigned
    * IVF cells, each vector probes its `nprobe` nearest cells, rank-1
    * is taken within cell co-residency and mutuality is resolved on
    * the (tiny) rank-1 result — the [[hardNegativeTopK]] layout, so
    * nothing corpus-sized is ever broadcast or all-paired. At
    * `nprobe = nlist` every cell is probed and the result equals the
    * exhaustive form by construction (each pair meets exactly once
    * after the probe dedupe) — the repo's exhaustive-probe oracle
    * convention; production runs probe 1–4 cells, with recall on
    * clustered data asserted in AnnSpec. Ids are cast to long for the
    * typed probe fan-out (the hardNegativeTopK contract).
    */
  def mutualNearestNeighborsCelled(corpus: DataFrame, index: IvfIndex,
                                   nprobe: Int, idCol: String = "vec_id",
                                   vecCol: String = "embedding",
                                   checkpointDir: Option[String] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v"))
      .withColumn("nm", norm(col("v")))
    val probes = base.as[(Long, Array[Double], Double)]
      .flatMap { case (id, v, n) =>
        index.nearestCentroids(v, nprobe).map(cell => (id, v, n, cell))
      }.toDF("query_id", "qv", "qn", "cell")
    val cand = base.select(col("id").as("neighbor_id"), col("v").as("cv"),
        col("nm").as("cn"))
      .withColumn("cell", ivfCell(col("cv"), index))
    val scoredAll = scorePairs(cand.join(probes, Seq("cell")))
    // a pair can meet through two probed cells — dedupe before ranking.
    // Only when probing MORE than one cell: at nprobe = 1 each query
    // meets a neighbor at most once, and the dedupe would be a full
    // candidate-product shuffle for nothing (the checkBatch condition)
    val scored =
      if (nprobe > 1) scoredAll.dropDuplicates("query_id", "neighbor_id")
      else scoredAll
    resolveScored(scored, checkpointDir)
  }

  /** Score the candidate product and PROJECT AWAY the vectors in the
    * same (codegen-fused, map-side) stage: every exchange a mutual-NN
    * pass plans after this point carries `(query_id, neighbor_id,
    * cos)` — 3 scalars — instead of two dim-d payloads per row. At the
    * 100k-corpus bench scale that is the difference between ~50 GB and
    * ~4 GB of shuffle per pass.
    */
  private def scorePairs(pairs: DataFrame): DataFrame = pairs
    .filter(col("query_id") =!= col("neighbor_id"))
    .select(col("query_id"), col("neighbor_id"),
      when(col("qn") * col("cn") === 0.0, 0.0)
        .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .as("cos"))

  /** Shared core of the mutual-NN forms. `pairs` carries one row per
    * candidate `(query_id, qv, qn, neighbor_id, cv, cn)` pair; it is
    * scored and projected map-side ([[scorePairs]]), rank-1 per query
    * is taken, then the mutuality self-join.
    */
  private def mutualResolve(pairs: DataFrame,
                            checkpointDir: Option[String] = None): DataFrame =
    resolveScored(scorePairs(pairs), checkpointDir)

  /** Rank-1 per query over scored `(query_id, neighbor_id, cos)`
    * candidates, then the mutuality self-join. Rank-1 is argmin by
    * `(−cos, id)` (ties: higher cos, then smaller neighbor id), via
    * [[graft.functions.expressions.ArgMinScoreIdAgg]] — a
    * DeclarativeAggregate over a primitive `[sortable(−cos): long,
    * id: long, raw −cos: double, seen]` buffer, so Spark plans a
    * whole-stage-codegen HashAggregate with zero per-row allocation.
    * The earlier `min(struct(−cos, id))` form's struct buffer forced
    * SortAggregate, whose partition-local sort of the ~175M compact
    * candidate rows was most of each mutual-NN pass: measured at the
    * 100k bench corpus (min-of-5, r13), scoring alone 2.2 s,
    * scoring+argmin 2.35 s, scoring+struct-min 9.4 s; a DECIMAL(38)
    * packed `min_by` (12.5 s, per-row BigDecimal churn) and an
    * ObjectHashAggregate argmin (lost whole-stage codegen) were
    * measured and rejected this round, the k-bounded heap aggregator
    * at k = 1 (403 cpu-s) and the rank window over un-projected rows
    * (>300 s wall) in earlier rounds. Ordering equivalence — Spark
    * double total order (−0.0 ≡ 0.0, NaN greatest) then id, with the
    * WINNING ROW's raw score value evaluating out bit-for-bit — is
    * pinned in AnnRank1Spec; both agg forms are map-side partial, so
    * the exchange carries one row per query per partition either way.
    * The rank-1 frame is localCheckpointed before the self-join —
    * Catalyst would otherwise re-execute the whole candidate scoring
    * (the expensive step) twice per action, the shared-subtree
    * re-execution the repo's iterative operators all guard against.
    * The cut honours the engine-wide [[graft.core.Durable]] policy:
    * `checkpointDir = None` is the local cut; a directory makes the
    * rank-1 state survive executor loss on a long corpus-alignment
    * run (bit-identical either way, asserted in AnnSpec).
    */
  private def resolveScored(scored: DataFrame,
                            checkpointDir: Option[String]): DataFrame = {
    val nn = new graft.core.Durable(checkpointDir).cut(scored
      .select(col("query_id"), col("neighbor_id"),
        (col("cos") * -1.0).as("negcos"))
      .groupBy("query_id").agg(graft.functions.expressions.VectorExpressions
        .argmin_score_id(col("negcos"), col("neighbor_id")).as("best"))
      .select(col("query_id").as("ida"), col("best.id").as("idb"),
        (col("best.score") * -1.0).as("cos")))
    nn.as("p").join(nn.as("q"),
        col("p.ida") === col("q.idb") && col("p.idb") === col("q.ida"))
      .filter(col("p.ida") < col("p.idb"))
      .select(col("p.ida").as("id_a"), col("p.idb").as("id_b"),
        round(col("p.cos"), 6).as("cos"))
  }

  /** Deterministic random hyperplanes: `planes` vectors of `dim`
    * components in [-1, 1), derived with a splitmix64 mixer — no RNG
    * state, reproducible across runs and executors. `seed` selects an
    * independent plane family (used per LSH band); seed 0 reproduces the
    * original single-family planes.
    */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 0L): Array[Array[Double]] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.tabulate(planes, dim) { (p, d) =>
      (mix(seed * 0x9e3779b97f4a7c15L + p.toLong * 10007L + d).toDouble /
        Long.MaxValue.toDouble)
    }
  }

  /** All XOR masks of popcount ≤ `r` over `planes` bits (enumerated by
    * combination, never by scanning 2^planes) — the probe sequence for
    * multi-probe LSH, smallest flips first.
    */
  private[similarity] def probeMasks(planes: Int, r: Int): Seq[Long] = {
    def comb(from: Int, k: Int): Seq[Long] =
      if (k == 0) Seq(0L)
      else (from until planes).flatMap(p =>
        comb(p + 1, k - 1).map(m => m | (1L << p)))
    (0 to r).flatMap(k => comb(0, k))
  }

  /** Sign-bucket key: one bit per hyperplane (1 iff v·r ≥ 0), packed into a
    * long. Cosine-close vectors collide with high probability (random
    * hyperplane LSH, Charikar 2002).
    */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (r, i) =>
      when(dot(v, array(r.map(lit): _*)) >= 0.0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** LSH-bucketed ANN top-k: corpus and queries bucketed by hyperplane
    * signs; candidates are same-bucket rows only, then exact cosine + rank.
    * The corpus-side bucket map can be written once (partitioned by
    * bucket) and reused across query batches at scale.
    *
    * `probeRadius` enables multi-probe (Lv et al., VLDB 2007): each query
    * also probes every bucket within that Hamming distance of its own —
    * near-miss sign flips are the dominant recall loss of single-probe
    * sign LSH. Only the (broadcast) query side fans out, by the number of
    * ≤radius bit masks; the corpus is still touched once per probed
    * bucket, so recall rises without rebucketing or widening the corpus
    * shuffle. At `probeRadius = planes` every bucket is probed and the
    * result equals brute force by construction (each query meets each
    * corpus row exactly once) — the exhaustive setting the driver oracle
    * uses; production settings are radius 1–2.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, planes: Int = 12,
              dim: Int = 64, queryId: String = "query_id",
              corpusId: String = "vec_id", vecCol: String = "embedding",
              probeRadius: Int = 0): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= planes,
      s"probeRadius must be in [0, planes=$planes]")
    val masks = probeMasks(planes, probeRadius)
    require(masks.size <= 4096,
      s"multi-probe fan-out ${masks.size} buckets/query — lower probeRadius")
    val hp = hyperplanes(planes, dim)
    val qBase = queries.select(col(queryId).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), hp))
      .withColumn("qn", norm(col("qv")))
    val q =
      if (probeRadius == 0) qBase
      else qBase.withColumn("bucket", explode(array(
        masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
    val c = corpus.select(col(corpusId).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), hp))
      .withColumn("cn", norm(col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(q), Seq("bucket"))
      .withColumn("cos",
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
      // a (query, neighbor) pair can collide through several probes —
      // dedupe BEFORE ranking or duplicates occupy top-k slots
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  // --------------------------------------------------------- quantization

  /** L2-normalize an embedding (zero vectors pass through unchanged). */
  def l2Normalize(v: Column): Column = {
    val n = norm(v)
    when(n === 0.0, v).otherwise(transform(v, x => x / n))
  }

  /** Per-vector symmetric int8 scalar quantization: scale = maxAbs/127,
    * code_i = floor(x_i/scale·… + 0.5). Shrinks a float32 corpus 4× for
    * ANN candidate scoring (re-rank on full precision), the standard
    * embedding-storage trade at corpus scale. floor(x+0.5) keeps the
    * rounding engine-portable (Spark's round() goes through JVM
    * shortest-string decimals).
    */
  def quantizeInt8(v: Column): Column = {
    val maxAbs = array_max(transform(v, x => abs(x)))
    val scale = when(maxAbs === 0.0, 1.0).otherwise(maxAbs / 127.0)
    struct(
      transform(v, x => floor(x / scale + 0.5).cast("int")).as("codes"),
      scale.as("scale"))
  }

  /** Reconstruct doubles from an int8 quantization struct. */
  def dequantize(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))

  /** Two-stage quantized retrieval (the FAISS SQ8-with-refine shape):
    * stage 1 ranks ALL corpus rows by cosine over the int8-reconstructed
    * vectors — the 4×-smaller representation a 100 TB deployment keeps
    * hot — and keeps `k·refineFactor` candidates per query; stage 2
    * re-scores only those survivors at full precision. The full-precision
    * corpus is touched for k·refine rows per query instead of all n.
    *
    * With `k·refineFactor ≥ |corpus|` stage 1 prunes nothing and the
    * result equals brute force by construction — the exhaustive setting
    * the driver oracle uses (the IVF/LSH oracle trick); production runs
    * refine at 2–8, with recall asserted in AnnSpec.
    */
  def quantizedRefineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                          refineFactor: Int, queryId: String = "query_id",
                          corpusId: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    require(refineFactor >= 1, "refineFactor must be >= 1")
    val q = queries.select(col(queryId).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = corpus.select(col(corpusId).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("av", dequantize(quantizeInt8(col("cv"))))
      .withColumn("an", norm(col("av")))
      .withColumn("cn", norm(col("cv")))
    val approxW = Window.partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("neighbor_id"))
    val survivors = c.crossJoin(broadcast(q))
      .withColumn("approx_cos",
        when(col("qn") * col("an") === 0.0, 0.0)
          .otherwise(dot(col("qv"), col("av")) / (col("qn") * col("an"))))
      .withColumn("approx_rk", row_number().over(approxW))
      .filter(col("approx_rk") <= k * refineFactor)
    val exactW = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    survivors
      .withColumn("cos",
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
      .withColumn("rk", row_number().over(exactW))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  // ------------------------------------------------------------------ IVF

  /** IVF (inverted-file) coarse quantizer: k-means centroids over a sample
    * of the corpus (MLlib), each corpus vector assigned to its nearest
    * centroid's list. Queries probe the `nprobe` nearest centroids and
    * score only those lists — the classic FAISS-style ANN layout; at
    * cluster scale the corpus lists live partitioned-by-centroid on disk
    * and only the probed partitions are read.
    */
  final case class IvfIndex(centroids: Array[Array[Double]]) extends Serializable {
    def nearestCentroids(v: Array[Double], nprobe: Int): Seq[Int] =
      centroids.indices
        .sortBy { c =>
          var d = 0.0
          var i = 0
          while (i < v.length) {
            val t = v(i) - centroids(c)(i); d += t * t; i += 1
          }
          d
        }
        .take(nprobe)
  }

  /** Train the coarse quantizer with MLlib k-means (deterministic seed).
    * Training fits a bounded SAMPLE of the corpus, never the corpus
    * itself — FAISS trains IVF on ~30–256 vectors per centroid; k-means
    * over 100 TB of embeddings would dominate the whole build. The
    * sample is seeded (reproducible) and skipped when the corpus is
    * already within budget.
    */
  def trainIvf(corpus: DataFrame, nlist: Int, vecCol: String = "embedding",
               maxTrainVectors: Int = 262144): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // nlist=1 is the exhaustive (single-cell) setting: every vector lands
    // in cell 0 whatever the centroid, so no clustering needs to run —
    // and MLlib's KMeans rejects k=1 anyway
    if (nlist == 1) {
      val dim = corpus.select(size(col(vecCol))).first().getInt(0)
      return IvfIndex(Array(Array.fill(dim)(0.0)))
    }
    val n = corpus.count()
    val sampled =
      if (n <= maxTrainVectors) corpus
      // 1.05 headroom: Bernoulli sampling undershoots the expectation on
      // some runs; a slightly larger sample is harmless for k-means
      else corpus.sample(withReplacement = false,
        math.min(1.0, 1.05 * maxTrainVectors / n.toDouble), seed = 42L)
    val feats = sampled.select(
      array_to_vector(asDouble(col(vecCol))).as("features"))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(20)
      .fit(feats)
    IvfIndex(model.clusterCenters.map(_.toArray))
  }

  /** Largest centroid count for which the cell assignment is built as a
    * literal-centroid codegen expression. Above this, the expression tree
    * itself is O(nlist·dim) literals — at a production nlist (4096) that
    * is megabytes of plan, so the assignment switches to a broadcast
    * closure instead.
    */
  val IvfExprMaxCentroids = 64

  /** Centroid-list id of a vector column under the index.
    *
    * Small nlist: distances expand as ‖v−c‖² = ‖v‖² − 2·v·c + ‖c‖² (one
    * dot per centroid; ‖c‖² is a literal), argmin via array_min +
    * array_position — a chained when-fold would nest each comparison
    * inside all later ones and blow up exponentially in expression size.
    *
    * Large nlist: one scalar function over a BROADCAST of the centroid
    * matrix — constant-size plan, one flat primitive-array argmin loop
    * per row. (A deliberate UDF: the per-row work is a dense
    * nlist×dim loop with no built-in equivalent, and the broadcast keeps
    * the plan independent of index size.)
    */
  def ivfCell(v: Column, index: IvfIndex): Column =
    if (index.centroids.length <= IvfExprMaxCentroids) {
      val vv = dot(v, v)
      val dists = index.centroids.map { c =>
        val cArr = array(c.map(lit): _*)
        val cc = c.map(x => x * x).sum
        vv - lit(2.0) * dot(v, cArr) + lit(cc)
      }
      val dArr = array(dists.toIndexedSeq: _*)
      (array_position(dArr, array_min(dArr)) - 1).cast("int")
    } else {
      // explicit broadcast: the centroid matrix ships once per executor,
      // not once per task closure (~nlist×dim×8 bytes — 2 MB at
      // nlist=4096, dim=64 — times thousands of tasks otherwise)
      val bc = SparkSession.active.sparkContext.broadcast(index.centroids)
      val assign = udf { (vec: Seq[Double]) =>
        val centroids = bc.value
        val x = vec.toArray
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          val ctr = centroids(c)
          var d = 0.0
          var i = 0
          while (i < x.length) { val t = x(i) - ctr(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
      assign(v)
    }

  /** IVF top-k: corpus bucketed by centroid cell; each query probes its
    * `nprobe` nearest cells, exact cosine + rank within the probed subset.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, index: IvfIndex, k: Int,
              nprobe: Int, queryId: String = "query_id",
              corpusId: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val q = queries.select(col(queryId).as("query_id"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val qProbes = q.as[(Long, Array[Double], Double)].flatMap { case (id, v, n) =>
      index.nearestCentroids(v, nprobe).map(cell => (id, v, n, cell))
    }.toDF("query_id", "qv", "qn", "cell")
    val c = corpus.select(col(corpusId).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cell", ivfCell(col("cv"), index))
      .withColumn("cn", norm(col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(qProbes), Seq("cell"))
      .withColumn("cos",
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
      // a (query, neighbor) pair can match through two probed cells —
      // dedupe BEFORE ranking or the duplicate occupies a top-k slot
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Hard-negative mining for contrastive training: for every anchor
    * vector, the `k` most-similar corpus vectors whose `keyCol` DIFFERS
    * from the anchor's — the nearest wrong-class/wrong-source examples,
    * the negatives that carry gradient signal (self-pairs share a key,
    * so they are excluded for free). Ties break on neighbor id; output
    * one row per (anchor, rank) with both keys and the rounded cosine.
    *
    * 100 TB shape: anchors here are the WHOLE corpus, so unlike
    * [[ivfTopK]] (whose probe side is query-sized and broadcasts)
    * nothing is broadcast — both sides bucket by IVF cell and the join
    * co-locates on `cell`, so the within-cell candidate product is
    * bounded by cell occupancy (corpus²/nlist expected), never
    * all-pairs; the rank window partitions by anchor. Exhaustive —
    * provably the exact wrong-key top-k — at `nprobe = nlist`.
    */
  def hardNegativeTopK(vectors: DataFrame, index: IvfIndex, k: Int,
                       nprobe: Int, idCol: String = "vec_id",
                       vecCol: String = "embedding",
                       keyCol: String = "label"): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val base = vectors.select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v"), col(keyCol).cast("string").as("key"))
      .withColumn("nm", norm(col("v")))
    val probes = base.as[(Long, Array[Double], String, Double)]
      .flatMap { case (id, v, key, n) =>
        index.nearestCentroids(v, nprobe).map(cell => (id, v, key, n, cell))
      }.toDF("query_id", "qv", "qkey", "qn", "cell")
    val cand = base.select(col("id").as("neighbor_id"), col("v").as("cv"),
        col("key").as("ckey"), col("nm").as("cn"))
      .withColumn("cell", ivfCell(col("cv"), index))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(probes, Seq("cell"))
      .filter(col("ckey") =!= col("qkey"))
      .withColumn("cos",
        when(col("qn") * col("cn") === 0.0, 0.0)
          .otherwise(dot(col("qv"), col("cv")) / (col("qn") * col("cn"))))
      // a pair can match through two probed cells — dedupe before ranking
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        col("qkey").as("anchor_key"), col("ckey").as("negative_key"),
        round(col("cos"), 6).as("cos"))
  }

  /** Embedding near-duplicate pairs: all (a < b) pairs with cosine ≥
    * threshold.
    *
    * Two physical plans behind one semantic:
    *  - corpus ≤ `exactMaxRows`: exact all-pairs compare (crossJoin) —
    *    100% recall at any threshold, quadratic but bounded;
    *  - larger corpus: banded sign-LSH candidates + the same exact cosine
    *    verify ([[cosineNearDupPairsBanded]]) — linear-shuffle scale path.
    *
    * The gate exists because banding recall depends on the threshold: at
    * high thresholds (≥0.8, the realistic near-dup band) the default
    * banding is effectively exhaustive, while at low thresholds no LSH
    * family prunes meaningfully, so a small corpus should take the exact
    * path and a big corpus should raise its threshold.
    */
  def cosineNearDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
                         threshold: Double,
                         exactMaxRows: Long = 100000L): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
    if (vectors.count() <= exactMaxRows) {
      val l = v.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
      val r = v.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
      l.crossJoin(r)
        .filter(col("id_a") < col("id_b"))
        .withColumn("cos",
          when(col("na") * col("nb") === 0.0, 0.0)
            .otherwise(dot(col("va"), col("vb")) / (col("na") * col("nb"))))
        .filter(col("cos") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    } else cosineNearDupPairsBanded(vectors, idCol, vecCol, threshold)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication — cluster the embedding corpus with the IVF coarse
    * quantizer, then inside each cluster drop every vector that has a
    * lower-id neighbor with cosine ≥ `threshold`. Keeps one
    * representative per semantic near-duplicate group while only ever
    * comparing within clusters.
    *
    * Scale shape (the reason SemDeDup beats all-pairs at corpus scale):
    * the only shuffle is on the cluster id, and the quadratic pairwise
    * term is confined to single clusters — nlist is chosen so clusters
    * average a few thousand vectors (the paper uses ~11k clusters for
    * LAION-440M), so per-cluster work stays bounded as the corpus grows
    * by raising nlist, not cluster size. Cross-cluster near-dups are the
    * (accepted) recall loss of the method; `nlist = 1` makes the pass
    * exhaustive and exactly equal to the brute-force rule — the setting
    * the driver oracle verifies, mirroring the exhaustive-probe IVF/LSH
    * oracles.
    *
    * Returns `(id, cell, kept)` for every vector; survivors are
    * `kept = true`.
    */
  def semDedup(vectors: DataFrame, index: IvfIndex, threshold: Double,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("cell", ivfCell(col("v"), index))
      .withColumn("n", norm(col("v")))
    val l = v.select(col("cell"), col("id").as("id_a"),
      col("v").as("va"), col("n").as("na"))
    val r = v.select(col("cell"), col("id").as("id_b"),
      col("v").as("vb"), col("n").as("nb"))
    // dominated = has a lower-id in-cluster neighbor above the threshold;
    // ids-only distinct before the re-attach join
    val dominated = l.join(r, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        when(col("na") * col("nb") === 0.0, 0.0)
          .otherwise(dot(col("va"), col("vb")) / (col("na") * col("nb"))))
      .filter(col("cos") >= threshold)
      .select(col("id_b").as("id")).distinct()
      .withColumn("kept", lit(false))
    v.select("id", "cell")
      .join(dominated, Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(col("kept"), lit(true)).as("kept"))
  }

  /** Prototypicality pruning (Sorscher et al., "Beyond neural scaling
    * laws: beating power law scaling via data pruning", NeurIPS 2022):
    * rank each vector by squared L2 distance to its cluster's mean and
    * keep the `keepFraction` hardest (farthest) per cell — the
    * data-pruning rule that drops the most prototypical, least
    * informative examples when the dataset is large.
    *
    * 100 TB shape: cell means come from a two-level aggregation of the
    * exploded (cell, dim, x) rows — nlist × dim tiny, broadcast back —
    * then one window rank per cell; nothing all-pairs, per-cell work is
    * one pass. Distance² folds in index order (`aggregate` over
    * `zip_with`), bit-stable across engines. At `nlist = 1` the cell mean
    * is the global per-dimension mean and the ranking is a closed-form
    * SQL statement — the setting the driver oracle verifies, mirroring
    * the exhaustive-probe IVF/LSH oracles; clustered behavior is
    * asserted in AnnSpec.
    *
    * Returns `(id, cell, d2, kept)` for every vector; ties break by id.
    */
  def prototypicalityPrune(vectors: DataFrame, index: IvfIndex,
                           keepFraction: Double, idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      s"keepFraction must be in (0, 1] (got $keepFraction)")
    val v = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("cell", ivfCell(col("v"), index))
    val means = v
      .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cell"), col("i")).agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        s => s.getField("m")).as("centroid"))
    val scored = v.join(broadcast(means), Seq("cell"))
      .withColumn("d2", aggregate(
        zip_with(col("v"), col("centroid"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, t) => acc + t))
    val byCell = Window.partitionBy(col("cell"))
    scored
      .withColumn("rk",
        row_number().over(byCell.orderBy(col("d2").desc, col("id"))))
      .withColumn("kept",
        col("rk") <= ceil(count(lit(1)).over(byCell) * keepFraction))
      .select(col("id"), col("cell"), col("d2"), col("kept"))
  }

  /** Banded sign-LSH near-duplicate pairs: `bands` independent hyperplane
    * families of `planesPerBand` planes each; a pair is a candidate iff it
    * collides on ALL planes of at least one band, then candidates are
    * verified with the exact cosine — so precision is always exact and
    * only recall is probabilistic. Ids-only ride the (band, bucket)
    * shuffle; vectors are fetched back just for surviving candidates
    * (the minhashLsh layout).
    *
    * Recall for a pair at angle θ: 1 − (1 − (1−θ/π)^r)^b. Defaults
    * (r=8, b=16) give ≥0.996 at cosine 0.9 and ~0.94 at cosine 0.8 while
    * pruning ~94% of random pairs; raise `bands` for more recall, raise
    * `planesPerBand` for more pruning.
    */
  def cosineNearDupPairsBanded(vectors: DataFrame, idCol: String, vecCol: String,
                               threshold: Double, bands: Int = 16,
                               planesPerBand: Int = 8, dim: Int = 64): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
    val bandKeys = (0 until bands).map { b =>
      val hp = hyperplanes(planesPerBand, dim, seed = b + 1L)
      struct(lit(b).as("band"), lshBucket(col("v"), hp).as("bucket"))
    }
    // primitive (band, bucket) join keys; ids only through the shuffle
    val keyed = v
      .select(col("id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val candidates = keyed.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(keyed.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    candidates
      .join(v.select(col("id").as("id_a"), col("v").as("va"), col("n").as("na")),
        Seq("id_a"))
      .join(v.select(col("id").as("id_b"), col("v").as("vb"), col("n").as("nb")),
        Seq("id_b"))
      .withColumn("cos",
        when(col("na") * col("nb") === 0.0, 0.0)
          .otherwise(dot(col("va"), col("vb")) / (col("na") * col("nb"))))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
