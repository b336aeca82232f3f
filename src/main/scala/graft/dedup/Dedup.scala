package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.expressions.TextExpressions
import graft.text.TextFunctions

/** Deduplication operators for large-scale text corpora.
  *
  * All stages are declarative DataFrame transforms: shingling, hashing and
  * signatures are codegen'd column expressions; candidate generation is a
  * shuffle on (band, bucket) keys — the standard MinHash-LSH layout that
  * scales linearly with corpus size instead of O(n²) pairwise compare.
  * Exact-jaccard verification touches only LSH candidates.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup by full-content hash: one surviving (minimum) id per
    * distinct text; `n_dups` counts the group. At scale the groupBy
    * shuffles on a 64-bit hash of the content, not the content itself.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  // ------------------------------------------------------------- shingles

  /** Word k-shingles (k consecutive whitespace tokens joined by a space) —
    * distinct per document, first-occurrence order. Native one-pass kernel
    * ([[graft.functions.expressions.WordShinglesExpr]]); the composed
    * transform/slice version re-ran the regex split per lambda element.
    */
  def wordShingles(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge._
    toColumn(graft.functions.expressions.WordShinglesExpr(toExpr(text), k))
  }

  /** ALL word k-shingles in positional order (element i = window at
    * token i, duplicates kept) — the span-detection variant
    * ([[graft.functions.expressions.WordShinglesAllExpr]]).
    */
  def wordShinglesAll(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge._
    toColumn(graft.functions.expressions.WordShinglesAllExpr(toExpr(text), k))
  }

  /** Exact Jaccard similarity of two string-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(a) + size(b) - inter
    when(uni === 0, 0.0).otherwise(inter.cast("double") / uni.cast("double"))
  }

  // ------------------------------------------- exact-content collapse
  //
  // Shared pre-pass for every pair generator: a doc duplicated n times
  // otherwise lands in the same candidate bucket in EVERY band/chunk/
  // posting, creating O(n²) candidate rows for the single heaviest dedup
  // target in a boilerplate-skewed corpus (and, under a df cap, losing
  // the cluster outright — advisor round-2 finding). Identical texts are
  // collapsed to one representative (minimum id) BEFORE the index; pairs
  // computed between representatives are expanded back over the members
  // at the end. The group key is md5 (128 bits — collision-free at any
  // realistic corpus size; a 64-bit key would see birthday collisions at
  // ~10¹⁰ docs).
  //
  // Plan note: Catalyst re-computes common subtrees, so the collapse
  // re-derives member/repIds a small constant number of times per query
  // (extra docs scans + narrow (id, md5) shuffles). That linear constant
  // buys out the quadratic candidate-bucket term — the term that
  // actually kills a boilerplate-skewed corpus at scale.

  /** (member map (doc, ch), representative ids (doc, ch)). */
  private[dedup] def exactGroups(docs: DataFrame, idCol: String,
                          textCol: String): (DataFrame, DataFrame) = {
    val member = docs.select(col(idCol).as("doc"), md5(col(textCol)).as("ch"))
    val repIds = member.groupBy("ch").agg(min(col("doc")).as("doc"))
    (member, repIds)
  }

  /** Representative docs frame (doc, ch, text under the original name). */
  private[dedup] def repDocs(docs: DataFrame, idCol: String, textCol: String,
                      repIds: DataFrame): DataFrame =
    repIds.join(docs.select(col(idCol).as("doc"), col(textCol)), Seq("doc"))

  /** Expand pairs computed between group representatives onto all members
    * of both groups (identical text ⇒ identical payload), plus intra-group
    * pairs whose payload comes from `intraPayload` (ch, payload…) — groups
    * absent from it contribute no intra pairs. `repPairs` carries
    * (id_a, id_b, payload…) with the same payload column names. Each
    * (group, group) pair appears once and groups partition docs, so the
    * expansion introduces no duplicates.
    */
  private[dedup] def expandExactGroups(member: DataFrame, repIds: DataFrame,
                                repPairs: DataFrame,
                                intraPayload: DataFrame): DataFrame = {
    val payloadCols =
      repPairs.columns.filterNot(Set("id_a", "id_b")).toSeq.map(col)
    val cross = repPairs
      .join(repIds.select(col("doc").as("id_a"), col("ch").as("ch_a")), Seq("id_a"))
      .join(repIds.select(col("doc").as("id_b"), col("ch").as("ch_b")), Seq("id_b"))
      .join(member.select(col("ch").as("ch_a"), col("doc").as("ma")), Seq("ch_a"))
      .join(member.select(col("ch").as("ch_b"), col("doc").as("mb")), Seq("ch_b"))
      .select(least(col("ma"), col("mb")).as("id_a") +:
        greatest(col("ma"), col("mb")).as("id_b") +: payloadCols: _*)
    val intra = member.select(col("ch"), col("doc").as("id_a"))
      .join(member.select(col("ch"), col("doc").as("id_b")), Seq("ch"))
      .filter(col("id_a") < col("id_b"))
      .join(intraPayload, Seq("ch"))
      .select(col("id_a") +: col("id_b") +: payloadCols: _*)
    cross.union(intra)
  }

  // -------------------------------------------------------------- minhash

  /** MinHash signature (array of `numHashes` longs) of a string-array
    * shingle column — one-pass native kernel
    * ([[graft.functions.expressions.MinHashSignatureExpr]]): per shingle,
    * all salted XXH64 hashes; per hash function, the min. The composed
    * `transform`/`array_min` alternative overflows codegen at 128 hashes
    * and falls back to interpreted eval (~150× slower measured).
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.expressions.MinHashExpressions
      .minhash_signature(shingles, numHashes)

  /** Candidate near-duplicate pairs (idA < idB) whose exact word-shingle
    * Jaccard ≥ `threshold`, found via MinHash-LSH banding:
    *
    *  1. signature per doc (map-side, codegen'd);
    *  2. explode band keys → shuffle on (band, bucket);
    *  3. self-join within buckets → candidate pairs (deduplicated);
    *  4. verify candidates with exact Jaccard on the shingle sets.
    *
    * With numHashes=128 and bands=32 (r=4), P[candidate | s=0.8] ≈ 1−5·10⁻⁸,
    * so recall at the 0.8 threshold is effectively exact while the shuffle
    * stays linear in corpus size. Exact duplicates are collapsed before
    * banding (see exactGroups — mass-duplicated docs otherwise fill every
    * band bucket quadratically) and re-expanded at jaccard 1.0.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 shingleSize: Int = 3, numHashes: Int = 128, bands: Int = 32,
                 threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val (member, repIds) = exactGroups(docs, idCol, textCol)
    val sh = repDocs(docs, idCol, textCol, repIds)
      .select(col("doc"), col("ch"), wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    // candidates first, ids only — the banded self-join must not drag the
    // shingle arrays through the shuffle (bands × |docs| rows). Band keys
    // come from one native pass (signature + per-band chain hash) and are
    // flattened to primitive (band, bucket) join columns.
    val banded = sh
      .select(col("doc"), posexplode(
        graft.functions.expressions.MinHashExpressions
          .minhash_bands(col("sh"), numHashes, bands)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // the id-pair table is CUT here (r13): it feeds the candidate-doc
    // id list AND the verification join below — uncut, Catalyst would
    // re-run the banded self-join + distinct once per consumer
    val candidates = banded.select(col("band"), col("bucket"), col("doc").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("doc").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .localCheckpoint()
    // verification shingles: computed ONCE, for CANDIDATE docs only,
    // and cut (r13) — the two verify joins each re-ran the full shingle
    // projection over every representative before this (Catalyst shares
    // no subtrees across join branches; measured at the 1M soak:
    // operator min-of-3 63.8 → 28.1 s same-box, output identical).
    // Candidate ids are banding participants by construction, so the
    // nonempty-shingle filter is preserved by restriction.
    val candIds = candidates.select(col("id_a").as("doc"))
      .union(candidates.select(col("id_b").as("doc"))).distinct()
    val candSh = repDocs(docs, idCol, textCol, repIds)
      .join(candIds, Seq("doc"))
      .select(col("doc"), wordShingles(col(textCol), shingleSize).as("sh"))
      .localCheckpoint()
    val repPairs = candidates
      .join(candSh.select(col("doc").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(candSh.select(col("doc").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    // intra pairs only for groups with a non-empty shingle set (empty
    // shingles never enter the index, same as the brute-force oracle)
    val intra = sh.select(col("ch"), lit(1.0).as("jaccard"))
    expandExactGroups(member, repIds, repPairs, intra)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // -------------------------------------------------------------- simhash

  /** SimHash near-duplicate pairs within a Hamming-distance bound. Buckets
    * by splitting the 64-bit fingerprint into `maxHamming+1` chunks — by
    * pigeonhole, any pair within the bound shares at least one exact chunk,
    * so candidate generation is a shuffle on (chunk index, chunk value),
    * never O(n²) — and exact duplicates are collapsed first (identical
    * text ⇒ identical fingerprint in EVERY chunk, the worst bucket skew),
    * then re-expanded at hamming 0.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val bits = 64 / chunks
    val (member, repIds) = exactGroups(docs, idCol, textCol)
    val fp = repDocs(docs, idCol, textCol, repIds).select(col("doc"),
      TextExpressions.simhash64(TextFunctions.wsTokens(col(textCol))).as("fp"))
    val keyed = fp.select(col("doc"), col("fp"),
      explode(array((0 until chunks).map { i =>
        struct(lit(i).as("chunk"),
          (shiftrightunsigned(col("fp"), i * bits) bitwiseAND
            lit((1L << bits) - 1)).as("v"))
      }: _*)).as("ck"))
      // primitive join keys — struct keys degrade to a non-hashable join
      .select(col("doc"), col("fp"), col("ck.chunk").as("chunk"), col("ck.v").as("v"))
    val l = keyed.select(col("chunk"), col("v"), col("doc").as("id_a"), col("fp").as("fp_a"))
    val r = keyed.select(col("chunk"), col("v"), col("doc").as("id_b"), col("fp").as("fp_b"))
    val repPairs = l.join(r, Seq("chunk", "v"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("fp_a") bitwiseXOR col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
    expandExactGroups(member, repIds, repPairs,
      repIds.select(col("ch"), lit(0).as("hamming")))
  }

  /** End-to-end near-dup deduplication: MinHash-LSH pairs → connected
    * components → survivors (every doc minus non-canonical cluster
    * members). The standard corpus-dedup recipe at scale.
    */
  def deduplicate(docs: DataFrame, idCol: String, textCol: String,
                  threshold: Double = 0.8): DataFrame = {
    val pairs = minhashLsh(docs, idCol, textCol, threshold = threshold)
    val components = connectedComponents(pairs)
    docs.join(
      components.filter(col("id") =!= col("canonical_id"))
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")
  }

  /** Quality-aware cluster resolution: keep the BEST-scoring member of
    * each near-duplicate cluster (ties by smaller id) instead of
    * [[deduplicate]]'s arbitrary minimum id — the curation-correct
    * resolve: when a cleaned page and its ad-ridden mirror near-dup,
    * the kept doc should be the better one, not the lower-numbered one.
    *
    * Returns EVERY doc with its verdict: `(idCol, cluster, keep_id,
    * kept)` — singletons are their own cluster and keep themselves.
    * The argmax is two aggregations per cluster — max score, then min
    * id among the max-score members (no rank window, no per-cluster
    * sort, and no arithmetic id negation: ids may be strings, like
    * every other dedup entry point's). Null scores abort loudly:
    * silently ranking null lowest would quietly keep a mirror because
    * the better page's scorer failed upstream.
    */
  def deduplicateByQuality(docs: DataFrame, idCol: String, textCol: String,
                           scoreCol: String,
                           threshold: Double = 0.8): DataFrame = {
    val checkedScore = when(col(scoreCol).isNull,
      raise_error(concat(lit("deduplicateByQuality: null score for id "),
        col(idCol).cast("string"),
        lit(" — a null-scored doc cannot compete for canonical; fix the " +
          "scorer or filter upstream"))))
      .otherwise(col(scoreCol))
    val pairs = minhashLsh(docs, idCol, textCol, threshold = threshold)
    val components = connectedComponents(pairs)
    val membership = docs
      .select(col(idCol), checkedScore.as("__score"))
      .join(components.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("__score"),
        coalesce(col("canonical_id"), col(idCol)).as("cluster"))
    val bestScore = membership.groupBy("cluster")
      .agg(max(col("__score")).as("__smax"))
    val best = membership.join(bestScore, Seq("cluster"))
      .filter(col("__score") === col("__smax"))
      .groupBy("cluster").agg(min(col(idCol)).as("keep_id"))
    membership.join(best, Seq("cluster"))
      .select(col(idCol), col("cluster"), col("keep_id"),
        (col(idCol) === col("keep_id")).as("kept"))
  }

  /** Leakage-safe train/test split: assign each document to a split by a
    * deterministic hash of its near-duplicate CLUSTER's canonical id, not
    * its own id — so two near-identical docs can never straddle the
    * boundary (the classic eval-contamination vector a doc-keyed split
    * leaves open: the model "generalizes" to a test doc it effectively
    * trained on). Hash rule is the engine's standard multiplicative
    * threshold (same family as the stratified sampler), reproducible
    * across runs and engines.
    *
    * Returns `(idCol, canonical_id, split)` with split ∈ train|test.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double = 0.8,
                       trainPermille: Int = 800): DataFrame = {
    val pairs = minhashLsh(docs, idCol, textCol, threshold = threshold)
    val components = connectedComponents(pairs)
    docs.select(col(idCol))
      .join(components.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("canonical_id"), col(idCol)).as("canonical_id"))
      .withColumn("split",
        when(pmod(graft.operators.Sampling.avalancheKey(col("canonical_id")),
          lit(1000L)) < trainPermille, "train").otherwise("test"))
  }

  // --------------------------------------------------- cluster resolution

  /** Connected components over a near-duplicate pair list → one canonical
    * (minimum) id per duplicate cluster.
    *
    * Large-star/small-star alternation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014): large-star hangs
    * every larger neighbor of a node under the neighborhood minimum,
    * small-star re-hangs the smaller neighbors; the alternation collapses
    * any component to a star around its minimum id in O(log n) rounds
    * REGARDLESS of component diameter — min-label propagation (the
    * round-1 implementation) needed O(diameter) rounds, which a chained
    * boilerplate corpus can stretch arbitrarily at 100 TB. Convergence is
    * detected via an order-independent (count, hash-sum) signature of the
    * edge set; hitting `maxRounds` without a fixed point throws rather
    * than silently splitting clusters.
    *
    * Returns (id, canonical_id) for every id that appears in `pairs`.
    *
    * `checkpointDir`: when set, the per-round lineage cuts use a
    * RELIABLE checkpoint into that directory instead of
    * `localCheckpoint` — on a real cluster a multi-hour components run
    * then survives executor loss instead of restarting from zero (see
    * [[graft.core.Durable]]; bit-identical results either way,
    * asserted in DedupSpec).
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50,
                          checkpointDir: Option[String] = None): DataFrame = {
    val cut = new graft.core.Durable(checkpointDir)
    val ids = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct().cache()
    // invariant edges point large → small (u > v). Each round's result is
    // cut from its lineage: the round's plan references the previous edge
    // set several times, so an uncut lineage grows exponentially with
    // rounds (a cache leaves the logical plan intact — round 1 lesson on
    // iterative operators: the ~8-round collapse of a 200-hop chain
    // already OOMs the PLANNER without truncation).
    var edges = cut.cut(pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct())
    try {
      // order-independent, overflow-free set signature (ANSI sum over
      // bigint hashes would overflow): count + xor-fold of edge hashes
      def signature(e: DataFrame): (Long, Long) = {
        val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      var sig = signature(edges)
      var converged = false
      var round = 0
      while (!converged && round < maxRounds) {
        // large-star: m = min(N(u) ∪ {u}); every neighbor v > u re-hangs
        // on m. Operates on the symmetric view; u itself links to m via
        // the small-star step that follows.
        val sym = edges.select(col("u"), col("v"))
          .union(edges.select(col("v").as("u"), col("u").as("v")))
        val lsMin = sym.groupBy("u")
          .agg(least(min(col("v")), first(col("u"))).as("m"))
        val ls = sym.join(lsMin, Seq("u"))
          .filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .filter(col("u") =!= col("v"))
        // small-star: over large→small edges, m = min of u's smaller
        // neighborhood; u and every smaller neighbor re-hang on m
        val ssMin = ls.groupBy("u").agg(min(col("v")).as("m"))
        val withMin = ls.join(ssMin, Seq("u"))
        val ss = cut.cut(withMin
          .filter(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v"))
          .union(ssMin.select(col("u"), col("m").as("v")))
          .filter(col("u") =!= col("v"))
          .distinct())
        val nextSig = signature(ss)
        edges = ss
        converged = nextSig == sig
        sig = nextSig
        round += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents did not converge within $maxRounds rounds")
      // converged state is a star graph: every non-root points at its
      // component minimum; roots label themselves
      ids.join(edges.select(col("u").as("id"), col("v").as("canonical_id")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("canonical_id"), col("id")).as("canonical_id"))
    } finally { edges.unpersist(); ids.unpersist() }
  }

  // ----------------------------------------------------------- winnowing

  /** Fingerprint-overlap near-duplicate pairs: docs sharing at least
    * `minShared` winnowed k-gram hashes ([[graft.text.Winnow]] — the
    * MOSS-style containment detector, robust to reordering/insertion at
    * character level where shingle jaccard is word-level). Inverted-index
    * join on fingerprint hashes, like the n-gram path.
    */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  minShared: Int = 10): DataFrame = {
    val (member, repIds) = exactGroups(docs, idCol, textCol)
    val reps = repDocs(docs, idCol, textCol, repIds).select(col("doc"),
      array_distinct(
        graft.functions.expressions.TextExpressions.winnow_fingerprint(col(textCol)))
        .as("fps"))
    val fp = reps.select(col("doc"), explode(col("fps")).as("h"))
    val l = fp.select(col("h"), col("doc").as("id_a"))
    val r = fp.select(col("h"), col("doc").as("id_b"))
    val repPairs = l.join(r, Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    // intra pairs share the group's ENTIRE fingerprint set — still subject
    // to the minShared floor, so identical-but-tiny docs don't pair
    val intra = repIds.join(
        reps.select(col("doc"), size(col("fps")).cast("long").as("shared")),
        Seq("doc"))
      .filter(col("shared") >= minShared)
      .select(col("ch"), col("shared"))
    expandExactGroups(member, repIds, repPairs, intra)
  }

  /** Containment near-dup pairs: |A∩B| / min(|A|,|B|) ≥ threshold over
    * word-shingle sets — the ASYMMETRIC companion to jaccard. A short
    * doc verbatim-embedded in a much longer page has containment ≈ 1
    * while its jaccard is diluted by the page's extra content toward 0;
    * symmetric scoring misses exactly the quote/boilerplate-embedding
    * duplication a crawled corpus is full of. Same inverted-index
    * layout, cap semantics, and exact-verify guarantees as
    * [[ngramJaccardPairs]]; the count prune is containment's own:
    * c ≥ t·min(|A|,|B|).
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int = 3, threshold: Double = 0.8,
                       maxShingleDf: Int = 10000): DataFrame = {
    val (member, repIds) = exactGroups(docs, idCol, textCol)
    val sh = repDocs(docs, idCol, textCol, repIds)
      .select(col("doc"), col("ch"), wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val inv = sh.select(col("doc"), explode(col("sh")).as("g0"))
      .select(col("doc"), xxhash64(col("g0")).as("g"))
    val pairCounts = inv.groupBy("g").agg(collect_list(col("doc")).as("docs"))
      .filter(size(col("docs")).between(2, maxShingleDf))
      .withColumn("id_a", explode(col("docs")))
      .withColumn("id_b", explode(col("docs")))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
    val sizes = sh.select(col("doc"), size(col("sh")).as("n"))
    val candidates = pairCounts
      .join(sizes.select(col("doc").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .filter(col("c") >= lit(threshold) * least(col("na"), col("nb")))
      .select("id_a", "id_b")
    val repPairs = candidates
      .join(sh.select(col("doc").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("containment",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          least(size(col("sh_a")), size(col("sh_b"))).cast("double"))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "containment")
    expandExactGroups(member, repIds, repPairs,
      sh.select(col("ch"), lit(1.0).as("containment")))
  }

  // ------------------------------------------- exact-substring span path

  /** Exact-substring span pairs (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" ExactSubstr signal, in
    * its distributed inverted-index form): pairs of docs sharing at
    * least `minShared` distinct windows of `spanTokens` consecutive
    * tokens, with the exact shared-window count. Long verbatim overlaps
    * (quotes, boilerplate, licenses) produce runs of shared windows that
    * shingle-jaccard dilutes away when the rest of the docs differ —
    * this operator scores the overlap itself.
    *
    * Same scale layout as [[ngramJaccardPairs]]: exact-content collapse
    * first, candidates from a 64-bit-hashed inverted index grouped ONCE
    * (df-capped — a >maxSpanDf window is boilerplate by definition and
    * cannot push a pair below `minShared` on its own), then the reported
    * count comes from an exact `array_intersect` of the full window
    * sets, so hash collisions and the df cap can never inflate or
    * corrupt the output — candidates only ever get discarded by the
    * exact verify.
    */
  def substringSpanPairs(docs: DataFrame, idCol: String, textCol: String,
                         spanTokens: Int = 15, minShared: Int = 3,
                         maxSpanDf: Int = 10000): DataFrame = {
    val (member, repIds) = exactGroups(docs, idCol, textCol)
    val sh = repDocs(docs, idCol, textCol, repIds)
      .select(col("doc"), col("ch"), wordShingles(col(textCol), spanTokens).as("sh"))
      .filter(size(col("sh")) > 0)
    val inv = sh.select(col("doc"), explode(col("sh")).as("g0"))
      .select(col("doc"), xxhash64(col("g0")).as("g"))
    // hashed candidate counts — a lower bound filter only (collisions can
    // only ever ADD phantom counts, and those pairs fail the exact verify)
    val candidates = inv.groupBy("g").agg(collect_list(col("doc")).as("docs"))
      .filter(size(col("docs")).between(2, maxSpanDf))
      .withColumn("id_a", explode(col("docs")))
      .withColumn("id_b", explode(col("docs")))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minShared)
      .select("id_a", "id_b")
    val repPairs = candidates
      .join(sh.select(col("doc").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("n_shared",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .filter(col("n_shared") >= minShared)
      .select("id_a", "id_b", "n_shared")
    // identical texts share their whole window set
    val intra = sh.select(col("ch"), size(col("sh")).cast("long").as("n_shared"))
      .filter(col("n_shared") >= minShared)
    expandExactGroups(member, repIds, repPairs, intra)
  }

  // ------------------------------------------------- pairwise n-gram path

  /** N-gram Jaccard pairs via a shingle inverted index (shares the
    * SQL-oracle semantics exactly): candidate pairs are docs sharing ≥1
    * shingle with document frequency ≤ `maxShingleDf`, verified with the
    * exact Jaccard of the full shingle sets.
    *
    * An exact-content pre-pass collapses identical texts to one
    * representative BEFORE the df-capped index (md5 group key — 128 bits,
    * collision-free at any realistic corpus size), then expands result
    * pairs back over the members: intra-group pairs are jaccard 1.0 by
    * definition, cross-group pairs inherit the representatives' jaccard.
    * Without this, a doc duplicated more than `maxShingleDf` times — the
    * heaviest dedup target in a boilerplate-skewed corpus — has EVERY
    * shingle above the df cap and its cluster yields zero pairs; with it,
    * a mass-duplicated doc contributes one posting per shingle and the
    * cap only ever measures frequency across DISTINCT contents.
    *
    * The df cap bounds the inverted index's worst bucket: one ubiquitous
    * boilerplate shingle otherwise creates a quadratic candidate bucket
    * at corpus scale. High-jaccard pairs share MOST of their shingles, so
    * they keep colliding through their rare shingles and survive the cap
    * (a pair is lost only if every one of its shared shingles exceeds the
    * cap — at the 0.8 default threshold that needs an all-boilerplate
    * overlap across >maxShingleDf distinct contents). Verification always
    * uses the complete sets, so reported jaccard values are exact
    * regardless of the cap.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, threshold: Double = 0.8,
                        maxShingleDf: Int = 10000): DataFrame = {
    // only representatives enter the shingle index; members rejoin at the
    // end (see exactGroups)
    val (member, repIds) = exactGroups(docs, idCol, textCol)
    val sh = repDocs(docs, idCol, textCol, repIds)
      .select(col("doc"), col("ch"), wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    // join on 64-bit shingle hashes, not the strings — far narrower shuffle
    val inv = sh.select(col("doc"), explode(col("sh")).as("g0"))
      .select(col("doc"), xxhash64(col("g0")).as("g"))
    // ONE shuffle of the inverted index: collect each shingle's posting
    // list, drop hot shingles from CANDIDATE GENERATION by bucket size
    // (shingles are distinct per doc, so |docs| == document frequency),
    // and expand pairs in place. A self-join formulation would scan and
    // hash the corpus three times (hot-set pass + both join sides) and
    // shuffle the index twice; here the posting list is grouped once and
    // the df cap bounds every pair expansion — no quadratic bucket can
    // survive regardless of boilerplate skew.
    val pairCounts = inv.groupBy("g").agg(collect_list(col("doc")).as("docs"))
      .filter(size(col("docs")).between(2, maxShingleDf))
      .withColumn("id_a", explode(col("docs")))
      .withColumn("id_b", explode(col("docs")))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
    // exact count pruning before the (wide) array verify: shingles are
    // distinct per doc, so `c` IS |A∩B| (sans capped hot shingles), and
    // jaccard ≥ t  ⟺  c ≥ t·(|A|+|B|)/(1+t). On the harness corpus this
    // cuts verified pairs ~1000× (1.1M sharing ≥1 shingle → the few that
    // can clear the threshold); with an active df cap it can only drop
    // pairs whose overlap is mostly boilerplate — the pairs the cap
    // already trades away (scaladoc above).
    val sizes = sh.select(col("doc"), size(col("sh")).as("n"))
    val candidates = pairCounts
      .join(sizes.select(col("doc").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .filter(col("c") * (1.0 + threshold) >= lit(threshold) * (col("na") + col("nb")))
      .select("id_a", "id_b")
    // exact verify on the full (uncapped) shingle sets — representative
    // pairs only
    val repPairs = candidates
      .join(sh.select(col("doc").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    // intra-group pairs only for non-empty shingle sets (empty shingles
    // never enter the index, same as the brute-force oracle)
    expandExactGroups(member, repIds, repPairs,
      sh.select(col("ch"), lit(1.0).as("jaccard")))
  }

  // ------------------------------------------------ prefix-filtered path

  /** N-gram Jaccard pairs via PREFIX FILTERING (Chaudhuri et al. 2006;
    * Bayardo et al. 2007 All-Pairs) — the LOSSLESS alternative to
    * [[ngramJaccardPairs]]'s df cap: every pair with jaccard ≥
    * `threshold` is found, with no boilerplate caveat, and the index
    * stays bounded anyway.
    *
    * Order every doc's shingles by a GLOBAL total order — ascending
    * document frequency, ties by hash ("rarest first") — and index only
    * each doc's first `p = n − ⌈t·n⌉ + 1` shingles. Completeness: a
    * pair with J ≥ t shares o ≥ ⌈t·n⌉ shingles on EACH side (from
    * o/(n_a+n_b−o) ≥ t), so fewer than p of either doc's shingles
    * precede the globally-smallest shared one — that shingle sits in
    * BOTH prefixes and the posting join finds the pair. A size filter
    * (t·n_a ≤ n_b ≤ n_a/t) prunes candidates no verified pair can
    * satisfy, then exact verification on the full sets keeps precision.
    *
    * Why this scales where the df cap trades recall: prefixes hold each
    * doc's RAREST shingles, so a high-df boilerplate shingle enters a
    * prefix only for docs made of nothing but boilerplate — exactly the
    * docs the exact-content collapse already collapsed. Posting-bucket
    * size is thus governed by rare-shingle df, not corpus skew: at
    * t = 0.8 each doc posts ~20% of its shingles and hot shingles
    * vanish from the index entirely. Index bytes: 8-byte hashed keys
    * ([[xxhash64]]; a 64-bit collision can only add a candidate or
    * reorder two shingles — the string-set verify is unaffected).
    *
    * Same exact-content collapse + member expansion as every pair
    * generator here; same output shape as [[ngramJaccardPairs]]:
    * `(id_a, id_b, jaccard)` with id_a < id_b.
    */
  def prefixJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                         shingleSize: Int = 3,
                         threshold: Double = 0.8): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold out of (0,1]: $threshold")
    val (member, repIds) = exactGroups(docs, idCol, textCol)
    val sh = repDocs(docs, idCol, textCol, repIds)
      .select(col("doc"), col("ch"),
        wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val post = sh.select(col("doc"), explode(col("sh")).as("g0"))
      .select(col("doc"), xxhash64(col("g0")).as("g"))
    // global df over representatives; shingles are distinct per doc
    val dfreq = post.groupBy("g").agg(count(lit(1)).as("df"))
    // rarest-first rank within each doc; one doc-keyed window (doc-sized
    // partitions — no global sort)
    val ranked = post.join(dfreq, Seq("g"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc").orderBy(col("df"), col("g"))))
    val sizes = sh.select(col("doc"), size(col("sh")).cast("long").as("n"))
    val prefix = ranked.join(sizes, Seq("doc"))
      .filter(col("rnk") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select("doc", "g")
    val candidates = prefix.select(col("doc").as("id_a"), col("g"))
      .join(prefix.select(col("doc").as("id_b"), col("g")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(sizes.select(col("doc").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("doc").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .filter(lit(threshold) * col("na") <= col("nb") &&
        lit(threshold) * col("nb") <= col("na"))
      .select("id_a", "id_b")
    val repPairs = candidates
      .join(sh.select(col("doc").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("doc").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    expandExactGroups(member, repIds, repPairs,
      sh.select(col("ch"), lit(1.0).as("jaccard")))
  }
}
