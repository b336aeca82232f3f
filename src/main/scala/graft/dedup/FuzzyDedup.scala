package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expressions.TextExpressions

/** Fuzzy (edit-distance) matching via symmetric deletes — the SymSpell
  * scheme (Garbe), distributed.
  *
  * Naive fuzzy dedup compares all pairs (O(n²) Levenshtein calls);
  * length- or prefix-blocking is cheaper but INCOMPLETE. Symmetric
  * deletes are both cheap and complete: any two strings within
  * Levenshtein distance `d` share at least one string reachable from
  * each by ≤ d character deletions (delete the edited positions on
  * both sides), so
  *
  *   1. each distinct string emits its deletion-variant set (a native
    *    codegen'd expression; ≤ Σ C(len,i) variants, bounded for the
    *    short keys this is meant for — words, titles, normalized ids);
  *   2. candidates equi-join on the variant (hash join, no theta scan);
  *   3. a single Levenshtein verification per candidate pair keeps
  *      exactly the true matches — the variants route, the distance
  *      decides, so the oracle is the brute-force pair scan.
  *
  * `maxBucket` df-caps pathologically hot variants (the empty string is
  * every ≤d-length string's variant); capped buckets trade completeness
  * for boundedness exactly like [[Dedup]]'s df-capped n-gram index —
  * the default keeps the gate uncapped.
  */
object FuzzyDedup {

  /** All (a, b, dist) pairs with `levenshtein(a, b) <= maxEdit`,
    * a < b, over the DISTINCT values of `strCol`.
    *
    * `maxLen` enforces the short-key scope the scheme is designed for:
    * the variant count per string is Σ_{i≤maxEdit} C(len, i), which is
    * combinatorial in length — a single 100-char string at maxEdit=3
    * emits ~166k variants, so one long outlier row (a pasted document
    * in a "title" column) would dominate the whole job's explode and
    * join. Strings longer than `maxLen` fail loudly; for long text use
    * MinHash/SimHash ([[Dedup]]) instead — edit distance is the wrong
    * similarity there anyway.
    */
  def pairsWithinEdit(df: DataFrame, strCol: String, maxEdit: Int,
                      maxBucket: Long = 100000L,
                      maxLen: Int = 40): DataFrame = {
    require(maxEdit >= 1 && maxEdit <= 3, s"maxEdit out of range: $maxEdit")
    require(maxLen >= 1 && maxLen <= 64,
      s"maxLen out of range: $maxLen (symmetric deletes are for short keys; " +
        "use MinHash/SimHash for long text)")
    val strs = df.select(col(strCol).cast("string").as("w"))
      .filter(col("w").isNotNull).distinct()
      .withColumn("__len", length(col("w")))
    // fail LOUDLY (never silently skip or truncate — truncation would
    // change which pairs match): a raise_error surviving into the kept
    // rows aborts the job with the offending value
    val checked = strs.withColumn("w",
        when(col("__len") > maxLen,
          raise_error(concat(lit(s"fuzzy-dedup key longer than maxLen=$maxLen: '"),
            substring(col("w"), 1, 48), lit("…'"))))
          .otherwise(col("w")))
      .drop("__len")
    val variants = checked.select(col("w"),
      explode(TextExpressions.deletion_variants(col("w"), maxEdit)).as("v"))
    val keptBuckets = variants.groupBy("v")
      .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxBucket)
      .select("v")
    val capped = variants.join(keptBuckets, Seq("v"))
    val candidates = capped.select(col("v"), col("w").as("a"))
      .join(capped.select(col("v"), col("w").as("b")), Seq("v"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    candidates
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= maxEdit)
  }

  /** Spelling canonicalization — the entity-resolution composition of
    * this module: cluster strings within `maxEdit` (deletion-variant
    * candidates → exact levenshtein → connected components) and map
    * every string to its cluster's MOST FREQUENT spelling (ties by
    * lexicographically LAST — `max(struct)` needs no string negation
    * and the oracle's `ORDER BY cnt DESC, w DESC` replays it). The
    * text-normalization face of dedup: "colour/color/colr" all map to
    * the corpus's dominant form.
    *
    * Input is one row per OCCURRENCE (frequency is the evidence);
    * output one row per distinct string: `(word, canonical, cnt)`.
    * Components run over the string keys directly (the resolver's
    * min-label is lexicographic there — any total order works).
    */
  def canonicalizeSpellings(df: DataFrame, strCol: String,
                            maxEdit: Int = 1,
                            maxBucket: Long = 100000L,
                            maxLen: Int = 40,
                            checkpointDir: Option[String] = None): DataFrame = {
    val occ = df.select(col(strCol).cast("string").as("w"))
      .filter(col("w").isNotNull)
    // the vocab-counts cut and the components loop both honour the
    // Durable policy (None = local cut; a dir survives executor loss)
    val counts = new graft.core.Durable(checkpointDir)
      .cut(occ.groupBy("w").agg(count(lit(1)).as("cnt")))
    val pairs = pairsWithinEdit(counts.select("w"), "w", maxEdit,
        maxBucket, maxLen)
      .select(col("a").as("id_a"), col("b").as("id_b"))
    val comps = Dedup.connectedComponents(pairs, checkpointDir = checkpointDir)
    val mem = counts
      .join(comps.withColumnRenamed("id", "w"), Seq("w"), "left")
      .select(col("w"), col("cnt"),
        coalesce(col("canonical_id"), col("w")).as("cluster"))
    val best = mem.groupBy("cluster")
      .agg(max(struct(col("cnt").as("c"), col("w").as("s"))).as("m"))
      .select(col("cluster"), col("m.s").as("canonical"))
    mem.join(best, Seq("cluster"))
      .select(col("w").as("word"), col("canonical"), col("cnt"))
  }
}
