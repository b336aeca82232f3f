package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring duplicate spans (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better", §4 ExactSubstr): find
  * every MAXIMAL token span of length ≥ `spanTokens` shared verbatim by
  * two documents — the strongest public dedup signal (fixed-window
  * operators like [[Dedup.substringSpanPairs]] count shared windows;
  * this one reports the spans themselves, with exact extents).
  *
  * The reference construction is a suffix array over the concatenated
  * corpus. The Spark-native equivalent used here is seed-and-extend,
  * which reaches the same answer with joins and windows instead of a
  * global sort:
  *
  *   1. SEEDS — every positional `spanTokens`-token window of every doc
  *      ([[graft.functions.expressions.WordShinglesAllExpr]]: element i
  *      = window at token i). Any shared span of length m ≥ L contains
  *      exactly m−L+1 CONSECUTIVE matching windows, so spans ≥ L are
  *      found with their exact extents and nothing shorter ever
  *      surfaces. The index key is `xxhash64(window)` — 8 bytes per
  *      entry through the inverted-index shuffle instead of ~L tokens
  *      of text (at 100 TB the text-keyed index would push petabytes
  *      through the exchange).
  *   2. MATCH — inverted index on the seed hash, df-capped: a hash
  *      bucket holding > `maxSeedDf` entries is boilerplate whose pairs
  *      are quadratic noise (same cap + rationale as the repo's other
  *      inverted indexes). Cross-doc position pairs come from one
  *      bounded explode of each bucket.
  *   3. VERIFY — hash keys route, they never decide (the
  *      [[graft.operators.BloomJoin]] contract): the actual window
  *      text is re-sliced from both docs' tokens for exactly the
  *      matched positions and compared, so a hash collision costs
  *      wasted verify work, never a false span. The re-slice joins
  *      ship (a) the matched-position list, bounded by the seed-pair
  *      count, and (b) one token array per doc that has ≥ 1 matched
  *      seed — never the corpus's windows.
  *   4. EXTEND — verified positions (i, j) of one doc pair lie on the
  *      same shared span iff they share the diagonal d = i − j and are
  *      consecutive in i: a gaps-and-islands pass per (pair, diagonal)
  *      (`i − row_number()` island keys, the Sessions move) folds seeds
  *      into maximal spans. Every window partition is bounded by the
  *      matched-seed count of ONE doc pair on ONE diagonal — never
  *      corpus-sized.
  *
  * The result is therefore text-exact under ANY `seedKey` (the
  * weak-hash collision spec pins this); the hash choice affects only
  * work, with one caveat shared with the text-keyed formulation:
  * MAXIMALITY IS SUBJECT TO THE DF CAP. A genuinely maximal span whose
  * interior windows are corpus boilerplate (bucket > `maxSeedDf`) is
  * fragmented at — or entirely suppressed by — the capped windows;
  * "every maximal span" holds exactly when no in-span window exceeds
  * the cap. (Under the hash key the cap counts hash buckets, so a
  * collision conflating two windows' counts can only move a bucket
  * PAST the cap — suppressing, never inventing, pairs; vanishingly
  * rare at 64 bits.) Raise `maxSeedDf` to trade pair-explosion
  * boundedness for completeness on boilerplate-heavy corpora.
  *
  * Output: one row per maximal shared span — `(id_a, id_b, a_start,
  * b_start, span_tokens)`, token positions 1-based, `id_a < id_b`.
  */
object ExactSubstr {

  /** Seed index rows (id, pos, h) — window text is hashed and dropped
    * before any shuffle.
    */
  private def hashedWindows(docs: DataFrame, idCol: String, textCol: String,
                            spanTokens: Int,
                            seedKey: Column => Column): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(graft.dedup.Dedup.wordShinglesAll(col(textCol), spanTokens))
          .as(Seq("pos", "w")))
      .select(col("id"), col("pos"), seedKey(col("w")).as("h"))

  /** The real window text, re-sliced from the doc tokens for exactly
    * the `needed` (id, pos) rows — ships one token array per doc with
    * ≥ 1 needed position, plus the needed-position list; never the
    * corpus's windows. Same whitespace tokenization as the shingle
    * kernel.
    */
  private def windowTextAt(docs: DataFrame, idCol: String, textCol: String,
                           needed: DataFrame, spanTokens: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), split(trim(col(textCol)), "\\s+").as("__t"))
      .join(needed.distinct().groupBy("id").agg(collect_list(col("pos")).as("__ps")),
        Seq("id"))
      .select(col("id"), explode(col("__ps")).as("pos"), col("__t"))
      .select(col("id"), col("pos"),
        array_join(slice(col("__t"), col("pos") + 1, lit(spanTokens)), " ")
          .as("__w"))

  /** Exact verify: keep only (id_a, id_b, pos_a, pos_b) seed pairs
    * whose re-sliced windows are verbatim-equal — hash keys route,
    * they never decide.
    */
  private def verifySeeds(seedPairs: DataFrame,
                          docsA: DataFrame, docsB: DataFrame,
                          idCol: String, textCol: String,
                          spanTokens: Int): DataFrame = {
    val wa = windowTextAt(docsA, idCol, textCol,
      seedPairs.select(col("id_a").as("id"), col("pos_a").as("pos")), spanTokens)
    val wb = windowTextAt(docsB, idCol, textCol,
      seedPairs.select(col("id_b").as("id"), col("pos_b").as("pos")), spanTokens)
    seedPairs
      .join(wa.select(col("id").as("id_a"), col("pos").as("pos_a"),
        col("__w").as("__wa")), Seq("id_a", "pos_a"))
      .join(wb.select(col("id").as("id_b"), col("pos").as("pos_b"),
        col("__w").as("__wb")), Seq("id_b", "pos_b"))
      .filter(col("__wa") === col("__wb"))
      .select("id_a", "id_b", "pos_a", "pos_b")
  }

  /** Gaps-and-islands per (pair, diagonal): consecutive pos_a runs are
    * the maximal spans — partition size is one pair's seeds on one
    * diagonal (≤ the shorter doc's token count), never corpus-scale.
    */
  private def islands(verified: DataFrame, spanTokens: Int): DataFrame = {
    val diag = verified.withColumn("__d", col("pos_a") - col("pos_b"))
    val w = Window.partitionBy("id_a", "id_b", "__d").orderBy("pos_a")
    diag.withColumn("__isl", col("pos_a") - row_number().over(w))
      .groupBy("id_a", "id_b", "__d", "__isl")
      .agg((min(col("pos_a")) + 1).as("a_start"),
        (min(col("pos_b")) + 1).as("b_start"),
        (count(lit(1)) + spanTokens - 1).cast("int").as("span_tokens"))
      .drop("__d", "__isl")
  }

  /** `checkpointDir`: the verified-seed table — the last corpus-derived
    * intermediate before the islands fold — is cut per the
    * [[graft.core.Durable]] policy (None = localCheckpoint; Some(dir) =
    * reliable checkpoint surviving executor loss — the production
    * posture for the multi-hour corpus runs, bit-identical either way,
    * spec-pinned). The cut also keeps the islands window from replaying
    * the seed-index lineage once per downstream action.
    */
  def maximalSharedSpans(docs: DataFrame, idCol: String, textCol: String,
                         spanTokens: Int = 15,
                         maxSeedDf: Int = 10000,
                         seedKey: Column => Column = xxhash64(_),
                         checkpointDir: Option[String] = None): DataFrame = {
    require(spanTokens >= 2, s"spanTokens too small: $spanTokens")
    require(maxSeedDf >= 2, s"maxSeedDf must be at least 2: $maxSeedDf")
    val windows = hashedWindows(docs, idCol, textCol, spanTokens, seedKey)
    // df-capped inverted index: every bucket is ≤ maxSeedDf entries, so
    // the pair explode below is bounded per bucket
    val buckets = windows.groupBy("h")
      .agg(collect_list(struct(col("id"), col("pos"))).as("occ"))
      .filter(size(col("occ")).between(2, maxSeedDf))
    val seedPairs = buckets
      .select(explode(col("occ")).as("a"), col("occ"))
      .select(col("a"), explode(col("occ")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
    val verified = new graft.core.Durable(checkpointDir)
      .cut(verifySeeds(seedPairs, docs, docs, idCol, textCol, spanTokens))
    islands(verified, spanTokens)
  }

  /** CROSS-corpus maximal shared spans — every maximal token span
    * ≥ `spanTokens` shared verbatim by a `corpus` doc and an `evalSet`
    * doc: the span-level decontamination primitive
    * ([[graft.text.Decontaminate.spanOverlap]] wraps it into the
    * per-train-doc flag). Same seeds → df cap → verify → islands
    * construction as [[maximalSharedSpans]], with the pair explode
    * restricted to cross-side pairs and the scale asymmetry exploited:
    * the eval side is small by construction (benchmarks are thousands
    * of docs against a corpus of billions), so its hash buckets
    * BROADCAST and the corpus windows are pruned map-side to matched
    * hashes before any aggregation — the corpus's seed index is never
    * shuffled whole. The df cap bounds the corpus-side occurrences per
    * hash (same boilerplate rationale and the same maximality caveat
    * as [[maximalSharedSpans]]); the eval side is uncapped.
    *
    * Output: `(train_id, eval_id, train_start, eval_start,
    * span_tokens)`, positions 1-based.
    */
  def crossSpans(corpus: DataFrame, evalSet: DataFrame,
                 idCol: String, textCol: String,
                 spanTokens: Int = 15,
                 maxSeedDf: Int = 10000,
                 seedKey: Column => Column = xxhash64(_),
                 checkpointDir: Option[String] = None): DataFrame = {
    require(spanTokens >= 2, s"spanTokens too small: $spanTokens")
    require(maxSeedDf >= 2, s"maxSeedDf must be at least 2: $maxSeedDf")
    val wTrain = hashedWindows(corpus, idCol, textCol, spanTokens, seedKey)
    val evalBuckets = hashedWindows(evalSet, idCol, textCol, spanTokens, seedKey)
      .groupBy("h")
      .agg(collect_list(struct(col("id"), col("pos"))).as("eocc"))
    // map-side prune: only corpus windows whose hash appears in the
    // eval set survive, so the df-cap aggregation is matched-hash-sized
    val matched = wTrain.join(broadcast(evalBuckets), Seq("h"))
    val seedPairs = matched.groupBy("h")
      .agg(collect_list(struct(col("id"), col("pos"))).as("tocc"),
        first(col("eocc")).as("eocc"))
      .filter(size(col("tocc")) <= maxSeedDf)
      .select(explode(col("tocc")).as("a"), col("eocc"))
      .select(col("a"), explode(col("eocc")).as("b"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
    val verified = new graft.core.Durable(checkpointDir)
      .cut(verifySeeds(seedPairs, corpus, evalSet, idCol, textCol, spanTokens))
    islands(verified, spanTokens)
      .select(col("id_a").as("train_id"), col("id_b").as("eval_id"),
        col("a_start").as("train_start"), col("b_start").as("eval_start"),
        col("span_tokens"))
  }

  /** The removal ACTION on [[maximalSharedSpans]]' output — the actual
    * ExactSubstr dedup step: cut every duplicated span from the LATER
    * document (`id_b`, the higher id), keeping the first occurrence
    * intact. Returns every doc with `text_clean` (the surviving tokens
    * re-joined) and `n_kept`. Zero-length tokens are dropped after the
    * split (mirroring `CorpusStats.tokens`), so an empty or
    * whitespace-only document reports `n_kept = 0`, not a phantom
    * empty token; span positions are unaffected — `trim` + `\s+` can
    * only produce an empty token for a document with no tokens at all.
    *
    * 100 TB shape: per-doc interval lists are one bounded aggregation
    * of the (tiny) span table, equi-joined back on the doc id — no
    * range join, no explode of the corpus; the token filter is one
    * map-side higher-order function per doc (intervals per doc are few,
    * and the lambda touches only plain attribute references — no
    * re-computed subtrees per element).
    */
  def cutSpans(docs: DataFrame, idCol: String, textCol: String,
               spans: DataFrame): DataFrame = {
    val iv = spans.groupBy(col("id_b").as(idCol))
      .agg(collect_list(struct(col("b_start"), col("span_tokens"))).as("__iv"))
    docs.join(iv, Seq(idCol), "left")
      .withColumn("__iv", coalesce(col("__iv"),
        array().cast("array<struct<b_start:int,span_tokens:int>>")))
      .withColumn("__toks", split(trim(col(textCol)), "\\s+"))
      .withColumn("__kept", filter(col("__toks"), (t, i) =>
        length(t) > 0 &&
          !exists(col("__iv"), s =>
            (i + 1 >= s.getField("b_start")) &&
              (i + 1 < s.getField("b_start") + s.getField("span_tokens")))))
      .select(col(idCol),
        size(col("__kept")).as("n_kept"),
        array_join(col("__kept"), " ").as("text_clean"))
  }
}
