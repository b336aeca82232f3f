package graft.dedup

import org.apache.spark.sql.DataFrame
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
  *      surfaces.
  *   2. MATCH — inverted index on the window text, df-capped: a window
  *      occurring > `maxSeedDf` times is boilerplate whose pairs are
  *      quadratic noise (same cap + rationale as the repo's other
  *      inverted indexes). Cross-doc position pairs come from one
  *      bounded explode of each bucket.
  *   3. EXTEND — matching positions (i, j) of one doc pair lie on the
  *      same shared span iff they share the diagonal d = i − j and are
  *      consecutive in i: a gaps-and-islands pass per (pair, diagonal)
  *      (`i − row_number()` island keys, the Sessions move) folds seeds
  *      into maximal spans. Every window partition is bounded by the
  *      matched-seed count of ONE doc pair on ONE diagonal — never
  *      corpus-sized.
  *
  * Joining on the window TEXT makes the result exact by construction
  * (no collision surface, replayable 1:1 in SQL). The shuffle carries
  * each window string once per occurrence — ~L× the token bytes. At
  * 100 TB swap the index key for `xxhash64(window)` (8 bytes/entry) and
  * add a per-span exact verify that re-slices both docs' tokens and
  * compares (the repo's hashed-candidates-then-exact-verify idiom,
  * [[Dedup.substringSpanPairs]]); seeds/extend shapes are unchanged.
  *
  * Output: one row per maximal shared span — `(id_a, id_b, a_start,
  * b_start, span_tokens)`, token positions 1-based, `id_a < id_b`.
  */
object ExactSubstr {

  def maximalSharedSpans(docs: DataFrame, idCol: String, textCol: String,
                         spanTokens: Int = 15,
                         maxSeedDf: Int = 10000): DataFrame = {
    require(spanTokens >= 2, s"spanTokens too small: $spanTokens")
    require(maxSeedDf >= 2, s"maxSeedDf must be at least 2: $maxSeedDf")
    val windows = docs.select(col(idCol).as("id"),
        posexplode(graft.dedup.Dedup.wordShinglesAll(col(textCol), spanTokens))
          .as(Seq("pos", "w")))
    // df-capped inverted index: every bucket is ≤ maxSeedDf entries, so
    // the pair explode below is bounded per bucket
    val buckets = windows.groupBy("w")
      .agg(collect_list(struct(col("id"), col("pos"))).as("occ"))
      .filter(size(col("occ")).between(2, maxSeedDf))
    val seedPairs = buckets
      .select(explode(col("occ")).as("a"), col("occ"))
      .select(col("a"), explode(col("occ")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.pos").as("pos_a"), col("b.pos").as("pos_b"))
    // gaps-and-islands per (pair, diagonal): consecutive pos_a runs are
    // the maximal spans — partition size is one pair's seeds on one
    // diagonal (≤ the shorter doc's token count), never corpus-scale
    val diag = seedPairs.withColumn("__d", col("pos_a") - col("pos_b"))
    val w = Window.partitionBy("id_a", "id_b", "__d").orderBy("pos_a")
    diag.withColumn("__isl", col("pos_a") - row_number().over(w))
      .groupBy("id_a", "id_b", "__d", "__isl")
      .agg((min(col("pos_a")) + 1).as("a_start"),
        (min(col("pos_b")) + 1).as("b_start"),
        (count(lit(1)) + spanTokens - 1).cast("int").as("span_tokens"))
      .drop("__d", "__isl")
  }

  /** The removal ACTION on [[maximalSharedSpans]]' output — the actual
    * ExactSubstr dedup step: cut every duplicated span from the LATER
    * document (`id_b`, the higher id), keeping the first occurrence
    * intact. Returns every doc with `text_clean` (the surviving tokens
    * re-joined) and `n_kept`.
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
        !exists(col("__iv"), s =>
          (i + 1 >= s.getField("b_start")) &&
            (i + 1 < s.getField("b_start") + s.getField("span_tokens")))))
      .select(col(idCol),
        size(col("__kept")).as("n_kept"),
        array_join(col("__kept"), " ").as("text_clean"))
  }
}
