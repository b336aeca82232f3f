package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with an evaluation/benchmark set (the GPT-3 §C / Llama
  * style 13-gram overlap rule, n configurable because tiny corpora need
  * shorter grams to exercise the path).
  *
  * Scale shape (the eval side is small by construction — benchmarks are
  * thousands of docs, the corpus is billions):
  *   - eval grams are distinct-ed and BROADCAST; the corpus-side gram
  *     explode is map-side;
  *   - the inner broadcast join keeps only matching grams, so the only
  *     shuffle (count-distinct per doc) carries hit rows, not the corpus;
  *   - the hit counts re-attach with a plain left join — AQE broadcasts
  *     it when contamination is sparse (the common case) and falls back
  *     to a doc_id shuffle when it is not, which is the correct plan
  *     either way.
  * The corpus text itself never crosses the network.
  */
object Decontaminate {

  /** Lower-cased whitespace-token n-grams of `textCol` as an array
    * column; documents shorter than `n` tokens yield an empty array.
    */
  def wordNgrams(textCol: Column, n: Int): Column =
    // native one-pass shingle kernel: the composed transform/slice form
    // re-ran the regex split per lambda element (no CSE across lambda
    // boundaries — O(tokens²) per doc). Distinct-per-doc output is
    // exactly what [[ngramOverlap]]'s countDistinct consumes.
    graft.dedup.Dedup.wordShingles(lower(textCol), n)

  /** Per-document overlap with the eval set: `(idCol, n_hits,
    * contaminated)` for every corpus row, where `n_hits` counts DISTINCT
    * shared n-grams. Corpus rows also present in `eval` should be
    * excluded by the caller (train/eval splits are disjoint upstream).
    */
  def ngramOverlap(corpus: DataFrame, eval: DataFrame, n: Int,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evalGrams = eval
      .select(explode(wordNgrams(col(textCol), n)).as("gram"))
      .distinct()
    val corpusGrams = corpus
      .select(col(idCol), explode(wordNgrams(col(textCol), n)).as("gram"))
    val hits = corpusGrams
      .join(broadcast(evalGrams), "gram")
      .groupBy(idCol)
      .agg(countDistinct("gram").as("n_hits"))
    corpus.select(idCol)
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** SPAN-level decontamination — the strongest public signal: flag
    * every corpus document sharing a VERBATIM token span ≥ `spanTokens`
    * with any eval document, with the spans' exact extents behind the
    * counts ([[graft.dedup.ExactSubstr.crossSpans]] does the seeds →
    * df cap → exact verify → gaps-and-islands work; this wrapper folds
    * its output into the per-train-doc decision). Where [[ngramOverlap]]
    * counts shared n-grams as a SET (lower-cased, position-free), this
    * reports maximal contiguous case-sensitive spans — "this train doc
    * contains 40 consecutive tokens of the benchmark", not "40 grams
    * overlap somewhere".
    *
    * Output, one row per corpus doc: `(idCol, n_eval_spans,
    * max_span_tokens, contaminated)` — the number of maximal shared
    * spans across all eval docs, the longest one (0 when clean), and
    * the flag. Scale shape: the span table is tiny (hits only), so the
    * re-attach left join is AQE-broadcast in the common sparse case —
    * the same posture as [[ngramOverlap]]'s hit join.
    */
  def spanOverlap(corpus: DataFrame, eval: DataFrame, spanTokens: Int,
                  maxSeedDf: Int = 10000,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spans = graft.dedup.ExactSubstr.crossSpans(corpus, eval, idCol, textCol,
      spanTokens, maxSeedDf)
    val agg = spans.groupBy(col("train_id").as(idCol))
      .agg(count(lit(1)).as("n_eval_spans"),
        max(col("span_tokens")).as("max_span_tokens"))
    corpus.select(idCol)
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_eval_spans"), lit(0L)).as("n_eval_spans"),
        coalesce(col("max_span_tokens"), lit(0)).as("max_span_tokens"),
        (coalesce(col("n_eval_spans"), lit(0L)) > 0).as("contaminated"))
  }

  /** Largest eval-side band-key row count the fuzzy pass will broadcast
    * (bands × eval docs rows of three primitives ≈ 50 MB at the
    * default) — above it the candidate join falls back to a shuffle,
    * the HeavyHitters size-conditional convention.
    */
  val FuzzyMaxBroadcastBandRows = 2000000L

  /** FUZZY cross-corpus contamination pairs — the near-duplicate
    * complement of [[ngramOverlap]] (exact gram sets) and
    * [[spanOverlap]] (verbatim spans): a PARAPHRASED benchmark item
    * (reworded question, reformatted answer) shares high shingle
    * jaccard with its source but can dodge any fixed verbatim rule.
    * MinHash-LSH across the two corpora: both sides banded
    * ([[graft.dedup.Dedup.minhashLsh]]'s kernel), candidates are
    * band-bucket collisions BETWEEN corpora only, every candidate
    * verified with the exact jaccard — precision exact, recall the
    * standard banding bound (≥ 1 − 1e-8 at the default r=4, b=32,
    * t=0.8; the `dedup_minhash_lsh` oracle convention).
    *
    * Returns `(corpus_id, eval_id, jaccard)` pairs at `threshold` or
    * above. Scale shape: the eval side is benchmark-sized by
    * construction, so its band keys broadcast (size-conditional — a
    * measured count above [[FuzzyMaxBroadcastBandRows]] demotes the
    * join to a shuffle); ids-only candidates, shingle arrays fetched
    * back only for survivors; the corpus text never crosses the wire.
    */
  def fuzzyPairs(corpus: DataFrame, eval: DataFrame, shingleSize: Int = 3,
                 numHashes: Int = 128, bands: Int = 32,
                 threshold: Double = 0.8, textCol: String = "text",
                 idCol: String = "doc_id",
                 maxBroadcastBandRows: Long = FuzzyMaxBroadcastBandRows)
      : DataFrame = {
    import graft.dedup.Dedup.{jaccard, wordShingles}
    require(bands * (numHashes / bands) == numHashes,
      "bands must divide numHashes")
    def shingled(df: DataFrame, side: String) = df
      .select(col(idCol).as(s"${side}_id"),
        wordShingles(col(textCol), shingleSize).as(s"sh_$side"))
      .filter(size(col(s"sh_$side")) > 0)
    def banded(sh: DataFrame, side: String) = sh
      .select(col(s"${side}_id"), posexplode(
        graft.functions.expressions.MinHashExpressions
          .minhash_bands(col(s"sh_$side"), numHashes, bands)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .select(col("band"), col("bucket"), col(s"${side}_id"))
    val corpusSh = shingled(corpus, "corpus")
    val evalSh = shingled(eval, "eval")
    val evalBands = banded(evalSh, "eval")
    val evalSide =
      if (eval.count() * bands <= maxBroadcastBandRows) broadcast(evalBands)
      else evalBands
    val candidates = banded(corpusSh, "corpus")
      .join(evalSide, Seq("band", "bucket"))
      .select("corpus_id", "eval_id").distinct()
    candidates
      .join(corpusSh, Seq("corpus_id"))
      .join(evalSh, Seq("eval_id"))
      .withColumn("jaccard", jaccard(col("sh_corpus"), col("sh_eval")))
      .filter(col("jaccard") >= threshold)
      .select(col("corpus_id"), col("eval_id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Per-corpus-doc verdict over [[fuzzyPairs]]: `(idCol,
    * n_eval_matches, max_jaccard, contaminated)` for EVERY corpus row.
    */
  def fuzzyOverlap(corpus: DataFrame, eval: DataFrame, shingleSize: Int = 3,
                   numHashes: Int = 128, bands: Int = 32,
                   threshold: Double = 0.8, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val agg = fuzzyPairs(corpus, eval, shingleSize, numHashes, bands,
        threshold, textCol, idCol)
      .groupBy(col("corpus_id").as(idCol))
      .agg(count(lit(1)).as("n_eval_matches"),
        max(col("jaccard")).as("max_jaccard"))
    corpus.select(idCol)
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_eval_matches"), lit(0L)).as("n_eval_matches"),
        col("max_jaccard"),
        (coalesce(col("n_eval_matches"), lit(0L)) > 0).as("contaminated"))
  }
}
