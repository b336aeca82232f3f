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
}
