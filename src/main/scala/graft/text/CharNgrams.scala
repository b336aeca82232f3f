package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-relative character-n-gram statistics — the CCNet-style quality
  * signal family: a document whose character distribution diverges from
  * the corpus (mojibake, binary spill, wrong-language fragments) has a
  * high out-of-vocabulary rate against the corpus' frequent n-grams,
  * even when per-doc-only signals (length, punctuation) look normal.
  *
  * The reference table is one distributed count pass (explode →
  * partial-aggregated groupBy) cut to the top-`k` n-grams with
  * TakeOrdered (count-desc, gram-asc — a total order, so the cut is
  * deterministic). Scoring joins each doc's exploded n-grams against the
  * (small, broadcast) table — the corpus text itself never shuffles,
  * only (doc_id, gram) pairs do, and the per-doc aggregation
  * partial-aggregates map-side.
  *
  * Everything emitted is exact integers plus one final division, so the
  * operator is exactly reproducible across engines (no transcendental
  * log-prob in the scoring path; a KenLM-style perplexity is a monotone
  * refinement that trades that portability away).
  */
object CharNgrams {

  /** All character n-grams of `text` (overlapping, in order,
    * non-distinct); texts shorter than `n` yield an empty array.
    * `substring(expr, pos, len)` is 1-based and codegen'd.
    */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - lit(n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** The corpus' `k` most frequent character n-grams. */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs.select(explode(charNgrams(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(k)

  /** Per-document OOV statistics against `reference` (a `(gram, cnt)`
    * table, typically [[topNgrams]] of a trusted corpus): total n-grams,
    * n-grams absent from the reference, and their ratio.
    */
  def oovStats(docs: DataFrame, reference: DataFrame, idCol: String,
               textCol: String, n: Int): DataFrame = {
    val exploded = docs.select(col(idCol),
      explode(charNgrams(col(textCol), n)).as("gram"))
    val flagged = exploded.join(
        broadcast(reference.select(col("gram"), lit(1).as("__known"))),
        Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("__known").isNull, 1)).as("n_oov"))
    docs.select(col(idCol))
      .join(flagged, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, 0.0)
          .otherwise(round(col("n_oov").cast("double") / col("n_grams"), 6))
          .as("oov_rate"))
  }
}
