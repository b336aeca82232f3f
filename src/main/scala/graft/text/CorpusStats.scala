package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-level term statistics: vocabulary building and per-document
  * keyword extraction — the "what is in this corpus" half of a training
  * -data pipeline (tokenizer vocab seeding, domain inspection, per-doc
  * topical keywords for mixture construction).
  *
  * Everything is built-in expressions: explode → hash-aggregate with
  * map-side partial aggregation, so token counting is one linear shuffle
  * of (token, partial-count) pairs regardless of corpus size, and top-k
  * selection is `TakeOrderedAndProject` (per-partition heaps + driver
  * merge of k rows), never a global sort of the vocabulary.
  */
object CorpusStats {

  /** Lower-cased whitespace tokens, empties filtered (so blank docs
    * contribute nothing, same as the SQL mirror).
    */
  private[graft] def tokens(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)

  /** Per-document Shannon token entropy (nats) over the token
    * histogram — the information-density quality signal that
    * `distinct_token_ratio` only approximates: boilerplate and
    * keyword-stuffed docs have low entropy at ANY length, while the
    * ratio degrades mechanically with doc size. Computed in the
    * cancellation-free form `H = ln(N) − (Σ c·ln c)/N` (exact when all
    * counts are 1: the Σ term is 0 and H = ln N with no subtraction
    * noise). `entropy_nats` carries `ln` — transcendental, so gate
    * queries round it per the house convention.
    *
    * Two linear shuffles, both map-side combined: (doc, token) counts,
    * then the per-doc rollup; docs with no tokens keep a row with
    * zeros. Same tokenization as [[vocabTopK]].
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tc = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(idCol, "tok").agg(count(lit(1)).as("c"))
    val h = tc.groupBy(idCol).agg(
      sum(col("c")).as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      sum(col("c").cast("double") * log(col("c").cast("double"))).as("s"))
    docs.select(col(idCol)).distinct()
      .join(h, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "n_distinct"))
      .withColumn("entropy_nats",
        when(col("n_tokens") > 0,
          log(col("n_tokens").cast("double")) - col("s") / col("n_tokens"))
          .otherwise(lit(0.0)))
      .drop("s")
  }

  /** The `k` most frequent tokens corpus-wide with their counts; ties
    * broken lexicographically so the cut is total-order deterministic.
    */
  def vocabTopK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)

  /** Per-document top-`k` keywords by tf·(1/df) — term frequency within
    * the doc times unlogged inverse document frequency, ties broken
    * lexicographically. The familiar ln-damped idf is deliberately not
    * used in the ORDER: ln is libm-dependent (not correctly-rounded), so
    * ranking on it is not reproducible across engines, while tf/df is a
    * single IEEE division — bit-identical everywhere. Emitted columns
    * are the exact integers (tf, df) plus the rank.
    *
    * Two linear shuffles: doc-term counts (partial-aggregated), then the
    * df join on the term; the rank window partitions by doc, so no
    * global sort appears anywhere.
    */
  def keywordTopK(docs: DataFrame, idCol: String, textCol: String,
                  k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol)
      .orderBy((col("tf").cast("double") / col("df").cast("double")).desc,
        col("term"))
    tf.join(df, Seq("term"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"), col("tf"), col("df"))
  }
}
