package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language model for corpus quality filtering — the
  * CCNet move (Wenzek et al. 2020): train a smoothed bigram LM on a
  * trusted slice of the corpus (e.g. one language / one curated source),
  * score every document's perplexity under it, and keep the
  * low-perplexity head. Documents whose token statistics diverge from
  * the trusted slice (boilerplate, spam, wrong language) land in the
  * high-perplexity tail.
  *
  * Reference scope: the pm25ml reference has no text models; this
  * extends the training-data-pipeline family next to
  * [[QualityClassifier]] (learned discriminative scorer) — this is the
  * *generative* scorer that needs no labels, only a trusted slice.
  *
  * Scale design (100 TB):
  *  - Bigram pairs are built map-side with `transform` over the token
  *    array — no shuffle, no self-join, stays in whole-stage codegen.
  *  - Training is two linear `groupBy` counts whose output is bounded by
  *    the observed bigram vocabulary, not the corpus: with
  *    `minCount` > 1 the model is df-capped exactly like the dedup
  *    indexes, so both count tables broadcast.
  *  - Scoring is explode → two broadcast left joins → one `groupBy`
  *    on the document id: the corpus shuffles once, carrying only
  *    (id, logp) pairs, never text.
  * Add-k smoothing keeps unseen bigrams finite: logp = ln((n + k) /
  * (ctx_n + k·V)) with V = training token vocabulary.
  */
object NgramLm {

  /** (context, token) bigram structs of the lowercased whitespace
    * tokens, with a `<s>` sentinel context for the first token.
    * Trim-empty texts produce an empty array (not a [""] singleton).
    */
  def bigrams(text: Column): Column = {
    val toks = TextFunctions.wsTokens(lower(text))
    // contexts = BOS ++ toks.init, zipped against toks. NOT a transform
    // with element_at(toks, i) inside the lambda: lambda bodies are
    // inlined per element, so that shape re-splits the text once per
    // token — O(tokens²) per document (the same non-CSE trap the
    // shingling kernel documents). Here every `toks` occurrence sits
    // outside a lambda and evaluates once per row.
    val ctxs = concat(array(lit("<s>")), slice(toks, lit(1), size(toks) - 1))
    val pairs = zip_with(ctxs, toks, (c, t) =>
      struct(c.as("ctx"), t.as("tok")))
    when(length(trim(text)) === 0, slice(pairs, 1, 0)).otherwise(pairs)
  }

  /** Trained model: df-capped bigram counts, context totals, and the
    * training vocabulary size. `bigramCounts` and `contextCounts` are
    * both bounded by the (capped) bigram vocabulary — broadcastable.
    * [[release]] drops the cached full count table backing them.
    */
  final case class Model(bigramCounts: DataFrame, contextCounts: DataFrame,
                         vocabSize: Long,
                         private val cached: Option[DataFrame] = None) {
    def release(): Unit = cached.foreach(_.unpersist())
  }

  /** Count bigrams over `trusted` in ONE corpus pass: the full bigram
    * count table is cached (bigram-vocab-bounded, NOT corpus-bounded),
    * and both the context totals (sum of n per ctx) and the vocabulary
    * size (distinct tok — every token occurs in tok position, the first
    * one via its BOS bigram) derive from it without touching the corpus
    * again. `minCount` then df-caps the model the broadcast ships;
    * totals and V keep the full stream so smoothing stays consistent.
    * Call `model.release()` when done (score's broadcasts hold their
    * own copies).
    */
  def train(trusted: DataFrame, textCol: String,
            minCount: Long = 1L): Model = {
    val full = trusted
      .select(explode(bigrams(col(textCol))).as("bg"))
      .groupBy(col("bg.ctx").as("ctx"), col("bg.tok").as("tok"))
      .agg(count(lit(1)).as("n"))
      .cache()
    val cc = full.groupBy("ctx").agg(sum("n").as("ctx_n"))
    val v = full.select(countDistinct(col("tok"))).first().getLong(0)
    Model(full.filter(col("n") >= minCount), cc, v, Some(full))
  }

  /** Per-document negative log-likelihood and perplexity under `model`.
    * Token-less documents drop (they have no bigrams to score).
    * Output: (idCol, n_bigrams, ppl) with ppl rounded to `roundTo`.
    */
  def score(docs: DataFrame, idCol: String, textCol: String, model: Model,
            k: Double = 0.5, roundTo: Int = 2): DataFrame = {
    val pairs = docs.select(col(idCol),
        explode(bigrams(col(textCol))).as("bg"))
      .select(col(idCol), col("bg.ctx").as("ctx"), col("bg.tok").as("tok"))
    val logp =
      log((coalesce(col("n"), lit(0L)) + lit(k)) /
          (coalesce(col("ctx_n"), lit(0L)) + lit(k) * lit(model.vocabSize.toDouble)))
    pairs
      .join(broadcast(model.bigramCounts), Seq("ctx", "tok"), "left")
      .join(broadcast(model.contextCounts), Seq("ctx"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(logp).as("__nll"))
      .select(col(idCol), col("n_bigrams"),
        round(exp(-col("__nll")), roundTo).as("ppl"))
  }
}
