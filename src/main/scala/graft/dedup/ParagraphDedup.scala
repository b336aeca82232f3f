package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repeated-paragraph removal — sub-document dedup of crawl boilerplate.
  *
  * Doc-level dedup (exact/MinHash/SimHash in [[Dedup]]) keeps one copy of
  * a *page*; it cannot touch the newsletter banner, cookie notice, or
  * share-bar paragraph that a template stamps into millions of otherwise
  * distinct pages. The standard corpus-curation fix (the RefinedWeb /
  * Gopher "repetitious boilerplate" pass) works at paragraph granularity:
  * count each paragraph's *document frequency* across the corpus and drop
  * paragraphs appearing in more than `maxDocFreq` documents, keeping the
  * survivors in original order.
  *
  * Reference scope: the pm25ml reference has no text operators; this
  * extends the engine's training-data-pipeline family alongside
  * `Dedup.exactSubstringSpans` (which targets *within-pair* repeats, not
  * corpus-wide template paragraphs).
  *
  * 100 TB shape: three shuffles, all linear — (1) exploded paragraphs
  * aggregate document frequency grouped by `xxhash64(paragraph)` so the
  * frequency table carries 16 bytes/paragraph instead of the text; (2)
  * the paragraph rows join that table on the hash; (3) re-assembly groups
  * by doc id. Nothing is all-pairs and nothing collects to the driver.
  * The 64-bit hash conflates two distinct paragraphs' frequencies only on
  * collision (probability ~n²/2⁶⁵ — at 10⁹ distinct paragraphs, ~3% for
  * a single conflated *pair* whose effect is one over-counted df).
  */
object ParagraphDedup {

  /** Drop paragraphs (split on `sep`) whose document frequency exceeds
    * `maxDocFreq`; re-join survivors in order. Blank paragraphs are
    * ignored (neither counted nor emitted). Returns one row per input
    * doc: (`idCol`, `textCol` cleaned, `n_removed`) — a doc whose every
    * paragraph was boilerplate survives with empty text, so the row count
    * is stable through the operator.
    */
  def removeRepeated(docs: DataFrame, idCol: String, textCol: String,
                     maxDocFreq: Long, sep: String = "\n"): DataFrame = {
    val paras = docs
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__para")))
      .filter(length(trim(col("__para"))) > 0)
      .withColumn("__ph", xxhash64(col("__para")))

    val freq = paras.groupBy(col("__ph"))
      .agg(countDistinct(col(idCol)).as("__pdf"))

    // array_join skips null elements, so boilerplate paragraphs are
    // nulled (keeping their position struct for the sort) rather than
    // filtered — one aggregation yields both the cleaned text and the
    // removed count, and all-boilerplate docs still emit a row.
    paras.join(freq, Seq("__ph"))
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"),
              when(col("__pdf") <= maxDocFreq, col("__para")).as("__p")))),
            s => s.getField("__p")),
          sep).as(textCol),
        sum(when(col("__pdf") > maxDocFreq, 1L).otherwise(0L)).as("n_removed"))
  }

  /** The corpus-wide paragraph document-frequency table (hash, df, one
    * example text) — the profiling view behind [[removeRepeated]]'s
    * threshold choice.
    */
  def paragraphFrequencies(docs: DataFrame, idCol: String, textCol: String,
                           sep: String = "\n"): DataFrame =
    docs
      .select(col(idCol),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as("__para"))
      .filter(length(trim(col("__para"))) > 0)
      .groupBy(xxhash64(col("__para")).as("paragraph_hash"))
      .agg(countDistinct(col(idCol)).as("doc_freq"),
        min(col("__para")).as("example"))
}
