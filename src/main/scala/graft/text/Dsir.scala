package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (Xie et al. 2023, DSIR):
  * pick raw-corpus documents that look like a small target corpus by
  * comparing hashed n-gram distributions. Each token hashes into one of
  * `numBuckets` buckets; the target and raw corpora each induce a
  * bucket distribution; a document's importance is the mean
  * log-likelihood ratio of its own buckets under target vs raw. The
  * top fraction by importance is kept.
  *
  * Reference scope: no counterpart in pm25ml — training-data-pipeline
  * family, the distribution-matching selector that complements
  * [[QualityClassifier]] (needs labels) and [[NgramLm]] (needs only a
  * trusted slice; DSIR additionally matches a *target domain*).
  *
  * Scale design (100 TB):
  *  - Both distributions are one explode + one `groupBy(bucket)` each —
  *    output is exactly `numBuckets` rows regardless of corpus size, so
  *    the weight table always broadcasts (2²⁰ buckets ≈ 8 MB).
  *  - Scoring reuses the [[QualityClassifier.scoreWithTable]] shape:
  *    explode → broadcast join → per-doc mean; the corpus shuffles once
  *    on the doc id carrying (id, weight) pairs only.
  *  - Selection avoids a global sort: ranking happens on the score
  *    output (one row per doc, not per token), and at production scale
  *    the keep-threshold comes from a sampled quantile instead of a
  *    full ROW_NUMBER — both paths implemented below.
  */
object Dsir {

  /** Per-bucket importance weights ln(p_target(b) / p_raw(b)) with
    * add-k smoothing: w_b = ln((t_b + k)/(T + kB)) - ln((r_b + k)/(R + kB)).
    * Output: (bucket, weight), exactly `numBuckets`-bounded.
    */
  def bucketWeights(target: DataFrame, raw: DataFrame, textCol: String,
                    numBuckets: Int, k: Double = 0.5): DataFrame = {
    def counts(df: DataFrame, name: String): DataFrame =
      df.select(explode(
          QualityClassifier.tokenBuckets(col(textCol), numBuckets))
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(name))
    val t = counts(target, "t_n")
    val r = counts(raw, "r_n")
    // numBuckets rows after the outer join; totals via a window over the
    // tiny joined table (no second pass over either corpus).
    val joined = t.join(r, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("t_n"), lit(0L)).as("t_n"),
        coalesce(col("r_n"), lit(0L)).as("r_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    val b = lit(numBuckets.toDouble) * lit(k)
    joined
      .withColumn("__T", sum("t_n").over(w).cast("double"))
      .withColumn("__R", sum("r_n").over(w).cast("double"))
      .select(col("bucket"),
        (log((col("t_n") + lit(k)) / (col("__T") + b)) -
         log((col("r_n") + lit(k)) / (col("__R") + b))).as("weight"))
  }

  /** Mean per-token importance per document. Token-less docs score 0.
    * Output: (idCol, dsir_score) rounded to `roundTo` decimals.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            weights: DataFrame, numBuckets: Int,
            roundTo: Int = 6): DataFrame = {
    val toks = docs.select(col(idCol), explode_outer(
      QualityClassifier.tokenBuckets(col(textCol), numBuckets)).as("bucket"))
    toks.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(coalesce(
        sum(col("weight")) / sum(when(col("bucket").isNotNull, 1.0)),
        lit(0.0)).as("__s"))
      .select(col(idCol), round(col("__s"), roundTo).as("dsir_score"))
  }

  /** Deterministic exact selection: keep the top `fraction` of documents
    * by (rounded score desc, id asc). ROW_NUMBER runs over one row per
    * document — fine to ~10⁹ docs; beyond that use [[keptByThreshold]].
    */
  def select(scored: DataFrame, idCol: String,
             fraction: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dsir_score").desc, col(idCol))
    val total = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(Long.MinValue, Long.MaxValue)
    scored
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(total))
      .select(col(idCol), col("dsir_score"),
        (col("__rk") <= ceil(col("__n") * fraction)).as("kept"))
  }

  /** Production-scale selection: threshold at the (1-fraction) sampled
    * quantile of the score — one approx-percentile aggregate broadcast
    * back, no global sort, at the cost of a ±err boundary band. Strictly
    * above the cut: the quantile value itself is the last *dropped*
    * score, so clustered/tied scores at the boundary drop together
    * (fraction=1 keeps everything explicitly).
    */
  def keptByThreshold(scored: DataFrame, fraction: Double,
                      err: Double = 0.001): DataFrame =
    if (fraction >= 1.0) scored.withColumn("kept", lit(true))
    else {
      val cut = scored.stat.approxQuantile(
        "dsir_score", Array(1.0 - fraction), err).head
      scored.withColumn("kept", col("dsir_score") > lit(cut))
    }
}
