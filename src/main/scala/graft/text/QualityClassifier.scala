package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.expressions.TextExpressions

/** fastText-style linear quality classifier — the CCNet / LLaMA-corpus
  * filtering move: hash each token into one of `m` buckets (hashing
  * trick), mean-pool the bucket weight vector, add a bias, squash with a
  * sigmoid, and keep documents above a probability threshold. The heavy
  * lifting (hashing + pooling) is the same whether the weights come from
  * a trained model or a hand-set lexicon.
  *
  * Reference scope: the pm25ml reference has no text classifiers; this
  * extends the training-data-pipeline family (heuristic quality signals
  * live in [[TextFunctions.qualityScore]]; this is the *learned* scorer).
  *
  * Two inference paths with identical semantics:
  *  - [[scoreText]]: weights as a plan literal array — whole-stage
  *    codegen end to end, right for lexicon-sized m (≤ a few thousand);
  *  - [[scoreWithTable]]: weights as a (bucket, weight) table broadcast
  *    onto exploded tokens — right for production m (2²⁰), where a
  *    literal array would bloat the plan by megabytes.
  *
  * Training ([[trainWeights]]) fits MLlib logistic regression over the
  * same mean-pooled hashed features, so the learned coefficients drop
  * straight into either inference path.
  */
object QualityClassifier {

  /** FNV-1a bucket ids of a text's whitespace tokens (native codegen'd
    * expression — ANSI-safe wrapping multiply).
    */
  def tokenBuckets(text: Column, numBuckets: Int): Column =
    TextExpressions.fnv_buckets(TextFunctions.wsTokens(text), numBuckets)

  /** P(quality) with literal weights: sigmoid(mean(w[bucket]) + bias).
    * Tokenless texts score sigmoid(bias).
    */
  def scoreText(text: Column, weights: Seq[Double], bias: Double,
                numBuckets: Int): Column = {
    require(weights.length == numBuckets,
      s"got ${weights.length} weights for $numBuckets buckets")
    val w = array(weights.map(lit): _*)
    val b = tokenBuckets(text, numBuckets)
    val s = aggregate(b, lit(0.0), (acc, i) => acc + element_at(w, i + 1)) /
      greatest(size(b), lit(1)).cast("double") + lit(bias)
    lit(1.0) / (lit(1.0) + exp(-s))
  }

  /** P(quality) via a broadcast weight table — the large-m path. One
    * explode + broadcast join + per-doc mean; the corpus shuffles once on
    * the doc id. Buckets absent from `weights` contribute weight 0.
    */
  def scoreWithTable(docs: DataFrame, idCol: String, textCol: String,
                     weights: DataFrame, bias: Double,
                     numBuckets: Int): DataFrame = {
    val toks = docs.select(col(idCol),
      explode_outer(tokenBuckets(col(textCol), numBuckets)).as("bucket"))
    toks.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg((coalesce(
          sum(coalesce(col("weight"), lit(0.0))) /
            sum(when(col("bucket").isNotNull, 1.0)), lit(0.0)) + lit(bias))
        .as("__s"))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-col("__s")))).as("quality_prob"))
  }

  /** Fit logistic regression over mean-pooled hashed features; returns
    * (weights of length numBuckets, bias) ready for [[scoreText]] /
    * [[scoreWithTable]]. The feature build runs distributed; only the
    * m-length coefficient vector comes back to the driver.
    */
  def trainWeights(docs: DataFrame, textCol: String, labelCol: String,
                   numBuckets: Int, regParam: Double = 0.0):
      (Array[Double], Double) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val toVec = udf { (buckets: Seq[Int]) =>
      val n = math.max(buckets.length, 1)
      val counts = buckets.groupBy(identity).view
        .mapValues(_.length.toDouble / n).toSeq.sortBy(_._1)
      Vectors.sparse(numBuckets, counts.map(_._1).toArray,
        counts.map(_._2).toArray)
    }
    val feats = docs.select(
      toVec(tokenBuckets(col(textCol), numBuckets)).as("features"),
      col(labelCol).cast("double").as("label"))
    val model = new LogisticRegression()
      .setRegParam(regParam).setStandardization(false).setMaxIter(100)
      .fit(feats)
    (model.coefficients.toArray, model.intercept)
  }
}
