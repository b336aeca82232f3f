package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.VectorExpressions

/** PCA over an embedding column — the whitening/dimensionality-reduction
  * step in front of embedding dedup and clustering (SemDeDup and
  * prototypicality pruning both behave better in a decorrelated space;
  * a d→k projection also cuts every downstream ANN distance to O(k)).
  *
  * Scale split, explicitly:
  *  - [[covariance]] is the only corpus-sized computation: a double
  *    posexplode → groupBy(i, j) whose hash aggregate combines
  *    MAP-SIDE, so the shuffle carries at most d² rows per partition
  *    regardless of corpus size (CPU O(n·d²) is inherent to
  *    covariance). No MLlib RowMatrix, no driver-side data pass.
  *  - [[fit]] collects the d×d matrix (d ≤ `maxDim` guard) and
  *    eigensolves on the driver with a from-scratch cyclic Jacobi —
  *    a 64×64 symmetric solve, microseconds.
  *  - [[project]] is map-side: k native dot-products against literal
  *    component arrays (codegen'd, no UDF).
  */
object Pca {

  /** Per-dimension means — a d-row aggregate, the tiny first pass of the
    * two-pass covariance. Collected to the driver (d ≤ a few thousand)
    * and re-broadcast as a literal array.
    */
  def dimMeans(df: DataFrame, vecCol: String): Array[Double] = {
    val v = col(vecCol).cast("array<double>")
    df.select(posexplode(v).as(Seq("i", "xi")))
      .groupBy("i").agg(avg("xi").as("m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
  }

  /** Sample covariance as long rows (i, j, cov) — i, j in [0, d).
    *
    * Two-pass centered form: pass 1 is the d-row mean aggregate
    * ([[dimMeans]]); pass 2 centers each vector against the literal mean
    * array map-side and aggregates `sum((xi−mi)(xj−mj))`. Centering
    * first removes the subtractive cancellation of the textbook
    * `(Σxy − ΣxΣy/n)` form, so the unordered double summation's ~1-ulp
    * partition-order wobble stays ~1e-15 relative — far below the pack's
    * 4-decimal rounding quantum — instead of being amplified to the
    * rounding boundary (the round-5 `ann_pca_covariance` flake).
    *
    * Scale: the groupBy's partial aggregation keeps the shuffle
    * d²-bounded per partition; the extra pass is one d-row aggregate.
    */
  def covariance(df: DataFrame, vecCol: String): DataFrame =
    covarianceCentered(df, vecCol, dimMeans(df, vecCol))

  private def covarianceCentered(df: DataFrame, vecCol: String,
                                 means: Array[Double]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val centered = zip_with(v, array(means.map(lit).toIndexedSeq: _*),
      (a, b) => a - b)
    val x = df.select(posexplode(centered).as(Seq("i", "xi")),
      centered.as("__v"))
    val p = x.select(col("i"), col("xi"),
      posexplode(col("__v")).as(Seq("j", "xj")))
    p.groupBy("i", "j")
      .agg(sum(col("xi") * col("xj")).as("__s"), count(lit(1)).as("__n"))
      .select(col("i"), col("j"),
        (col("__s") / (col("__n") - 1)).as("cov"))
  }

  final case class Model(mean: Array[Double],
                         components: Array[Array[Double]], // k rows of d
                         eigenvalues: Array[Double])

  /** Fit top-`k` principal components. One corpus pass for the
    * covariance + one tiny mean aggregate; the d×d eigensolve runs on
    * the driver (`maxDim` bounds the collect).
    */
  def fit(df: DataFrame, vecCol: String, k: Int,
          maxDim: Int = 4096): Model = {
    val v = col(vecCol).cast("array<double>")
    val d = df.select(size(v)).head().getInt(0)
    require(d <= maxDim, s"dim $d exceeds driver eigensolve guard $maxDim")
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")
    val mean = dimMeans(df, vecCol)
    val c = Array.ofDim[Double](d, d)
    covarianceCentered(df, vecCol, mean).collect().foreach { r =>
      c(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    val (values, vectors) = jacobiEigSym(c)
    // sort by eigenvalue descending; fix sign so the largest-|.| entry
    // of each component is positive (eigenvectors are sign-ambiguous)
    val order = values.zipWithIndex.sortBy(-_._1).take(k).map(_._2)
    val comps = order.map { idx =>
      val vcol = Array.tabulate(d)(r => vectors(r)(idx))
      val m = vcol.maxBy(math.abs)
      if (m < 0) vcol.map(-_) else vcol
    }
    Model(mean, comps, order.map(values))
  }

  /** Append `pc0..pc{k-1}`: centered projections onto the components —
    * map-side, one codegen'd dot product per component.
    */
  def project(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val centered = zip_with(col(vecCol).cast("array<double>"),
      array(model.mean.map(lit).toIndexedSeq: _*), (a, b) => a - b)
    val withC = df.withColumn("__c", centered)
    model.components.zipWithIndex.foldLeft(withC) { case (acc, (comp, j)) =>
      acc.withColumn(s"pc$j", VectorExpressions.dot_product(
        col("__c"), array(comp.map(lit).toIndexedSeq: _*)))
    }.drop("__c")
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (values,
    * vectors as columns). Classic textbook sweep — O(d³) per sweep,
    * converges quadratically; fine to d ≈ 4096 on the driver.
    */
  def jacobiEigSym(a0: Array[Array[Double]],
                   maxSweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-30) {
            // classic symmetric Jacobi rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            // sign(0) must be +1 here: equal diagonal entries need the
            // full 45-degree rotation, not the identity
            val t = (if (theta >= 0) 1.0 else -1.0) /
              (math.abs(theta) + math.sqrt(theta * theta + 1))
            val cos = 1 / math.sqrt(t * t + 1)
            val sin = t * cos
            val tau = sin / (1 + cos)
            a(p)(p) -= t * apq
            a(q)(q) += t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var i = 0
            while (i < d) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = aip - sin * (aiq + tau * aip)
                a(i)(q) = aiq + sin * (aip - tau * aiq)
                a(p)(i) = a(i)(p); a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = vip - sin * (viq + tau * vip)
              v(i)(q) = viq + sin * (vip - tau * viq)
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
