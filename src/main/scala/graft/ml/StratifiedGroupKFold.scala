package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** K6 — stratified group k-fold assignment: every group lands in exactly
  * one fold (spatially-correlated rows never straddle train/validation)
  * while each fold's stratum distribution tracks the global one (ref:
  * training/full_model_pipeline.py:126-172 uses sklearn's
  * `StratifiedGroupKFold(n_splits=10, shuffle=True)` stratifying on
  * `grid__k_region` and grouping on `grid__id_50km`;
  * setup/training_full.py:11-91 declares those columns).
  *
  * Distributed shape: the per-(group, stratum) counts are aggregated in
  * one map-side-combined groupBy — rows never leave the cluster — and only
  * the GROUP-LEVEL summary is collected. Groups here are 50 km cells
  * (thousands, not billions, even over a continental grid at 100 TB of
  * daily rows), so the greedy assignment is a driver-side loop over a
  * small array, exactly like the reference's in-memory sklearn call, and
  * the resulting group→fold map broadcast-joins back onto the big frame.
  *
  * Assignment mirrors sklearn's greedy algorithm: groups in decreasing
  * stratum-count spread, each placed on the fold that minimizes the mean
  * over strata of the std-dev across folds of (fold stratum count /
  * global stratum count), ties to the emptier fold. Instead of sklearn's
  * RNG shuffle, ties in the visit order break on xxhash64(group) — fully
  * deterministic across runs and cluster layouts, same contract (the
  * SURVEY documents seed-level divergence from the Python stack as
  * acceptable; the gate is distributional, not bit-wise).
  */
object StratifiedGroupKFold {

  /** Greedy group→fold assignment from group-level stratum counts.
    * `counts` rows are (group, stratumCounts) where the array is indexed
    * by a dense stratum id; returns fold per group, aligned with input.
    */
  private[ml] def assignGreedy(counts: Array[(Long, Array[Long])], k: Int): Map[Long, Int] = {
    val nStrata = if (counts.isEmpty) 0 else counts.head._2.length
    val total = new Array[Double](nStrata)
    counts.foreach { case (_, cs) =>
      var i = 0; while (i < nStrata) { total(i) += cs(i); i += 1 }
    }
    // visit spread-heaviest groups first (they are hardest to place);
    // tie-break on a hash of the group id for determinism without RNG
    def spread(cs: Array[Long]): Double = {
      if (nStrata == 0) return 0.0
      val m = cs.map(_.toDouble).sum / nStrata
      math.sqrt(cs.map(c => (c - m) * (c - m)).sum / nStrata)
    }
    val order = counts.sortBy { case (g, cs) =>
      (-spread(cs), scala.util.hashing.byteswap64(g))
    }
    val perFold = Array.fill(k, nStrata)(0.0)
    val foldSizes = new Array[Double](k)
    val out = Map.newBuilder[Long, Int]
    order.foreach { case (g, cs) =>
      var best = 0
      var bestEval = Double.MaxValue
      var bestSize = Double.MaxValue
      var f = 0
      while (f < k) {
        // eval = mean over strata of std across folds of the stratum's
        // normalized fold share, with this group tentatively on fold f
        var evalSum = 0.0
        var s = 0
        while (s < nStrata) {
          if (total(s) > 0) {
            var mean = 0.0
            var i = 0
            while (i < k) {
              val v = (perFold(i)(s) + (if (i == f) cs(s) else 0L)) / total(s)
              mean += v; i += 1
            }
            mean /= k
            var vsum = 0.0
            i = 0
            while (i < k) {
              val v = (perFold(i)(s) + (if (i == f) cs(s) else 0L)) / total(s)
              vsum += (v - mean) * (v - mean); i += 1
            }
            evalSum += math.sqrt(vsum / k)
          }
          s += 1
        }
        val eval = if (nStrata == 0) 0.0 else evalSum / nStrata
        if (eval < bestEval - 1e-12 ||
            (math.abs(eval - bestEval) <= 1e-12 && foldSizes(f) < bestSize)) {
          bestEval = eval; best = f; bestSize = foldSizes(f)
        }
        f += 1
      }
      var s = 0
      while (s < nStrata) { perFold(best)(s) += cs(s); s += 1 }
      foldSizes(best) += cs.sum
      out += g -> best
    }
    out.result()
  }

  /** Group→fold map as a small DataFrame (groupCol, __fold), suitable for
    * a broadcast join. Group and stratum columns may be any orderable
    * type; they are densely re-indexed internally.
    */
  /** Upper bound on collected (group × stratum) combinations. The greedy
    * assignment is inherently driver-side (it is sequential in the sorted
    * group order); the collect is GROUP-level, not row-level — pm25's
    * ~3.3k 50 km cells × 5 regions ≈ 16k rows — but the bound makes the
    * contract explicit so corpus-scale callers (e.g. millions of web
    * domains as groups) fail fast with guidance instead of OOMing the
    * driver.
    */
  val MaxGroupStratumCombos: Long = 5000000L

  def groupFolds(df: DataFrame, groupCol: String, stratumCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    // one distributed agg; collect is (groups × strata), group-level only
    val comboCount = df.select(col(groupCol), col(stratumCol)).distinct().count()
    require(comboCount <= MaxGroupStratumCombos,
      s"$comboCount (group × stratum) combinations exceed the driver-side " +
        s"bound $MaxGroupStratumCombos — stratified group k-fold collects " +
        "group-level counts to the driver by design; reduce group " +
        "cardinality (coarser grouping key) or raise the bound deliberately")
    val counts: Array[Row] = df
      .groupBy(col(groupCol).as("g"), col(stratumCol).as("s"))
      .agg(count(lit(1)).as("n"))
      .collect()
    val strata = counts.map(_.get(1)).distinct.sortBy(_.toString)
    val sIdx = strata.zipWithIndex.toMap
    // sorted like strata: dense group ids (and thus the greedy visit
    // tie-break, which hashes them) must not depend on collect() order,
    // which varies with partition layout
    val groups = counts.map(_.get(0)).distinct.sortBy(_.toString)
    val gIdx = groups.zipWithIndex.map { case (g, i) => g -> i.toLong }.toMap
    val perGroup = groups.map(g => gIdx(g) -> new Array[Long](strata.length)).toMap
    counts.foreach { r =>
      perGroup(gIdx(r.get(0)))(sIdx(r.get(1))) += r.getLong(2)
    }
    val folds = assignGreedy(
      groups.map(g => gIdx(g) -> perGroup(gIdx(g))), k)
    val rows = groups.map(g => Row(g, folds(gIdx(g))))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(groupCol).copy(name = groupCol),
      org.apache.spark.sql.types.StructField("__fold",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }

  /** Attach `__fold` by a broadcast join on the group column. */
  def withStratifiedFold(df: DataFrame, groupCol: String, stratumCol: String,
                         k: Int): DataFrame =
    df.join(broadcast(groupFolds(df, groupCol, stratumCol, k)), Seq(groupCol))
}
