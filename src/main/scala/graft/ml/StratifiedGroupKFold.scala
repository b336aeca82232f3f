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
  * global stratum count), ties broken by (emptier fold, lower fold id).
  * Instead of sklearn's RNG shuffle, ties in the visit order break on
  * `md5(group.toString)` — fully deterministic across runs and cluster
  * layouts, same contract (the SURVEY documents seed-level divergence
  * from the Python stack as acceptable; the gate is distributional, not
  * bit-wise). Every floating-point reduction folds in a FIXED order
  * (strata in string order, folds 0..k-1), so the whole assignment is a
  * pure function of the (group, stratum, count) table — the
  * `k6_fold_assignment` gate replays it step-for-step in a DuckDB
  * recursive CTE and matches bit-exactly.
  */
object StratifiedGroupKFold {

  /** Greedy group→fold assignment from group-level stratum counts.
    * `counts` rows are (tieKey, stratumCounts) where `tieKey` is the
    * group's visit-order tie-break string (md5 of the group's string
    * form) and the array is indexed by a dense stratum id; returns the
    * fold per input position.
    *
    * Fully deterministic, SQL-replayable arithmetic: counts stay
    * integral until the one division by the stratum total, reductions
    * fold in fixed (stratum, fold-id) order, and the best fold is the
    * exact lexicographic min of (eval, foldSize, foldId) — both engines
    * produce bit-identical doubles, so no epsilon is needed.
    */
  private[ml] def assignGreedy(counts: Array[(String, Array[Long])], k: Int): Array[Int] = {
    val nStrata = if (counts.isEmpty) 0 else counts.head._2.length
    val total = new Array[Long](nStrata)
    counts.foreach { case (_, cs) =>
      var i = 0; while (i < nStrata) { total(i) += cs(i); i += 1 }
    }
    // visit spread-heaviest groups first (they are hardest to place);
    // tie-break on md5 of the group's string form — deterministic
    // without RNG and computable in any SQL engine
    def spread(cs: Array[Long]): Double = {
      if (nStrata == 0) return 0.0
      val m = cs.sum.toDouble / nStrata
      var s2 = 0.0
      var s = 0
      while (s < nStrata) { val d = cs(s) - m; s2 += d * d; s += 1 }
      math.sqrt(s2 / nStrata)
    }
    val order = counts.indices.sortBy(ix => (-spread(counts(ix)._2), counts(ix)._1))
    val perFold = Array.fill(k, nStrata)(0L)
    val foldSizes = new Array[Long](k)
    val out = new Array[Int](counts.length)
    order.foreach { ix =>
      val cs = counts(ix)._2
      var best = 0
      var bestEval = Double.MaxValue
      var bestSize = Long.MaxValue
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
              val v = (perFold(i)(s) + (if (i == f) cs(s) else 0L)).toDouble / total(s)
              mean += v; i += 1
            }
            mean /= k
            var vsum = 0.0
            i = 0
            while (i < k) {
              val v = (perFold(i)(s) + (if (i == f) cs(s) else 0L)).toDouble / total(s)
              vsum += (v - mean) * (v - mean); i += 1
            }
            evalSum += math.sqrt(vsum / k)
          }
          s += 1
        }
        val eval = if (nStrata == 0) 0.0 else evalSum / nStrata
        // exact lexicographic (eval, size, foldId) — fold 0 wins full ties
        if (eval < bestEval ||
            (eval == bestEval && foldSizes(f) < bestSize)) {
          bestEval = eval; best = f; bestSize = foldSizes(f)
        }
        f += 1
      }
      var s = 0
      while (s < nStrata) { perFold(best)(s) += cs(s); s += 1 }
      foldSizes(best) += cs.sum
      out(ix) = best
    }
    out
  }

  /** md5 hex of a value's string form — the visit-order tie-break,
    * chosen because every SQL engine can replay it (`md5(CAST(g AS
    * VARCHAR))`).
    */
  private[ml] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

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
    // stratum/group dense order is by string form — collect() order
    // (which varies with partition layout) must not leak into the
    // greedy's arithmetic or visit order
    val strata = counts.map(_.get(1)).distinct.sortBy(_.toString)
    val sIdx = strata.zipWithIndex.toMap
    val groups = counts.map(_.get(0)).distinct.sortBy(_.toString)
    val gIdx = groups.zipWithIndex.toMap
    val perGroup = Array.fill(groups.length)(new Array[Long](strata.length))
    counts.foreach { r =>
      perGroup(gIdx(r.get(0)))(sIdx(r.get(1))) += r.getLong(2)
    }
    val folds = assignGreedy(
      groups.zipWithIndex.map { case (g, ix) =>
        md5Hex(g.toString) -> perGroup(ix)
      }, k)
    val rows = groups.zipWithIndex.map { case (g, ix) => Row(g, folds(ix)) }
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
