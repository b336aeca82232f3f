package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group equi-depth bucketing — assign each row the quantile
  * bucket its value falls in (quartiles, deciles, …): the
  * feature-binning step before hashing/one-hot, and the DETERMINISTIC
  * alternative to `ntile`. `ntile` splits ties arbitrarily by row
  * order (two equal values can land in different tiles — no oracle,
  * no reproducibility across engines); cut-based bucketing is a pure
  * function of the VALUE, so equal values always share a bucket and
  * the whole assignment replays in SQL.
  *
  * `bucket = Σ_q [v > cut_q]` over the group's `nBuckets − 1` interior
  * exact percentile cuts — values at or below the first cut get 0,
  * values above the last get `nBuckets − 1`. Bucket POPULATIONS are
  * therefore only approximately equal in the presence of ties (the
  * tie mass goes wholly to one side) — that is the price of
  * determinism, and the honest semantics for a binned FEATURE.
  *
  * 100 TB shape, the [[Winsorize]] posture exactly: one
  * percentile-aggregation row per group broadcast back, the
  * assignment map-side; the exact percentile buffers a group's
  * distinct quantized values in one task (swap `approx = true` for
  * bounded G-K state at extreme scale — no oracle then, same shape).
  * Interpolated cuts are the a2/Winsorize-established parity surface
  * (Spark `percentile` ≡ DuckDB `QUANTILE_CONT`, dyadic-exact on
  * quantized values).
  */
object Bucketize {

  /** Append `<valueCol>_bucket` (int, 0-based) to every row; null
    * values get a null bucket. Cuts ride along as `__cut_1 …` for
    * inspection.
    */
  def equiDepth(df: DataFrame, groupCols: Seq[String], valueCol: String,
                nBuckets: Int, approx: Boolean = false,
                accuracy: Int = 10000): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000,
      s"nBuckets out of [2,1000]: $nBuckets")
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
    def pct(p: Double) =
      if (approx) percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .cast("double")
      else percentile(col(valueCol), lit(p))
    val cuts = df.groupBy(groupCols.map(col): _*)
      .agg(pct(qs.head).as("__cut_1"),
        qs.tail.zipWithIndex.map { case (q, i) =>
          pct(q).as(s"__cut_${i + 2}")
        }: _*)
    val bucket = (1 until nBuckets).map(i =>
      when(col(valueCol).cast("double") > col(s"__cut_$i"), 1)
        .otherwise(0)).reduce(_ + _)
    df.join(broadcast(cuts), groupCols)
      .withColumn(s"${valueCol}_bucket",
        when(col(valueCol).isNull, lit(null).cast("int"))
          .otherwise(bucket))
  }

  /** DuckDB replay of [[equiDepth]] for `rowsSql` yielding
    * `(groupCols…, v)` plus any pass-through columns listed in
    * `carryCols`.
    */
  def oracleSql(rowsSql: String, groupCols: Seq[String], nBuckets: Int,
                carryCols: Seq[String]): String = {
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cutDefs = qs.zipWithIndex.map { case (q, i) =>
      s"QUANTILE_CONT(v, $q) AS __cut_${i + 1}"
    }.mkString(", ")
    val g = groupCols.mkString(", ")
    val joinCond = if (groupCols.isEmpty) "TRUE"
      else groupCols.map(c => s"c.$c = r.$c").mkString(" AND ")
    val groupBy = if (groupCols.isEmpty) "" else s"GROUP BY $g"
    val bucket = (1 to nBuckets - 1).map(i =>
      s"(CASE WHEN r.v > c.__cut_$i THEN 1 ELSE 0 END)").mkString(" + ")
    // assemble the select list from non-empty fragments: a fixed
    // template leaves a dangling comma when groupCols or carryCols is
    // empty ("SELECT r.g, , CASE …")
    val sel = (groupCols.map("r." + _) ++ carryCols.map("r." + _) :+
      s"""CASE WHEN r.v IS NULL THEN NULL
              ELSE CAST($bucket AS INT) END AS v_bucket""").mkString(", ")
    s"""WITH rows_in AS ($rowsSql),
       cuts AS (SELECT ${if (g.isEmpty) "" else s"$g, "}$cutDefs
                FROM rows_in $groupBy)
       SELECT $sel
       FROM rows_in r JOIN cuts c ON $joinCond"""
  }
}
