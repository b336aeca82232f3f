package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AMS (Alon–Matias–Szegedy 1996) "tug-of-war" sketch of the second
  * frequency moment F₂ = Σ_v f(v)² — the self-join size, repetition
  * mass, and skew measure of a key column, from `depth` integers.
  *
  * Completes the sketch algebra next to [[CmsSketch]]: CMS's
  * inner-product estimate is ONE-SIDED (never under, collisions only
  * add), AMS is UNBIASED — each counter z_i = Σ_v s_i(v)·f(v) with
  * s_i(v) ∈ {−1,+1}, so E[z_i²] = F₂ exactly and the median over
  * `depth` counters concentrates. A corpus whose CMS self-join estimate
  * and AMS estimate diverge wildly is collision-saturated — the pair is
  * a built-in sanity check on sketch width.
  *
  * Engine-portable like the repo's other sketches: the sign is the low
  * bit of the md5 avalanche key of `value ∥ ':' ∥ i`
  * ([[Sampling.avalancheKey]]), each z_i an exact BIGINT (order-free
  * sum of ±1), the estimate the LOWER MEDIAN of the d squares — integer
  * arithmetic end to end, so the gate oracle replays every counter and
  * the median with zero float surface. (Squares of |z| ≤ N fit 64 bits
  * for N < 3·10⁹ per partition-group; ANSI mode makes any overflow
  * loud.)
  *
  * 100 TB shape: the build is ONE map-side-combined aggregation —
  * `groups × depth` output rows, the corpus never shuffles; merge is
  * counter-wise addition (a shard's z adds linearly), so per-shard
  * sketches at rest roll up exactly. With `groupCols`, one independent
  * sketch per group, same bounded shuffle.
  */
object AmsSketch {

  /** ±1 sign of `c` for counter `i`: low bit of avalanche(value:i). */
  private def sign(c: org.apache.spark.sql.Column, i: Int) =
    (pmod(Sampling.avalancheKey(concat(c.cast("string"), lit(s":$i"))),
      lit(2L)) * 2L - 1L)

  /** An AMS counter table plus its parameters: one row per
    * `(groupCols…, i)` holding the exact BIGINT counter `z`.
    */
  final case class Ams(cells: DataFrame, depth: Int,
                       groupCols: Seq[String] = Nil) {

    private def requireSameShape(other: Ams): Unit =
      require(depth == other.depth && groupCols == other.groupCols,
        s"AMS parameter mismatch: ($depth,$groupCols) vs " +
          s"(${other.depth},${other.groupCols}) — counters built under " +
          "different sign families cannot be combined")

    /** Counter-wise merge with a sketch of the SAME shape. */
    def merge(other: Ams): Ams = {
      requireSameShape(other)
      val merged = cells.unionByName(other.cells)
        .groupBy((groupCols :+ "i").map(col): _*)
        .agg(sum(col("z")).as("z"))
      Ams(merged, depth, groupCols)
    }

    /** F₂ (self-join size) estimate per group: the lower median of the
      * `depth` squared counters — `(groupCols…, f2_est)`, exact BIGINTs.
      */
    def f2Estimate(): DataFrame = {
      val med = element_at(sort_array(collect_list(col("z") * col("z"))),
        (depth - 1) / 2 + 1).as("f2_est")
      if (groupCols.isEmpty) cells.agg(med)
      else cells.groupBy(groupCols.map(col): _*).agg(med)
    }
  }

  /** Build the depth-counter sketch of `valueCol` (per group when
    * `groupCols` is non-empty). Null values are excluded. Counters for
    * an empty input are absent (no rows → no groups), matching the
    * other sketches' absence-is-zero convention.
    */
  def sketch(df: DataFrame, valueCol: String, depth: Int,
             groupCols: Seq[String] = Nil): Ams = {
    require(depth >= 1 && depth <= 64, s"depth out of range: $depth")
    val rows = df.filter(col(valueCol).isNotNull)
    val contribs = explode(array((0 until depth).map(i =>
      struct(lit(i).as("i"), sign(col(valueCol), i).as("s"))): _*))
    val table = rows.select((groupCols.map(col) :+ contribs.as("c")): _*)
      .groupBy((groupCols.map(col) :+ col("c.i").as("i")): _*)
      .agg(sum(col("c.s")).as("z"))
    Ams(table, depth, groupCols)
  }

  /** DuckDB replay of the counter table for `SELECT <groupCols…>, v`
    * rows from `valuesSql`: same salted sign, same per-(group, i) sum.
    */
  def cellsSql(valuesSql: String, depth: Int,
               groupCols: Seq[String] = Nil): String = {
    val g = groupCols.map(c => s"$c, ").mkString
    val gb = (groupCols :+ "i").mkString(", ")
    s"""SELECT $g i, CAST(SUM(${Sampling.avalancheKeySql(
         "CAST(v AS VARCHAR) || ':' || CAST(i AS VARCHAR)")} % 2 * 2 - 1)
         AS BIGINT) AS z
       FROM ($valuesSql) CROSS JOIN (SELECT unnest(range(0, $depth)) AS i)
       GROUP BY $gb"""
  }

  /** DuckDB replay of [[Ams.f2Estimate]] over a `cells` CTE. */
  def f2Sql(depth: Int, groupCols: Seq[String] = Nil): String = {
    val g = groupCols.map(c => s"$c, ").mkString
    val gb = if (groupCols.isEmpty) "" else
      s"GROUP BY ${groupCols.mkString(", ")}"
    s"""SELECT $g (LIST(z * z ORDER BY z * z))[${(depth - 1) / 2 + 1}]
         AS f2_est
       FROM cells $gb"""
  }
}
