package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog — the fixed-memory mergeable cardinality sketch
  * (Flajolet et al. 2007), completing the repo's cardinality pair:
  * [[KmvSketch]] keeps the k smallest hashes (k·8 bytes, supports
  * set-operation estimates), HLL keeps `m = 2^p` max-rank registers
  * (m bytes dense — the industry default for COUNT DISTINCT at 100 TB
  * because its size never grows past `m` no matter the cardinality).
  *
  * Register construction over the repo's shared 60-bit avalanche hash
  * ([[Sampling.avalancheKey]], md5-based — engine-portable):
  *
  *   bucket = h mod m
  *   w      = h div m                            (60−p usable bits)
  *   rho(w) = trailing-zeros(w) + 1, capped at 61−p when w = 0
  *   reg[bucket] = max over values of rho
  *
  * (Trailing-zero rank is the Flajolet–Martin orientation; its
  * distribution is the same geometric one as leading-zero rank and it
  * is exact-integer expressible on BOTH engines as
  * `bit_count((w & -w) - 1) + 1` — no float log anywhere.)
  *
  * Everything the estimator needs is integer-exact and
  * order-independent: registers are MAXes of per-row integers, the
  * harmonic mass `S = Σ_b 2^(R − reg[b])` (R = 61−p, empty registers
  * contribute 2^R) is a BIGINT sum of powers of two bounded by
  * m·2^R = 2^61 — so sketch content, merge results and `S` replay
  * bit-for-bit in the DuckDB oracle under any partitioning. The only
  * float is the final `est_raw = α_m·m²·2^R / S` — one IEEE division
  * over exactly-representable integers, identical on both engines —
  * and the small-range linear-counting correction `m·ln(m/V)`, whose
  * `ln` is the one not-bit-pinned operation (rounded to 4 decimals at
  * the gate, the house convention for transcendental outputs).
  *
  * The `p`/`groupCols` parameters travel with the sketch in the [[Hll]]
  * wrapper ([[CmsSketch.Cms]] contract): merging registers built under
  * different precisions would silently mix incompatible bucket spaces,
  * so mismatches fail loudly at plan time.
  *
  * 100 TB shape: the build is ONE map-side-combining max-aggregation —
  * each partition emits at most groups×m register rows however large
  * the corpus (the hash agg folds same-bucket rows before the
  * exchange); merge is a register-wise max over two sketch-sized
  * tables; estimation is a bounded per-group fold over the registers —
  * there is no probe join, no broadcast, nothing corpus-sized past the
  * first scan.
  */
object HllSketch {

  /** HLL register table plus its build parameters. `registers` holds
    * one row per NON-EMPTY bucket: `(groupCols…, bucket, reg)`; absent
    * buckets are zero (the estimator accounts them V empty registers).
    */
  final case class Hll(registers: DataFrame, p: Int,
                       groupCols: Seq[String] = Nil) {
    private val m: Int = 1 << p
    private val capRho: Int = 61 - p

    private def requireSameShape(other: Hll): Unit =
      require(p == other.p && groupCols == other.groupCols,
        s"HLL parameter mismatch: ($p,$groupCols) vs " +
          s"(${other.p},${other.groupCols}) — merging registers from " +
          "different precisions mixes incompatible bucket spaces")

    /** Register-wise max with a sketch of the SAME shape — the
      * per-shard rollup; the agg never exceeds groups×m groups.
      */
    def merge(other: Hll): Hll = {
      requireSameShape(other)
      val merged = registers.unionByName(other.registers)
        .groupBy((groupCols :+ "bucket").map(col): _*)
        .agg(max(col("reg")).as("reg"))
      Hll(merged, p, groupCols)
    }

    /** Cardinality estimate per group (one global row when ungrouped):
      * `(groupCols…, n_buckets, v_empty, s_mass, est_raw, est)` where
      * `s_mass` is the exact harmonic mass Σ 2^(R−reg) (BIGINT),
      * `est_raw` the raw HLL estimate α_m·m²·2^R / s_mass, and `est`
      * applies the standard small-range correction (linear counting
      * `m·ln(m/V)` when V > 0 and est_raw ≤ 2.5m). α_m uses the
      * asymptotic `0.7213/(1 + 1.079/m)` at every precision — at p ≤ 6
      * the tabulated constants (0.673/0.697/0.709) differ from it by
      * < 2%, inside the 1.04/√m standard error the spec envelope pins;
      * one formula keeps the oracle replay a single expression.
      */
    def estimate(): DataFrame = {
      val term = expr(s"shiftleft(CAST(1 AS BIGINT), $capRho - reg)")
      // coalesce: an EMPTY register table (nothing sketched) must yield
      // s_mass = m·2^R and est = m·ln(m/m) = 0, not a NULL row
      val aggd =
        if (groupCols.isEmpty)
          registers.agg(count(lit(1)).as("n_buckets"),
            coalesce(sum(term), lit(0L)).as("__s"))
        else
          registers.groupBy(groupCols.map(col): _*)
            .agg(count(lit(1)).as("n_buckets"),
              coalesce(sum(term), lit(0L)).as("__s"))
      val vEmpty = (lit(m.toLong) - col("n_buckets")).as("v_empty")
      val sMass = (col("__s") +
        (lit(m.toLong) - col("n_buckets")) *
          lit(1L << capRho)).as("s_mass")
      val md = m.toDouble
      val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(md))
      val withMass = aggd.select(
        (groupCols.map(col) :+ col("n_buckets") :+ vEmpty :+ sMass): _*)
      val estRaw = alpha * lit(md) * lit(md) *
        lit((1L << capRho).toDouble) / col("s_mass").cast("double")
      withMass
        .withColumn("est_raw", estRaw)
        .withColumn("est",
          when(col("v_empty") > 0 && col("est_raw") <= lit(2.5) * lit(md),
            lit(md) * log(lit(md) / col("v_empty").cast("double")))
            .otherwise(col("est_raw")))
    }
  }

  /** Build the register table of distinct `valueCol` values — one
    * sketch per group when `groupCols` is non-empty. Nulls are excluded
    * (absence, not a key).
    */
  def sketch(df: DataFrame, valueCol: String, p: Int,
             groupCols: Seq[String] = Nil): Hll = {
    require(p >= 4 && p <= 16, s"precision out of range: $p")
    val m = 1L << p
    val capRho = 61 - p
    val rows = df.filter(col(valueCol).isNotNull)
    val h = Sampling.avalancheKey(col(valueCol).cast("string"))
    val built = rows
      .withColumn("__h", h)
      .withColumn("bucket", bucketOf(col("__h"), p))
      .withColumn("__w", expr(s"__h div $m"))
      .withColumn("__rho", rhoOf(col("__w"), capRho))
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("__rho")).as("reg"))
    Hll(built, p, groupCols)
  }

  /** Register bucket of the avalanche hash column `h` at precision
    * `p` — shared with the streaming twin so the two register
    * constructions cannot drift apart.
    */
  def bucketOf(h: Column, p: Int): Column = pmod(h, lit((1L << p)))

  /** rho(w): trailing-zero rank + 1, capped for w = 0 — exact-integer
    * on both engines (`bit_count((w & -w) - 1) + 1`). Shared with the
    * streaming twin (stream-vs-batch register parity needs one tree).
    */
  def rhoOf(w: Column, capRho: Int): Column =
    when(w === 0L, lit(capRho))
      .otherwise(bit_count(w.bitwiseAND(-w) - 1) + lit(1))
      .cast("int")

  /** DuckDB SQL fragments mirroring the build, for oracle assembly:
    * the register CTE body over `valuesSql` (must SELECT the group
    * columns and a `v` value column, non-null).
    */
  def registersSql(valuesSql: String, p: Int, groupCols: Seq[String]): String = {
    val m = 1L << p
    val capRho = 61 - p
    val g = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ", ")
    val gb = if (groupCols.isEmpty) "1" else
      (1 to (groupCols.size + 1)).mkString(", ")
    s"""SELECT $g bucket,
         MAX(CASE WHEN w = 0 THEN $capRho
             ELSE CAST(bit_count((w & -w) - 1) + 1 AS INT) END) AS reg
       FROM (
         SELECT $g h % $m AS bucket, h // $m AS w
         FROM (SELECT $g ${Sampling.avalancheKeySql("v")} AS h
               FROM ($valuesSql)))
       GROUP BY $gb"""
  }

  /** DuckDB estimate SQL over a register CTE named `regs`: same
    * columns and expression trees as [[Hll.estimate]] (`est`'s `ln` is
    * the one transcendental — gate queries round it per the house
    * convention).
    */
  def estimateSql(p: Int, groupCols: Seq[String]): String = {
    val m = 1L << p
    val md = s"CAST($m AS DOUBLE)"
    val capRho = 61 - p
    val g = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ", ")
    val gb = if (groupCols.isEmpty) "" else
      "GROUP BY " + (1 to groupCols.size).mkString(", ")
    s"""SELECT $g n_buckets, v_empty, s_mass, est_raw,
         CASE WHEN v_empty > 0 AND est_raw <= 2.5 * $md
              THEN $md * LN($md / CAST(v_empty AS DOUBLE))
              ELSE est_raw END AS est
       FROM (
         SELECT $g
           CAST(n_buckets AS BIGINT) AS n_buckets,
           CAST($m - n_buckets AS BIGINT) AS v_empty,
           CAST(s_occ + ($m - n_buckets) * (CAST(1 AS BIGINT) << $capRho) AS BIGINT) AS s_mass,
           (0.7213 / (1.0 + 1.079 / $md)) * $md * $md
             * CAST(CAST(1 AS BIGINT) << $capRho AS DOUBLE)
             / CAST(s_occ + ($m - n_buckets) * (CAST(1 AS BIGINT) << $capRho) AS DOUBLE) AS est_raw
         FROM (
           SELECT $g COUNT(*) AS n_buckets,
             COALESCE(SUM(CAST(1 AS BIGINT) << ($capRho - reg)), 0) AS s_occ
           FROM regs $gb))"""
  }
}
