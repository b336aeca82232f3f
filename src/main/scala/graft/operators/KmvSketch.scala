package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — MERGEABLE cardinality
  * for incremental corpus stats (Bar-Yossef et al. 2002; the sketch
  * behind theta sketches).
  *
  * The continuous-ingest problem: "distinct users/tokens/URLs per
  * group, updated per batch" — recomputing `COUNT(DISTINCT)` rescans
  * the whole corpus every batch, and HLL registers (the usual fix) are
  * implementation-defined, so results differ across engines and
  * versions. KMV keeps the k SMALLEST avalanche-hash values per group:
  *
  *   - estimate = (k−1) · 2^60 / h_(k) (the k-th minimum) — one IEEE
  *     division over exactly-representable integers, bit-identical on
  *     any engine (±~1/√(k−2) relative error);
  *   - merge(A, B) = bottom-k of A ∪ B — associative + commutative, so
  *     per-shard sketches at rest roll up without touching raw data;
  *   - below k distinct values the sketch IS the distinct set — exact.
  *
  * Everything (sketch content AND estimate) is a deterministic function
  * of the input via the md5 avalanche key, so the gate oracle replays
  * the whole sketch in SQL — a mergeable-sketch contract no
  * register-based sketch can offer.
  *
  * 100 TB shape: one shuffle on (group, hash) for the distinct, then a
  * k-bounded heap aggregate whose map-side partials are capped at k
  * rows per group — no window sort over the distinct set anywhere in
  * the plan. (For a single global group prefer a per-partition bottom-k
  * + driver merge; the grouped form is the corpus-stats shape.)
  */
object KmvSketch {

  /** Per-group KMV sketch: the k smallest DISTINCT hash values of
    * `valueCol`, ascending. Groups with fewer than k distinct values
    * keep them all (the exact regime).
    *
    * Shape: `distinct()` on (group, hash) is a hash aggregate that
    * combines map-side; the bottom-k is then the k-bounded heap
    * aggregate ([[graft.functions.expressions.TopKStructsAgg]]), whose
    * partial state is at most k rows per group per partition — no task
    * ever sorts a group's full distinct-hash set, so a hot group
    * (billions of distinct users under one event_type) costs
    * k·partitions shuffle rows, never its own size.
    */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
             k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (got $k)")
    val h = Sampling.avalancheKey(col(valueCol))
    // heap eval returns the structs already ascending by __h
    val bottomK = graft.functions.expressions.TopKExpressions
      .topKStructs(struct(col("__h")), k)
    df.select((groupCols.map(col) :+ h.as("__h")): _*)
      .distinct()
      .groupBy(groupCols.map(col): _*)
      .agg(transform(bottomK, s => s.getField("__h")).as("kmv"))
  }

  /** Distinct-count estimate from a sketch row: exact when the group
    * held fewer than k values, (k−1)·2^60/h_(k) otherwise.
    */
  def estimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toLong).cast("double") *
        lit(1152921504606846976L).cast("double") /
        element_at(kmv, k).cast("double"))

  /** Merge two sketch arrays: bottom-k of the distinct union — the
    * per-shard rollup.
    */
  def merge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Distinct-count estimate of the UNION of two sketched sets (the
    * merged sketch's estimate). With [[estimate]] on each side this
    * gives `|A∩B| ≈ estA + estB − estUnion` by inclusion–exclusion —
    * join-cardinality estimation from sketches alone, no join run. All
    * arithmetic stays in the exact-division regime, so the whole
    * estimator replays bit-identically in SQL.
    */
  def unionEstimate(a: Column, b: Column, k: Int): Column =
    estimate(merge(a, b, k), k)

  def intersectionEstimate(a: Column, b: Column, k: Int): Column =
    estimate(a, k) + estimate(b, k) - unionEstimate(a, b, k)
}
