package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact heavy hitters by sketch + confirm — "top-k most frequent items"
  * without a corpus-wide groupBy.
  *
  * The direct plan (`groupBy(item).count.orderBy.limit`) shuffles one
  * row per DISTINCT item; over 100 TB of tokens/URLs/hosts that is
  * billions of shuffle rows to answer a question about the top few
  * hundred. This operator runs the classic two-pass scheme instead:
  *
  *   1. CANDIDATES — a per-partition Misra–Gries summary with `counters`
  *      slots (one map pass, no shuffle, bounded memory). Any item
  *      absent from EVERY partition's summary has a per-partition count
  *      ≤ N_p/(counters+1), hence a global count ≤ N/(counters+1).
  *   2. CONFIRM — exact counts of the candidate set only: a broadcast
  *      semi-join prunes the corpus map-side (candidates ≤
  *      counters × partitions, tiny), then one aggregation whose
  *      shuffle is candidate-sized, then TakeOrdered for the top k.
  *
  * EXACTNESS CERTIFICATE: if the confirmed k-th count is strictly
  * greater than N/(counters+1), no non-candidate can reach the top k
  * (the step-1 bound), so the result provably equals the exact top-k —
  * which is what the gate oracle states. The certificate is CHECKED at
  * runtime: a corpus too flat for the configured `counters` fails
  * loudly with sizing guidance instead of silently returning an
  * approximation.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries survivor items (superset of every item
    * with global count > N/(counters+1)).
    */
  def candidates(items: DataFrame, itemCol: String, counters: Int): DataFrame = {
    require(counters > 0, s"counters must be positive (got $counters)")
    import items.sparkSession.implicits._
    items.select(col(itemCol).cast("string")).as[String]
      .mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { s =>
          counts.get(s) match {
            case Some(c) => counts(s) = c + 1
            case None if counts.size < counters => counts(s) = 1L
            case None =>
              // decrement-all step; items reaching zero free their slot
              val dead = List.newBuilder[String]
              counts.foreach { case (k, c) =>
                if (c == 1L) dead += k else counts(k) = c - 1
              }
              dead.result().foreach(counts.remove)
          }
        }
        counts.keysIterator
      }
      .toDF(itemCol).distinct()
  }

  /** Provably-exact top `k` (count DESC, item ASC) via candidates +
    * confirm. Throws when the exactness certificate fails — raise
    * `counters` (bound ≈ N / k-th frequency) and re-run.
    */
  /** The lazy confirm plan: exact counts of the candidate set only,
    * top k by (count DESC, item ASC). Exposed for plan audits; result
    * is only provably exact after [[topKExact]]'s certificate check.
    */
  def confirmTopK(items: DataFrame, itemCol: String, k: Int,
                  counters: Int): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val cand = candidates(items, itemCol, counters)
    items
      .join(broadcast(cand), Seq(itemCol), "left_semi")
      .groupBy(itemCol).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(itemCol))
      .limit(k)
  }

  def topKExact(items: DataFrame, itemCol: String, k: Int,
                counters: Int): DataFrame = {
    val top = confirmTopK(items, itemCol, k, counters).cache()
    // the top is ≤ k rows: collect it once (certificate + result), then
    // drop the cache — returning the cached frame would leak its blocks
    // for the app lifetime, and returning it uncached would recompute
    // the confirm pass on every downstream action
    val rows = try {
      val n = items.count()
      val collected = top.collect()
      require(collected.nonEmpty,
        "heavy-hitter certificate failed: no candidate survived the confirm " +
          s"pass (empty input, or corpus too flat for counters=$counters) " +
          "— raise `counters`")
      val kth = collected.iterator.map(_.getLong(1)).min
      require(kth > n / (counters + 1),
        s"heavy-hitter certificate failed: k-th count $kth is not above the " +
          s"Misra-Gries bound ${n / (counters + 1)} (N=$n, counters=$counters) " +
          "— a non-candidate could tie into the top k; raise `counters`")
      collected
    } finally top.unpersist()
    items.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), top.schema)
  }

  /** Per-GROUP Misra–Gries candidates: for every group, a superset of
    * the items with in-group count > N_g/(counters+1). One map-side-
    * combining aggregation ([[graft.functions.expressions.MisraGriesAgg]])
    * — each partition ships ≤ counters strings per group, a hot group
    * costs counters·partitions rows, never its token count. Null items
    * are excluded (absence, not a key).
    */
  def candidatesByGroup(items: DataFrame, groupCols: Seq[String],
                        itemCol: String, counters: Int): DataFrame =
    items.filter(col(itemCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.expressions.MisraGriesAgg
        .misraGries(col(itemCol).cast("string"), counters).as("__cands"))
      .select((groupCols.map(col) :+ explode(col("__cands")).as(itemCol)): _*)

  /** Provably-exact top `k` (count DESC, item ASC) WITHIN every group —
    * the per-domain boilerplate question ("the most frequent tokens per
    * source"), with the same sketch + confirm + certificate scheme as
    * the global [[topKExact]]:
    *
    *   1. per-group candidates via the bounded Misra–Gries aggregate;
    *   2. confirm: broadcast semi-join prunes the corpus to candidate
    *      (group, item) pairs, one candidate-sized aggregation counts
    *      them exactly, and the k-bounded [[graft.functions.expressions
    *      .TopKStructsAgg]] heap takes each group's top k (skew-safe —
    *      no rank window, no group ships to a single task);
    *   3. CERTIFICATE, per group and IN-PLAN: every returned row
    *      carries `cnt > N_g/(counters+1)` enforced by a codegen'd
    *      `raise_error` guard, and a group whose candidates all died
    *      resurfaces via the totals join with a null count — also fatal.
    *      The first action on a corpus too flat for `counters` aborts
    *      with sizing guidance instead of silently approximating.
    *
    * Output: groupCols…, item, cnt, group_rank (1 = most frequent).
    */
  def topKExactByGroup(items: DataFrame, groupCols: Seq[String],
                       itemCol: String, k: Int, counters: Int): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val nonNull = items.filter(col(itemCol).isNotNull)
    val cand = candidatesByGroup(items, groupCols, itemCol, counters)
    val joinCols = groupCols :+ itemCol
    val confirmed = nonNull
      .join(broadcast(cand), joinCols, "left_semi")
      .groupBy(joinCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    val top = graft.operators.Sampling.topKPerGroupSkewSafe(
      confirmed, groupCols,
      struct((-col("cnt")).as("__neg"), col(itemCol)), k)
    val totals = nonNull.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    // left join FROM totals: a group with no surviving row shows up as
    // a null cnt and fails the same guard (instead of silently
    // vanishing from the result)
    totals.join(top, groupCols, "left")
      .withColumn("cnt",
        when(col("cnt").isNull ||
            col("cnt") <= expr(s"__n DIV ${counters + 1}"),
          raise_error(concat(
            lit("heavy-hitter certificate failed for group ("),
            concat_ws(",", groupCols.map(c => col(c).cast("string")): _*),
            lit(s"): k-th count "),
            coalesce(col("cnt").cast("string"), lit("<no survivor>")),
            lit(" is not above the Misra-Gries bound N_g/(counters+1) with N_g="),
            col("__n").cast("string"),
            lit(s", counters=$counters - raise `counters`"))))
          .otherwise(col("cnt")))
      .drop("__n")
  }
}
