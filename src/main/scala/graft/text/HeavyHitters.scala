package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.expressions.MisraGriesAgg.misraGries

/** Exact heavy hitters by sketch + confirm — "top-k most frequent items"
  * without a corpus-wide groupBy.
  *
  * The direct plan (`groupBy(item).count.orderBy.limit`) shuffles one
  * row per DISTINCT item; over 100 TB of tokens/URLs/hosts that is
  * billions of shuffle rows to answer a question about the top few
  * hundred. This operator runs the classic two-pass scheme instead:
  *
  *   1. CANDIDATES — a bounded Misra–Gries summary with `counters`
  *      slots ([[graft.functions.expressions.MisraGriesAgg]]: partial
  *      per partition, mergeable-summaries combine — one map pass,
  *      candidate-sized shuffle, bounded memory). The total decrement
  *      over any update/merge tree is ≤ N/(counters+1), so any item
  *      absent from the final summary has global count ≤ N/(counters+1).
  *      The summary also reports whether ANY decrement ran: if none
  *      did, the candidate set is the COMPLETE distinct-item set.
  *   2. CONFIRM — exact counts of the candidate set only: a broadcast
  *      semi-join prunes the corpus map-side (candidates ≤ `counters`,
  *      tiny), then one aggregation whose shuffle is candidate-sized,
  *      then TakeOrdered for the top k.
  *
  * EXACTNESS CERTIFICATE, checked at runtime — the result is provably
  * the exact top-k when EITHER
  *   - no decrement ever ran (candidates = every distinct item, so the
  *     confirm pass counted the whole domain exactly — this also covers
  *     a domain with fewer than k items, where fewer than k rows is the
  *     exact answer), OR
  *   - k rows came back and the k-th confirmed count is strictly above
  *     N/(counters+1) (no non-candidate can reach the top k).
  * Anything else — fewer than k rows after an eviction (ranks m+1..k
  * could hide among the evicted), or a k-th count at or below the bound
  * — fails loudly with sizing guidance instead of silently returning an
  * approximation. Null items are excluded throughout (absence, not a
  * key); N is the non-null count.
  */
object HeavyHitters {

  /** Rows above this many candidate rows are not broadcast-hinted in
    * the grouped confirm join: at web-scale group cardinality
    * (millions of groups × `counters`) the candidate set outgrows the
    * driver/broadcast budget, so the join falls back to a shuffled
    * semi-join (AQE still upgrades it back to broadcast at runtime if
    * the measured size allows).
    */
  val DefaultMaxBroadcastCandidates: Long = 4L * 1000 * 1000

  /** The global Misra–Gries candidate items — a superset of every item
    * with count > N/(counters+1) (the mergeable-summaries bound over
    * the whole update/merge tree, partition layout notwithstanding).
    */
  def candidates(items: DataFrame, itemCol: String, counters: Int): DataFrame = {
    require(counters > 0, s"counters must be positive (got $counters)")
    items.filter(col(itemCol).isNotNull)
      .agg(misraGries(col(itemCol).cast("string"), counters).as("__mg"))
      .select(explode(col("__mg.items")).as(itemCol))
  }

  /** The lazy confirm plan: exact counts of the candidate set only,
    * top k by (count DESC, item ASC). Exposed for plan audits; result
    * is only provably exact after [[topKExact]]'s certificate check.
    * The candidate broadcast here is unconditionally safe: the global
    * candidate set is ≤ `counters` rows by construction.
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

  /** Provably-exact top `k` (count DESC, item ASC) via candidates +
    * confirm. Throws when the exactness certificate fails — raise
    * `counters` (bound ≈ N / k-th frequency) and re-run. Runs two
    * corpus passes: one aggregation collecting N, the candidate set
    * (≤ `counters` strings) and the eviction flag to the driver, then
    * the confirm count against the candidate local relation.
    */
  def topKExact(items: DataFrame, itemCol: String, k: Int,
                counters: Int): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val spark = items.sparkSession
    import spark.implicits._
    val nonNull = items.filter(col(itemCol).isNotNull)
    val summary = nonNull
      .agg(count(lit(1)).as("__n"),
        misraGries(col(itemCol).cast("string"), counters).as("__mg"))
      .head()
    val n = summary.getLong(0)
    require(n > 0,
      "heavy-hitter certificate failed: empty input (no non-null items)")
    val mg = summary.getStruct(1)
    val candItems = mg.getSeq[String](0)
    val evicted = mg.getBoolean(1)
    val cand = candItems.toDF(itemCol)
    val top = nonNull
      .join(broadcast(cand), Seq(itemCol), "left_semi")
      .groupBy(itemCol).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(itemCol))
      .limit(k)
    val collected = top.collect()
    if (evicted) {
      require(collected.length >= k,
        s"heavy-hitter certificate failed: only ${collected.length} of $k " +
          s"rows survived and Misra-Gries evictions ran (counters=$counters) " +
          "— ranks beyond those returned may hide among the evicted items; " +
          "raise `counters`")
      val kth = collected.iterator.map(_.getLong(1)).min
      require(kth > n / (counters + 1),
        s"heavy-hitter certificate failed: k-th count $kth is not above the " +
          s"Misra-Gries bound ${n / (counters + 1)} (N=$n, counters=$counters) " +
          "— a non-candidate could tie into the top k; raise `counters`")
    }
    // !evicted: the candidate set is the complete distinct-item set, so
    // the confirm pass counted the whole domain exactly — the top-m
    // result (m ≤ k) is exact unconditionally.
    spark.createDataFrame(java.util.Arrays.asList(collected: _*), top.schema)
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
      .agg(misraGries(col(itemCol).cast("string"), counters).as("__mg"))
      .select((groupCols.map(col) :+ explode(col("__mg.items")).as(itemCol)): _*)

  /** The grouped top-k result plus its planning facts and the release
    * handle for the bounded candidate cache (the
    * [[graft.operators.BloomJoin.Pruned]] idiom). `candidateRows` is
    * the measured candidate-set size that decided `broadcastConfirm`.
    * Call `release()` after the last action on `df` — the cache
    * (≤ groups × counters strings, spilled to disk when large) is
    * otherwise held by the session's cache manager for the app
    * lifetime.
    */
  final case class GroupedTopK(df: DataFrame, candidateRows: Long,
                               broadcastConfirm: Boolean,
                               private val candidateCache: DataFrame) {
    def release(): Unit = { candidateCache.unpersist(); () }
  }

  /** Provably-exact top `k` (count DESC, item ASC) WITHIN every group —
    * the per-domain boilerplate question ("the most frequent tokens per
    * source"), with the same sketch + confirm + certificate scheme as
    * the global [[topKExact]]:
    *
    *   1. per-group candidates via the bounded Misra–Gries aggregate,
    *      computed ONCE and persisted (the cache is candidate-sized:
    *      ≤ groups × counters strings);
    *   2. confirm: a semi-join prunes the corpus to candidate
    *      (group, item) pairs, one candidate-sized aggregation counts
    *      them exactly, and the k-bounded [[graft.functions.expressions
    *      .TopKStructsAgg]] heap takes each group's top k (skew-safe —
    *      no rank window, no group ships to a single task). The
    *      candidate side carries a `broadcast` hint only when its
    *      MEASURED row count is ≤ `maxBroadcastCandidates`: a
    *      web-scale group domain (millions of groups × counters) would
    *      otherwise OOM the driver, so past the cap the hint is
    *      dropped and the join shuffles (AQE still upgrades it back if
    *      the runtime size allows);
    *   3. CERTIFICATE, per group and IN-PLAN, via a codegen'd
    *      `raise_error` guard. A group's rows pass when EITHER no
    *      Misra–Gries decrement ever ran for the group (its candidate
    *      set is the complete distinct-item set, so the confirmed
    *      top-m — even m < k for a small domain — is exact), OR the
    *      group yielded all k rows with every confirmed count strictly
    *      above N_g/(counters+1). After an eviction, fewer than k rows
    *      (ranks m+1..k could hide among the evicted), a count at or
    *      below the bound, or a group whose candidates all died
    *      (resurfaced by the totals join with a null count) each abort
    *      the FIRST action with sizing guidance — never a silent
    *      approximation.
    *
    * Output: groupCols…, item, cnt, group_rank (1 = most frequent).
    *
    * This convenience overload leaves the candidate cache to the
    * session cache manager; callers running many grouped top-k passes
    * in one long-lived session should use [[topKExactByGroupPlanned]]
    * and `release()` it after the downstream action.
    */
  def topKExactByGroup(items: DataFrame, groupCols: Seq[String],
                       itemCol: String, k: Int, counters: Int,
                       maxBroadcastCandidates: Long =
                         DefaultMaxBroadcastCandidates): DataFrame =
    topKExactByGroupPlanned(items, groupCols, itemCol, k, counters,
      maxBroadcastCandidates).df

  /** [[topKExactByGroup]] with the planning facts and the candidate-
    * cache release handle. Eager up to the candidate pass: the one
    * corpus Misra–Gries aggregation runs (and is persisted) when this
    * is called, so the candidate-set size can pick the join strategy;
    * the confirm plan itself stays lazy.
    */
  def topKExactByGroupPlanned(items: DataFrame, groupCols: Seq[String],
                              itemCol: String, k: Int, counters: Int,
                              maxBroadcastCandidates: Long =
                                DefaultMaxBroadcastCandidates): GroupedTopK = {
    require(k > 0, s"k must be positive (got $k)")
    val nonNull = items.filter(col(itemCol).isNotNull)
    val raw = nonNull
      .groupBy(groupCols.map(col): _*)
      .agg(misraGries(col(itemCol).cast("string"), counters).as("__mg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the single corpus MG pass runs here; everything below reads the
    // bounded cached summary
    val candRows = raw
      .agg(coalesce(sum(size(col("__mg.items"))), lit(0L))).head().getLong(0)
    val useBroadcast = candRows <= maxBroadcastCandidates
    val cand = raw.select(
      (groupCols.map(col) :+ explode(col("__mg.items")).as(itemCol)): _*)
    val candSide = if (useBroadcast) broadcast(cand) else cand
    val joinCols = groupCols :+ itemCol
    val confirmed = nonNull
      .join(candSide, joinCols, "left_semi")
      .groupBy(joinCols.map(col): _*).agg(count(lit(1)).as("cnt"))
    val top = graft.operators.Sampling.topKPerGroupSkewSafeCounted(
      confirmed, groupCols,
      struct((-col("cnt")).as("__neg"), col(itemCol)), k)
    // per-group eviction flags: one candidate-sized row per group
    val flags = raw.select(
      (groupCols.map(col) :+ col("__mg.evicted").as("__ev")): _*)
    val totals = nonNull.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    // left join FROM totals: a group with no surviving row shows up as
    // a null cnt and fails the same guard (instead of silently
    // vanishing from the result)
    val guarded = totals.join(top, groupCols, "left")
      .join(if (useBroadcast) broadcast(flags) else flags, groupCols, "left")
      .withColumn("cnt",
        when(coalesce(col("__ev"), lit(true)) &&
            (col("cnt").isNull || col("group_k") < k ||
              col("cnt") <= expr(s"__n DIV ${counters + 1}")),
          raise_error(concat(
            lit("heavy-hitter certificate failed for group ("),
            concat_ws(",", groupCols.map(c => col(c).cast("string")): _*),
            lit("): Misra-Gries evictions ran and "),
            when(col("cnt").isNull, lit("no candidate survived the confirm pass"))
              .when(col("group_k") < k, concat(
                lit("only "), col("group_k").cast("string"),
                lit(s" of $k rows survived - ranks beyond those returned may hide among the evicted items")))
              .otherwise(concat(
                lit("count "), col("cnt").cast("string"),
                lit(" is not above the bound N_g/(counters+1) with N_g="),
                col("__n").cast("string"))),
            lit(s", counters=$counters - raise `counters`"))))
          .otherwise(col("cnt")))
      .drop("__n", "__ev", "group_k")
    GroupedTopK(guarded, candRows, useBroadcast, raw)
  }
}
