package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.TestSpark

/** Plan-shape regression tests: the scale arguments each operator's
  * scaladoc makes are asserted against the actual physical plan, so a
  * refactor that silently reintroduces a shuffle (or drops a broadcast,
  * or un-pushes the Bloom probe) fails CI rather than a 100 TB run.
  * Counts are structural lower/upper bounds, not golden plans — AQE and
  * Catalyst version drift may renumber nodes but not add exchanges.
  */
class PlanHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def shuffles(df: DataFrame): Int = {
    // materialize so AQE finalizes its plan, then count the exchanges the
    // run actually executed
    df.count()
    val plan = df.queryExecution.executedPlan
    def strip(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children ++ other.subqueries
    }
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeExec => 1; case _ => 0 }
      self + strip(p).map(count).sum
    }
    count(plan)
  }

  test("NDCG: one corpus aggregation, no rank window, no self-join") {
    val df = graft.SparkEntry.queries("a_ndcg")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Window"),
      s"per-query top-k must use the k-bounded heap, not a rank window:\n$s")
    assert(!"(?i)sortmergejoin|broadcasthashjoin".r.findFirstIn(s).isDefined,
      s"both orders ride one aggregation — no join reassembles them:\n$s")
    // one corpus exchange (the groupBy) + one for the output orderBy
    assert(shuffles(df) <= 2, s"NDCG grew extra exchanges:\n$s")
  }

  test("calibration summary: one corpus shuffle to the bin table") {
    val df = graft.SparkEntry.queries("a_brier_ece")(spark, sf)
    assert(shuffles(df) <= 2) // bin agg + 1-row rollup
  }

  test("decomposed prefix sums: AUC/Spearman plan range partitioning") {
    Seq("a_roc_auc", "a_spearman").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sf)
      df.count()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("rangepartitioning"),
        s"$q should run its prefix sum range-decomposed:\n$s")
    }
  }

  test("chunking is map-side: only the final orderBy shuffles") {
    val df = graft.SparkEntry.queries("t_chunk_windows")(spark, sf)
    assert(shuffles(df) <= 1)
  }

  test("vocab top-k has one count shuffle and no global sort exchange") {
    val df = graft.SparkEntry.queries("t_vocab_topk")(spark, sf)
    // partial agg → 1 exchange → final agg → TakeOrdered (no sort shuffle)
    assert(shuffles(df) <= 1)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"))
  }

  test("incremental dedup probes the bloom filter natively, map-side") {
    val df = graft.SparkEntry.queries("dedup_incremental")(spark, sf)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("bloom_probe"),
      "bloom probe should be the codegen'd broadcast-backed BloomProbeExpr " +
        "(a plan-literal might_contain would embed the whole bit array)")
  }

  test("decontamination broadcasts the eval grams — corpus never shuffles whole") {
    val df = graft.SparkEntry.queries("t_decontaminate")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"))
  }

  test("brute-force ANN broadcasts queries; corpus side has no join shuffle") {
    val df = graft.SparkEntry.queries("ann_topk_brute")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"))
  }

  test("two-year-slice mean: one daily-agg shuffle feeds window + output sort") {
    // the slice filter must stay ABOVE the user_id window (filtering on
    // day would change the aggregate's input — the W4 semantic); the
    // whole query needs only the daily groupBy exchange, the window's
    // user_id exchange, and the output sort
    val df = graft.SparkEntry.queries("w4_two_year_slice_mean")(spark, sf)
    assert(shuffles(df) <= 3)
  }

  test("cross-month carry: union does not double the window exchange") {
    // prev/cur derive from the same daily agg; the union feeds ONE
    // user_id window partitioning — a plan that shuffles each branch
    // separately before the union would pay the dominant exchange twice
    val df = graft.SparkEntry.queries("w5_cross_month_carry")(spark, sf)
    assert(shuffles(df) <= 4)
  }

  test("share-imputed: pruned predictor windows add no extra exchange") {
    // attach() defines 3 window families (date share, grid_id r7d) plus
    // cast columns, but the query selects only flag/imputed/score/share —
    // the grid_id rolling window must prune out of the executed plan,
    // leaving the date window exchange + output sort
    val df = graft.SparkEntry.queries("a5_share_imputed")(spark, sf)
    assert(shuffles(df) <= 2)
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("__imputed_r7d"),
      "unselected rolling-mean window should be pruned from the plan")
  }

  test("ngram LM scoring: model joins broadcast, corpus shuffles once on doc_id") {
    val df = graft.SparkEntry.queries("t_ngram_lm_ppl")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"),
      "bigram/context count tables must broadcast, not shuffle-join the corpus")
    // 2 trusted-slice-bounded model-build aggs (inside the broadcast
    // subtrees) + the doc_id agg + output sort; the corpus itself
    // exchanges only once, on doc_id
    assert(shuffles(df) <= 4)
  }

  test("DSIR scoring: weight table broadcasts; one doc_id agg + rank + sort") {
    val df = graft.SparkEntry.queries("t_dsir_select")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"))
    // numBuckets-bounded weight-build aggs (2) live inside the broadcast
    // subtree; corpus-scale exchanges are the doc_id agg, the
    // single-partition row_number rank (one row per DOC — the documented
    // ≤10⁹ limit; keptByThreshold is the beyond path), and the sort
    assert(shuffles(df) <= 6)
  }

  test("as-of join is the union-window plan: no join operator, bounded exchanges") {
    val df = graft.SparkEntry.queries("j_asof_join")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("SortMergeJoin") && !s.contains("NestedLoopJoin"),
      "as-of must not plan a join (the theta-join blowup is the thing it avoids)")
    // union's key shuffle + output sort (AQE may split the sort exchange)
    assert(shuffles(df) <= 3)
  }

  test("range join equi-joins on (key, bucket): no nested-loop fallback") {
    val df = graft.SparkEntry.queries("j_range_join")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("NestedLoopJoin"),
      "bucketed range join must stay an equi-join on (key, bucket)")
  }

  test("sessionize: lag, running sum, and rollup share ONE user shuffle") {
    val df = graft.SparkEntry.queries("w_sessionize")(spark, sf)
    // user_id exchange (both windows + the group-by reuse it) + output sort
    assert(shuffles(df) <= 3)
  }

  test("funnel: the fold replaces the per-step join cascade") {
    val df = graft.SparkEntry.queries("w_funnel")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("SortMergeJoin"),
      "funnel must not join the fact table per step")
    // the user_id collect_list exchange + output sort
    assert(shuffles(df) <= 2)
  }

  test("retention: cohort assignment + tagging + distinct stay bounded") {
    val df = graft.SparkEntry.queries("w_retention")(spark, sf)
    // key agg, join, (cohort, offset) distinct agg (2 exchanges for
    // exact distinct), output sort
    assert(shuffles(df) <= 6)
  }

  test("audio decode is partition-local: synth + parse add no shuffle") {
    val df = graft.SparkEntry.queries("mm_audio_meta")(spark, sf)
    // only the output orderBy exchanges
    assert(shuffles(df) <= 1)
  }

  test("bloom semi-reduce: native probe filters the fact side before the join") {
    val df = graft.SparkEntry.queries("j_bloom_semi_reduce")(spark, sf)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("bloom_probe"),
      "the broadcast-variable BloomProbeExpr must prune map-side")
    // agg + join + output sort: the pruned fact never shuffles twice
    assert(shuffles(df) <= 4)
  }

  test("heavy hitters: candidates confirm via broadcast semi-join") {
    val toks = graft.core.Tables.table(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        graft.text.CorpusStats.tokens(
          org.apache.spark.sql.functions.col("text"))).as("token"))
    // confirmTopK is the lazy plan topKExact certifies-then-collects
    // (topKExact itself returns a collected k-row local relation)
    val top = graft.text.HeavyHitters.confirmTopK(toks, "token",
      k = 10, counters = 1024)
    val s = top.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      "the candidate set must broadcast, never shuffle the corpus for it")
    assert(s.contains("TakeOrderedAndProject"), "top-k must avoid a global sort")
  }

  test("priority sample resolves with TakeOrdered, no global sort exchange") {
    val docs = graft.core.Tables.table(spark, sf, "documents")
    val df = graft.operators.Sampling
      .prioritySample(docs, "doc_id", "n_chars", n = 50)
    assert(shuffles(df) === 0)
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("KMV sketch: one group shuffle, state is the k-heap not the set") {
    val df = graft.SparkEntry.queries("t_kmv_distinct")(spark, sf)
    // distinct agg + heap agg + output sort — the old rank-window plan
    // needed a 4th exchange for the window repartition
    assert(shuffles(df) <= 3)
    // the bottom-k must be the k-bounded heap aggregate, never a window
    // sort over the group's full distinct-hash set (one task per group
    // would sort billions of hashes for a hot event_type)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("topk_structs"), "expected the TopKStructsAgg heap")
    assert(!s.contains("Window"), s"window sort leaked into the KMV plan")
  }

  test("stride sample: offset and rank boundary samplings agree (invariant)") {
    // strideSample's correctness rests on the offsets subplan and the
    // rank subplan assigning IDENTICAL range-partition boundaries.
    // Column pruning gives the two consumers structurally DIFFERENT
    // exchanges (the offsets side reads only the order column), so
    // ReuseExchange does NOT collapse them — the invariant holds only
    // because Spark's range-boundary sampling is a deterministic
    // function of the key data. This test pins that behaviorally on
    // adversarial input (skewed, shuffled, many input partitions):
    // if a Spark upgrade ever seeds the boundary sampler per-RDD, the
    // decomposed rank skews against the exact rank and this fails
    // instead of the gate silently corrupting.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val df = (1 to 60000).map(_ => math.abs(rnd.nextGaussian() * 1e6).toLong)
      .distinct.map(Tuple1(_)).toDF("k").repartition(17)
    val got = graft.operators.Sampling.strideSample(df, Seq("k"), 7)
      .collect().map(_.getLong(0)).sorted.toSeq
    val exact = df.withColumn("__rn", row_number().over(Window.orderBy(col("k"))))
      .filter(pmod(col("__rn") - 1, lit(7)) === 0)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === exact, s"sizes got=${got.length} exact=${exact.length}")
  }

  test("global percent-rank: decomposed and single-window ranks agree (invariant)") {
    // globalPercentRank rests on the SAME two-exchange agreement as
    // strideSample (offsets subplan and rank subplan must see identical
    // range boundaries) — pin it on its own adversarial input rather
    // than inheriting the stride test's: skewed values, shuffled
    // arrival, many input partitions.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val df = (1 to 60000).map(_ => math.abs(rnd.nextGaussian() * 1e6).toLong)
      .distinct.map(Tuple1(_)).toDF("k").repartition(17)
    val got = graft.operators.Sampling.globalPercentRank(df, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = df.withColumn("pr",
        percent_rank().over(Window.orderBy(col("k"))))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size === exact.size)
    assert(got === exact)
  }

  test("grouped heavy hitters: bounded MG + heap aggregates, no rank window") {
    val df = graft.SparkEntry.queries("t_heavy_hitters_by_group")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    // candidates come from the bounded Misra–Gries aggregate and the
    // per-group top-k from the k-bounded heap — never a rank window that
    // would ship a whole group's distinct items to one task
    assert(s.contains("misra_gries"), "expected the MisraGriesAgg candidates")
    assert(s.contains("topk_structs"), "expected the TopKStructsAgg heap")
    assert(!s.contains("Window"), s"rank window leaked into the plan")
    // the gate's group domain (a handful of sources) is far under the
    // candidate cap, so the confirm semi-join must take the broadcast
    // regime (the over-cap shuffled regime is pinned in HeavyHittersSpec)
    assert(s.contains("BroadcastHashJoin"),
      "small-domain confirm must broadcast the candidate set")
  }

  test("grouped CMS sketch is one map-side-combined aggregation") {
    val df = graft.SparkEntry.queries("t_cms_by_group")(spark, sf)
    // cell agg exchange + the output sort — the corpus itself must
    // never shuffle (the explode×depth happens before the partial agg)
    assert(shuffles(df) <= 2)
  }

  test("dyadic quantile sketch build: distinct pre-agg + cell agg + sort only") {
    val df = graft.SparkEntry.queries("t_dq_cells")(spark, sf)
    // three exchanges, all bounded: the distinct-(group, value) pre-agg
    // (≤ groups×2^levels per partition by construction — only these
    // rows pay the levels×depth hash explode), the cell agg
    // (≤ groups×levels×d×w), and the output sort. The corpus itself
    // never shuffles and is hashed zero times per row
    assert(shuffles(df) <= 3)
  }

  test("quantile walk under the cap is driver-side: a local result, no joins") {
    val df = graft.SparkEntry.queries("t_dq_quantile")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    // the gate sketch is far under the broadcast cap, so the walk runs
    // on the collected (sketch-sized) cells — the result plan is a
    // local scan plus the output sort, with no join of any kind (the
    // levels×depth per-slice broadcast-build jobs of the joined walk
    // were pure scheduling overhead on an under-cap sketch); the
    // over-cap joined regime is pinned row-identical in
    // QuantileSketchSpec
    assert(s.contains("LocalTableScan"),
      s"under-cap walk should return a local frame:\n$s")
    assert(!s.contains("Join"), s"no join should appear:\n$s")
  }

  test("HLL register build is one map-side-combined aggregation") {
    val df = graft.SparkEntry.queries("t_hll_registers")(spark, sf)
    // register max-agg exchange + the output sort; each partition emits
    // at most groups×2^p register rows however large the corpus
    assert(shuffles(df) <= 2)
  }

  test("moments summary is one map-side-combined aggregation, no window") {
    val df = graft.SparkEntry.queries("t_moments_by_group")(spark, sf)
    df.count()
    assert(shuffles(df) <= 2) // sum agg + output sort
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Window"), s"no window should appear:\n$s")
  }

  test("pagerank iteration plan stays one step deep (localCheckpoint truncation)") {
    // 8 iterations on the gate graph: if the loop accreted lineage, the
    // final plan would chain 8 iterations of joins/aggs; per-iteration
    // checkpointing means the output frame reads the materialized state
    // RDD with at most one iteration's operators above it
    val df = graft.SparkEntry.queries("g_pagerank")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("Scan ExistingRDD"),
      s"final frame should read the checkpointed state:\n$s")
    val joins = "(?i)join".r.findAllIn(s).size
    assert(joins <= 3, s"plan should be one iteration deep, found $joins joins:\n$s")
  }

  test("triangle counting: oriented wedge pipeline needs no extra exchanges") {
    // deg and oriented are checkpointed (each read 3×), so the final
    // plan is: wedge self-join on the apex → closure join on (lo, hi)
    // → per-node count agg → degree join → output sort — every
    // exchange carries (long, long)-sized rows; nothing
    // corpus-quadratic, no array columns, no driver collect
    val df = graft.SparkEntry.queries("g_triangles")(spark, sf)
    assert(shuffles(df) <= 10)
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"),
      s"triangle counting must never plan a cartesian:\n$s")
  }

  test("frequent pairs: the support floor enters via broadcast, not a shuffle") {
    // the 1-row threshold aggregate must reach both filters as a
    // BroadcastNestedLoopJoin / BroadcastExchange — re-deriving it per
    // partition or shuffling the corpus against it would be wrong at any
    // scale; the pair explosion itself is basket-local (no join)
    val df = graft.SparkEntry.queries("a_frequent_pairs")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastExchange"),
      s"threshold frame should broadcast:\n$s")
    assert(!s.contains("CartesianProduct"),
      s"1-row cross joins must resolve as broadcast:\n$s")
  }

  test("prefix jaccard: posting join on 8-byte hashed keys, no cartesian") {
    val df = graft.SparkEntry.queries("dedup_prefix_jaccard")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"),
      s"prefix filtering must never plan an all-pairs product:\n$s")
  }

  test("k-core / BFS results read checkpointed state, not replayed rounds") {
    // both loops checkpoint per round; the FINAL frame must be the
    // materialized state plus at most the output sort — a plan that
    // chains the rounds would replay every peel/frontier per action
    Seq("g_kcore", "g_bfs_hops").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sf)
      df.count()
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("Scan ExistingRDD"),
        s"$q should read checkpointed state:\n$s")
      assert(shuffles(df) <= 2, s"$q grew extra exchanges")
    }
  }

  test("bradley-terry final plan is one join off the checkpointed strengths") {
    val df = graft.SparkEntry.queries("a_bradley_terry")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("Scan ExistingRDD"),
      s"final frame should read checkpointed strengths:\n$s")
    val joins = "(?i)join".r.findAllIn(s).size
    assert(joins <= 3, s"plan should not replay MM iterations:\n$s")
  }

  test("equi-depth buckets: cuts broadcast back, assignment map-side") {
    val df = graft.SparkEntry.queries("a_equidepth_buckets")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      s"per-group cuts should broadcast:\n$s")
  }

  test("cusum: both CUSUM sides share ONE series-key window shuffle") {
    val df = graft.SparkEntry.queries("a_cusum_changepoint")(spark, sf)
    // day pre-agg + the shared window partitioning + output sort
    assert(shuffles(df) <= 3)
    val s = df.queryExecution.executedPlan.toString
    // the four window functions (2 sums, 2 mins) must coalesce into
    // window operators over one partitioning, not re-exchange per side
    // (count EXCHANGE nodes on the series key, not windowspec mentions)
    // keyed by event_type ALONE — the (event_type, day) pre-agg
    // exchange is the separate, expected daily-rollup shuffle
    val exchangesOnType =
      "exchange hashpartitioning\\(event_type#\\d+, \\d+\\)"
        .r.findAllIn(s.toLowerCase).size
    assert(exchangesOnType <= 1,
      s"CUSUM sides re-shuffled the series partitioning:\n$s")
  }

  test("markov transitions: lag window + pair count, matrix stays bounded") {
    val df = graft.SparkEntry.queries("w_markov_transitions")(spark, sf)
    // user shuffle (lag) + pair-count shuffle + bounded row-total/sort
    assert(shuffles(df) <= 4)
    val s = df.queryExecution.executedPlan.toString
    assert(!"(?i)cartesianproduct".r.findFirstIn(s).isDefined)
  }

  test("dq gates: each table scanned once per gate family, anti-joins bounded") {
    val df = graft.SparkEntry.queries("dq_gates")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    // FK checks must be HASH anti-joins — a nested-loop LeftAnti would
    // re-scan the parent per child row. (The 1-row violations × total
    // cross joins legitimately plan as bounded nested loops.)
    assert(!"(?i)nestedloopjoin[^\\n]*leftanti".r.findFirstIn(s).isDefined,
      s"FK gate fell back to a nested-loop anti join:\n$s")
    assert("(?i)leftanti".r.findFirstIn(s).isDefined,
      s"expected anti-join FK checks in:\n$s")
  }

  test("group trend: ONE aggregation, no window, no sort but the output's") {
    val df = graft.SparkEntry.queries("a_group_trend")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Window"),
      s"OLS sums must be a plain aggregation:\n$s")
    assert(shuffles(df) <= 3) // join + group agg + output sort
  }

  test("pmi bigrams: pairs build map-side — no self-join of the token table") {
    val df = graft.SparkEntry.queries("t_pmi_bigrams")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    val gens = "(?i)generate explode".r.findAllIn(s).size
    assert(gens <= 2, s"expected one explode per count pass:\n$s")
  }

  test("gini: two bounded aggregations, no window, no join") {
    val df = graft.SparkEntry.queries("a_group_gini")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Window"))
    assert(!"(?i)sortmergejoin|shuffledhashjoin".r.findFirstIn(s).isDefined,
      s"gini needs no join at all:\n$s")
    assert(shuffles(df) <= 3) // (g,label) agg + g rollup + output sort
  }

  test("MI cells: marginals broadcast back — no corpus re-scan, no SMJ") {
    val df = graft.SparkEntry.queries("a_mutual_information")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("Scan ExistingRDD"),
      s"joint cells should be checkpointed once and reused:\n$s")
    assert(!"(?i)sortmergejoin".r.findFirstIn(s).isDefined,
      s"cell-bounded marginals must broadcast:\n$s")
  }

  test("time-weighted avg: lead + agg share ONE series-key exchange") {
    val df = graft.SparkEntry.queries("w_time_weighted_avg")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    val exchangesOnKey =
      "exchange hashpartitioning\\(user_id#\\d+, \\d+\\)"
        .r.findAllIn(s.toLowerCase).size
    assert(exchangesOnKey <= 1,
      s"TWA re-shuffled the series partitioning:\n$s")
  }

  test("rolling distinct: offset scatter, no range join, day list broadcasts") {
    val df = graft.SparkEntry.queries("w_rolling_distinct")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!"(?i)nestedloopjoin".r.findFirstIn(s).isDefined,
      s"the scatter must be an equi-join against the day list:\n$s")
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      s"the observed-day restriction should broadcast:\n$s")
  }

  test("rolling PSI: offset scatter is an equi-join, day list and shares broadcast") {
    val df = graft.SparkEntry.queries("w_rolling_psi")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!"(?i)cartesianproduct".r.findFirstIn(s).isDefined,
      s"the window merge must be the offset scatter, not a range join:\n$s")
    // the only nested loops allowed are the bounded BROADCAST crosses of
    // the house one-row/grid-attach idiom (days × 10-bucket grid, ref
    // total); the scatter and share joins themselves must be hash equi
    assert("BroadcastNestedLoopJoin".r.findAllIn(s).size <= 2 &&
      !"(?i)(?<!broadcast)nestedloopjoin".r.findFirstIn(s.toLowerCase
        .replace("broadcastnestedloopjoin", "")).isDefined,
      s"only the bounded broadcast grid-crosses may nested-loop:\n$s")
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      s"day list / totals / reference shares should broadcast:\n$s")
    assert(!"(?i)sortmergejoin".r.findFirstIn(s).isDefined,
      s"every post-reduction frame is bounded — nothing may sort-merge:\n$s")
  }

  test("categorical rolling PSI: same scatter shape, category map broadcasts") {
    val df = graft.SparkEntry.queries("w_rolling_psi_cat")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!"(?i)cartesianproduct".r.findFirstIn(s).isDefined,
      s"the window merge must be the offset scatter, not a range join:\n$s")
    // bounded broadcast crosses only: days × local category list (the
    // zero-grid union), the ref one-row total, and the reserved-name
    // guard's probe
    assert("BroadcastNestedLoopJoin".r.findAllIn(s).size <= 3 &&
      !"(?i)(?<!broadcast)nestedloopjoin".r.findFirstIn(s.toLowerCase
        .replace("broadcastnestedloopjoin", "")).isDefined,
      s"only the bounded broadcast grid-crosses may nested-loop:\n$s")
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      s"category map / day list / shares should broadcast:\n$s")
    assert(!"(?i)sortmergejoin".r.findFirstIn(s).isDefined,
      s"every post-reduction frame is category-bounded — nothing may " +
        s"sort-merge:\n$s")
  }

  test("wilson rates: ONE aggregation, interval math map-side") {
    val df = graft.SparkEntry.queries("a_rate_wilson")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("Window") && !"(?i)join".r.findFirstIn(s).isDefined,
      s"wilson needs one agg and nothing else:\n$s")
    assert(shuffles(df) <= 2) // group agg + output sort
  }

  test("rolling quantile: cell scatter is an equi-join, no range join") {
    val df = graft.SparkEntry.queries("w_rolling_quantile")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(!"(?i)nestedloopjoin[^\\n]*(inner|leftouter)?range"
        .r.findFirstIn(s).isDefined &&
      !"(?i)cartesianproduct".r.findFirstIn(s).isDefined,
      s"the window merge must be the offset scatter, not a range join:\n$s")
  }

  test("seasonal outliers: slot profile broadcasts, flags map-side") {
    val df = graft.SparkEntry.queries("w_seasonal_outliers")(spark, sf)
    df.count()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      s"the slot profile should broadcast back:\n$s")
    assert(!"(?i)sortmergejoin".r.findFirstIn(s).isDefined,
      s"a slot-bounded profile must not sort-merge:\n$s")
  }

  test("z-order layout plans a range exchange (tiles, not hash buckets)") {
    val docs = graft.core.Tables.table(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id").as("x"),
        (org.apache.spark.sql.functions.col("doc_id") * 7 % 256).as("y"))
    val laid = graft.operators.ZOrder.layoutByZ(docs, "x", "y", numFiles = 4)
    laid.count()
    val s = laid.queryExecution.executedPlan.toString
    assert(s.contains("rangepartitioning"),
      s"expected RangePartitioning in:\n$s")
  }
}
