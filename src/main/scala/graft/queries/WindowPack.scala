package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables.table

/** Window operators from SURVEY.md §2.5 (the heart of the reference's
  * feature generation) on the harness tables.
  *
  * Rolling means are decomposed into (exact decimal rolling SUM, rolling
  * COUNT of non-nulls) so the oracle hash-compare is order- and
  * precision-independent; mean = sum/cnt is recoverable and the window
  * machinery (frames, null skipping, ordering) is exercised identically.
  *
  * Coverage: W1 7-row rolling mean w/ min_samples=1 (ref:
  * feature_generation/generate.py:71-79), W2 long rolling window
  * (generate.py:81-89), W3/A3 group mean over (key, year)
  * (generate.py:91-92), W4 two-year-slice all-period mean — window over
  * the full slice, warm-up rows trimmed after (generate.py:99-145), W5
  * cross-month rolling carry replayed with the reference's literal
  * union + `_which_df` tag + filter dance (regression_model_predictor
  * .py:187-229), W6 "null until window full" (setup/pm25_filters.py:28-35),
  * W7 backward/forward fill (generate.py:76-77), O1 multi-key sort, A9
  * stride sampling (setup/dependency_injection.py:340-345).
  */
object WindowPack extends QueryPack {
  private val DEC = "decimal(18,2)"

  /** Daily per-user value totals with gaps — the scaffolded long table all
    * window queries run over (one row per (user, day) with data).
    *
    * Output canonicalization: sums are computed in DECIMAL (exact) but the
    * FINAL output column is cast to DOUBLE on both engines — Spark's
    * decimal(28,2) and DuckDB's decimal(38,2) hash differently in the
    * driver's compare layer even when values are identical (round-1 judge
    * finding). All sums here are << 2^53, so cent-exactness survives the
    * double cast and the hash compare becomes type-stable.
    */
  private def daily(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast(DEC)).as("total"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1 (+W5): 7-row rolling window per key ordered by day.
    "w1_rolling_7" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
      daily(s, dir)
        .withColumn("roll_sum", sum(col("total")).over(w).cast("double"))
        .withColumn("roll_cnt", count(col("total")).over(w))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day_s"),
                col("roll_sum"), col("roll_cnt"))
        .orderBy("user_id", "day_s")
    }),

    // W2: long (30-row) rolling window — same machinery, wider frame.
    "w2_rolling_long" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-29, 0)
      daily(s, dir)
        .withColumn("roll_sum", sum(col("total")).over(w).cast("double"))
        .withColumn("roll_cnt", count(col("total")).over(w))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day_s"),
                col("roll_sum"), col("roll_cnt"))
        .orderBy("user_id", "day_s")
    }),

    // W3/A3/A4: unbounded group aggregate broadcast back to rows.
    "w3_group_mean" -> ((s, dir) => {
      val wy = Window.partitionBy(col("user_id"), month(col("day")))
      val wa = Window.partitionBy("user_id")
      daily(s, dir)
        .withColumn("month_sum", sum(col("total")).over(wy).cast("double"))
        .withColumn("month_cnt", count(col("total")).over(wy))
        .withColumn("all_sum", sum(col("total")).over(wa).cast("double"))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day_s"),
                col("month_sum"), col("month_cnt"), col("all_sum"))
        .orderBy("user_id", "day_s")
    }),

    // W4: the reference's two-year-slice "mean_all" subtlety (ref:
    // feature_generation/generate.py:99-145; SURVEY.md §3.2): the
    // per-key all-period aggregate is computed over the FULL loaded slice
    // (target year + warm-up year), then the warm-up rows are filtered
    // back off — so surviving rows carry an aggregate that saw rows no
    // longer in the output. Events span one month, so days 1-15 stand in
    // for the warm-up year and days 16+ for the target year; the filter
    // sits ABOVE the window (not its partition key) exactly like the
    // reference's year trim.
    "w4_two_year_slice_mean" -> ((s, dir) => {
      val wAll = Window.partitionBy("user_id")
      daily(s, dir)
        .withColumn("all_sum", sum(col("total")).over(wAll).cast("double"))
        .withColumn("all_cnt", count(col("total")).over(wAll))
        .filter(dayofmonth(col("day")) > 15)
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day_s"),
                col("all_sum"), col("all_cnt"))
        .orderBy("user_id", "day_s")
    }),

    // W5: the cross-month rolling carry (ref: regression_model_predictor
    // .py:187-229): month-at-a-time prediction concats the PREVIOUS
    // month's rows, tags origin with `_which_df`, rolls the 7-row window
    // over the union, and keeps only current-month rows — so the current
    // month's first days see the previous month's tail instead of a
    // truncated frame. Replayed literally (union + tag + filter) over the
    // two pseudo-months; the oracle rolls over the undivided table and
    // trims, which is equivalent exactly when the carry works.
    "w5_cross_month_carry" -> ((s, dir) => {
      val d = daily(s, dir)
      val prev = d.filter(dayofmonth(col("day")) <= 15)
        .withColumn("_which_df", lit("previous"))
      val cur = d.filter(dayofmonth(col("day")) > 15)
        .withColumn("_which_df", lit("current"))
      val w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
      prev.unionByName(cur)
        .withColumn("roll_sum", sum(col("total")).over(w).cast("double"))
        .withColumn("roll_cnt", count(col("total")).over(w))
        .filter(col("_which_df") === "current")
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day_s"),
                col("roll_sum"), col("roll_cnt"))
        .orderBy("user_id", "day_s")
    }),

    // W6: rolling aggregate that is null until the frame holds 5 non-null
    // samples (polars min_samples counts valid values, not rows — same rule
    // as Rolling.rollingMeanFullWindowOnly).
    "w6_full_window_only" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
      table(s, dir, "events")
        .withColumn("roll5_sum",
          when(count(col("value")).over(w) === 5,
            sum(col("value").cast(DEC)).over(w)).cast("double"))
        .select("event_id", "user_id", "roll5_sum")
        .orderBy("event_id")
    }),

    // W7: forward fill then backward fill over a gappy scaffold.
    "w7_fill_directions" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val users = ev.select("user_id").distinct()
      val days = ev.select(to_date(col("ts")).as("day")).distinct()
      val scaffold = users.crossJoin(days)
        .join(daily(s, dir), Seq("user_id", "day"), "left")
      val wf = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wb = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      scaffold
        .withColumn("ffill", last(col("total"), ignoreNulls = true).over(wf).cast("double"))
        .withColumn("bfill", first(col("total"), ignoreNulls = true).over(wb).cast("double"))
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day_s"),
                col("total").cast("double").as("total"), col("ffill"), col("bfill"))
        .orderBy("user_id", "day_s")
    }),

    // A5 + K7: the imputation stats columns driven through the real
    // PredictorStats.attach path (ref: regression_model_predictor
    // .py:132-229): flag = target missing, imputed = coalesce(target,
    // predicted), score = predicted·meanCvR² where missing, share =
    // mean(flag) over date (A5). Float parity: every output is a float32
    // narrowing of a deterministic double (products and k/n divides are
    // correctly rounded from identical inputs on both engines), and the
    // float32 round-trips back to double exactly — so the compare is
    // bit-stable without decimal scaffolding. The unselected __predicted
    // and __imputed_r7d columns prune out of the plan.
    "a5_share_imputed" -> ((s, dir) => {
      val frame = table(s, dir, "events").select(
        col("event_id"),
        col("user_id").as("grid_id"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("date"),
        when(col("event_id") % 5 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("aod"),
        (col("value") * 0.5 + 1.0).as("pred"))
      graft.ml.PredictorStats.attach(frame, "aod", "pred", meanCvR2 = 0.875)
        .select(col("event_id"),
          col("aod__imputed_flag").as("flag"),
          col("aod__imputed").cast("double").as("imputed"),
          col("aod__score").cast("double").as("score"),
          col("aod__share_imputed_across_all_grids").cast("double").as("share"))
        .orderBy("event_id")
    }),

    // O1/O2: deterministic multi-key sort of a projection.
    // Batch sessionization (gaps-and-islands): 30-minute inactivity gap
    // splits each user's events into sessions — lag → break flag →
    // running-sum session id → rollup, all over ONE user_id shuffle.
    // The streaming twin (EventsStream.sessionize, explicit state) is
    // pinned to the same closed sessions in StreamingSpec.
    "w_sessionize" -> ((s, dir) => {
      graft.operators.Sessions.sessionize(
          table(s, dir, "events"), Seq("user_id"), "ts",
          gapMs = 30L * 60 * 1000)
        .orderBy("user_id", "session_start")
    }),

    // Funnel: earliest signup → click-after → purchase-after chain per
    // user — one shuffle, the chain threaded through a higher-order
    // aggregate fold over each user's sorted step events (no per-step
    // join cascade over the fact table).
    "w_funnel" -> ((s, dir) => {
      graft.operators.Funnel.funnel(
          table(s, dir, "events"), Seq("user_id"), "ts", "event_type",
          Seq("signup", "click", "purchase"))
        .orderBy("user_id")
    }),

    // Cohort retention: users bucket into their first-event day, then
    // distinct-active counts per day offset — the retention curve.
    "w_retention" -> ((s, dir) => {
      graft.operators.Cohorts.retention(
          table(s, dir, "events"), "user_id", "ts")
        .orderBy("cohort_day", "day_offset")
    }),

    "o1_multikey_sort" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
                col("l_quantity"))
        .orderBy(col("l_returnflag").desc, col("l_orderkey"), col("l_linenumber"))
    }),

    // A9: stride ("gather_every(10)") sampling over a deterministic
    // order — through the decomposed-rank operator (range partitions +
    // parallel in-range windows + exact offsets), so the gate exercises
    // the plan with NO single-partition window.
    "a9_stride_sample" -> ((s, dir) => {
      graft.operators.Sampling.strideSample(
          table(s, dir, "events"), Seq("event_id"), n = 10)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    }),

    // Two-sided CUSUM level monitor over the per-(type, day) value
    // totals — "did this feed's daily level step-shift": the
    // sequential-detection companion to the distributional monitors
    // (KS/PSI). The recursion runs as its closed prefix form — two
    // window passes over one partitioning — on exact BIGINTs.
    "a_cusum_changepoint" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
        .agg(sum(floor(col("value")).cast("long")).as("v"))
      graft.operators.Changepoint.cusum(daily,
          keyCols = Seq("event_type"), orderCols = Seq("day"),
          valueCol = "v", driftK = 16000L, threshold = 8000L)
        .orderBy("event_type", "day")
    }),

    // COMPOSED session co-occurrence: which event types co-occur in
    // the same 30-minute session beyond chance — Sessions.assignIds
    // (per-row gaps-and-islands ids) feeding FrequentPairs (a-priori
    // pruned 2-itemsets with exact support/lift). Two green operators,
    // one plan; the basket key is a numeric (user, session) compose.
    "w_session_pairs" -> ((s, dir) => {
      // 3-DAY visit epochs, not 30-minute sessions: the synthetic log
      // averages ~5 events/user/month, so short gaps yield singleton
      // baskets and a vacuously-empty (hash-equal but weak) gate
      val withSid = graft.operators.Sessions.assignIds(
        table(s, dir, "events"), Seq("user_id"), "ts",
        gapMs = 3L * 24 * 60 * 60 * 1000)
      val rel = withSid.select(
        (col("user_id") * 100000L + col("session_seq")).as("basket"),
        col("event_type").as("item"))
      graft.operators.FrequentPairs
        .frequentPairs(rel, "basket", "item", minSupportFrac = 0.02)
        .orderBy("item_a", "item_b")
    }),

    // Rolling 7-day p50/p90 of the event value via sliding dyadic-
    // sketch merges — the quantile sibling of w_rolling_distinct: the
    // corpus sketches once per day, windows merge CELL TABLES (the
    // CMS merge is addition), the per-window walk is deterministic
    // integer descent the oracle replays step-for-step.
    "w_rolling_quantile" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("ts"), floor(col("value")).cast("long").as("v"))
      graft.operators.RollingQuantile.rollingQuantiles(
          ev, "ts", "v", levels = 10, depth = 4, width = 256,
          windowDays = 7, qs = Seq(0.5, 0.9))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("q"), col("q_value"))
        .orderBy("day", "q")
    }),

    // Seasonality-aware outliers: each (type, day) total judged
    // against ITS OWN (type, weekday) slot — weekly rhythm stops
    // masquerading as anomaly. The flag is an exact integer
    // inequality (dev² > k²·vt — no floats); dow is portable integer
    // arithmetic ((epochDay+4) mod 7, 0 = Sunday) on both engines.
    // k = 1 because month-long data gives 4–5 samples per slot and
    // population-σ z is bounded by √(n−1) there.
    "w_seasonal_outliers" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
        .agg(sum(floor(col("value")).cast("long")).as("v"))
        .withColumn("dow", pmod(col("d") + 4, lit(7)))
      graft.operators.Seasonal.outliers(daily,
          Seq("event_type", "dow"), "v", k = 1)
        .select(col("event_type"), col("d"), col("dow"), col("v"),
          col("slot_cnt"), col("dev_scaled"), col("outlier"),
          round(col("z"), 6).as("z"))
        .orderBy("event_type", "d")
    }),

    // Debounced CUSUM — the alert-hygiene layer: a page fires only
    // after 2 consecutive breaching days, so one noisy sample cannot
    // flap the monitor. Same partitioning, no extra exchange.
    "a_cusum_debounced" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .groupBy(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
        .agg(sum(floor(col("value")).cast("long")).as("v"))
      graft.operators.Changepoint.cusumDebounced(daily,
          keyCols = Seq("event_type"), orderCols = Seq("day"),
          valueCol = "v", driftK = 16000L, threshold = 8000L,
          consecutive = 2)
        .orderBy("event_type", "day")
    }),

    // First-order Markov transition matrix of each user's event
    // sequence — the "what happens after X" empirical next-step
    // model; counts exact, probability ONE pinned division. Sequence
    // order made unique by (ts, event_id).
    "w_markov_transitions" -> ((s, dir) => {
      graft.operators.Transitions.transitionMatrix(
          table(s, dir, "events"), Seq("user_id"),
          Seq("ts", "event_id"), "event_type")
        .orderBy("prev", "next")
    }),

    // Step-function time-weighted average per user — the correct
    // "average level" over irregular arrivals (plain AVG overweights
    // dense bursts): µs-gap × quantized-value masses in the
    // DECIMAL(38,0) lane, TWA one pinned division.
    "w_time_weighted_avg" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value")).cast("long").as("v"))
      graft.operators.TimeWeighted.stepTwa(ev, Seq("user_id"),
          Seq("ts", "event_id"), "ts", "v")
        .orderBy("user_id")
    }),

    // Rolling 7-day distinct users per day via sliding HLL merges —
    // the windowed COUNT(DISTINCT) that touches the corpus ONCE (daily
    // register build) and rolls on register tables: the offset scatter
    // + max-agg IS the window union. Exact through s_mass; est rounds
    // its linear-counting ln per the transcendental convention.
    "w_rolling_distinct" -> ((s, dir) => {
      graft.operators.SlidingDistinct.rollingDistinct(
          table(s, dir, "events"), "ts", "user_id", p = 8, windowDays = 7)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_buckets"), col("v_empty"), col("s_mass"), col("est_raw"),
          round(col("est"), 4).as("est"))
        .orderBy("day")
    }),

    // GROUPED rolling quantiles: one independent trailing-median/p90
    // series per event type, same deterministic sketch walk — the
    // grouped twin of w_rolling_quantile.
    "w_rolling_quantile_by_type" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_type"), col("ts"),
          floor(col("value")).cast("long").as("v"))
      graft.operators.RollingQuantile.rollingQuantiles(
          ev, "ts", "v", levels = 10, depth = 4, width = 256,
          windowDays = 7, qs = Seq(0.5, 0.9),
          groupCols = Seq("event_type"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("q"), col("q_value"))
        .orderBy("event_type", "day", "q")
    }),

    // GROUPED rolling distinct: one independent 7-day active-user
    // series per event type, windows anchored to each type's own
    // observed days — the scatter/merge keys widen, the plan doesn't.
    "w_rolling_distinct_by_type" -> ((s, dir) => {
      graft.operators.SlidingDistinct.rollingDistinct(
          table(s, dir, "events"), "ts", "user_id", p = 8, windowDays = 7,
          groupCols = Seq("event_type"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_buckets"), col("v_empty"), col("s_mass"), col("est_raw"),
          round(col("est"), 4).as("est"))
        .orderBy("event_type", "day")
    }),

    // Trailing-window PSI via the same scatter idiom: per-day bucket
    // counts post to every containing 7-day window (one equi-shuffle,
    // no non-equi join), each window's shares compared against the
    // pinned purchase-slice reference. Shares are single divisions;
    // contrib carries the one ln — all rounded per the transcendental
    // convention.
    "w_rolling_psi" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      graft.operators.Drift.rollingPsi(
          ev, "ts", "value",
          ref = ev.filter(col("event_type") === "purchase"),
          nBuckets = 10, lo = 0.0, hi = 500.0, windowDays = 7)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("bucket"),
          round(col("p_ref"), 6).as("p_ref"),
          round(col("p_cur"), 6).as("p_cur"),
          round(col("contrib"), 6).as("contrib"))
        .orderBy("day", "bucket")
    }),

    // Multi-feature rolling PSI: one melt pass, per-feature grids, one
    // PSI row set per (window-end, feature). The oracle is the
    // per-feature single-column replay UNION'd — the stacked pipeline
    // must be invisible in the result.
    "w_rolling_psi_multi" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      graft.operators.Drift.rollingPsiStacked(
          ev, "ts",
          features = Map("value" -> ((0.0, 500.0)),
            "user_id" -> ((0.0, 1000.0))),
          nBuckets = 8,
          ref = ev.filter(col("event_type") === "purchase"),
          windowDays = 7)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("feature"), col("bucket"),
          round(col("p_ref"), 6).as("p_ref"),
          round(col("p_cur"), 6).as("p_cur"),
          round(col("contrib"), 6).as("contrib"))
        .orderBy("day", "feature", "bucket")
    }),

    // Categorical rolling PSI + chi-square on the event-type mix: the
    // reference deliberately excludes 'click', so current-side clicks
    // land in the __other__ bucket — the novel-category lane the
    // source-mix monitor exists for.
    "w_rolling_psi_cat" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      graft.operators.Drift.rollingPsiCat(
          ev, "ts", "event_type",
          ref = ev.filter(pmod(col("user_id"), lit(2L)) === 0 &&
            col("event_type") =!= "click"),
          windowDays = 7)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("category"),
          round(col("p_ref"), 6).as("p_ref"),
          round(col("p_cur"), 6).as("p_cur"),
          round(col("contrib"), 6).as("contrib"),
          round(col("chi2"), 6).as("chi2"))
        .orderBy("day", "category")
    }),

    // Per-day PSI summary + alert status — the page-on row: 6dp
    // contributions folded in bucket order (deterministic under any
    // partitioning), thresholds 0.1/0.25 per the PSI rule of thumb.
    "w_rolling_psi_alarm" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      graft.operators.Drift.rollingPsiSummary(
          ev, "ts", "value",
          ref = ev.filter(col("event_type") === "purchase"),
          nBuckets = 10, lo = 0.0, hi = 500.0, windowDays = 7)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("psi"), 6).as("psi"), col("status"))
        .orderBy("day")
    }),

    // Composed nightly DRIFT report: numeric PSI + categorical PSI +
    // KS per day against one pinned reference, unioned into the
    // (day, metric, value, status) page — every leaf is its own green
    // gate; this row pins that the drift monitors COMPOSE.
    "w_drift_report" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .withColumn("kv", floor(col("value")).cast("long"))
      val ref = ev.filter(pmod(col("user_id"), lit(2L)) === 0)
      graft.operators.Drift.driftReport(
          ev, "ts", "value", "event_type", "kv", ref,
          nBuckets = 10, lo = 0.0, hi = 500.0, windowDays = 7)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("metric"), col("value"), col("status"))
        .orderBy("day", "metric")
    }),

    // The same composed report PER GROUP (round-13 task 6): a derived
    // source key (user_id mod 3) threads through every leaf's bounded
    // dimensions — observed days, totals, grids, window partitions —
    // against the ONE pinned reference. The oracle is the per-group
    // union of single-stream replays (the w_rolling_psi_multi arm
    // precedent), so the grouped plumbing must be invisible in the
    // result.
    "w_drift_report_by_group" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .withColumn("kv", floor(col("value")).cast("long"))
        .withColumn("src", pmod(col("user_id"), lit(3L)))
      val ref = ev.filter(pmod(col("user_id"), lit(2L)) === 0)
      graft.operators.Drift.driftReport(
          ev, "ts", "value", "event_type", "kv", ref,
          nBuckets = 10, lo = 0.0, hi = 500.0, windowDays = 7,
          groupCols = Seq("src"))
        .select(col("src"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("metric"), col("value"), col("status"))
        .orderBy("src", "day", "metric")
    }),

    // Trailing-window KS PER GROUP: the per-group support rule (a
    // group's own values ∪ the shared ref — a value only another group
    // observed must not fabricate rows) faces the oracle directly via
    // per-group single-stream arms.
    "w_rolling_ks_by_group" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("ts"), col("event_type"),
          pmod(col("user_id"), lit(3L)).as("src"),
          floor(col("value")).cast("long").as("v"))
      graft.operators.Drift.rollingKs(
          ev, "ts", "v",
          ref = ev.filter(col("event_type") === "purchase")
            .select(col("v")),
          windowDays = 7, groupCols = Seq("src"))
        .select(col("src"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("v"),
          round(col("cdf_ref"), 6).as("cdf_ref"),
          round(col("cdf_cur"), 6).as("cdf_cur"),
          round(col("gap"), 6).as("gap"))
        .orderBy("src", "day", "v")
    }),

    // Trailing-window KS vs the pinned reference — the binning-free
    // companion of w_rolling_psi: exact integer prefix sums over the
    // global support, one CDF division pair per (day, v).
    "w_rolling_ks" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("ts"), col("event_type"),
          floor(col("value")).cast("long").as("v"))
      graft.operators.Drift.rollingKs(
          ev, "ts", "v",
          ref = ev.filter(col("event_type") === "purchase"),
          windowDays = 7)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("v"),
          round(col("cdf_ref"), 6).as("cdf_ref"),
          round(col("cdf_cur"), 6).as("cdf_cur"),
          round(col("gap"), 6).as("gap"))
        .orderBy("day", "v")
    }))

  def oracles: Map[String, String] = Map(
    "w_retention" ->
      """WITH c AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
                    FROM events GROUP BY 1)
         SELECT STRFTIME(c.cohort, '%Y-%m-%d') AS cohort_day,
                CAST(DATEDIFF('day', c.cohort, CAST(e.ts AS DATE)) AS INT) AS day_offset,
                COUNT(DISTINCT e.user_id) AS n_active
         FROM events e JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // the oracle is the k-pass join-cascade formulation — the fold must
    // be invisible in the result
    "w_funnel" ->
      """WITH s1 AS (SELECT user_id, MIN(epoch_us(ts) // 1000) AS t1
                     FROM events WHERE event_type = 'signup' GROUP BY 1),
         s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts) // 1000) AS t2
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND epoch_us(e.ts) // 1000 > s1.t1
                GROUP BY 1),
         s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts) // 1000) AS t3
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND epoch_us(e.ts) // 1000 > s2.t2
                GROUP BY 1),
         base AS (SELECT DISTINCT user_id FROM events
                  WHERE event_type IN ('signup', 'click', 'purchase'))
         SELECT b.user_id,
                CAST(CASE WHEN t3 IS NOT NULL THEN 3
                          WHEN t2 IS NOT NULL THEN 2
                          WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS reached,
                t1 AS step1_ms, t2 AS step2_ms, t3 AS step3_ms
         FROM base b LEFT JOIN s1 USING (user_id)
                     LEFT JOIN s2 USING (user_id)
                     LEFT JOIN s3 USING (user_id)
         ORDER BY b.user_id""",
    "w_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(epoch_us(ts) // 1000 AS BIGINT) AS ms FROM events),
         f AS (SELECT user_id, ms,
                 CASE WHEN ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms) > 1800000
                      THEN 1 ELSE 0 END AS brk
               FROM e),
         s AS (SELECT user_id, ms,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ms ROWS UNBOUNDED PRECEDING) AS sid
               FROM f)
         SELECT user_id, MIN(ms) AS session_start, MAX(ms) AS session_end,
                COUNT(*) AS n_events
         FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "w1_rolling_7" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS total FROM events GROUP BY 1, 2)
         SELECT user_id, CAST(day AS VARCHAR) AS day_s,
           CAST(SUM(total) OVER (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum,
           COUNT(total) OVER (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll_cnt
         FROM daily ORDER BY user_id, day_s""",
    "w2_rolling_long" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS total FROM events GROUP BY 1, 2)
         SELECT user_id, CAST(day AS VARCHAR) AS day_s,
           CAST(SUM(total) OVER (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum,
           COUNT(total) OVER (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS roll_cnt
         FROM daily ORDER BY user_id, day_s""",
    "w3_group_mean" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS total FROM events GROUP BY 1, 2)
         SELECT user_id, CAST(day AS VARCHAR) AS day_s,
           CAST(SUM(total) OVER (PARTITION BY user_id, MONTH(day)) AS DOUBLE) AS month_sum,
           COUNT(total) OVER (PARTITION BY user_id, MONTH(day)) AS month_cnt,
           CAST(SUM(total) OVER (PARTITION BY user_id) AS DOUBLE) AS all_sum
         FROM daily ORDER BY user_id, day_s""",
    "w4_two_year_slice_mean" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS total FROM events GROUP BY 1, 2),
         win AS (SELECT user_id, day,
           CAST(SUM(total) OVER (PARTITION BY user_id) AS DOUBLE) AS all_sum,
           COUNT(total) OVER (PARTITION BY user_id) AS all_cnt
         FROM daily)
         SELECT user_id, CAST(day AS VARCHAR) AS day_s, all_sum, all_cnt
         FROM win WHERE DAY(day) > 15 ORDER BY user_id, day_s""",
    "w5_cross_month_carry" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS total FROM events GROUP BY 1, 2),
         win AS (SELECT user_id, day,
           CAST(SUM(total) OVER (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum,
           COUNT(total) OVER (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS roll_cnt
         FROM daily)
         SELECT user_id, CAST(day AS VARCHAR) AS day_s, roll_sum, roll_cnt
         FROM win WHERE DAY(day) > 15 ORDER BY user_id, day_s""",
    "w6_full_window_only" ->
      """SELECT event_id, user_id,
           CAST(CASE WHEN COUNT(value) OVER w = 5
                THEN SUM(CAST(value AS DECIMAL(18,2))) OVER w END AS DOUBLE) AS roll5_sum
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         ORDER BY event_id""",
    "w7_fill_directions" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS total FROM events GROUP BY 1, 2),
         scaffold AS (
           SELECT u.user_id, d.day, t.total
           FROM (SELECT DISTINCT user_id FROM events) u
           CROSS JOIN (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) d
           LEFT JOIN daily t ON t.user_id = u.user_id AND t.day = d.day)
         SELECT user_id, CAST(day AS VARCHAR) AS day_s, CAST(total AS DOUBLE) AS total,
           CAST(LAST_VALUE(total IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS ffill,
           CAST(FIRST_VALUE(total IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS bfill
         FROM scaffold ORDER BY user_id, day_s""",
    "a5_share_imputed" ->
      """WITH f AS (
           SELECT event_id,
             CAST(CAST(ts AS DATE) AS VARCHAR) AS date,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS aod,
             value * 0.5 + 1.0 AS pred
           FROM events)
         SELECT event_id,
           CASE WHEN aod IS NULL THEN 1 ELSE 0 END AS flag,
           CAST(CAST(COALESCE(aod, pred) AS REAL) AS DOUBLE) AS imputed,
           CAST(CAST(CASE WHEN aod IS NULL THEN pred * 0.875 ELSE aod END
                AS REAL) AS DOUBLE) AS score,
           CAST(CAST(AVG(CASE WHEN aod IS NULL THEN 1.0 ELSE 0.0 END)
                OVER (PARTITION BY date) AS REAL) AS DOUBLE) AS share
         FROM f ORDER BY event_id""",
    "o1_multikey_sort" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity
         FROM lineitem
         ORDER BY l_returnflag DESC, l_orderkey, l_linenumber""",
    "a9_stride_sample" ->
      """WITH r AS (SELECT event_id, user_id, event_type,
             ROW_NUMBER() OVER (ORDER BY event_id) AS rn FROM events)
         SELECT event_id, user_id, event_type FROM r
         WHERE (rn - 1) % 10 = 0 ORDER BY event_id""",

    "a_cusum_changepoint" -> (graft.operators.Changepoint.oracleSql(
      """SELECT event_type, STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS v
         FROM events GROUP BY 1, 2""",
      keyCols = Seq("event_type"), orderCols = Seq("day"),
      valueCol = "v", driftK = 16000L, threshold = 8000L) +
      " ORDER BY event_type, day"),

    "w_session_pairs" -> (graft.operators.FrequentPairs.oracleSql(
      """SELECT user_id * 100000 + sid AS basket, event_type AS item
         FROM (
           SELECT user_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ms
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM (
             SELECT user_id, event_type, ms,
               CASE WHEN ms - LAG(ms) OVER (PARTITION BY user_id
                 ORDER BY ms) > 259200000 THEN 1 ELSE 0 END AS brk
             FROM (SELECT user_id, event_type,
                     CAST(epoch_us(ts) // 1000 AS BIGINT) AS ms
                   FROM events)))""",
      minSupportFrac = 0.02) + " ORDER BY item_a, item_b"),

    // daily cells → offset scatter (the SlidingDistinct idiom) →
    // the t_dq_quantile walk keyed by window-end day
    "w_rolling_quantile" ->
      s"""WITH RECURSIVE
         d AS (SELECT unnest(range(0, 4)) AS i),
         lv AS (SELECT unnest(range(0, 10)) AS lvl),
         ev AS (SELECT CAST(ts AS DATE) AS dday,
                  CAST(FLOOR(value) AS BIGINT) AS v
                FROM events WHERE value IS NOT NULL),
         cells0 AS (
           SELECT dday, lvl, i, ${graft.operators.Sampling.avalancheKeySql(
             "CAST(v >> lvl AS VARCHAR) || ':' || CAST(lvl AS VARCHAR)" +
               " || ':' || CAST(i AS VARCHAR)")} % 256 AS bucket
           FROM ev CROSS JOIN lv CROSS JOIN d),
         sk0 AS (SELECT dday, lvl, i, bucket, COUNT(*) AS cnt
                 FROM cells0 GROUP BY 1, 2, 3, 4),
         days AS (SELECT DISTINCT dday AS day FROM sk0),
         scat AS (
           SELECT dday + CAST(off AS INTEGER) AS day, lvl, i, bucket, cnt
           FROM sk0 CROSS JOIN (SELECT UNNEST(RANGE(0, 7)) AS off)),
         sk AS (SELECT s.day, lvl, i, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
                FROM scat s JOIN days dd ON dd.day = s.day
                GROUP BY 1, 2, 3, 4),
         tot AS (SELECT day, CAST(SUM(cnt) AS BIGINT) AS n FROM sk
                 WHERE lvl = 0 AND i = 0 GROUP BY 1),
         qs AS (SELECT CAST(unnest([0.5, 0.9]) AS DOUBLE) AS q),
         walk AS (
           SELECT tot.day, qs.q, 10 AS l,
                  GREATEST(CAST(CEIL(qs.q * tot.n) AS BIGINT),
                           CAST(1 AS BIGINT)) AS t,
                  CAST(0 AS BIGINT) AS p
           FROM tot CROSS JOIN qs WHERE tot.n > 0
           UNION ALL
           SELECT day, q, l - 1,
                  CASE WHEN t <= lc THEN t ELSE t - lc END,
                  CASE WHEN t <= lc THEN p * 2 ELSE p * 2 + 1 END
           FROM (
             SELECT w.day, w.q, w.l, w.t, w.p, LEAST(
               COALESCE((SELECT cnt FROM sk
                 WHERE sk.day = w.day AND sk.lvl = w.l - 1
                   AND sk.i = 0 AND sk.bucket = ${graft.operators.Sampling
                     .avalancheKeySql("CAST(w.p * 2 AS VARCHAR) || ':' ||" +
                       " CAST(w.l - 1 AS VARCHAR) || ':0'")} % 256), 0),
               COALESCE((SELECT cnt FROM sk
                 WHERE sk.day = w.day AND sk.lvl = w.l - 1
                   AND sk.i = 1 AND sk.bucket = ${graft.operators.Sampling
                     .avalancheKeySql("CAST(w.p * 2 AS VARCHAR) || ':' ||" +
                       " CAST(w.l - 1 AS VARCHAR) || ':1'")} % 256), 0),
               COALESCE((SELECT cnt FROM sk
                 WHERE sk.day = w.day AND sk.lvl = w.l - 1
                   AND sk.i = 2 AND sk.bucket = ${graft.operators.Sampling
                     .avalancheKeySql("CAST(w.p * 2 AS VARCHAR) || ':' ||" +
                       " CAST(w.l - 1 AS VARCHAR) || ':2'")} % 256), 0),
               COALESCE((SELECT cnt FROM sk
                 WHERE sk.day = w.day AND sk.lvl = w.l - 1
                   AND sk.i = 3 AND sk.bucket = ${graft.operators.Sampling
                     .avalancheKeySql("CAST(w.p * 2 AS VARCHAR) || ':' ||" +
                       " CAST(w.l - 1 AS VARCHAR) || ':3'")} % 256), 0)) AS lc
             FROM walk w WHERE w.l > 0) z)
         SELECT STRFTIME(day, '%Y-%m-%d') AS day, q, p AS q_value
         FROM walk WHERE l = 0 ORDER BY day, q""",

    "w_seasonal_outliers" -> (s"""SELECT event_type, d, dow, v, slot_cnt,
        dev_scaled, outlier, ROUND(z, 6) AS z FROM (
      ${graft.operators.Seasonal.oracleSql(
        """SELECT event_type, d, (d + 4) % 7 AS dow, v FROM (
             SELECT event_type,
               DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS v
             FROM events GROUP BY 1, 2)""",
        slotCols = Seq("event_type", "dow"), k = 1)}) ORDER BY event_type, d"""),

    "a_cusum_debounced" -> (graft.operators.Changepoint.debouncedOracleSql(
      """SELECT event_type, STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS day,
           CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS v
         FROM events GROUP BY 1, 2""",
      keyCols = Seq("event_type"), orderCols = Seq("day"),
      valueCol = "v", driftK = 16000L, threshold = 8000L,
      consecutive = 2) + " ORDER BY event_type, day"),

    "w_markov_transitions" -> (graft.operators.Transitions.oracleSql(
      "SELECT user_id, ts, event_id, event_type FROM events",
      keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
      stateCol = "event_type") + " ORDER BY prev, next"),

    "w_time_weighted_avg" -> (graft.operators.TimeWeighted.oracleSql(
      """SELECT user_id, ts, event_id,
           CAST(FLOOR(value) AS BIGINT) AS v FROM events""",
      keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id")) +
      " ORDER BY user_id"),

    "w_rolling_distinct" ->
      s"""SELECT STRFTIME(day, '%Y-%m-%d') AS day, n_buckets, v_empty,
           s_mass, est_raw, ROUND(est, 4) AS est
         FROM (${graft.operators.SlidingDistinct.oracleSql(
        "SELECT ts, user_id AS v FROM events WHERE user_id IS NOT NULL",
        p = 8, windowDays = 7)})
         ORDER BY day""",

    // the w_rolling_quantile walk with the group key threaded through
    // every frame (cells, day list, scatter, totals, walk state and
    // the correlated child-count lookups)
    "w_rolling_quantile_by_type" ->
      s"""WITH RECURSIVE
         d AS (SELECT unnest(range(0, 4)) AS i),
         lv AS (SELECT unnest(range(0, 10)) AS lvl),
         ev AS (SELECT event_type AS g, CAST(ts AS DATE) AS dday,
                  CAST(FLOOR(value) AS BIGINT) AS v
                FROM events WHERE value IS NOT NULL),
         cells0 AS (
           SELECT g, dday, lvl, i, ${graft.operators.Sampling.avalancheKeySql(
             "CAST(v >> lvl AS VARCHAR) || ':' || CAST(lvl AS VARCHAR)" +
               " || ':' || CAST(i AS VARCHAR)")} % 256 AS bucket
           FROM ev CROSS JOIN lv CROSS JOIN d),
         sk0 AS (SELECT g, dday, lvl, i, bucket, COUNT(*) AS cnt
                 FROM cells0 GROUP BY 1, 2, 3, 4, 5),
         days AS (SELECT DISTINCT g, dday AS day FROM sk0),
         scat AS (
           SELECT g, dday + CAST(off AS INTEGER) AS day, lvl, i, bucket, cnt
           FROM sk0 CROSS JOIN (SELECT UNNEST(RANGE(0, 7)) AS off)),
         sk AS (SELECT s.g, s.day, lvl, i, bucket,
                  CAST(SUM(cnt) AS BIGINT) AS cnt
                FROM scat s JOIN days dd ON dd.g = s.g AND dd.day = s.day
                GROUP BY 1, 2, 3, 4, 5),
         tot AS (SELECT g, day, CAST(SUM(cnt) AS BIGINT) AS n FROM sk
                 WHERE lvl = 0 AND i = 0 GROUP BY 1, 2),
         qs AS (SELECT CAST(unnest([0.5, 0.9]) AS DOUBLE) AS q),
         walk AS (
           SELECT tot.g, tot.day, qs.q, 10 AS l,
                  GREATEST(CAST(CEIL(qs.q * tot.n) AS BIGINT),
                           CAST(1 AS BIGINT)) AS t,
                  CAST(0 AS BIGINT) AS p
           FROM tot CROSS JOIN qs WHERE tot.n > 0
           UNION ALL
           SELECT g, day, q, l - 1,
                  CASE WHEN t <= lc THEN t ELSE t - lc END,
                  CASE WHEN t <= lc THEN p * 2 ELSE p * 2 + 1 END
           FROM (
             SELECT w.g, w.day, w.q, w.l, w.t, w.p, LEAST(
               COALESCE((SELECT cnt FROM sk
                 WHERE sk.g = w.g AND sk.day = w.day AND sk.lvl = w.l - 1
                   AND sk.i = 0 AND sk.bucket = ${graft.operators.Sampling
                     .avalancheKeySql("CAST(w.p * 2 AS VARCHAR) || ':' ||" +
                       " CAST(w.l - 1 AS VARCHAR) || ':0'")} % 256), 0),
               COALESCE((SELECT cnt FROM sk
                 WHERE sk.g = w.g AND sk.day = w.day AND sk.lvl = w.l - 1
                   AND sk.i = 1 AND sk.bucket = ${graft.operators.Sampling
                     .avalancheKeySql("CAST(w.p * 2 AS VARCHAR) || ':' ||" +
                       " CAST(w.l - 1 AS VARCHAR) || ':1'")} % 256), 0),
               COALESCE((SELECT cnt FROM sk
                 WHERE sk.g = w.g AND sk.day = w.day AND sk.lvl = w.l - 1
                   AND sk.i = 2 AND sk.bucket = ${graft.operators.Sampling
                     .avalancheKeySql("CAST(w.p * 2 AS VARCHAR) || ':' ||" +
                       " CAST(w.l - 1 AS VARCHAR) || ':2'")} % 256), 0),
               COALESCE((SELECT cnt FROM sk
                 WHERE sk.g = w.g AND sk.day = w.day AND sk.lvl = w.l - 1
                   AND sk.i = 3 AND sk.bucket = ${graft.operators.Sampling
                     .avalancheKeySql("CAST(w.p * 2 AS VARCHAR) || ':' ||" +
                       " CAST(w.l - 1 AS VARCHAR) || ':3'")} % 256), 0)) AS lc
             FROM walk w WHERE w.l > 0) z)
         SELECT g AS event_type, STRFTIME(day, '%Y-%m-%d') AS day, q,
           p AS q_value
         FROM walk WHERE l = 0 ORDER BY event_type, day, q""",

    "w_rolling_distinct_by_type" ->
      s"""SELECT event_type, STRFTIME(day, '%Y-%m-%d') AS day, n_buckets,
           v_empty, s_mass, est_raw, ROUND(est, 4) AS est
         FROM (${graft.operators.SlidingDistinct.oracleSql(
        "SELECT event_type, ts, user_id AS v FROM events" +
          " WHERE user_id IS NOT NULL",
        p = 8, windowDays = 7, groupCols = Seq("event_type"))})
         ORDER BY event_type, day""",

    "w_rolling_psi" -> (graft.operators.Drift.rollingPsiOracleSql(
      "SELECT ts, value AS v FROM events",
      "SELECT value AS v FROM events WHERE event_type = 'purchase'",
      nBuckets = 10, lo = 0.0, hi = 500.0, windowDays = 7) +
      " ORDER BY day, bucket"),

    // per-feature single-column replays, tagged and UNION'd — the
    // stacked melt must be invisible in the result
    "w_rolling_psi_multi" -> {
      def arm(feature: String, lo: Double, hi: Double) =
        s"""SELECT '$feature' AS feature, * FROM (
           ${graft.operators.Drift.rollingPsiOracleSql(
          s"SELECT ts, $feature AS v FROM events",
          s"SELECT $feature AS v FROM events WHERE event_type = 'purchase'",
          nBuckets = 8, lo = lo, hi = hi, windowDays = 7)})"""
      arm("user_id", 0.0, 1000.0) + " UNION ALL " +
        arm("value", 0.0, 500.0) + " ORDER BY day, feature, bucket"
    },

    "w_rolling_psi_cat" -> (graft.operators.Drift.rollingPsiCatOracleSql(
      "SELECT ts, event_type AS v FROM events",
      "SELECT event_type AS v FROM events" +
        " WHERE user_id % 2 = 0 AND event_type <> 'click'",
      windowDays = 7) + " ORDER BY day, category"),

    "w_rolling_psi_alarm" ->
      s"""SELECT day, ROUND(psi, 6) AS psi, status
         FROM (${graft.operators.Drift.rollingPsiSummaryOracleSql(
        "SELECT ts, value AS v FROM events",
        "SELECT value AS v FROM events WHERE event_type = 'purchase'",
        nBuckets = 10, lo = 0.0, hi = 500.0, windowDays = 7)}) q
       ORDER BY day""",

    // the three sub-oracles unioned with the same shaping — status on
    // the unrounded fold, value rounded at 6, like each leaf
    "w_drift_report" -> {
      val values = "SELECT ts, value AS v FROM events"
      val refNum = "SELECT value AS v FROM events WHERE user_id % 2 = 0"
      val catVals = "SELECT ts, event_type AS v FROM events"
      val refCat =
        "SELECT event_type AS v FROM events WHERE user_id % 2 = 0"
      val ksVals =
        "SELECT ts, CAST(FLOOR(value) AS BIGINT) AS v FROM events"
      val refKs = "SELECT CAST(FLOOR(value) AS BIGINT) AS v FROM events" +
        " WHERE user_id % 2 = 0"
      s"""SELECT day, 'psi_value' AS metric, ROUND(psi, 6) AS value, status
         FROM (${graft.operators.Drift.rollingPsiSummaryOracleSql(
        values, refNum, nBuckets = 10, lo = 0.0, hi = 500.0,
        windowDays = 7)})
       UNION ALL
       SELECT day, 'psi_cat' AS metric,
         ROUND(LIST_SUM(LIST(contrib ORDER BY category)), 6) AS value,
         CASE WHEN LIST_SUM(LIST(contrib ORDER BY category)) < 0.1
              THEN 'stable'
              WHEN LIST_SUM(LIST(contrib ORDER BY category)) < 0.25
              THEN 'watch' ELSE 'action' END AS status
       FROM (${graft.operators.Drift.rollingPsiCatOracleSql(
        catVals, refCat, windowDays = 7)})
       GROUP BY day
       UNION ALL
       SELECT day, 'ks_gap' AS metric, ROUND(MAX(gap), 6) AS value,
         CASE WHEN MAX(gap) < 0.1 THEN 'stable'
              WHEN MAX(gap) < 0.25 THEN 'watch'
              ELSE 'action' END AS status
       FROM (${graft.operators.Drift.rollingKsOracleSql(
        ksVals, refKs, windowDays = 7)})
       GROUP BY day
       ORDER BY day, metric"""
    },

    // per-group single-stream replays of the w_drift_report oracle,
    // tagged with the group literal and UNION'd — the reference arm is
    // IDENTICAL (unfiltered by group) in all three
    "w_drift_report_by_group" -> {
      def arm(g: Int): String = {
        val values = s"SELECT ts, value AS v FROM events WHERE user_id % 3 = $g"
        val refNum = "SELECT value AS v FROM events WHERE user_id % 2 = 0"
        val catVals =
          s"SELECT ts, event_type AS v FROM events WHERE user_id % 3 = $g"
        val refCat =
          "SELECT event_type AS v FROM events WHERE user_id % 2 = 0"
        val ksVals = "SELECT ts, CAST(FLOOR(value) AS BIGINT) AS v " +
          s"FROM events WHERE user_id % 3 = $g"
        val refKs = "SELECT CAST(FLOOR(value) AS BIGINT) AS v FROM events" +
          " WHERE user_id % 2 = 0"
        s"""SELECT $g AS src, day, 'psi_value' AS metric,
           ROUND(psi, 6) AS value, status
         FROM (${graft.operators.Drift.rollingPsiSummaryOracleSql(
          values, refNum, nBuckets = 10, lo = 0.0, hi = 500.0,
          windowDays = 7)})
       UNION ALL
       SELECT $g AS src, day, 'psi_cat' AS metric,
         ROUND(LIST_SUM(LIST(contrib ORDER BY category)), 6) AS value,
         CASE WHEN LIST_SUM(LIST(contrib ORDER BY category)) < 0.1
              THEN 'stable'
              WHEN LIST_SUM(LIST(contrib ORDER BY category)) < 0.25
              THEN 'watch' ELSE 'action' END AS status
       FROM (${graft.operators.Drift.rollingPsiCatOracleSql(
          catVals, refCat, windowDays = 7)})
       GROUP BY day
       UNION ALL
       SELECT $g AS src, day, 'ks_gap' AS metric,
         ROUND(MAX(gap), 6) AS value,
         CASE WHEN MAX(gap) < 0.1 THEN 'stable'
              WHEN MAX(gap) < 0.25 THEN 'watch'
              ELSE 'action' END AS status
       FROM (${graft.operators.Drift.rollingKsOracleSql(
          ksVals, refKs, windowDays = 7)})
       GROUP BY day"""
      }
      (0 to 2).map(arm).mkString("", " UNION ALL ",
        " ORDER BY src, day, metric")
    },

    // per-group single-stream replays with the SAME (unfiltered)
    // reference arm, tagged and UNION'd — the per-group support rule
    // must be invisible in the result
    "w_rolling_ks_by_group" -> {
      def arm(g: Int): String =
        s"""SELECT $g AS src, day, v, ROUND(cdf_ref, 6) AS cdf_ref,
           ROUND(cdf_cur, 6) AS cdf_cur, ROUND(gap, 6) AS gap
         FROM (${graft.operators.Drift.rollingKsOracleSql(
          "SELECT ts, CAST(FLOOR(value) AS BIGINT) AS v FROM events" +
            s" WHERE user_id % 3 = $g",
          "SELECT CAST(FLOOR(value) AS BIGINT) AS v FROM events" +
            " WHERE event_type = 'purchase'",
          windowDays = 7)}) q$g"""
      (0 to 2).map(arm).mkString("", " UNION ALL ",
        " ORDER BY src, day, v")
    },

    "w_rolling_ks" ->
      s"""SELECT day, v, ROUND(cdf_ref, 6) AS cdf_ref,
           ROUND(cdf_cur, 6) AS cdf_cur, ROUND(gap, 6) AS gap
         FROM (${graft.operators.Drift.rollingKsOracleSql(
        "SELECT ts, CAST(FLOOR(value) AS BIGINT) AS v FROM events",
        "SELECT CAST(FLOOR(value) AS BIGINT) AS v FROM events" +
          " WHERE event_type = 'purchase'",
        windowDays = 7)}) q ORDER BY day, v""")
}
