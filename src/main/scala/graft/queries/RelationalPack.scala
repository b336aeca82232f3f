package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables.table

/** Core relational operators from SURVEY.md §2.2–§2.4, §2.7, re-expressed
  * over the harness star schema.
  *
  * Coverage: A1 group-by mean, A2 group quantiles+IQR, A6 distinct,
  * A7 count, A8 deterministic stratified per-group sampling, J1 N-way wide
  * combine (ref: combiners/archive/combiner.py:132-179), J2 full-outer
  * recombine with key coalescing (ref: combiners/recombiner/recombiner.py:143-178),
  * J3 scaffold completion (ref: collectors/gee/gee_export_pipeline.py:157-176),
  * J5 equi-join, P5/P6/P7 filters (ref: collectors/pm25/pm25_pipeline.py:120-138),
  * U1 union.
  */
object RelationalPack extends QueryPack {
  private val DEC = "decimal(18,2)"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A7/F11: grouped aggregation with exact decimal sums (TPC-H Q1 shape).
    "q1_pricing_summary" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // Decimal internally for exactness; DOUBLE on the way out so the
          // driver's hash layer sees the same type as DuckDB (decimal
          // precision metadata differs across engines even at equal values).
          sum(col("l_quantity").cast(DEC)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(DEC)).cast("double").as("sum_base_price"),
          // decimal-factor arithmetic: casting a *product* of doubles to
          // decimal diverges between engines (JVM shortest-string rounding
          // vs binary-value rounding); casting each source column first
          // keeps everything exact on both sides.
          sum(col("l_extendedprice").cast(DEC) *
              (lit(1) - col("l_discount").cast(DEC))).cast("double").as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // P1/P2: projection + dataset-prefix rename (the wide-combine
    // namespacing, ref: combiners/archive/combiner.py:181-208).
    "p2_prefix_rename" -> ((s, dir) => {
      graft.operators.WideCombiner
        .prefixColumns(table(s, dir, "region"), "region")
        .orderBy("region__r_regionkey")
    }),

    // P3: regex column projection (ref: spatial_imputation_manager.py:54-59).
    "p3_regex_projection" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val picked = li.columns.filter(_.matches("^l_(orderkey|linenumber|.*price|discount)$"))
      li.select(picked.map(col).toIndexedSeq: _*)
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
    }),

    // S6/S7/P4: partitioned stage write → hive scan → partition-pruned
    // read-back, checked against an independent recomputation
    // (ref: combined_storage.py:130-183). The harness events table spans a
    // single calendar month, so the stage partition key is a half-month
    // bucket ("2024-01-a"/"2024-01-b") — the prune then selects a real,
    // non-empty subset (round-1 gate ran this vacuously at 0 rows).
    "s6_partitioned_roundtrip" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast(DEC)).cast("double").as("total"))
        .withColumn("month",
          concat(date_format(col("day"), "yyyy-MM"),
                 when(dayofmonth(col("day")) <= 15, lit("-a")).otherwise(lit("-b"))))
        .withColumn("day", date_format(col("day"), "yyyy-MM-dd"))
      val root = java.nio.file.Files.createTempDirectory("graft-s6").toString
      val storage = new graft.core.StageStorage(s, root)
      storage.writePartitioned(daily, graft.core.StageRef("daily_user"))
      storage.scanStage(graft.core.StageRef("daily_user"))
        .filter(col("month") === "2024-01-a")
        .select("user_id", "day", "n", "total")
        .orderBy("user_id", "day")
    }),

    // J1: N-way inner combine on shared keys; small dims broadcast
    // (ref: combiners/archive/combiner.py:132-179 joins on key intersection).
    "j1_wide_combine" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      val r = table(s, dir, "region")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DEC)).cast("double").as("sum_total"))
        .orderBy("r_name", "n_name")
    }),

    // J2: full-outer join with coalesced keys + null-defaulting
    // (ref: recombiner.py:143-178, coalesce=True semantics of the Seq join).
    "j2_full_outer_coalesce" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_purchase"),
             sum(col("value").cast(DEC)).cast("double").as("purchase_total"))
      val errors = ev.filter(col("event_type") === "error")
        .groupBy("user_id").agg(count(lit(1)).as("n_error"))
      purchases.join(errors, Seq("user_id"), "full")
        .select(
          col("user_id"),
          coalesce(col("n_purchase"), lit(0L)).as("n_purchase"),
          col("purchase_total"),
          coalesce(col("n_error"), lit(0L)).as("n_error"))
        .orderBy("user_id")
    }),

    // J3/J4: cross-join scaffold (every user × every day) completed with a
    // left join; gaps stay null (ref: gee_export_pipeline.py:157-176,
    // pm25_pipeline.py:140-164).
    "j3_scaffold_complete" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val users = ev.select("user_id").distinct()
      val days = ev.select(to_date(col("ts")).as("day")).distinct()
      val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(DEC)).cast("double").as("total"))
      users.crossJoin(days)
        .join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day_s"),
                col("total"))
        .orderBy("user_id", "day_s")
    }),

    // A2: per-group exact quantiles + IQR (ref: collectors/pm25/data_source.py:63-78).
    "a2_group_quantiles" -> ((s, dir) => {
      // one percentile pass per bound; iqr derived, not recomputed
      table(s, dir, "events")
        .groupBy("user_id")
        .agg(
          expr("percentile(value, 0.25)").as("__q1"),
          expr("percentile(value, 0.75)").as("__q3"))
        .select(col("user_id"),
          round(col("__q1"), 4).as("q1"),
          round(col("__q3"), 4).as("q3"),
          round(col("__q3") - col("__q1"), 4).as("iqr"))
        .orderBy("user_id")
    }),

    // A8: deterministic per-stratum fraction sampling — multiplicative-hash
    // order + exact per-group ceil(fraction·count) cutoff. Replaces the
    // reference's opaque seeded sample with a portable deterministic rule
    // (ref: sample/imputation_sampler.py:75-96).
    "a8_stratified_sample" -> ((s, dir) => {
      val h = table(s, dir, "customer")
        .withColumn("hk", pmod(col("c_custkey") * lit(2654435761L), lit(1000000007L)))
      val w = Window.partitionBy("c_nationkey").orderBy("hk", "c_custkey")
      val wc = Window.partitionBy("c_nationkey")
      h.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(wc))
        .filter(col("rn") <= ceil(lit(0.1) * col("cnt")))
        .select("c_custkey", "c_nationkey")
        .orderBy("c_custkey")
    }),

    // P7/P8: label-marker filter chain — max-value, IQR-anomaly and
    // repeating-value (5-row rolling mean) markers, then filter label=="keep"
    // (ref: setup/pm25_filters.py:7-82, pm25_pipeline.py:120-138).
    "p7_label_filter_chain" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val stats = ev.groupBy("user_id")
        .agg(expr("percentile(value, 0.25)").as("q1"),
             expr("percentile(value, 0.75)").as("q3"))
        .withColumn("iqr", col("q3") - col("q1"))
      val w5 = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
      ev.join(stats, Seq("user_id"))
        .withColumn("rmean5",
          when(count(col("value")).over(w5) === 5, avg(col("value")).over(w5)))
        .withColumn("label", lit("keep"))
        .withColumn("label",
          when(col("value") >= 999.99, lit("drop")).otherwise(col("label")))
        .withColumn("label",
          when(col("value") > lit(15) * col("iqr"), lit("drop"))
            .otherwise(col("label")))
        .withColumn("label",
          when(abs(col("value") - col("rmean5")) < 0.05, lit("drop"))
            .otherwise(col("label")))
        .filter(col("label") === "keep")
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    }),

    // U1: vertical concat of same-schema slices (ref: ned_export_pipeline.py:217-218).
    "u1_union_all" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      val a = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "event_type")
      val b = ev.filter(col("event_type") === "signup")
        .select("event_id", "user_id", "event_type")
      a.unionByName(b).orderBy("event_id")
    }),

    // A10: CV-metric style aggregation — mean/stddev/min/max of per-group
    // scores (ref: training/imputation_model_pipeline.py:188-198).
    "a10_metric_summary" -> ((s, dir) => {
      val daily = table(s, dir, "events")
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      daily.groupBy("event_type")
        .agg(round(avg("n"), 4).as("mean_n"),
             round(stddev_samp(col("n")), 4).as("std_n"),
             min("n").as("min_n"), max("n").as("max_n"))
        .orderBy("event_type")
    }),

    // A6/P6: distinct over a date-range predicate (ref: pm25_pipeline.py:131-137).
    // Range sits inside the harness data's actual 2024-01 span so the
    // predicate selects a real subset (round-1 gate ran this at 0 rows).
    "a6_distinct_daterange" -> ((s, dir) => {
      table(s, dir, "events")
        .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
                col("ts") < lit("2024-01-21").cast("timestamp"))
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day_s"))
        .orderBy("user_id", "day_s")
    }),

    // S3: footer-only row count — the validator read that never scans
    // data (ref: combined_storage.py:74-88). The count comes from parquet
    // footer metadata via the real StageStorage path and must equal the
    // full scan.
    "s3_footer_count" -> ((s, dir) => {
      import s.implicits._
      val clicks = table(s, dir, "events")
        .filter(col("event_type") === "click")
      val root = java.nio.file.Files.createTempDirectory("graft-s3").toString
      val storage = new graft.core.StageStorage(s, root)
      val ref = graft.core.StageRef("clicks")
      storage.writeMonth(clicks, ref, "2024-01")
      val footer = storage.rowCount(ref, "2024-01")
      val scanned = storage.readMonth(ref, "2024-01").count()
      Seq((footer, scanned)).toDF("n_footer", "n_scan")
    }),

    // O3: sort + drop the working coordinates — the interpolator's
    // output shape (ref: daily_spatial_interpolator.py:110-114).
    "o3_sort_drop" -> ((s, dir) => {
      table(s, dir, "events")
        .withColumn("x", pmod(col("user_id") * 31, lit(100)))
        .withColumn("y", pmod(col("event_id") * 17, lit(100)))
        .orderBy("user_id", "event_id")
        .drop("x", "y", "ts", "props")
        .select("event_id", "user_id", "event_type", "value")
    }),

    // O4: "latest run" = lexicographic max over a run-directory listing,
    // through the real ModelStore path (ref: model_storage.py:155-181 —
    // run ids are sortable strings). Run dirs are synthesized from the
    // orders table's months so the oracle derives the same answer from
    // data.
    "o4_latest_run" -> ((s, dir) => {
      import s.implicits._
      val months = table(s, dir, "orders")
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"))
        .distinct().as[String].collect()
      val root = java.nio.file.Files.createTempDirectory("graft-o4").toString
      months.foreach { m =>
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(s"$root/gbt/run-$m"))
      }
      val latest = new graft.ml.ModelStore(s, root).latestRun("gbt")
      Seq(latest.getOrElse("")).toDF("latest_run")
    }),

    // U2: set algebra on column NAME sets (schema-level, the combine
    // managers' expected-vs-actual checks, ref: combine_manager.py:103-111)
    // — prefix-stripped customer vs supplier columns, classified by side.
    "u2_column_set_algebra" -> ((s, dir) => {
      import s.implicits._
      def strip(cs: Array[String]): Set[String] =
        cs.map(_.dropWhile(_ != '_').drop(1)).toSet
      val l = strip(table(s, dir, "customer").columns)
      val r = strip(table(s, dir, "supplier").columns)
      val rows = (l & r).toSeq.map(("both", _)) ++
        (l -- r).toSeq.map(("customer_only", _)) ++
        (r -- l).toSeq.map(("supplier_only", _))
      rows.toDF("side", "col").orderBy("side", "col")
    }),

    // F7: date parse/format round trip (ref: grid.py:139-142,
    // pm25_pipeline.py:72-74 strptime/cast/format).
    "f7_date_roundtrip" -> ((s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy/MM/dd").as("d_slash"))
        .withColumn("d_iso", date_format(
          to_date(col("d_slash"), "yyyy/MM/dd"), "yyyy-MM-dd"))
        .withColumn("yr", year(to_date(col("d_slash"), "yyyy/MM/dd")))
        .orderBy("o_orderkey")
    }),

    // PSI distribution drift between two slices over a fixed bucket
    // grid — per-bucket shares are exact divisions; ln() contributions
    // follow the transcendental-rounding convention.
    "a_psi_drift" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      graft.operators.Drift.psi(
          li.filter(col("l_returnflag") === "A"),
          li.filter(col("l_returnflag") === "N"),
          "l_quantity", nBuckets = 10, lo = 1.0, hi = 51.0)
        .select(col("bucket"),
          round(col("p_ref"), 6).as("p_ref"),
          round(col("p_cur"), 6).as("p_cur"),
          round(col("contrib"), 6).as("contrib"))
        .orderBy("bucket")
    }),

    // Rolling-origin (walk-forward) CV folds: train ≤ cut_f, test on
    // the next slice — summarized per (fold, role) so the oracle pins
    // both the rank-based cuts and the assignment.
    "a_rolling_origin_folds" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      graft.ml.TemporalCv.rollingOriginFolds(ev, "day", k = 4)
        .groupBy("fold", "role")
        .agg(count(lit(1)).as("n"),
          min("day").as("d_min"), max("day").as("d_max"))
        .orderBy("fold", "role")
    }),

    // Per-group winsorization: values clamped to exact [5%, 95%] group
    // percentiles — the heavy-tail complement of the IQR row filters
    // (cap, don't drop). Boundaries are one tiny agg broadcast back;
    // the clamp is map-side.
    "a_winsorize" -> ((s, dir) => {
      graft.operators.Winsorize.winsorize(
          table(s, dir, "lineitem"), Seq("l_returnflag"),
          "l_extendedprice", lo = 0.05, hi = 0.95)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round(col("l_extendedprice_w"), 4).as("price_w"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // The winsorize APPROX boundary pass facing the exact oracle: on
    // quantized scores (runs of thousands of identical values, G-K rank
    // error ≪ run length at accuracy=100000) the sketch boundary equals
    // the exact interpolated one, so approx must be INVISIBLE in the
    // result — the spec-proven equality, now driver-checked.
    "a_winsorize_approx" -> ((s, dir) => {
      val quantized = table(s, dir, "lineitem")
        .withColumn("price_q",
          (floor(col("l_extendedprice") / 5000) * 5000).cast("double"))
      graft.operators.Winsorize.winsorize(
          quantized, Seq("l_returnflag"), "price_q",
          lo = 0.05, hi = 0.95, approx = true, accuracy = 100000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          round(col("price_q_w"), 4).as("price_w"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Kolmogorov–Smirnov drift: the largest CDF gap anywhere between
    // purchase and non-purchase value distributions — binning-free
    // (PSI's complement); every CDF one IEEE division over exact
    // integer prefix sums, the gap a subtraction — all bit-replayed.
    "a_ks_drift" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_type"), floor(col("value")).cast("long").as("v"))
      graft.operators.Drift.ksTable(
          ev.where(col("event_type") === "purchase"),
          ev.where(col("event_type") =!= "purchase"), "v")
        .orderBy("v")
    }),

    // Grouped KS: one independent drift table per event_type (the
    // per-source monitor) between even- and odd-id event halves —
    // per-group windows, per-group totals, same exact-division parity.
    "a_ks_drift_by_group" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          floor(col("value")).cast("long").as("v"))
      graft.operators.Drift.ksTable(
          ev.where(col("event_id") % 2 === 0),
          ev.where(col("event_id") % 2 === 1), "v",
          groupCols = Seq("event_type"))
        .orderBy("event_type", "v")
    }),

    // Median/MAD robust z-scores per group (50% breakdown point — the
    // outliers can't drag the yardstick): two percentile aggs broadcast
    // back, score map-side; quantized values keep the interpolation
    // dyadic-exact. Zero-MAD groups yield NULL, identically both sides.
    "a_robust_z" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          floor(col("value")).cast("long").as("v"))
      graft.operators.RobustScore.robustZ(ev, Seq("event_type"), "v")
        .select(col("event_id"), col("event_type"), col("v"),
          round(col("v_med"), 4).as("v_med"),
          round(col("v_mad"), 4).as("v_mad"),
          round(col("v_rz"), 4).as("v_rz"))
        .orderBy("event_id")
    }),

    // Global percent-rank as a corpus feature, assembled from
    // range-partitioned local ranks + exact offsets (no single-partition
    // window over the corpus); the division is one IEEE op over exact
    // integers — bit-identical to the oracle's PERCENT_RANK.
    "a_percent_rank" -> ((s, dir) => {
      graft.operators.Sampling.globalPercentRank(
          table(s, dir, "events").select("event_id"), Seq("event_id"))
        .orderBy("event_id")
    }),

    // UNPIVOT/melt — the long-form inverse of the K4 raster pivot:
    // four measure columns per line item become (measure, val) rows
    // via stack() (one generator pass, no join, no shuffle until the
    // output sort). Raw column doubles pass through bit-exact.
    "p_unpivot_measures" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .where(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("""stack(4,
            'quantity', l_quantity,
            'extendedprice', l_extendedprice,
            'discount', l_discount,
            'tax', l_tax) AS (measure, val)"""))
        .orderBy("l_orderkey", "l_linenumber", "measure")
    }),

    // ROLLUP: hierarchical subtotals (flag, flag+status, grand total)
    // in ONE pass — the reporting aggregation a naive union of three
    // groupBys would triple-scan for. grouping_id disambiguates
    // subtotal rows from genuine-null groups; sums go through the
    // DECIMAL convention.
    "a_rollup_pricing" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("gid", "l_returnflag", "l_linestatus")
    }),

    // CUBE: every grouping-set combination incl. the status-only
    // marginal ROLLUP cannot express — same single-pass contract.
    "a_cube_pricing" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("gid", "l_returnflag", "l_linestatus")
    }),

    // Per-group equi-depth decile binning — the deterministic ntile:
    // bucket is a pure function of the VALUE (ties share a bucket), so
    // unlike ntile the whole assignment replays in SQL. Quantized
    // values keep the interpolated cuts dyadic-exact on both engines.
    "a_equidepth_buckets" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          floor(col("value")).cast("long").as("v"))
      graft.operators.Bucketize.equiDepth(ev, Seq("event_type"), "v",
          nBuckets = 10)
        .select("event_id", "event_type", "v", "v_bucket")
        .orderBy("event_id")
    }),

    // Bradley–Terry skill ranking from pairwise preferences — the
    // RLHF/eval-judging aggregation: suppliers "win" in-order quantity
    // comparisons, 8 fixed-point integer MM steps turn the game set
    // into latent strengths the oracle replays bit-for-bit (the
    // integer-PageRank parity contract, extended to preference data).
    "a_bradley_terry" -> ((s, dir) => {
      val l = table(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_quantity")
      val games = l.as("x").join(l.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_quantity") > col("y.l_quantity") &&
            col("x.l_suppkey") =!= col("y.l_suppkey"))
        .select(col("x.l_suppkey").as("winner"),
          col("y.l_suppkey").as("loser"))
      graft.ml.BradleyTerry.ranks(games, "winner", "loser", iterations = 8)
        .orderBy("player")
    }),

    // Exact Spearman rank correlation — do two scorers RANK the corpus
    // the same way (char length vs token count here): midranks exact
    // via the AUC construction, sums in the DECIMAL(38,0) lane (rank
    // sums grow N³ past 64 bits near N≈1.3M), difference terms exact,
    // one sqrt/divide tree rounded per convention.
    "a_spearman" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(
        col("n_chars").cast("long").as("x"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("y"))
      graft.ml.Correlation.spearman(docs, "x", "y")
        .select(col("n"), round(col("spearman"), 4).as("spearman"))
    }),

    // Per-group Spearman — the per-domain agreement slice, mirroring
    // rocAucByGroup: group-partitioned midrank prefix sums (no
    // partition-less window at any cardinality), one DECIMAL(38,0)
    // rollup per group.
    "a_spearman_by_group" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(
        col("source"),
        col("n_chars").cast("long").as("x"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("y"))
      graft.ml.Correlation.spearmanByGroup(docs, Seq("source"), "x", "y")
        .select(col("source"), col("n"),
          round(col("spearman"), 4).as("spearman"))
        .orderBy("source")
    }),

    // Per-group ROC-AUC — the per-domain eval slice: does value rank
    // purchases above other events INSIDE each event day-of-week
    // cohort (a deliberately coarser group than event_type so both
    // classes exist per group). Group-partitioned prefix sums — no
    // single-partition window even at corpus scale.
    "a_roc_auc_by_group" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(pmod(col("user_id"), lit(4L)).as("cohort"),
          col("value").as("s"),
          (col("event_type") === "purchase").as("y"))
      graft.ml.Auc.rocAucByGroup(ev, Seq("cohort"), "s", "y")
        .orderBy("cohort")
    }),

    // Cohen's kappa — do two quality annotators (char-length vs
    // token-count heuristics) agree beyond chance: the annotation-QA
    // gate for labeling pipelines. All-integer confusion/marginal
    // masses, kappa as ONE pinned division via (N·A − B)/(N² − B).
    "a_cohens_kappa" -> ((s, dir) => {
      val docs = table(s, dir, "documents").select(
        (col("n_chars") >= 400).as("a"),
        (graft.text.TextFunctions.tokenCount(col("text")) >= 60).as("b"))
      graft.ml.Agreement.cohensKappa(docs, "a", "b")
    }),

    // Exact ROC-AUC (Mann–Whitney with midranks): does event value
    // rank purchases above other events — the model-eval gate as one
    // number. The doubled-midrank sum is an exact BIGINT; AUC is one
    // pinned division, bit-replayed (raw parquet doubles group
    // identically on both engines; ties exercise the midrank path).
    "a_roc_auc" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("value").as("s"),
          (col("event_type") === "purchase").as("y"))
      graft.ml.Auc.rocAuc(ev, "s", "y")
    }),

    // NDCG@5 per user cohort — the ranking-eval gate: does event value
    // rank high-intent events (purchase=3, signup=2, click=1) to the
    // top of each cohort's list. Per-query top-k via the k-bounded
    // heap (no rank window sorts whole groups); both orders tie-break
    // on event_id; rank-order left folds make the sums engine-stable,
    // logs rounded at 6 per the transcendental convention.
    "a_ndcg" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(pmod(col("user_id"), lit(25L)).as("cohort"),
          col("event_id"), col("value"),
          when(col("event_type") === "purchase", 3L)
            .when(col("event_type") === "signup", 2L)
            .when(col("event_type") === "click", 1L)
            .otherwise(0L).as("rel"))
      graft.ml.Ranking.ndcgAtK(ev, Seq("cohort"), "event_id", "value",
          "rel", k = 5)
        .orderBy("cohort")
    }),

    // Precision/Recall/MRR@5 per cohort — the set-based retrieval
    // metrics beside NDCG: single divisions of exact integers, so the
    // whole row is bit-exact with no rounding.
    "a_retrieval_at_k" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(pmod(col("user_id"), lit(25L)).as("cohort"),
          col("event_id"), col("value"),
          when(col("event_type") === "purchase", 3L)
            .when(col("event_type") === "signup", 2L)
            .when(col("event_type") === "click", 1L)
            .otherwise(0L).as("rel"))
      graft.ml.Ranking.retrievalAtK(ev, Seq("cohort"), "event_id", "value",
          "rel", k = 5)
        .orderBy("cohort")
    }),

    // Fleiss' kappa over a 3-rater panel (three length-proxy quality
    // raters per document): the multi-annotator agreement gate. All
    // terms exact in the DECIMAL(38,0) lane, ONE pinned division;
    // ragged panels abort in-plan.
    "a_fleiss_kappa" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      def rate(c: org.apache.spark.sql.Column) =
        docs.select(col("doc_id").as("i"),
          when(c, "hi").otherwise("lo").as("c"))
      val ratings = rate(col("n_chars") >= 400)
        .unionByName(rate(
          graft.text.TextFunctions.tokenCount(col("text")) >= 60))
        .unionByName(rate(col("n_chars") >= 300))
      graft.ml.Agreement.fleissKappa(ratings, "i", "c")
    }),

    // Classifier calibration over a closed-form pseudo-probability
    // (the fractional part of event value — exact in IEEE on both
    // engines, so bin assignment replays bit-for-bit): reliability
    // table + Brier/ECE summary. Counts exact; conf/brier/ece are
    // AVG-class, rounded at 6.
    "a_calibration" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select((col("value") - floor(col("value"))).as("p"),
          (col("event_type") === "purchase").as("y"))
      graft.ml.Calibration.reliabilityTable(ev, "p", "y", bins = 10)
        .orderBy("bin")
    }),
    "a_calibration_by_group" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(pmod(col("user_id"), lit(4L)).as("cohort"),
          (col("value") - floor(col("value"))).as("p"),
          (col("event_type") === "purchase").as("y"))
      graft.ml.Calibration.reliabilityTableByGroup(ev, Seq("cohort"),
          "p", "y", bins = 10)
        .orderBy("cohort", "bin")
    }),
    "a_brier_ece" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select((col("value") - floor(col("value"))).as("p"),
          (col("event_type") === "purchase").as("y"))
      graft.ml.Calibration.summary(ev, "p", "y", bins = 10)
    }),

    // Frequent-pair mining with a-priori pruning (Agrawal & Srikant
    // 1994): which part brands co-occur in the same order beyond the
    // 2% support floor, with exact counts and the pinned-tree
    // support/lift association measures. The threshold resolves
    // in-plan from the measured basket count — no driver action.
    "a_frequent_pairs" -> ((s, dir) => {
      val l = table(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      val p = table(s, dir, "part").select("p_partkey", "p_brand")
      val rel = l.join(p, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
      graft.operators.FrequentPairs
        .frequentPairs(rel, "basket", "item", minSupportFrac = 0.02)
        .orderBy("item_a", "item_b")
    }),

    // F12: all-null column rejection — one aggregation pass of
    // count(col) vs count(*) per column, the GeeCsvAdapter gate
    // (ref: gee_export_pipeline.py:186-196).
    "f12_allnull_reject" -> ((s, dir) => {
      import s.implicits._
      val ev = table(s, dir, "events")
        .withColumn("purchase_value",
          when(col("event_type") === "purchase", col("value")))
        .withColumn("ghost", lit(null).cast("double"))
      val checked = Seq("value", "purchase_value", "ghost")
      val agg = ev.agg(count(lit(1)).as("n_rows"),
        checked.map(c => count(col(c)).as(s"nn_$c")): _*).head()
      val n = agg.getAs[Long]("n_rows")
      checked.map(c => (c, agg.getAs[Long](s"nn_$c"), n))
        .toDF("col", "n_nonnull", "n_rows")
        .withColumn("rejected", col("n_nonnull") === 0)
        .orderBy("col")
    }),

    // Data-quality gates — the nightly promote/abort contract: range
    // and consistency predicates (ONE scan per table however many
    // gates), key uniqueness (one distinct agg), referential
    // integrity (LEFT ANTI counts). Exact BIGINT violation counts;
    // the events range gate is deliberately violated by the data so
    // a broken counting lane cannot hide behind all-zeros.
    "dq_gates" -> ((s, dir) => {
      import graft.operators.DataQuality._
      val ev = table(s, dir, "events")
      val docs = table(s, dir, "documents")
      val orders = table(s, dir, "orders")
      predicateGates(ev, Seq(
          Gate("events_value_in_range",
            col("value").isNull || col("value") < 0.01 || col("value") > 450),
          Gate("events_ts_in_2024", year(col("ts")) =!= 2024)))
        .unionAll(predicateGates(docs, Seq(
          Gate("docs_nchars_consistent", col("n_chars") =!= length(col("text"))),
          Gate("docs_lang_nonnull", col("lang").isNull))))
        .unionAll(predicateGates(orders, Seq(
          Gate("orders_price_positive", col("o_totalprice") <= 0))))
        .unionAll(uniquenessGate(ev, Seq("event_id"), "events_id_unique"))
        .unionAll(fkGate(orders, "o_custkey",
          table(s, dir, "customer"), "c_custkey", "orders_custkey_fk"))
        .unionAll(fkGate(table(s, dir, "lineitem"), "l_orderkey",
          orders, "o_orderkey", "lineitem_orderkey_fk"))
        .orderBy("check")
    }),

    // Per-nation OLS price trend — exact DECIMAL(38,0) normal-
    // equation sums over quantized (epoch-day, whole-dollar) lanes;
    // slope/intercept/r2 are pinned IEEE tails over exact terms, so
    // they hash without rounding.
    "a_group_trend" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      val rows = o.join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").cast("long").as("nation"),
          datediff(col("o_orderdate"), lit("1970-01-01")).as("x"),
          floor(col("o_totalprice")).cast("long").as("y"))
      graft.ml.Trend.groupedOls(rows, Seq("nation"), "x", "y")
        .orderBy("nation")
    }),

    // Mutual-information cell table between event type and the
    // value's 100-bucket — "does this cheap signal carry label
    // information": exact BIGINT masses, per-cell ln contributions
    // rounded per the transcendental convention (a global float sum
    // would be addition-order-dependent; the PSI posture).
    "a_mutual_information" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_type").as("x"),
          floor(col("value") / lit(100)).cast("long").as("y"))
      graft.operators.InfoTheory.miTable(ev, "x", "y")
        .orderBy("x", "y")
    }),

    // Per-source Gini impurity of the language mix — "how mixed is
    // each slice": Σc² in the DECIMAL(38,0) lane, gini ONE pinned
    // division — bit-exact, no rounding.
    "a_group_gini" -> ((s, dir) => {
      graft.operators.InfoTheory.giniByGroup(
          table(s, dir, "documents"), Seq("source"), "lang")
        .orderBy("source")
    }),

    // COMPOSED nightly monitor report — the artifact a 100 TB ingest
    // actually publishes: DQ gates, CUSUM level alarms, OLS ramps,
    // Wilson rates and shuffle-key skew unioned into one
    // (area, item, value, flag) frame. Every leaf is its own green
    // gate; this row pins that they COMPOSE (shapes, nullability,
    // ordering) without a bespoke pipeline.
    "dq_monitor_report" -> ((s, dir) => {
      import graft.operators._
      val ev = table(s, dir, "events")
      val gates = {
        import DataQuality._
        predicateGates(ev, Seq(
            Gate("events_value_in_range",
              col("value").isNull || col("value") < 0.01 || col("value") > 450),
            Gate("events_ts_in_2024", year(col("ts")) =!= 2024)))
          .unionAll(uniquenessGate(ev, Seq("event_id"), "events_id_unique"))
          .select(lit("dq").as("area"), col("check").as("item"),
            col("violations").cast("double").as("value"),
            (lit(1) - col("pass")).as("flag"))
      }
      val daily = ev.groupBy(col("event_type"),
          date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
        .agg(sum(floor(col("value")).cast("long")).as("v"))
      val cusum = Changepoint.cusum(daily, Seq("event_type"), Seq("day"),
          "v", driftK = 16000L, threshold = 8000L)
        .groupBy("event_type")
        .agg(sum(col("alarm")).as("n_alarms"), max(col("alarm")).as("mx"))
        .select(lit("cusum").as("area"), col("event_type").as("item"),
          col("n_alarms").cast("double").as("value"), col("mx").as("flag"))
      val trend = {
        val rows = table(s, dir, "orders")
          .join(table(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").cast("long").as("nation"),
            datediff(col("o_orderdate"), lit("1970-01-01")).as("x"),
            floor(col("o_totalprice")).cast("long").as("y"))
        graft.ml.Trend.groupedOls(rows, Seq("nation"), "x", "y")
          .select(lit("trend").as("area"),
            col("nation").cast("string").as("item"),
            col("slope").as("value"),
            when(abs(col("slope")) > 5.0, 1).otherwise(0).cast("int")
              .as("flag"))
      }
      val rate = Rates.wilson(
          ev.select(pmod(col("user_id"), lit(4L)).as("cohort"),
            (col("event_type") === "purchase").as("success")),
          Seq("cohort"), col("success"))
        .select(lit("rate").as("area"), col("cohort").cast("string").as("item"),
          col("rate").as("value"),
          when(col("lo") > 0.25, 1).otherwise(0).cast("int").as("flag"))
      val skew = KeySkew.loadProfile(ev, Seq("user_id"))
        .select(lit("skew").as("area"), lit("user_id").as("item"),
          col("gini_load").as("value"),
          when(col("gini_load") > 0.5, 1).otherwise(0).cast("int").as("flag"))
      gates.unionAll(cusum).unionAll(trend).unionAll(rate).unionAll(skew)
        .orderBy("area", "item")
    }),

    // Lead–lag scan: do clicks LEAD purchases day-over-day — Pearson
    // of (clicks_t, purchases_{t+lag}) per lag from exact DECIMAL
    // sums over the bounded daily series (the "series at rest"
    // contract); the corr tail is the pinned sqrt/divide tree,
    // rounded per the transcendental convention.
    "a_lead_lag" -> ((s, dir) => {
      val ev = table(s, dir, "events")
      def series(tp: String) = ev.filter(col("event_type") === tp)
        .groupBy(datediff(to_date(col("ts")), lit("1970-01-01")).as("t"))
        .agg(count(lit(1)).as("v"))
      graft.operators.LeadLag.crossCorrelation(
          series("click"), series("purchase"), "t", "v", maxLag = 5)
        .select(col("lag"), col("n"), round(col("corr"), 6).as("corr"))
        .orderBy("lag")
    }),

    // Wilson-interval rate monitor — per-cohort purchase rate with
    // honest small-n confidence bounds: exact (n, k) from one agg,
    // lo/hi a fixed IEEE tree both engines evaluate bit-identically.
    "a_rate_wilson" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(pmod(col("user_id"), lit(4L)).as("cohort"),
          (col("event_type") === "purchase").as("success"))
      graft.operators.Rates.wilson(ev, Seq("cohort"), col("success"))
        .orderBy("cohort")
    }),

    // Key-load skew profile — "is user_id safe to shuffle on":
    // exact key/row/hot-key masses + the Gini coefficient of the
    // per-key load via the tie-collapsed rank-run form over the load
    // HISTOGRAM (no per-key rank window; the prefix sum decomposed).
    "a_key_skew" -> ((s, dir) => {
      graft.operators.KeySkew.loadProfile(
        table(s, dir, "events"), Seq("user_id"))
    }),

    // One-way variance decomposition — "how much of the value does
    // the event type explain": exact DECIMAL(38,0) masses; the one
    // per-group division folds in group order on BOTH engines (the
    // list-fold idiom), so eta² is bit-exact with no rounding.
    "a_variance_decomp" -> ((s, dir) => {
      val ev = table(s, dir, "events")
        .select(col("event_type").as("g"),
          floor(col("value")).cast("long").as("y"))
      graft.operators.VarianceDecomp.etaSquared(ev, "g", "y")
    }))

  def oracles: Map[String, String] = Map(
    "a_roc_auc" -> graft.ml.Auc.oracleSql(
      "SELECT value AS s, event_type = 'purchase' AS y FROM events"),
    "a_spearman" -> (s"""SELECT n, ROUND(spearman, 4) AS spearman FROM (
      ${graft.ml.Correlation.oracleSql(
        """SELECT CAST(n_chars AS BIGINT) AS x,
             CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                  ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END
               AS BIGINT) AS y
           FROM documents""")})"""),
    "a_spearman_by_group" -> (s"""SELECT source, n,
        ROUND(spearman, 4) AS spearman FROM (
      ${graft.ml.Correlation.groupedOracleSql(
        """SELECT source, CAST(n_chars AS BIGINT) AS x,
             CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                  ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END
               AS BIGINT) AS y
           FROM documents""", groupCols = Seq("source"))})
      ORDER BY source"""),
    "a_roc_auc_by_group" -> (graft.ml.Auc.groupedOracleSql(
      """SELECT user_id % 4 AS cohort, value AS s,
           event_type = 'purchase' AS y FROM events""",
      groupCols = Seq("cohort")) + " ORDER BY cohort"),
    "a_cohens_kappa" -> graft.ml.Agreement.oracleSql(
      """SELECT n_chars >= 400 AS a,
           (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                 ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END) >= 60
             AS b
         FROM documents"""),
    "a_ndcg" -> (graft.ml.Ranking.oracleSql(
      """SELECT user_id % 25 AS cohort, event_id AS id, value AS s,
           CASE event_type WHEN 'purchase' THEN 3 WHEN 'signup' THEN 2
                WHEN 'click' THEN 1 ELSE 0 END AS rel
         FROM events""",
      queryCols = Seq("cohort"), k = 5) + " ORDER BY cohort"),
    "a_retrieval_at_k" -> (graft.ml.Ranking.retrievalOracleSql(
      """SELECT user_id % 25 AS cohort, event_id AS id, value AS s,
           CASE event_type WHEN 'purchase' THEN 3 WHEN 'signup' THEN 2
                WHEN 'click' THEN 1 ELSE 0 END AS rel
         FROM events""",
      queryCols = Seq("cohort"), k = 5) + " ORDER BY cohort"),
    "a_fleiss_kappa" -> graft.ml.Agreement.fleissOracleSql(
      """SELECT doc_id AS i,
           CASE WHEN n_chars >= 400 THEN 'hi' ELSE 'lo' END AS c
         FROM documents
         UNION ALL
         SELECT doc_id,
           CASE WHEN (CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                 ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END) >= 60
                THEN 'hi' ELSE 'lo' END
         FROM documents
         UNION ALL
         SELECT doc_id, CASE WHEN n_chars >= 300 THEN 'hi' ELSE 'lo' END
         FROM documents"""),
    "a_calibration" -> (graft.ml.Calibration.tableOracleSql(
      """SELECT value - FLOOR(value) AS p, event_type = 'purchase' AS y
         FROM events""", bins = 10) + " ORDER BY bin"),
    "a_calibration_by_group" -> (graft.ml.Calibration.groupedTableOracleSql(
      """SELECT user_id % 4 AS cohort, value - FLOOR(value) AS p,
           event_type = 'purchase' AS y FROM events""",
      groupCols = Seq("cohort"), bins = 10) + " ORDER BY cohort, bin"),
    "a_brier_ece" -> graft.ml.Calibration.summaryOracleSql(
      """SELECT value - FLOOR(value) AS p, event_type = 'purchase' AS y
         FROM events""", bins = 10),
    "p_unpivot_measures" ->
      """SELECT l_orderkey, l_linenumber, measure, val FROM (
           SELECT l_orderkey, l_linenumber,
             'quantity' AS measure, l_quantity AS val
           FROM lineitem WHERE l_orderkey % 50 = 0
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
           FROM lineitem WHERE l_orderkey % 50 = 0
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'discount', l_discount
           FROM lineitem WHERE l_orderkey % 50 = 0
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'tax', l_tax
           FROM lineitem WHERE l_orderkey % 50 = 0)
         ORDER BY l_orderkey, l_linenumber, measure""",
    "a_rollup_pricing" ->
      """SELECT 2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS gid,
         l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",
    "a_cube_pricing" ->
      """SELECT 2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS gid,
         l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS n
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",
    "a_equidepth_buckets" -> (graft.operators.Bucketize.oracleSql(
      """SELECT event_id, event_type, CAST(FLOOR(value) AS BIGINT) AS v
         FROM events""",
      groupCols = Seq("event_type"), nBuckets = 10,
      carryCols = Seq("event_id", "v")) + " ORDER BY r.event_id"),
    "a_bradley_terry" -> (graft.ml.BradleyTerry.oracleSql(
      """SELECT x.l_suppkey AS winner, y.l_suppkey AS loser
         FROM lineitem x JOIN lineitem y ON y.l_orderkey = x.l_orderkey
         WHERE x.l_quantity > y.l_quantity
           AND x.l_suppkey <> y.l_suppkey""",
      iterations = 8) + " ORDER BY 1"),
    "a_frequent_pairs" -> (graft.operators.FrequentPairs.oracleSql(
      """SELECT l_orderkey AS basket, p_brand AS item
         FROM lineitem JOIN part ON p_partkey = l_partkey""",
      minSupportFrac = 0.02) + " ORDER BY item_a, item_b"),
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         ROUND(AVG(l_quantity), 4) AS avg_qty,
         ROUND(AVG(l_discount), 4) AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "p2_prefix_rename" ->
      """SELECT r_regionkey AS region__r_regionkey, r_name AS region__r_name
         FROM region ORDER BY region__r_regionkey""",
    "p3_regex_projection" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice""",
    "s6_partitioned_roundtrip" ->
      """SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events
         WHERE STRFTIME(CAST(ts AS DATE), '%Y-%m') = '2024-01'
           AND DAY(CAST(ts AS DATE)) <= 15
         GROUP BY 1, 2 ORDER BY user_id, day""",
    "j1_wide_combine" ->
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "j2_full_outer_coalesce" ->
      """SELECT COALESCE(p.user_id, e.user_id) AS user_id,
         COALESCE(p.n_purchase, 0) AS n_purchase,
         CAST(p.purchase_total AS DOUBLE) AS purchase_total,
         COALESCE(e.n_error, 0) AS n_error
         FROM (SELECT user_id, COUNT(*) AS n_purchase,
                      SUM(CAST(value AS DECIMAL(18,2))) AS purchase_total
               FROM events WHERE event_type = 'purchase' GROUP BY user_id) p
         FULL OUTER JOIN
              (SELECT user_id, COUNT(*) AS n_error
               FROM events WHERE event_type = 'error' GROUP BY user_id) e
         ON p.user_id = e.user_id
         ORDER BY user_id""",
    "j3_scaffold_complete" ->
      """SELECT u.user_id AS user_id, CAST(d.day AS VARCHAR) AS day_s, CAST(t.total AS DOUBLE) AS total
         FROM (SELECT DISTINCT user_id FROM events) u
         CROSS JOIN (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) d
         LEFT JOIN (SELECT user_id, CAST(ts AS DATE) AS day,
                           SUM(CAST(value AS DECIMAL(18,2))) AS total
                    FROM events GROUP BY 1, 2) t
         ON t.user_id = u.user_id AND t.day = d.day
         ORDER BY user_id, day_s""",
    "a2_group_quantiles" ->
      """SELECT user_id,
         ROUND(QUANTILE_CONT(value, 0.25), 4) AS q1,
         ROUND(QUANTILE_CONT(value, 0.75), 4) AS q3,
         ROUND(QUANTILE_CONT(value, 0.75) - QUANTILE_CONT(value, 0.25), 4) + 0.0 AS iqr
         FROM events GROUP BY user_id ORDER BY user_id""",
    "a8_stratified_sample" ->
      """WITH h AS (SELECT c_custkey, c_nationkey,
                (c_custkey * 2654435761) % 1000000007 AS hk FROM customer),
         r AS (SELECT c_custkey, c_nationkey,
                ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY hk, c_custkey) AS rn,
                COUNT(*) OVER (PARTITION BY c_nationkey) AS cnt FROM h)
         SELECT c_custkey, c_nationkey FROM r
         WHERE rn <= CEIL(0.1 * cnt) ORDER BY c_custkey""",
    "p7_label_filter_chain" ->
      """WITH stats AS (SELECT user_id, QUANTILE_CONT(value, 0.75) AS q3,
                QUANTILE_CONT(value, 0.75) - QUANTILE_CONT(value, 0.25) AS iqr
               FROM events GROUP BY user_id),
         marked AS (
           SELECT e.event_id, e.user_id, e.value, s.q3, s.iqr,
             CASE WHEN COUNT(e.value) OVER w = 5 THEN AVG(e.value) OVER w END AS rmean5
           FROM events e JOIN stats s ON e.user_id = s.user_id
           WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts, e.event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
         labeled AS (
           SELECT event_id, user_id, value,
             CASE WHEN ABS(value - rmean5) < 0.05 THEN 'drop'
                  WHEN value > 15 * iqr THEN 'drop'
                  WHEN value >= 999.99 THEN 'drop'
                  ELSE 'keep' END AS label
           FROM marked)
         SELECT event_id, user_id, value FROM labeled
         WHERE label = 'keep' ORDER BY event_id""",
    "u1_union_all" ->
      """SELECT event_id, user_id, event_type FROM events WHERE event_type = 'click'
         UNION ALL
         SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
         ORDER BY event_id""",
    "a10_metric_summary" ->
      """WITH d AS (SELECT user_id, event_type, COUNT(*) AS n
                    FROM events GROUP BY 1, 2)
         SELECT event_type, ROUND(AVG(n), 4) AS mean_n,
           ROUND(STDDEV_SAMP(n), 4) AS std_n,
           MIN(n) AS min_n, MAX(n) AS max_n
         FROM d GROUP BY event_type ORDER BY event_type""",
    "a6_distinct_daterange" ->
      """SELECT DISTINCT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day_s
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-21'
         ORDER BY user_id, day_s""",
    // the footer count and the scan must both equal the plain COUNT
    "s3_footer_count" ->
      """SELECT COUNT(*) AS n_footer, COUNT(*) AS n_scan
         FROM events WHERE event_type = 'click'""",
    "o3_sort_drop" ->
      """SELECT event_id, user_id, event_type, value
         FROM events ORDER BY user_id, event_id""",
    "o4_latest_run" ->
      """SELECT 'run-' || MAX(STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m'))
           AS latest_run
         FROM orders""",
    // schema-level set algebra replayed over the catalog: the same
    // prefix-strip + intersection/difference on column-name sets
    "u2_column_set_algebra" ->
      """WITH l AS (SELECT REGEXP_REPLACE(column_name, '^[^_]*_', '') AS c
                    FROM information_schema.columns WHERE table_name = 'customer'),
         r AS (SELECT REGEXP_REPLACE(column_name, '^[^_]*_', '') AS c
               FROM information_schema.columns WHERE table_name = 'supplier')
         SELECT 'both' AS side, c AS col FROM l WHERE c IN (SELECT c FROM r)
         UNION ALL
         SELECT 'customer_only', c FROM l WHERE c NOT IN (SELECT c FROM r)
         UNION ALL
         SELECT 'supplier_only', c FROM r WHERE c NOT IN (SELECT c FROM l)
         ORDER BY side, col""",
    "f7_date_roundtrip" ->
      """SELECT o_orderkey,
         STRFTIME(CAST(o_orderdate AS DATE), '%Y/%m/%d') AS d_slash,
         STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d_iso,
         CAST(YEAR(CAST(o_orderdate AS DATE)) AS INT) AS yr
         FROM orders ORDER BY o_orderkey""",
    "a_psi_drift" ->
      """WITH a AS (SELECT LEAST(GREATEST(FLOOR((l_quantity - 1.0) / 5.0), 0),
                                 9) AS bucket, COUNT(*) AS n
                    FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1),
         b AS (SELECT LEAST(GREATEST(FLOOR((l_quantity - 1.0) / 5.0), 0),
                            9) AS bucket, COUNT(*) AS n
               FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1),
         g AS (SELECT UNNEST(RANGE(0, 10)) AS bucket),
         p AS (SELECT g.bucket,
                 COALESCE(CAST(a.n AS DOUBLE) /
                   (SELECT SUM(n) FROM a), 0.0) AS p_ref,
                 COALESCE(CAST(b.n AS DOUBLE) /
                   (SELECT SUM(n) FROM b), 0.0) AS p_cur
               FROM g LEFT JOIN a ON a.bucket = g.bucket
                      LEFT JOIN b ON b.bucket = g.bucket)
         SELECT CAST(bucket AS INT) AS bucket,
           ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
           ROUND((GREATEST(p_cur, 0.0001) - GREATEST(p_ref, 0.0001))
                 * LN(GREATEST(p_cur, 0.0001) / GREATEST(p_ref, 0.0001)), 6)
             + 0.0 AS contrib
         FROM p ORDER BY bucket""",
    // rank-based cuts over the distinct-date sequence + the
    // train/test assignment, replayed with the same arithmetic
    "a_rolling_origin_folds" ->
      """WITH d AS (SELECT event_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
                    FROM events),
         dd AS (SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS r
                FROM (SELECT DISTINCT day FROM d)),
         nn AS (SELECT COUNT(*) AS n FROM dd),
         cuts AS (SELECT f, day AS cut
                  FROM dd, nn, range(1, 6) t(f)
                  WHERE r = CEIL(n * f / 5.0)),
         folds AS (SELECT lo.f AS fold, lo.cut AS cut_lo, hi.cut AS cut_hi
                   FROM cuts lo JOIN cuts hi ON hi.f = lo.f + 1
                   WHERE lo.f <= 4),
         asg AS (SELECT d.event_id, f.fold,
                   CASE WHEN d.day <= f.cut_lo THEN 'train'
                        WHEN d.day <= f.cut_hi THEN 'test' END AS role,
                   d.day
                 FROM d CROSS JOIN folds f)
         SELECT CAST(fold AS INT) AS fold, role, COUNT(*) AS n,
                MIN(day) AS d_min, MAX(day) AS d_max
         FROM asg WHERE role IS NOT NULL
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // native PERCENT_RANK vs the engine's decomposed global rank; the
    // (rank−1)/(N−1) division is exact-integer IEEE on both engines
    "a_percent_rank" ->
      """SELECT event_id, PERCENT_RANK() OVER (ORDER BY event_id) AS pr
         FROM events ORDER BY event_id""",
    // QUANTILE_CONT ≡ Spark percentile (the a2/scoreTiers parity surface)
    "a_winsorize" ->
      """WITH b AS (
           SELECT l_returnflag,
             QUANTILE_CONT(l_extendedprice, 0.05) AS plo,
             QUANTILE_CONT(l_extendedprice, 0.95) AS phi
           FROM lineitem GROUP BY 1)
         SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           ROUND(LEAST(GREATEST(CAST(l.l_extendedprice AS DOUBLE), b.plo),
                       b.phi), 4) + 0.0 AS price_w
         FROM lineitem l JOIN b USING (l_returnflag)
         ORDER BY l_orderkey, l_linenumber""",
    // prefix-sum CDFs over the joint support, exact integer counts,
    // one division each — the KS table replayed bit-for-bit
    "a_ks_drift" ->
      """WITH r AS (SELECT CAST(FLOOR(value) AS BIGINT) AS v FROM events
                    WHERE event_type = 'purchase' AND value IS NOT NULL),
         c AS (SELECT CAST(FLOOR(value) AS BIGINT) AS v FROM events
               WHERE event_type <> 'purchase' AND value IS NOT NULL),
         rc AS (SELECT v, COUNT(*) AS nr FROM r GROUP BY v),
         cc AS (SELECT v, COUNT(*) AS nc FROM c GROUP BY v),
         j AS (SELECT COALESCE(rc.v, cc.v) AS v,
                 COALESCE(nr, 0) AS nr, COALESCE(nc, 0) AS nc
               FROM rc FULL JOIN cc ON rc.v = cc.v),
         p AS (SELECT v,
                 SUM(nr) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cr,
                 SUM(nc) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cu,
                 (SELECT SUM(nr) FROM j) AS tr,
                 (SELECT SUM(nc) FROM j) AS tc
               FROM j)
         SELECT v,
           CAST(cr AS DOUBLE) / CAST(tr AS DOUBLE) AS cdf_ref,
           CAST(cu AS DOUBLE) / CAST(tc AS DOUBLE) AS cdf_cur,
           ABS(CAST(cr AS DOUBLE) / CAST(tr AS DOUBLE)
               - CAST(cu AS DOUBLE) / CAST(tc AS DOUBLE)) AS gap
         FROM p ORDER BY v""",
    // per-group prefix-sum CDFs, per-group totals — same exact parity
    "a_ks_drift_by_group" ->
      """WITH ev AS (SELECT event_id, event_type,
                       CAST(FLOOR(value) AS BIGINT) AS v
                     FROM events WHERE value IS NOT NULL),
         rc AS (SELECT event_type, v, COUNT(*) AS nr FROM ev
                WHERE event_id % 2 = 0 GROUP BY 1, 2),
         cc AS (SELECT event_type, v, COUNT(*) AS nc FROM ev
                WHERE event_id % 2 = 1 GROUP BY 1, 2),
         j AS (SELECT COALESCE(rc.event_type, cc.event_type) AS event_type,
                 COALESCE(rc.v, cc.v) AS v,
                 COALESCE(nr, 0) AS nr, COALESCE(nc, 0) AS nc
               FROM rc FULL JOIN cc
               ON rc.event_type = cc.event_type AND rc.v = cc.v),
         t AS (SELECT event_type, SUM(nr) AS tr, SUM(nc) AS tc
               FROM j GROUP BY 1),
         p AS (SELECT j.event_type, j.v,
                 SUM(nr) OVER (PARTITION BY j.event_type ORDER BY v
                               ROWS UNBOUNDED PRECEDING) AS cr,
                 SUM(nc) OVER (PARTITION BY j.event_type ORDER BY v
                               ROWS UNBOUNDED PRECEDING) AS cu,
                 t.tr, t.tc
               FROM j JOIN t USING (event_type))
         SELECT event_type, v,
           CASE WHEN tr > 0
                THEN CAST(cr AS DOUBLE) / CAST(tr AS DOUBLE) END AS cdf_ref,
           CASE WHEN tc > 0
                THEN CAST(cu AS DOUBLE) / CAST(tc AS DOUBLE) END AS cdf_cur,
           ABS(CASE WHEN tr > 0
                 THEN CAST(cr AS DOUBLE) / CAST(tr AS DOUBLE) END
               - CASE WHEN tc > 0
                 THEN CAST(cu AS DOUBLE) / CAST(tc AS DOUBLE) END) AS gap
         FROM p ORDER BY event_type, v""",
    // median/MAD replayed: same two QUANTILE_CONT passes, same pinned
    // (v - med) / (1.4826 * mad) tree, same NULL guard
    "a_robust_z" ->
      """WITH ev AS (
           SELECT event_id, event_type, CAST(FLOOR(value) AS BIGINT) AS v
           FROM events),
         med AS (
           SELECT event_type,
             QUANTILE_CONT(CAST(v AS DOUBLE), 0.5) AS v_med
           FROM ev GROUP BY 1),
         mad AS (
           SELECT e.event_type,
             QUANTILE_CONT(ABS(CAST(e.v AS DOUBLE) - m.v_med), 0.5) AS v_mad
           FROM ev e JOIN med m USING (event_type) GROUP BY 1)
         SELECT e.event_id, e.event_type, e.v,
           ROUND(m.v_med, 4) + 0.0 AS v_med,
           ROUND(d.v_mad, 4) + 0.0 AS v_mad,
           CASE WHEN e.v IS NOT NULL AND d.v_mad > 0
                THEN ROUND((CAST(e.v AS DOUBLE) - m.v_med)
                           / (1.4826 * d.v_mad), 4) + 0.0 END AS v_rz
         FROM ev e JOIN med m USING (event_type) JOIN mad d USING (event_type)
         ORDER BY e.event_id""",
    // the approx path faces the EXACT oracle: on quantized scores the
    // sketch boundary must coincide with QUANTILE_CONT's
    "a_winsorize_approx" ->
      """WITH q AS (
           SELECT l_orderkey, l_linenumber, l_returnflag,
             CAST(FLOOR(l_extendedprice / 5000) * 5000 AS DOUBLE) AS price_q
           FROM lineitem),
         b AS (
           SELECT l_returnflag,
             QUANTILE_CONT(price_q, 0.05) AS plo,
             QUANTILE_CONT(price_q, 0.95) AS phi
           FROM q GROUP BY 1)
         SELECT q.l_orderkey, q.l_linenumber, q.l_returnflag,
           ROUND(LEAST(GREATEST(q.price_q, b.plo), b.phi), 4) + 0.0 AS price_w
         FROM q JOIN b USING (l_returnflag)
         ORDER BY l_orderkey, l_linenumber""",
    "f12_allnull_reject" ->
      """WITH ev AS (
           SELECT value,
             CASE WHEN event_type = 'purchase' THEN value END AS purchase_value,
             CAST(NULL AS DOUBLE) AS ghost
           FROM events),
         counts AS (
           SELECT COUNT(*) AS n_rows, COUNT(value) AS nn_value,
             COUNT(purchase_value) AS nn_purchase_value, COUNT(ghost) AS nn_ghost
           FROM ev)
         SELECT 'ghost' AS col, nn_ghost AS n_nonnull, n_rows,
                nn_ghost = 0 AS rejected FROM counts
         UNION ALL
         SELECT 'purchase_value', nn_purchase_value, n_rows,
                nn_purchase_value = 0 FROM counts
         UNION ALL
         SELECT 'value', nn_value, n_rows, nn_value = 0 FROM counts
         ORDER BY col""",

    "dq_gates" ->
      """WITH ev AS (
           SELECT COUNT(*) AS total,
             COUNT(*) FILTER (WHERE value IS NULL OR value < 0.01
                              OR value > 450) AS v1,
             COUNT(*) FILTER (WHERE DATE_PART('year', ts) <> 2024) AS v2,
             COUNT(*) - COUNT(DISTINCT event_id) AS v3
           FROM events),
         dc AS (
           SELECT COUNT(*) AS total,
             COUNT(*) FILTER (WHERE n_chars <> LENGTH(text)) AS v1,
             COUNT(*) FILTER (WHERE lang IS NULL) AS v2
           FROM documents),
         od AS (
           SELECT COUNT(*) AS total,
             COUNT(*) FILTER (WHERE o_totalprice <= 0) AS v1
           FROM orders),
         ofk AS (
           SELECT (SELECT COUNT(*) FROM orders) AS total,
             (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS (
                SELECT 1 FROM customer c
                WHERE c.c_custkey = o.o_custkey)) AS v1),
         lfk AS (
           SELECT (SELECT COUNT(*) FROM lineitem) AS total,
             (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_orderkey = l.l_orderkey)) AS v1),
         g AS (
           SELECT 'events_value_in_range' AS chk, v1 AS violations, total FROM ev
           UNION ALL SELECT 'events_ts_in_2024', v2, total FROM ev
           UNION ALL SELECT 'events_id_unique', v3, total FROM ev
           UNION ALL SELECT 'docs_nchars_consistent', v1, total FROM dc
           UNION ALL SELECT 'docs_lang_nonnull', v2, total FROM dc
           UNION ALL SELECT 'orders_price_positive', v1, total FROM od
           UNION ALL SELECT 'orders_custkey_fk', v1, total FROM ofk
           UNION ALL SELECT 'lineitem_orderkey_fk', v1, total FROM lfk)
         SELECT chk AS "check", CAST(violations AS BIGINT) AS violations,
           CAST(total AS BIGINT) AS total,
           CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INTEGER) AS pass
         FROM g ORDER BY chk""",

    "a_group_trend" -> (graft.ml.Trend.oracleSql(
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
           DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS x,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS y
         FROM orders JOIN customer ON c_custkey = o_custkey""",
      Seq("nation")) + " ORDER BY nation"),

    "a_mutual_information" -> (graft.operators.InfoTheory.miOracleSql(
      """SELECT event_type AS x,
           CAST(FLOOR(value / 100) AS BIGINT) AS y FROM events""") +
      " ORDER BY x, y"),

    "a_group_gini" -> (graft.operators.InfoTheory.giniOracleSql(
      "SELECT source, lang AS label FROM documents", Seq("source")) +
      " ORDER BY source"),

    "a_variance_decomp" -> graft.operators.VarianceDecomp.oracleSql(
      """SELECT event_type AS g,
           CAST(FLOOR(value) AS BIGINT) AS y FROM events"""),

    "a_key_skew" -> graft.operators.KeySkew.oracleSql(
      "SELECT user_id FROM events", Seq("user_id")),

    "a_lead_lag" -> (s"""SELECT lag, n, ROUND(corr, 6) AS corr FROM (
      ${graft.operators.LeadLag.oracleSql(
        """SELECT DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
             COUNT(*) AS v FROM events WHERE event_type = 'click'
           GROUP BY 1""",
        """SELECT DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) AS t,
             COUNT(*) AS v FROM events WHERE event_type = 'purchase'
           GROUP BY 1""",
        maxLag = 5)}) ORDER BY lag"""),

    "a_rate_wilson" -> (graft.operators.Rates.oracleSql(
      """SELECT user_id % 4 AS cohort,
           event_type = 'purchase' AS success FROM events""",
      Seq("cohort")) + " ORDER BY cohort"),

    "dq_monitor_report" -> {
      val cusumSql = graft.operators.Changepoint.oracleSql(
        """SELECT event_type, STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2""",
        keyCols = Seq("event_type"), orderCols = Seq("day"),
        valueCol = "v", driftK = 16000L, threshold = 8000L)
      val trendSql = graft.ml.Trend.oracleSql(
        """SELECT CAST(c_nationkey AS BIGINT) AS nation,
             DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS x,
             CAST(FLOOR(o_totalprice) AS BIGINT) AS y
           FROM orders JOIN customer ON c_custkey = o_custkey""",
        Seq("nation"))
      val rateSql = graft.operators.Rates.oracleSql(
        """SELECT user_id % 4 AS cohort,
             event_type = 'purchase' AS success FROM events""",
        Seq("cohort"))
      val skewSql = graft.operators.KeySkew.oracleSql(
        "SELECT user_id FROM events", Seq("user_id"))
      s"""WITH evm AS (
           SELECT
             COUNT(*) FILTER (WHERE value IS NULL OR value < 0.01
                              OR value > 450) AS v1,
             COUNT(*) FILTER (WHERE DATE_PART('year', ts) <> 2024) AS v2,
             COUNT(*) - COUNT(DISTINCT event_id) AS v3
           FROM events),
         dq AS (
           SELECT 'dq' AS area, 'events_value_in_range' AS item,
             CAST(v1 AS DOUBLE) AS value,
             CAST(CASE WHEN v1 = 0 THEN 0 ELSE 1 END AS INTEGER) AS flag
           FROM evm
           UNION ALL SELECT 'dq', 'events_ts_in_2024', CAST(v2 AS DOUBLE),
             CAST(CASE WHEN v2 = 0 THEN 0 ELSE 1 END AS INTEGER) FROM evm
           UNION ALL SELECT 'dq', 'events_id_unique', CAST(v3 AS DOUBLE),
             CAST(CASE WHEN v3 = 0 THEN 0 ELSE 1 END AS INTEGER) FROM evm),
         cus AS (
           SELECT 'cusum' AS area, event_type AS item,
             CAST(SUM(alarm) AS DOUBLE) AS value,
             CAST(MAX(alarm) AS INTEGER) AS flag
           FROM ($cusumSql) GROUP BY event_type),
         tr AS (
           SELECT 'trend' AS area, CAST(nation AS VARCHAR) AS item,
             slope AS value,
             CAST(CASE WHEN ABS(slope) > 5.0 THEN 1 ELSE 0 END AS INTEGER)
               AS flag
           FROM ($trendSql)),
         ra AS (
           SELECT 'rate' AS area, CAST(cohort AS VARCHAR) AS item,
             rate AS value,
             CAST(CASE WHEN lo > 0.25 THEN 1 ELSE 0 END AS INTEGER) AS flag
           FROM ($rateSql)),
         sk AS (
           SELECT 'skew' AS area, 'user_id' AS item, gini_load AS value,
             CAST(CASE WHEN gini_load > 0.5 THEN 1 ELSE 0 END AS INTEGER)
               AS flag
           FROM ($skewSql))
         SELECT * FROM (
           SELECT * FROM dq UNION ALL SELECT * FROM cus
           UNION ALL SELECT * FROM tr UNION ALL SELECT * FROM ra
           UNION ALL SELECT * FROM sk)
         ORDER BY area, item"""
    })
}
