package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two frames — the data-quality
  * check a production pipeline runs on every new stage output ("did
  * today's batch shift against the training distribution?").
  *
  * PSI (population stability index), the standard industry metric:
  * bucket both sides on a FIXED equal-width grid, compare bucket
  * shares, `PSI = Σ (p_cur − p_ref) · ln(p_cur / p_ref)` with epsilon
  * smoothing for empty buckets (rule of thumb: < 0.1 stable, > 0.25
  * action). Fixed explicit bounds — not data-driven percentiles — so
  * the grid is identical on both sides and across days.
  *
  * 100 TB shape: each side is ONE map-side-combined bucket count
  * (shuffle = nBuckets rows per side), joined on the bucket id; no row
  * ever crosses between the frames. ln() is the only transcendental —
  * per the pack convention its contributions are reported rounded,
  * with error ~1e-16 against a 1e-6 quantum.
  */
object Drift {

  /** Per-bucket drift table: (bucket, p_ref, p_cur, contrib) +
    * lo/hi clamped edges; sum `contrib` for the PSI.
    */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
          nBuckets: Int, lo: Double, hi: Double,
          eps: Double = 1e-4): DataFrame = {
    require(nBuckets > 0 && hi > lo, s"bad grid [$lo, $hi) x $nBuckets")
    val w = (hi - lo) / nBuckets
    def bucket(c: Column): Column =
      least(greatest(floor((c.cast("double") - lo) / w), lit(0.0)),
        lit((nBuckets - 1).toDouble)).cast("int")
    def shares(df: DataFrame, name: String): DataFrame = {
      // nulls leave the distribution entirely (numerator AND
      // denominator): counting them in the total while their null
      // bucket drops out of the grid join would silently deflate every
      // share, and with it the PSI
      val b = df.filter(col(valueCol).isNotNull)
        .select(bucket(col(valueCol)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("__n"))
      val total = b.agg(sum(col("__n")).as("__tot")) // one-row broadcast
      b.crossJoin(broadcast(total))
        .select(col("bucket"),
          (col("__n").cast("double") / col("__tot").cast("double")).as(name))
    }
    val grid = ref.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as("bucket"))
    val p = grid
      .join(shares(ref, "p_ref"), Seq("bucket"), "left")
      .join(shares(cur, "p_cur"), Seq("bucket"), "left")
      .na.fill(0.0, Seq("p_ref", "p_cur"))
    val pr = greatest(col("p_ref"), lit(eps))
    val pc = greatest(col("p_cur"), lit(eps))
    p.withColumn("contrib", (pc - pr) * log(pc / pr))
  }

  /** TRAILING-WINDOW PSI — the drift twin of [[SlidingDistinct
    * .rollingDistinct]]'s scatter idiom, closing the monitor family's
    * gap: CUSUM watches a series' LEVEL, this watches its trailing
    * DISTRIBUTION. One row per (observed day, bucket): the PSI
    * contribution of that bucket over the window covering the day and
    * the `windowDays − 1` before it, against a PINNED reference frame
    * (the training snapshot). Σ contrib per day is that day's PSI.
    *
    * Execution is the scatter idiom end-to-end: the corpus reduces
    * ONCE to per-day bucket counts (the only corpus-sized shuffle),
    * each day's counts post to every window that contains the day (a
    * bounded `windowDays` explode + ONE equi-shuffle on (day, bucket)
    * — no non-equi join, no per-window rescan), per-day totals and
    * reference shares ride broadcasts. The reference side is one
    * bounded aggregation of the pinned frame. NULL timestamps abort
    * loudly (the SlidingDistinct posture); NULL values leave the
    * distribution entirely, like [[psi]].
    *
    * Windows ending on unobserved days do not emit (absence of ANY
    * corpus row that day is its own signal — the [[DataQuality]]
    * gates watch volume); empty buckets within an observed window
    * surface as share 0 → `eps`, exactly [[psi]]'s smoothing.
    */
  def rollingPsi(df: DataFrame, tsCol: String, valueCol: String,
                 ref: DataFrame, nBuckets: Int, lo: Double, hi: Double,
                 windowDays: Int, eps: Double = 1e-4,
                 groupCols: Seq[String] = Nil): DataFrame = {
    require(nBuckets > 0 && hi > lo, s"bad grid [$lo, $hi) x $nBuckets")
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays out of [1,366]: $windowDays")
    val w = (hi - lo) / nBuckets
    def bucket(c: Column): Column =
      least(greatest(floor((c.cast("double") - lo) / w), lit(0.0)),
        lit((nBuckets - 1).toDouble)).cast("int")
    val withDay = df
      .filter(col(valueCol).isNotNull)
      .withColumn("__day",
        when(col(tsCol).isNull, raise_error(lit(
            s"Drift.rollingPsi: NULL $tsCol — filter or repair null " +
              "timestamps upstream")))
          .otherwise(to_date(col(tsCol))))
    // the ONE corpus-sized reduction; feeds the day list AND the
    // scatter — cut once (the Triangles lesson). With `groupCols`
    // (source, langid, tier…) every bounded dimension below simply
    // gains the group key — still one corpus reduction, one scatter.
    val daily = withDay
      .select(groupCols.map(col) ++
        Seq(col("__day").as("day"), bucket(col(valueCol)).as("bucket")): _*)
      .groupBy((groupCols ++ Seq("day", "bucket")).map(col): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    rollingPsiFromDailyCounts(daily, ref, valueCol, nBuckets, lo, hi,
      windowDays, eps, groupCols)
  }

  /** The window-assembly stage of [[rollingPsi]] over an ALREADY
    * REDUCED per-day bucket count table `(day DATE, bucket INT,
    * n LONG)` — factored out so the streaming twin
    * ([[graft.streaming.EventsStream.psiDailyCountsStream]], which
    * maintains exactly this table as keyed state) shares the batch
    * semantics literally: feed its emitted counts here and the output
    * is row-identical to [[rollingPsi]] over the replayed corpus
    * (StreamingSpec pins it). Everything downstream of the corpus
    * reduction is bounded (days × buckets), so this stage is cheap on
    * either path.
    */
  def rollingPsiFromDailyCounts(daily: DataFrame, ref: DataFrame,
                                valueCol: String, nBuckets: Int, lo: Double,
                                hi: Double, windowDays: Int,
                                eps: Double = 1e-4,
                                groupCols: Seq[String] = Nil): DataFrame = {
    require(nBuckets > 0 && hi > lo, s"bad grid [$lo, $hi) x $nBuckets")
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays out of [1,366]: $windowDays")
    val w = (hi - lo) / nBuckets
    def bucket(c: Column): Column =
      least(greatest(floor((c.cast("double") - lo) / w), lit(0.0)),
        lit((nBuckets - 1).toDouble)).cast("int")
    val spark = daily.sparkSession
    val gc = groupCols.map(col)
    // observed days PER GROUP: a group quiet on some days emits exactly
    // the rows its single-stream run would — grouped output ≡ the
    // per-group union, bit for bit (DriftSpec pins it)
    val days = daily.select(gc :+ col("day"): _*).distinct()
    val scattered = daily
      .select(gc ++ Seq(col("day").as("__day"), col("bucket"),
        col("n").as("__n"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__off")): _*)
      .select(gc ++ Seq(date_add(col("__day"), col("__off")).as("day"),
        col("bucket"), col("__n")): _*)
    val windowed = scattered
      .join(broadcast(days), groupCols :+ "day")
      .groupBy((groupCols ++ Seq("day", "bucket")).map(col): _*)
      .agg(sum(col("__n")).as("__wn"))
    val totals = windowed.groupBy((groupCols :+ "day").map(col): _*)
      .agg(sum(col("__wn")).as("__tot"))
    // the reference is the ONE pinned distribution every group is
    // compared against (global, not per group) — per-group references
    // are just per-group calls
    val refB = ref.filter(col(valueCol).isNotNull)
      .select(bucket(col(valueCol)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("__rn"))
    val refShares = refB
      .crossJoin(broadcast(refB.agg(sum(col("__rn")).as("__rtot"))))
      .select(col("bucket"),
        (col("__rn").cast("double") / col("__rtot").cast("double"))
          .as("p_ref"))
    // full (observed group-day) × bucket grid: empty buckets must
    // surface as 0 shares for the eps smoothing, like psi's grid
    // left-joins (days already carries the group key)
    val grid = days.crossJoin(broadcast(
      spark.range(nBuckets).select(col("id").cast("int").as("bucket"))))
    val p = grid
      .join(windowed, groupCols ++ Seq("day", "bucket"), "left")
      .join(broadcast(totals), groupCols :+ "day")
      .join(broadcast(refShares), Seq("bucket"), "left")
      .select(gc ++ Seq(col("day"), col("bucket"),
        coalesce(col("p_ref"), lit(0.0)).as("p_ref"),
        (coalesce(col("__wn"), lit(0L)).cast("double") /
          col("__tot").cast("double")).as("p_cur")): _*)
    val pr = greatest(col("p_ref"), lit(eps))
    val pc = greatest(col("p_cur"), lit(eps))
    p.withColumn("contrib", (pc - pr) * log(pc / pr))
  }

  /** Per-day PSI SUMMARY with alert classification over
    * [[rollingPsi]] — the row a drift dashboard actually pages on:
    * `(day, psi, status)` with the industry thresholds (psi < 0.1
    * `stable`, < 0.25 `watch`, else `action`). The per-bucket
    * contributions are rounded at 6 FIRST and summed in bucket order
    * through one in-order fold (the embeddingShift pattern), so the
    * float total is deterministic under any partitioning and replays
    * bit-for-bit in SQL; the bucket list is nBuckets-bounded per day.
    */
  def rollingPsiSummary(df: DataFrame, tsCol: String, valueCol: String,
                        ref: DataFrame, nBuckets: Int, lo: Double,
                        hi: Double, windowDays: Int,
                        eps: Double = 1e-4,
                        groupCols: Seq[String] = Nil): DataFrame = {
    val gc = groupCols.map(col)
    val byDay = rollingPsi(df, tsCol, valueCol, ref, nBuckets, lo, hi,
        windowDays, eps, groupCols)
      .select(gc ++ Seq(col("day"),
        struct(col("bucket"), round(col("contrib"), 6).as("c")).as("bc")): _*)
      .groupBy((groupCols :+ "day").map(col): _*)
      .agg(sort_array(collect_list(col("bc"))).as("a"))
    val psi = aggregate(col("a"), lit(0.0),
      (acc, x) => acc + x.getField("c"))
    byDay.select(gc ++ Seq(col("day"), psi.as("psi"),
      when(psi < 0.1, lit("stable"))
        .when(psi < 0.25, lit("watch"))
        .otherwise(lit("action")).as("status")): _*)
  }

  /** DuckDB replay of [[rollingPsiSummary]]: the [[rollingPsiOracleSql]]
    * table folded per day in bucket order with the LIST left-fold
    * (bit-identical to Spark's `aggregate`), then the same threshold
    * CASE. Emits `(day, psi, status)` with `day` already formatted.
    */
  def rollingPsiSummaryOracleSql(valuesSql: String, refSql: String,
                                 nBuckets: Int, lo: Double, hi: Double,
                                 windowDays: Int,
                                 eps: Double = 1e-4): String =
    s"""WITH base AS (${rollingPsiOracleSql(valuesSql, refSql, nBuckets,
          lo, hi, windowDays, eps)}),
       folded AS (
         SELECT day,
           LIST_SUM(LIST(contrib ORDER BY bucket)) AS psi
         FROM base GROUP BY day)
       SELECT day, psi,
         CASE WHEN psi < 0.1 THEN 'stable'
              WHEN psi < 0.25 THEN 'watch'
              ELSE 'action' END AS status
       FROM folded"""

  /** Multi-FEATURE [[rollingPsi]]: one melt pass over the corpus, one
    * scatter, one PSI table per (window-end day, feature) — the
    * drift dashboard's actual shape ("which feature moved this
    * week"), without scanning the corpus once per feature. Each
    * feature brings its own fixed grid `(lo, hi)` (scales differ;
    * normalizing them onto one grid would hide drift in the smaller
    * ones); `features` maps column name → grid. Output adds a
    * `feature` column ahead of [[rollingPsi]]'s.
    *
    * Execution: the corpus melts map-side to `(day, feature, bucket)`
    * via one stacked projection (bucket arithmetic inlined per
    * feature — no per-row grid lookup), reduces ONCE, and everything
    * downstream is the [[rollingPsi]] pipeline with `feature` carried
    * through every key — still one corpus-sized shuffle total, not
    * one per feature. Observed days are tracked PER FEATURE: a
    * feature with NULLs on some days emits exactly the rows its
    * single-feature [[rollingPsi]] would — the stacked output is the
    * per-feature union, bit for bit.
    */
  def rollingPsiStacked(df: DataFrame, tsCol: String,
                        features: Map[String, (Double, Double)],
                        nBuckets: Int, ref: DataFrame, windowDays: Int,
                        eps: Double = 1e-4): DataFrame = {
    require(features.nonEmpty, "features must be non-empty")
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays out of [1,366]: $windowDays")
    features.foreach { case (c, (lo, hi)) =>
      require(hi > lo, s"bad grid [$lo, $hi) for feature $c") }
    val spark = df.sparkSession
    val feats = features.toSeq.sortBy(_._1)
    def bucket(c: Column, lo: Double, hi: Double): Column =
      least(greatest(floor((c.cast("double") - lo) /
        ((hi - lo) / nBuckets)), lit(0.0)),
        lit((nBuckets - 1).toDouble)).cast("int")
    def melt(src: DataFrame, withDay: Boolean): DataFrame = {
      val cells = array(feats.map { case (c, (lo, hi)) =>
        struct(lit(c).as("feature"),
          when(col(c).isNotNull, bucket(col(c), lo, hi)).as("bucket"))
      }: _*)
      val base = if (withDay)
        src.select(
          when(col(tsCol).isNull, raise_error(lit(
              s"Drift.rollingPsiStacked: NULL $tsCol — filter or repair " +
                "null timestamps upstream")))
            .otherwise(to_date(col(tsCol))).as("__day"),
          explode(cells).as("fc"))
      else src.select(lit(null).cast("date").as("__day"),
        explode(cells).as("fc"))
      // a NULL feature value leaves that feature's distribution (the
      // psi posture), not the whole row
      base.select(col("__day"), col("fc.feature").as("feature"),
          col("fc.bucket").as("bucket"))
        .filter(col("bucket").isNotNull)
    }
    val daily = melt(df, withDay = true)
      .groupBy("__day", "feature", "bucket").agg(count(lit(1)).as("__n"))
      .localCheckpoint() // feeds day list + scatter (Triangles lesson)
    // observed days PER FEATURE — each feature's windows anchor to its
    // own observed days (the per-feature rollingPsi semantics), not to
    // days where only some OTHER feature had data: features with
    // disjoint NULL patterns must produce exactly the single-feature
    // output, row for row
    val featDays = daily.select(col("feature"), col("__day").as("day"))
      .distinct()
    val windowed = daily
      .select(col("__day"), col("feature"), col("bucket"), col("__n"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__off"))
      .select(date_add(col("__day"), col("__off")).as("day"),
        col("feature"), col("bucket"), col("__n"))
      .join(broadcast(featDays), Seq("feature", "day"))
      .groupBy("day", "feature", "bucket").agg(sum(col("__n")).as("__wn"))
    val totals = windowed.groupBy("day", "feature")
      .agg(sum(col("__wn")).as("__tot"))
    val refB = melt(ref, withDay = false)
      .groupBy("feature", "bucket").agg(count(lit(1)).as("__rn"))
    val refShares = refB
      .join(broadcast(refB.groupBy("feature")
        .agg(sum(col("__rn")).as("__rtot"))), Seq("feature"))
      .select(col("feature"), col("bucket"),
        (col("__rn").cast("double") / col("__rtot").cast("double"))
          .as("p_ref"))
    // (feature, observed-for-that-feature day) × bucket — every grid
    // row's feature has data ON that day, so its window is non-empty
    // and the inner totals join below drops nothing
    val grid = featDays
      .crossJoin(broadcast(spark.range(nBuckets)
        .select(col("id").cast("int").as("bucket"))))
    val p = grid
      .join(windowed, Seq("day", "feature", "bucket"), "left")
      .join(broadcast(totals), Seq("day", "feature"))
      .join(broadcast(refShares), Seq("feature", "bucket"), "left")
      .select(col("day"), col("feature"), col("bucket"),
        coalesce(col("p_ref"), lit(0.0)).as("p_ref"),
        (coalesce(col("__wn"), lit(0L)).cast("double") /
          col("__tot").cast("double")).as("p_cur"))
    val pr = greatest(col("p_ref"), lit(eps))
    val pc = greatest(col("p_cur"), lit(eps))
    p.withColumn("contrib", (pc - pr) * log(pc / pr))
  }

  /** CATEGORICAL trailing-window PSI (+ chi-square) — [[rollingPsi]]
    * for STRING-valued columns (source domain, langid, quality tier,
    * split label…), where a numeric grid cannot exist. Buckets are the
    * pinned reference frame's category VALUES plus one `__other__`
    * bucket that absorbs categories the reference never saw — novel
    * categories are exactly the drift a source-mix monitor pages on,
    * and folding them into one bucket keeps the grid
    * reference-bounded however wild the current side gets.
    *
    * One row per (observed day, category): reference share, trailing-
    * window share, the PSI contribution, and the chi-square
    * contribution `(obs − exp)² / exp` with `exp = max(p_ref, eps) ·
    * window_total` (the eps smoothing keeps `__other__` — reference
    * share zero by construction — finite on both metrics). Σ contrib
    * per day is the day's PSI; Σ chi2 per day is the day's chi-square
    * statistic against the reference mix.
    *
    * The BOUNDED-DOMAIN contract is enforced eagerly: the reference's
    * distinct category count must not exceed `maxCategories` — the
    * categories ride broadcasts and the grid is days × categories, so
    * a high-cardinality column (user ids are not categories) aborts
    * BEFORE any broadcast builds, with one cheap count over the
    * already-reduced reference table (the [[InfoTheory.miTable]]
    * posture — and like it, this makes the call NON-lazy). The current
    * side needs no cap: its values reduce map-side to per-day counts
    * (the one corpus-sized aggregation) and collapse into the bounded
    * category set immediately after.
    *
    * Execution is the [[rollingPsi]] scatter, keys swapped from bucket
    * ids to category strings: reduce once, bounded `windowDays`
    * explode, ONE equi-shuffle on (day, category), everything else on
    * broadcasts. NULL timestamps abort loudly; NULL categories leave
    * the distribution (the [[psi]] posture).
    */
  def rollingPsiCat(df: DataFrame, tsCol: String, catCol: String,
                    ref: DataFrame, windowDays: Int,
                    eps: Double = 1e-4,
                    maxCategories: Int = 100000,
                    groupCols: Seq[String] = Nil): DataFrame = {
    val (refCounts, catList) = refCategorySet(ref, catCol, maxCategories)
    val gc = groupCols.map(col)
    val withDay = df
      .filter(col(catCol).isNotNull)
      .select(gc ++ Seq(
        when(col(tsCol).isNull, raise_error(lit(
            s"Drift.rollingPsiCat: NULL $tsCol — filter or repair null " +
              "timestamps upstream")))
          .otherwise(to_date(col(tsCol))).as("__day"),
        col(catCol).cast("string").as("__v")): _*)
    // the ONE corpus-sized reduction (raw values), then the bounded
    // collapse into ref categories + __other__
    val dailyRaw = withDay
      .groupBy((groupCols ++ Seq("__day", "__v")).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    val daily = dailyRaw
      .join(broadcast(refCounts.select(col("category").as("__v"),
        lit(true).as("__inref"))), Seq("__v"), "left")
      .select(gc ++ Seq(col("__day").as("day"),
        when(col("__inref"), col("__v")).otherwise(lit(Other))
          .as("category"),
        col("__n").as("n")): _*)
      .groupBy((groupCols ++ Seq("day", "category")).map(col): _*)
      .agg(sum(col("n")).as("n"))
      .localCheckpoint() // feeds day list + scatter (Triangles lesson)
    assembleCat(daily, refCounts, catList, windowDays, eps, groupCols)
  }

  private val Other = "__other__"

  /** The pinned reference's category table + cap-gated driver list
    * (the QuantileSketch gated-walk precedent — a LOCAL category
    * dimension has known-small stats, so the grid joins plan broadcast
    * like rollingPsi's range grid; derived distributively from the
    * checkpointed counts it would carry an unknown-size estimate and
    * push the bounded grid work into a sort-merge).
    */
  private def refCategorySet(ref: DataFrame, catCol: String,
                             maxCategories: Int)
      : (DataFrame, Array[String]) = {
    require(maxCategories >= 1, s"maxCategories too small: $maxCategories")
    val refCounts = ref.filter(col(catCol).isNotNull)
      .select(col(catCol).cast("string").as("category"))
      .groupBy("category").agg(count(lit(1)).as("__rn"))
      .localCheckpoint() // feeds cap + shares + grid (3 reads)
    val nCats = refCounts.count()
    require(nCats > 0, "Drift.rollingPsiCat: empty reference frame")
    require(nCats <= maxCategories,
      s"Drift.rollingPsiCat: $nCats reference categories exceed " +
        s"maxCategories=$maxCategories — this operator monitors bounded " +
        "categorical mixes (collapse or hash high-cardinality keys first)")
    require(refCounts.filter(col("category") === Other).isEmpty,
      s"Drift.rollingPsiCat: reference contains the reserved '$Other' " +
        "category")
    (refCounts, refCounts.select("category").collect()
      .map(_.getString(0)) :+ Other)
  }

  /** The window-assembly stage of [[rollingPsiCat]] over an ALREADY
    * REDUCED-AND-COLLAPSED per-day category count table `(day DATE,
    * category STRING, n LONG)` — the categorical twin of
    * [[rollingPsiFromDailyCounts]], factored out so the streaming twin
    * ([[graft.streaming.EventsStream.psiCatDailyCountsStream]], which
    * maintains exactly this table as keyed state over the pinned
    * category set) shares the batch semantics literally. Categories
    * must already be the reference's set ∪ `__other__` — a stray
    * value aborts in-plan rather than surfacing as a phantom
    * zero-reference row.
    */
  def rollingPsiCatFromDailyCounts(daily: DataFrame, ref: DataFrame,
                                   catCol: String, windowDays: Int,
                                   eps: Double = 1e-4,
                                   maxCategories: Int = 100000): DataFrame = {
    val (refCounts, catList) = refCategorySet(ref, catCol, maxCategories)
    val spark = daily.sparkSession
    val catsDf = broadcast(spark.createDataset(catList.toSeq)(
      org.apache.spark.sql.Encoders.STRING).toDF("category"))
    // stray-category guard rides the count column (projection-proof)
    val guarded = daily
      .join(catsDf.withColumn("__known", lit(true)), Seq("category"), "left")
      .select(col("day"),
        when(col("__known"), col("category")).otherwise(raise_error(concat(
          lit("Drift.rollingPsiCatFromDailyCounts: category '"),
          col("category"),
          lit("' is not in the reference set ∪ __other__ — collapse " +
            "upstream with the same pinned reference")))).as("category"),
        col("n"))
    assembleCat(guarded, refCounts, catList, windowDays, eps)
  }

  private def assembleCat(daily: DataFrame, refCounts: DataFrame,
                          catList: Array[String], windowDays: Int,
                          eps: Double,
                          groupCols: Seq[String] = Nil): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays out of [1,366]: $windowDays")
    val spark = daily.sparkSession
    val gc = groupCols.map(col)
    val days = daily.select(gc :+ col("day"): _*).distinct()
    // the full (observed group-day × category) grid enters the scatter
    // as ZERO rows, so the one (group, day, category) aggregation below
    // emits every grid cell directly — no grid⋈window join exists to
    // mis-plan (empty cells must surface as 0 shares for the eps
    // smoothing, like psi's grid left-joins). `days` already carries
    // the group key, so the grid stays per-group.
    val gridZero = days
      .crossJoin(broadcast(spark.createDataset(catList.toSeq)(
        org.apache.spark.sql.Encoders.STRING).toDF("category")))
      .select(gc ++ Seq(col("day"), col("category"), lit(0L).as("__n")): _*)
    val windowed = daily
      .select(gc ++ Seq(col("day").as("__day"), col("category"),
        col("n").as("__n"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__off")): _*)
      .select(gc ++ Seq(date_add(col("__day"), col("__off")).as("day"),
        col("category"), col("__n")): _*)
      .join(broadcast(days), groupCols :+ "day")
      .unionByName(gridZero)
      .groupBy((groupCols ++ Seq("day", "category")).map(col): _*)
      .agg(sum(col("__n")).as("__wn"))
    val totals = windowed.groupBy((groupCols :+ "day").map(col): _*)
      .agg(sum(col("__wn")).as("__tot"))
    val refShares = refCounts
      .crossJoin(broadcast(refCounts.agg(sum(col("__rn")).as("__rtot"))))
      .select(col("category"),
        (col("__rn").cast("double") / col("__rtot").cast("double"))
          .as("p_ref"))
    val p = windowed
      .join(broadcast(totals), groupCols :+ "day")
      .join(broadcast(refShares), Seq("category"), "left")
      .select(gc ++ Seq(col("day"), col("category"),
        coalesce(col("p_ref"), lit(0.0)).as("p_ref"),
        (col("__wn").cast("double") / col("__tot").cast("double"))
          .as("p_cur"),
        col("__wn"), col("__tot")): _*)
    val pr = greatest(col("p_ref"), lit(eps))
    val pc = greatest(col("p_cur"), lit(eps))
    val exp = pr * col("__tot").cast("double")
    p.select(gc ++ Seq(col("day"), col("category"), col("p_ref"),
      col("p_cur"),
      ((pc - pr) * log(pc / pr)).as("contrib"),
      ((col("__wn").cast("double") - exp) * (col("__wn").cast("double") - exp)
        / exp).as("chi2")): _*)
  }

  /** Composed per-day DRIFT REPORT — the page a 100 TB ingest
    * publishes nightly for one monitored stream: numeric rolling PSI,
    * categorical rolling PSI and rolling KS against the same pinned
    * reference, unioned into `(day, metric, value, status)` with the
    * shared thresholds (< 0.1 `stable`, < 0.25 `watch`, else
    * `action`; KS gap graded on the same scale — tighten per stream
    * if its domain calls for it). Every leaf is its own green gate;
    * this row pins that the drift monitors COMPOSE (shapes,
    * rounding, ordering) — the [[DataQuality]] report posture.
    *
    * Per-day values are deterministic folds: numeric PSI via
    * [[rollingPsiSummary]]'s bucket-ordered fold, categorical PSI the
    * same fold in CATEGORY order, KS one MAX over exact gaps.
    * `ksCol` must already ride the [[Quantized]] integer contract
    * (quantize floats upstream — the [[ksTable]] posture).
    *
    * With `groupCols` (source, langid, tier…) one independent report
    * per group against the SAME pinned reference — each leaf threads
    * the key through its bounded dimensions (observed days, totals,
    * grids, window partitions), so the grouped report is row-identical
    * to the per-group union (DriftSpec pins it) while the corpus still
    * reduces exactly once per leaf.
    */
  def driftReport(df: DataFrame, tsCol: String, valueCol: String,
                  catCol: String, ksCol: String, ref: DataFrame,
                  nBuckets: Int, lo: Double, hi: Double, windowDays: Int,
                  eps: Double = 1e-4,
                  maxCategories: Int = 100000,
                  groupCols: Seq[String] = Nil): DataFrame = {
    def status(v: Column): Column =
      when(v < 0.1, lit("stable")).when(v < 0.25, lit("watch"))
        .otherwise(lit("action"))
    val gc = groupCols.map(col)
    val psiNum = rollingPsiSummary(df, tsCol, valueCol, ref, nBuckets,
        lo, hi, windowDays, eps, groupCols)
      .select(gc ++ Seq(col("day"), lit("psi_value").as("metric"),
        round(col("psi"), 6).as("value"), col("status")): _*)
    val catByDay = rollingPsiCat(df, tsCol, catCol, ref, windowDays, eps,
        maxCategories, groupCols)
      .select(gc ++ Seq(col("day"),
        struct(col("category"), round(col("contrib"), 6).as("c"))
          .as("cc")): _*)
      .groupBy((groupCols :+ "day").map(col): _*)
      .agg(sort_array(collect_list(col("cc"))).as("a"))
    val catPsi = aggregate(col("a"), lit(0.0),
      (acc, x) => acc + x.getField("c"))
    val psiCat = catByDay.select(gc ++ Seq(col("day"),
      lit("psi_cat").as("metric"),
      round(catPsi, 6).as("value"), status(catPsi).as("status")): _*)
    val ks = rollingKs(df, tsCol, ksCol, ref, windowDays, groupCols)
      .groupBy((groupCols :+ "day").map(col): _*)
      .agg(max(col("gap")).as("g"))
      .select(gc ++ Seq(col("day"), lit("ks_gap").as("metric"),
        round(col("g"), 6).as("value"), status(col("g")).as("status")): _*)
    psiNum.unionByName(psiCat).unionByName(ks)
  }

  /** DuckDB replay of [[rollingPsiCat]]: same daily raw-value counts,
    * ref-set collapse to categories + `__other__`, offset scatter,
    * observed-day restriction, grid left-joins, eps-clamped PSI tree
    * and smoothed chi-square. `valuesSql` must yield `(ts TIMESTAMP,
    * v VARCHAR)`, `refSql` a `v VARCHAR` column. p_* are single IEEE
    * divisions; `contrib` carries the one `ln`; chi2 one division-
    * square tree — round all four at the gate per the transcendental
    * convention.
    */
  def rollingPsiCatOracleSql(valuesSql: String, refSql: String,
                             windowDays: Int,
                             eps: Double = 1e-4): String =
    s"""WITH refc AS (
         SELECT CAST(v AS VARCHAR) AS category, COUNT(*) AS rn
         FROM ($refSql) WHERE v IS NOT NULL GROUP BY 1),
       vals AS (
         SELECT CAST(ts AS DATE) AS dday, CAST(v AS VARCHAR) AS vv
         FROM ($valuesSql) WHERE v IS NOT NULL),
       dailyraw AS (
         SELECT dday, vv, COUNT(*) AS n FROM vals GROUP BY 1, 2),
       daily AS (
         SELECT dday,
           CASE WHEN r.category IS NULL THEN '__other__' ELSE d.vv END
             AS category,
           SUM(n) AS n
         FROM dailyraw d LEFT JOIN refc r ON r.category = d.vv
         GROUP BY 1, 2),
       days AS (SELECT DISTINCT dday AS day FROM daily),
       scattered AS (
         SELECT dday + CAST(off AS INTEGER) AS day, category, n
         FROM daily CROSS JOIN (
           SELECT UNNEST(RANGE(0, $windowDays)) AS off)),
       win AS (
         SELECT s.day, category, SUM(n) AS wn
         FROM scattered s JOIN days d ON d.day = s.day GROUP BY 1, 2),
       tot AS (SELECT day, SUM(wn) AS tot FROM win GROUP BY 1),
       rshare AS (
         SELECT category, CAST(rn AS DOUBLE) / (SELECT SUM(rn) FROM refc)
           AS p_ref
         FROM refc),
       cats AS (SELECT category FROM refc
                UNION ALL SELECT '__other__' AS category),
       grid AS (SELECT day, category FROM days, cats),
       p AS (
         SELECT g.day, g.category,
           COALESCE(r.p_ref, 0.0) AS p_ref,
           CAST(COALESCE(w.wn, 0) AS DOUBLE) / CAST(t.tot AS DOUBLE)
             AS p_cur,
           COALESCE(w.wn, 0) AS wn, t.tot AS tot
         FROM grid g
         LEFT JOIN win w ON w.day = g.day AND w.category = g.category
         JOIN tot t ON t.day = g.day
         LEFT JOIN rshare r ON r.category = g.category)
       SELECT STRFTIME(day, '%Y-%m-%d') AS day, category,
         ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
         ROUND((GREATEST(p_cur, $eps) - GREATEST(p_ref, $eps))
               * LN(GREATEST(p_cur, $eps) / GREATEST(p_ref, $eps)), 6)
           + 0.0 AS contrib,
         ROUND((CAST(wn AS DOUBLE) - GREATEST(p_ref, $eps) * CAST(tot AS DOUBLE))
               * (CAST(wn AS DOUBLE) - GREATEST(p_ref, $eps) * CAST(tot AS DOUBLE))
               / (GREATEST(p_ref, $eps) * CAST(tot AS DOUBLE)), 6)
           + 0.0 AS chi2
       FROM p"""

  /** TRAILING-WINDOW KS — [[ksTable]] under the scatter idiom, the
    * binning-free companion of [[rollingPsi]] (PSI needs a grid; KS
    * catches the shifts a coarse grid averages away). One row per
    * (observed day, support value v): the ref and trailing-window
    * CDFs at v and their gap; `MAX(gap)` per day is that day's KS
    * statistic against the pinned reference.
    *
    * Values ride the [[Quantized]] integer contract (quantize floats
    * first — the ksTable posture), so every count, prefix sum and CDF
    * division is exact. The support is the GLOBAL union of ref and
    * corpus values — domain-bounded by quantization — so the per-day
    * prefix sums run one window over (days × domain) rows, never
    * corpus-sized; the corpus itself reduces once to per-day value
    * counts and scatters with the bounded explode. NULL timestamps
    * abort loudly; NULL values are excluded per the ksTable contract.
    * Days where the window is empty cannot occur (observed days post
    * to themselves); an empty REF aborts eagerly (no CDF to compare).
    */
  def rollingKs(df: DataFrame, tsCol: String, valueCol: String,
                ref: DataFrame, windowDays: Int,
                groupCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays out of [1,366]: $windowDays")
    val gc = groupCols.map(col)
    val withDay = df
      .filter(col(valueCol).isNotNull)
      .select(gc ++ Seq(
        when(col(tsCol).isNull, raise_error(lit(
            s"Drift.rollingKs: NULL $tsCol — filter or repair null " +
              "timestamps upstream")))
          .otherwise(to_date(col(tsCol))).as("__day"),
        Quantized.checkedLong(col(valueCol), "Drift.rollingKs").as("v")): _*)
    val daily = withDay
      .groupBy((groupCols ++ Seq("__day", "v")).map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumnRenamed("__day", "day")
      .localCheckpoint() // feeds day list + scatter + support
    rollingKsFromDailyCounts(daily, ref, valueCol, windowDays, groupCols)
  }

  /** The window-assembly stage of [[rollingKs]] over an ALREADY
    * REDUCED per-day value count table `(day DATE, v LONG, n LONG)` —
    * the KS member of the from-daily-counts family
    * ([[rollingPsiFromDailyCounts]], [[rollingPsiCatFromDailyCounts]]),
    * factored out so the streaming twin ([[graft.streaming
    * .EventsStream.ksDailyCountsStream]], which maintains exactly this
    * table as keyed state) shares the batch semantics literally: feed
    * its emitted counts here and the output is row-identical to
    * [[rollingKs]] over the replayed corpus (StreamingSpec pins it).
    * `v` must already ride the [[Quantized]] integer contract.
    * Everything downstream of the corpus reduction is bounded
    * (days × support), so this stage is cheap on either path.
    */
  def rollingKsFromDailyCounts(daily: DataFrame, ref: DataFrame,
                               valueCol: String, windowDays: Int,
                               groupCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays out of [1,366]: $windowDays")
    val gc = groupCols.map(col)
    val days = daily.select(gc :+ col("day"): _*).distinct()
    val refCounts = ref.filter(col(valueCol).isNotNull)
      .select(Quantized.checkedLong(col(valueCol), "Drift.rollingKs ref")
        .as("v"))
      .groupBy("v").agg(count(lit(1)).as("__rn"))
      .localCheckpoint() // feeds support + shares + eager total
    val refTotal = refCounts.agg(sum(col("__rn")).as("__rt")).head()
    require(!refTotal.isNullAt(0) && refTotal.getLong(0) > 0,
      "Drift.rollingKs: empty reference frame — no CDF to compare against")
    // support PER GROUP (the group's own values ∪ the shared ref
    // values): a value only another group observed must not fabricate
    // rows here, so grouped output stays ≡ the per-group union
    val support =
      if (groupCols.isEmpty)
        daily.select(col("v")).union(refCounts.select(col("v"))).distinct()
      else
        daily.select(gc :+ col("v"): _*)
          .union(daily.select(gc: _*).distinct()
            .crossJoin(refCounts.select(col("v"))))
          .distinct()
    val windowed = daily
      .select(gc ++ Seq(col("day").as("__day"), col("v"), col("n").as("__n"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__off")): _*)
      .select(gc ++ Seq(date_add(col("__day"), col("__off")).as("day"),
        col("v"), col("__n")): _*)
      .join(broadcast(days), groupCols :+ "day")
      .groupBy((groupCols ++ Seq("day", "v")).map(col): _*)
      .agg(sum(col("__n")).as("__wn"))
    // (observed group-day × per-group support) frame — domain-bounded
    val dayBySupport =
      if (groupCols.isEmpty) days.crossJoin(broadcast(support))
      else days.join(broadcast(support), groupCols)
    val frame = dayBySupport
      .join(windowed, groupCols ++ Seq("day", "v"), "left")
      .join(broadcast(refCounts), Seq("v"), "left")
      .na.fill(0L, Seq("__wn", "__rn"))
    val w = Window.partitionBy((groupCols :+ "day").map(col): _*)
      .orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = windowed.groupBy((groupCols :+ "day").map(col): _*)
      .agg(sum(col("__wn")).as("__wt"))
    frame
      .withColumn("__cw", sum(col("__wn")).over(w))
      .withColumn("__cr", sum(col("__rn")).over(w))
      .join(broadcast(totals), groupCols :+ "day")
      .select(gc ++ Seq(col("day"), col("v"),
        (col("__cr").cast("double") / lit(refTotal.getLong(0).toDouble))
          .as("cdf_ref"),
        (col("__cw").cast("double") / col("__wt").cast("double"))
          .as("cdf_cur")): _*)
      .withColumn("gap", abs(col("cdf_ref") - col("cdf_cur")))
  }

  /** DuckDB replay of [[rollingKs]]: same daily counts, scatter,
    * global support grid, per-day prefix sums and exact CDF
    * divisions. `valuesSql` must yield `(ts TIMESTAMP, v integral)`,
    * `refSql` a `v` column.
    */
  def rollingKsOracleSql(valuesSql: String, refSql: String,
                         windowDays: Int): String =
    s"""WITH vals AS (
         SELECT CAST(ts AS DATE) AS dday, v FROM ($valuesSql)
         WHERE v IS NOT NULL),
       daily AS (SELECT dday, v, COUNT(*) AS n FROM vals GROUP BY 1, 2),
       days AS (SELECT DISTINCT dday AS day FROM daily),
       refc AS (SELECT v, COUNT(*) AS rn FROM ($refSql)
                WHERE v IS NOT NULL GROUP BY 1),
       sup AS (SELECT DISTINCT v FROM (
         SELECT v FROM daily UNION ALL SELECT v FROM refc)),
       scattered AS (
         SELECT dday + CAST(off AS INTEGER) AS day, v, n
         FROM daily CROSS JOIN (
           SELECT UNNEST(RANGE(0, $windowDays)) AS off)),
       win AS (
         SELECT s.day, v, SUM(n) AS wn
         FROM scattered s JOIN days d ON d.day = s.day GROUP BY 1, 2),
       wt AS (SELECT day, SUM(wn) AS wt FROM win GROUP BY 1),
       frame AS (
         SELECT d.day, sup.v,
           COALESCE(w.wn, 0) AS wn, COALESCE(r.rn, 0) AS rn
         FROM days d CROSS JOIN sup
         LEFT JOIN win w ON w.day = d.day AND w.v = sup.v
         LEFT JOIN refc r ON r.v = sup.v),
       cum AS (
         SELECT day, v,
           SUM(wn) OVER (PARTITION BY day ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
           SUM(rn) OVER (PARTITION BY day ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr
         FROM frame)
       SELECT STRFTIME(cum.day, '%Y-%m-%d') AS day, v,
         CAST(cr AS DOUBLE) / (SELECT CAST(SUM(rn) AS DOUBLE) FROM refc)
           AS cdf_ref,
         CAST(cw AS DOUBLE) / CAST(wt.wt AS DOUBLE) AS cdf_cur,
         ABS(CAST(cr AS DOUBLE) / (SELECT CAST(SUM(rn) AS DOUBLE) FROM refc)
             - CAST(cw AS DOUBLE) / CAST(wt.wt AS DOUBLE)) AS gap
       FROM cum JOIN wt ON wt.day = cum.day"""

  /** DuckDB replay of [[rollingPsi]]: the same daily bucket counts,
    * offset scatter, observed-day restriction, grid left-joins and
    * eps-clamped contribution tree. `valuesSql` must yield
    * `(ts TIMESTAMP, v)` and `refSql` a `v` column; shares are single
    * IEEE divisions, `contrib` carries the one `ln` — round all three
    * at the gate per the transcendental convention.
    */
  def rollingPsiOracleSql(valuesSql: String, refSql: String, nBuckets: Int,
                          lo: Double, hi: Double, windowDays: Int,
                          eps: Double = 1e-4): String = {
    val w = (hi - lo) / nBuckets
    def bucketSql(c: String) =
      s"LEAST(GREATEST(FLOOR((CAST($c AS DOUBLE) - $lo) / $w), 0), ${nBuckets - 1})"
    s"""WITH vals AS (
         SELECT CAST(ts AS DATE) AS dday, v FROM ($valuesSql)
         WHERE v IS NOT NULL),
       daily AS (
         SELECT dday, ${bucketSql("v")} AS bucket, COUNT(*) AS n
         FROM vals GROUP BY 1, 2),
       days AS (SELECT DISTINCT dday AS day FROM daily),
       scattered AS (
         SELECT dday + CAST(off AS INTEGER) AS day, bucket, n
         FROM daily CROSS JOIN (
           SELECT UNNEST(RANGE(0, $windowDays)) AS off)),
       win AS (
         SELECT s.day, bucket, SUM(n) AS wn
         FROM scattered s JOIN days d ON d.day = s.day
         GROUP BY 1, 2),
       tot AS (SELECT day, SUM(wn) AS tot FROM win GROUP BY 1),
       refb AS (
         SELECT ${bucketSql("v")} AS bucket, COUNT(*) AS rn
         FROM ($refSql) WHERE v IS NOT NULL GROUP BY 1),
       rshare AS (
         SELECT bucket, CAST(rn AS DOUBLE) / (SELECT SUM(rn) FROM refb)
           AS p_ref
         FROM refb),
       grid AS (
         SELECT day, b AS bucket FROM days, (
           SELECT UNNEST(RANGE(0, $nBuckets)) AS b)),
       p AS (
         SELECT g.day, g.bucket,
           COALESCE(r.p_ref, 0.0) AS p_ref,
           CAST(COALESCE(w.wn, 0) AS DOUBLE) / CAST(t.tot AS DOUBLE)
             AS p_cur
         FROM grid g
         LEFT JOIN win w ON w.day = g.day AND w.bucket = g.bucket
         JOIN tot t ON t.day = g.day
         LEFT JOIN rshare r ON r.bucket = g.bucket)
       SELECT STRFTIME(day, '%Y-%m-%d') AS day, CAST(bucket AS INT) AS bucket,
         ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
         ROUND((GREATEST(p_cur, $eps) - GREATEST(p_ref, $eps))
               * LN(GREATEST(p_cur, $eps) / GREATEST(p_ref, $eps)), 6)
           + 0.0 AS contrib
       FROM p"""
  }

  /** Kolmogorov–Smirnov drift table — the binning-free complement of
    * [[psi]] (PSI answers "how much mass moved between my buckets"; KS
    * answers "what is the largest CDF gap anywhere", catching shifts a
    * coarse grid averages away). Values are compared on their OWN
    * support (the distinct values of both frames), so there is no grid
    * parameter to mis-set; quantize heavy-tailed floats first, the
    * house convention, which also makes every output exact: counts are
    * integers, CDFs are single IEEE divisions over exact integer prefix
    * sums, the gap one subtraction — bit-replayable in SQL.
    *
    * Output: one row per distinct value — `(groupCols…, v, cdf_ref,
    * cdf_cur, gap)` with `gap = |cdf_ref − cdf_cur|`; `MAX(gap)` (per
    * group) is the KS statistic. With `groupCols` one independent KS
    * table per group — the per-source drift monitor — with the window
    * partitioned per group and per-group totals broadcast back.
    *
    * 100 TB shape: each side collapses to (value, count) in one
    * map-side-combined agg — bounded by the quantized domain however
    * large the corpus — and the prefix sums run over that bounded
    * domain in a single-ordered window WHOSE INPUT IS DOMAIN-SIZED,
    * never corpus-sized (the [[graft.operators.Sampling
    * .globalPercentRank]] decomposition exists for when a window's
    * input is not bounded; here it is, by quantization).
    */
  def ksTable(ref: DataFrame, cur: DataFrame, valueCol: String,
              groupCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = groupCols :+ "v"
    def counts(df: DataFrame, name: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(groupCols.map(col) :+
          Quantized.checkedLong(col(valueCol), "Drift.ksTable").as("v"): _*)
        .groupBy(keys.map(col): _*).agg(count(lit(1)).as(name))
    val joined = counts(ref, "__nr").join(counts(cur, "__nc"), keys, "full")
      .na.fill(0L, Seq("__nr", "__nc"))
    val w = (if (groupCols.isEmpty) Window.orderBy("v")
             else Window.partitionBy(groupCols.map(col): _*).orderBy("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totAgg = Seq(sum(col("__nr")).as("__tr"), sum(col("__nc")).as("__tc"))
    val cum = joined
      .withColumn("__cr", sum(col("__nr")).over(w))
      .withColumn("__cc", sum(col("__nc")).over(w))
    val withTot =
      if (groupCols.isEmpty) cum.crossJoin(broadcast(joined.agg(totAgg.head, totAgg.tail: _*)))
      else cum.join(broadcast(
        joined.groupBy(groupCols.map(col): _*).agg(totAgg.head, totAgg.tail: _*)),
        groupCols)
    withTot
      // an empty side has no CDF: null (guarded — ANSI aborts on /0)
      .select(keys.map(col) :+
        when(col("__tr") > 0,
          col("__cr").cast("double") / col("__tr").cast("double")).as("cdf_ref") :+
        when(col("__tc") > 0,
          col("__cc").cast("double") / col("__tc").cast("double")).as("cdf_cur"): _*)
      .withColumn("gap", abs(col("cdf_ref") - col("cdf_cur")))
  }

  /** Embedding-space drift — the VECTOR complement of [[psi]]/[[
    * ksTable]]: did the embedding distribution move between a reference
    * corpus snapshot and the current one (a retrained encoder, a
    * changed upstream tokenizer, a shifted source mix all show up here
    * before any scalar metric notices). One row per dimension:
    * `(i, mean_ref, mean_cur, gap)` — per-dimension centroid means
    * (AVG-class, rounded at 6) and their absolute difference. The
    * summary every dashboard wants — cosine between the two centroids,
    * L2 of the gap — is one in-order fold over this 64-row table;
    * [[embeddingShift]] computes it from the ROUNDED means so the
    * fold replays bit-for-bit in SQL.
    *
    * 100 TB shape: each side is ONE map-side-combined aggregation of
    * the exploded (i, x) pairs — the shuffle carries dims × partitions
    * partial rows, never vectors — joined on the 64-row dimension key.
    * No row crosses between the frames.
    */
  def embeddingMeans(ref: DataFrame, cur: DataFrame,
                     vecCol: String = "embedding"): DataFrame = {
    def means(df: DataFrame, name: String): DataFrame = df
      .filter(col(vecCol).isNotNull)
      .select(posexplode(graft.similarity.Ann.asDouble(col(vecCol)))
        .as(Seq("i", "__x")))
      .groupBy("i").agg(round(avg(col("__x")), 6).as(name))
    means(ref, "mean_ref").join(means(cur, "mean_cur"), Seq("i"))
      .select(col("i"), col("mean_ref"), col("mean_cur"),
        round(abs(col("mean_ref") - col("mean_cur")), 6).as("gap"))
  }

  /** One-row centroid-shift summary over [[embeddingMeans]]:
    * `(dims, centroid_cos, shift_l2)` — both folds run in DIMENSION
    * order over the rounded means (deterministic left fold ≡ the
    * oracle's ordered-LIST fold), final transcendentals rounded at 6.
    * Zero-norm centroids report NULL cosine.
    */
  def embeddingShift(ref: DataFrame, cur: DataFrame,
                     vecCol: String = "embedding"): DataFrame = {
    val byDim = embeddingMeans(ref, cur, vecCol)
    val arr = byDim.agg(
      array_sort(collect_list(struct(col("i"), col("mean_ref"),
        col("mean_cur")))).as("a"))
    def fold(f: Column => Column): Column =
      aggregate(col("a"), lit(0.0), (acc, x) => acc + f(x))
    val dot = fold(x => x.getField("mean_ref") * x.getField("mean_cur"))
    val nr = sqrt(fold(x => x.getField("mean_ref") * x.getField("mean_ref")))
    val nc = sqrt(fold(x => x.getField("mean_cur") * x.getField("mean_cur")))
    val d2 = fold(x => (x.getField("mean_ref") - x.getField("mean_cur")) *
      (x.getField("mean_ref") - x.getField("mean_cur")))
    arr.select(size(col("a")).as("dims"),
      when(nr * nc =!= 0.0, round(dot / (nr * nc), 6)).as("centroid_cos"),
      round(sqrt(d2), 6).as("shift_l2"))
  }
}
