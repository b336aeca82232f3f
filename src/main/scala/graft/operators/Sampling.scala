package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-sample construction (ref: src/pm25ml/sample/imputation_sampler.py
  * and full_model_sampler.py).
  *
  * The reference samples `fraction` of the (grid_id, date) keys per 50 km
  * stratum with polars' seeded sampler. Polars' RNG is not portable, so the
  * engine defines its own deterministic rule — multiplicative-hash order
  * with an exact per-group ceil(fraction·count) cutoff — which keeps the
  * reference's properties (exact per-stratum fraction, reproducibility)
  * with a documented, engine-independent definition (SURVEY.md §7 "A8").
  */
object Sampling {

  /** Deterministic sort key for sampling: multiplicative hash of the row
    * key columns. Stable across runs, partitionings and engines.
    */
  def hashKey(keys: Seq[Column]): Column =
    pmod(xxhash64(keys: _*), lit(1000000007L))

  /** Portable avalanche hash of a key: the first 15 hex digits of
    * md5(key as string), as a long — 60 uniformly-mixed bits that DuckDB
    * derives identically (`CAST('0x' || substr(md5(x::VARCHAR),1,15) AS
    * BIGINT)`). Used for keep/split THRESHOLD decisions, where the
    * previous multiplicative-only `(key * 2654435761) % m` was a
    * bijection of `key mod m` (gcd = 1): structured id spaces (e.g.
    * stride-encoded shard ids) correlated with the keep decision, and
    * the multiply overflowed for keys ≥ ~3.5e9 — wrapping in Spark,
    * erroring in DuckDB/ANSI. md5 avalanches every input bit and never
    * overflows.
    */
  def avalancheKey(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL mirroring [[avalancheKey]] over expression `x`. */
  def avalancheKeySql(x: String): String =
    s"CAST('0x' || substr(md5(CAST($x AS VARCHAR)), 1, 15) AS BIGINT)"

  /** Driver-side twin of [[avalancheKey]], byte-identical: first 15 hex
    * chars of the md5 of the string, parsed base 16 (60 bits — always
    * non-negative, so `% m` equals `pmod`). For probing sketch-sized
    * structures on the driver; equality with the column expression is
    * spec-pinned (OperatorsSpec).
    */
  def avalancheKeyLocal(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Mark `fraction` of rows per stratum as "training", the rest "test"
    * (ref: imputation_sampler.py:75-105 incl. the J8 left join + default).
    */
  def stratifiedSplit(df: DataFrame, stratumCol: String, fraction: Double,
                      keyCols: Seq[String]): DataFrame = {
    val hk = hashKey(keyCols.map(col))
    val w = Window.partitionBy(stratumCol).orderBy(hk, col(keyCols.head))
    val wc = Window.partitionBy(stratumCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wc))
      .withColumn("split",
        when(col("__rn") <= ceil(lit(fraction) * col("__cnt")), lit("training"))
          .otherwise(lit("test")))
      .drop("__rn", "__cnt")
  }

  /** Rows eligible for model training: target present and finite
    * (ref: imputation_sampler.py:69-73, full_model_sampler.py:58-62 —
    * mind NaN: Spark's isNotNull alone would keep NaNs).
    */
  def filterTargetPresent(df: DataFrame, targetCol: String): DataFrame =
    df.filter(col(targetCol).isNotNull && !isnan(col(targetCol)))

  /** Domain-mixture sampling: keep a per-domain target fraction of rows,
    * selected by a deterministic hash threshold on the row key. This is
    * the corpus-mixing step of a pre-training data pipeline (down-weight
    * crawl, keep all of wiki/books, ...) expressed as a pure map-side
    * filter: the weights join is a broadcast and the threshold test is a
    * scan-local predicate, so the plan has NO shuffle and NO window —
    * the shape that survives a 100 TB corpus with a skewed domain
    * distribution (a windowed exact-count variant would hot-spot on the
    * dominant domain's partition).
    *
    * The selection (not just the rate) is deterministic and portable:
    * the [[avalancheKey]] hash of the row key against ceil(fraction·M)
    * over modulus M. Domains absent from `fractions` fall back to
    * `defaultFraction`.
    */
  def domainMixture(df: DataFrame, domainCol: String, keyCol: String,
                    fractions: Map[String, Double],
                    defaultFraction: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = 1000000007L
    val weights = fractions.toSeq.toDF(domainCol, "__frac")
    df.join(broadcast(weights), Seq(domainCol), "left")
      .withColumn("__frac", coalesce(col("__frac"), lit(defaultFraction)))
      .filter(pmod(avalancheKey(col(keyCol)), lit(m)) <
        ceil(col("__frac") * lit(m)).cast("long"))
      .select(df.columns.map(col): _*) // join put the key first; restore
  }

  /** Temperature-scaled domain mixing — the training-mix rule behind
    * multilingual/multi-source samplers (Conneau & Lample 2019 §3.1;
    * the "sample with p_d ∝ n_d^α" convention): domain d's share of
    * the `targetRows` budget is n_d^α / Σ_e n_e^α, so α = 1 preserves
    * natural proportions, α → 0 approaches uniform-over-domains, and
    * the usual 0.3–0.7 range up-weights the tail without drowning the
    * head. Per-domain keep fraction f_d = min(1, target·share / n_d)
    * (no up-sampling: a domain smaller than its slot keeps everything
    * — redistribute by raising `targetRows`, not by duplicating rows).
    *
    * Determinism/parity: Σ n^α folds over the DOMAIN-SORTED count
    * array (one deterministic left fold ≡ the oracle's ordered-LIST
    * fold), fractions are quantized at 6 decimals BEFORE thresholding
    * (so a last-ulp `pow` disagreement cannot move the selection
    * boundary), and the row selection is the same [[avalancheKey]]
    * threshold every sampler here uses — reproducible across runs,
    * partitionings and engines.
    *
    * Scale shape: one map-side-combined count to the domain-cardinality
    * frame, a 1-row broadcast of the fold, then the same broadcast-join
    * + scan-local predicate as [[domainMixture]] — NO shuffle of the
    * corpus, no window.
    */
  def temperatureMixture(df: DataFrame, domainCol: String, keyCol: String,
                         alpha: Double, targetRows: Long): DataFrame = {
    val fracs = temperatureMixPlan(df, domainCol, alpha, targetRows)
      .select(col(domainCol), col("frac").as("__frac"))
    val m = 1000000007L
    df.join(broadcast(fracs), Seq(domainCol))
      .filter(pmod(avalancheKey(col(keyCol)), lit(m)) <
        ceil(col("__frac") * m).cast("long"))
      .select(df.columns.map(col): _*)
  }

  /** The mix table behind [[temperatureMixture]]: one row per domain —
    * `(domainCol, n, frac)` with `frac` the quantized keep fraction.
    * Null domains are excluded (an unattributed row has no slot in a
    * domain budget — attribute or drop upstream).
    */
  def temperatureMixPlan(df: DataFrame, domainCol: String, alpha: Double,
                         targetRows: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0, 1]: $alpha")
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(domainCol).agg(count(lit(1)).as("n"))
    // the deterministic fold collects the count table into ONE row —
    // bounded by DOMAIN cardinality, which for a mixing taxonomy is
    // dozens-to-thousands. A million-key column (URL hosts, user ids)
    // is not a mixing taxonomy; abort loudly instead of materializing
    // a gigabyte row (pre-aggregate hosts into domains upstream).
    val nDomains = counts.count()
    require(nDomains <= 1000000L,
      s"temperatureMixPlan: $nDomains distinct domains in '$domainCol' — " +
        "mixing taxonomies are small; pre-aggregate (e.g. host → domain " +
        "class) before mixing")
    // Σ n^α as a deterministic fold over the domain-sorted array — a
    // plain agg sums doubles in partition order, which would wobble
    // the fractions' last ulp across layouts
    val s = counts.agg(aggregate(
      transform(
        array_sort(collect_list(struct(
          col(domainCol).cast("string").as("d"), col("n").as("n")))),
        x => pow(x.getField("n").cast("double"), alpha)),
      lit(0.0), (acc, t) => acc + t).as("__s"))
    counts.crossJoin(broadcast(s))
      .select(col(domainCol), col("n"),
        round(least(lit(1.0),
          lit(targetRows.toDouble) * pow(col("n").cast("double"), alpha) /
            col("__s") / col("n").cast("double")), 6).as("frac"))
  }

  /** Stride sampling — every `n`-th row of a deterministic order
    * ("mini" pipeline mode, ref: setup/dependency_injection.py:340-345).
    *
    * The naive `row_number over (ORDER BY ...)` is a single-partition
    * window — one task ranks the whole corpus. The global rank
    * decomposes instead: range-partition on the order columns, rank
    * within each range (parallel windows), and add each range's exact
    * row-count offset — a prefix sum over the partition-count summary
    * (≤ numShufflePartitions rows), the same decomposition as
    * [[tokenBudgetSelect]]'s score buckets.
    *
    * Invariant this plan rests on: the counts subplan and the ranks
    * subplan each execute their OWN range exchange (column pruning
    * makes them structurally different, so ReuseExchange does not
    * collapse them), and they agree only because Spark's boundary
    * sampling is a deterministic function of the key data. That holds
    * for every current Spark, is pinned behaviorally by
    * PlanHygieneSpec's adversarial stride test, and requires
    * `orderCols` to be deterministic expressions over a deterministic
    * source — a `rand()`-derived order column (or a re-sampled
    * nondeterministic scan) would let the two samplings diverge with
    * no error raised. `orderCols` must be a total order, as before.
    */
  def strideSample(df: DataFrame, orderCols: Seq[String], n: Int): DataFrame = {
    require(n > 0, s"stride must be positive (got $n)")
    val ranged = df.repartitionByRange(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .select("__pid", "__off")
    val inW = Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__rn", col("__off") + row_number().over(inW))
      .filter(pmod(col("__rn") - 1, lit(n)) === 0)
      .drop("__pid", "__off", "__rn")
  }

  /** Global percent-rank — `(rank − 1) / (N − 1)` over the WHOLE frame
    * — as a training feature ("where does this doc sit in the corpus
    * quality distribution?"). Same decomposition as [[strideSample]]:
    * `percent_rank() over (order by …)` is a single-partition window
    * (one task ranks the corpus), so the global rank is assembled from
    * range-partitioned local ranks plus exact per-range offsets; the
    * only unbounded-preceding window runs over the ≤ numShufflePartitions
    * count rows. The division is one IEEE op over exactly-representable
    * integers — bit-identical on any engine. `orderCols` must be a total
    * order (ranks are then dense, so rank ≡ row_number) and, as with
    * [[strideSample]], deterministic — see the boundary-sampling
    * invariant documented there. Order keys must also be NON-NULL:
    * engines disagree on where nulls sort (Spark windows default NULLS
    * FIRST, DuckDB NULLS LAST), so a null key would silently diverge
    * from any SQL replay — the guard below aborts the job with the
    * offending row instead (map-side codegen, no extra pass).
    */
  def globalPercentRank(df: DataFrame, orderCols: Seq[String],
                        outCol: String = "pr"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val guarded = orderCols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(col(c).isNull,
          raise_error(lit(s"globalPercentRank: null order key in '$c' — " +
            "null sort position is engine-defined; filter or coalesce first")))
        .otherwise(col(c)))
    }
    val ranged = guarded.repartitionByRange(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .select("__pid", "__off")
    val total = counts.agg(sum(col("__cnt")).as("__n"))
    val inW = Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
    ranged.join(broadcast(offsets), Seq("__pid"))
      .crossJoin(broadcast(total))
      .withColumn(outCol,
        when(col("__n") === 1, lit(0.0)) // Spark/SQL convention for N=1
          .otherwise((col("__off") + row_number().over(inW) - 1).cast("double")
            / (col("__n") - 1).cast("double")))
      .drop("__pid", "__off", "__n")
  }

  /** Deterministic uniform k-sample WITHOUT replacement per group — the
    * k rows with the smallest avalanche hash of `keyCol ∥ salt`
    * (hashing distinct keys is an exchangeable random order, so the
    * bottom-k is a uniform WOR sample; change `salt` for a fresh draw).
    * Built on [[topKPerGroupSkewSafe]]'s k-bounded heap, so each
    * partition contributes at most k rows per group to the shuffle — a
    * hot group costs k·partitions rows, never its own size (the
    * rank-window sampler ships whole groups to single tasks). Appends
    * `group_rank` (1 = smallest hash). Reproducible across runs,
    * engines, and partitionings, unlike `rand()`-based samplers.
    */
  def sampleKPerGroup(df: DataFrame, groupCols: Seq[String], keyCol: String,
                      k: Int, salt: String = ""): DataFrame =
    topKPerGroupSkewSafe(df, groupCols,
      struct(avalancheKey(concat(col(keyCol).cast("string"), lit(salt))),
        col(keyCol)), k)

  /** Score-weighted sampling: keep each row with probability
    * `clamp(scoreCol · scale, 0, 1)` — quality-proportional corpus
    * downsampling (keep the best docs at full rate, thin the tail),
    * decided per row by the same deterministic [[avalancheKey]]
    * threshold the domain sampler uses. Map-side, shuffle-free,
    * reproducible across runs and engines; expectation of the kept
    * fraction equals the mean clamped score.
    */
  def scoreWeightedSample(df: DataFrame, keyCol: String, scoreCol: String,
                          scale: Double = 1.0): DataFrame = {
    val m = 1000000007L
    val p = least(greatest(col(scoreCol) * scale, lit(0.0)), lit(1.0))
    df.filter(pmod(avalancheKey(col(keyCol)), lit(m)) <
      ceil(p * lit(m)).cast("long"))
  }

  /** Deterministic weighted sample-without-replacement of `n` rows —
    * priority sampling (Duffield–Lund–Thorup): each row draws a
    * pseudorandom uniform `u = (avalancheKey(key ∥ salt) + 1) / 2^60`
    * and gets priority `w/u`; the `n` largest priorities are the
    * sample, selection probability ∝ weight (the weighted-subsampling
    * rule corpus builds use to favor high-quality/underrepresented
    * documents without a learned mixer).
    *
    * Engine-portable by construction: the priority is ONE multiply and
    * ONE divide over exactly-representable integers
    * (`w · 2^60 / (h+1)` — no ln/pow, unlike Efraimidis–Sampling's
    * `u^(1/w)` key, whose libm calls differ across engines in the last
    * ulp), so any SQL engine replays the identical doubles and the
    * identical selection; re-running (or a task retry) reproduces it
    * where `rand()` would not.
    *
    * 100 TB shape: priorities are map-side; the top-n resolves with
    * TakeOrdered (per-partition partial top-n, then a driver merge of
    * n-row partials — no global sort). Weights must be positive;
    * non-positive-weight rows are excluded (probability 0).
    */
  def prioritySample(df: DataFrame, keyCol: String, weightCol: String,
                     n: Int, salt: String = ""): DataFrame = {
    require(n > 0, s"n must be positive (got $n)")
    val h = avalancheKey(concat(col(keyCol).cast("string"), lit(salt)))
    val priority = col(weightCol).cast("double") *
      lit(1152921504606846976L).cast("double") /
      (h + lit(1L)).cast("double")
    df.filter(col(weightCol) > 0)
      .withColumn("priority", priority)
      .orderBy(col("priority").desc, col(keyCol))
      .limit(n)
  }

  /** Deterministic global corpus shuffle + sharding — the training-order
    * randomization every pretraining data build needs (decorrelate
    * neighboring documents before sequence packing): rows land in
    * `pmod(avalancheKey(key ∥ salt), numShards)` and are ranked inside
    * their shard by the same key, so the full (shard, shard_rank) order
    * is a reproducible pseudorandom permutation — vary `salt` per epoch
    * for a fresh permutation, re-run for an identical one (`rand()`
    * would not survive a task retry).
    *
    * 100 TB shape: one shuffle on shard (md5 avalanches, so shards
    * balance regardless of id structure) and a per-shard sort — exactly
    * the write path of sharded training-data output; no global sort, no
    * driver state.
    */
  def shuffleShards(df: DataFrame, keyCol: String, numShards: Int,
                    salt: String = ""): DataFrame = {
    require(numShards > 0, s"numShards must be positive (got $numShards)")
    val k = avalancheKey(concat(col(keyCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col("shard")).orderBy(k, col(keyCol))
    df.withColumn("shard", pmod(k, lit(numShards.toLong)).cast("int"))
      .withColumn("shard_rank", row_number().over(w))
  }

  /** Keep the top `k` rows of every group under `ordering` — count-based
    * curation (the k best documents per domain by quality score), the
    * complement of [[domainMixture]]'s fraction-based thinning. Appends
    * `group_rank`, the row's 1-based position within its group; make the
    * ordering total (tie-break on a unique id) for reproducible output.
    *
    * 100 TB shape: one shuffle on the group key, then a per-group sort
    * inside each partition — no global sort, no driver state. Assumes
    * many groups of moderate size (domains, languages, buckets); one
    * giant group serializes into a single task's sort — pre-thin such
    * skew with a per-partition partial top-k before the window.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   ordering: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("group_rank", row_number().over(w))
      .filter(col("group_rank") <= k)
  }

  /** [[topKPerGroup]] with the skew pre-thin its scaladoc promises,
    * built on the custom bounded-heap aggregate
    * ([[graft.functions.expressions.TopKStructsAgg]]): partial
    * aggregation truncates each partition's contribution to k rows per
    * group MAP-SIDE, so the group shuffle carries ≤ k·partitions rows
    * per group and a hot domain never serializes into one task's sort
    * (the rank-window plan ships every row of every group to a single
    * task each).
    *
    * `orderKey` must be a struct/column whose ASCENDING order is
    * "best first" and total (negate a score for descending, append a
    * unique id for the tie) — then the result is row-identical to
    * [[topKPerGroup]] with the equivalent window ordering.
    */
  def topKPerGroupSkewSafe(df: DataFrame, groupCols: Seq[String],
                           orderKey: Column, k: Int): DataFrame =
    topKPerGroupSkewSafeCounted(df, groupCols, orderKey, k).drop("group_k")

  /** [[topKPerGroupSkewSafe]] that also appends `group_k` — how many
    * rows the group actually yielded (= min(k, group size)), read for
    * free from the heap array's size. Callers that must distinguish "a
    * full top-k" from "the group ran out of rows"
    * ([[graft.text.HeavyHitters.topKExactByGroup]]'s completeness
    * certificate) get it without a second aggregation or a rank
    * window over the result.
    */
  def topKPerGroupSkewSafeCounted(df: DataFrame, groupCols: Seq[String],
                                  orderKey: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val item = struct(orderKey.as("__k"),
      struct(df.columns.map(col).toIndexedSeq: _*).as("__row"))
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.expressions.TopKExpressions
        .topKStructs(item, k).as("__top"))
      .select(size(col("__top")).as("group_k"),
        posexplode(col("__top")).as(Seq("__pos", "__item")))
      .select(col("__item.__row.*"),
        (col("__pos") + 1).cast("int").as("group_rank"), col("group_k"))
  }

  /** Curriculum tiering: split rows into quantile tiers of `scoreCol`
    * (default quartiles → tiers 0..3, best = highest) — the bucketing a
    * curriculum or mixed-quality training schedule samples from.
    * Boundaries are ONE exact-percentile aggregate (one row), broadcast
    * back; tier assignment is a map-side comparison count, so the corpus
    * itself never sorts or shuffles.
    *
    * Interpolated quantile boundaries fall strictly between adjacent
    * distinct score values, so an ulp of cross-engine interpolation
    * difference cannot flip a `score >= boundary` comparison as long as
    * scores are quantized (e.g. rounded to 6dp) — which also bounds the
    * exact-percentile buffer; at extreme scale swap in
    * `percentile_approx` for the boundary pass, assignment unchanged.
    */
  def scoreTiers(df: DataFrame, scoreCol: String,
                 cuts: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted && cuts.forall(c => c > 0 && c < 1),
      s"cuts must be sorted fractions in (0, 1): $cuts")
    val bounds = df.agg(
      expr(s"percentile($scoreCol, ${cuts.head})").as("__p0"),
      cuts.tail.zipWithIndex.map { case (c, i) =>
        expr(s"percentile($scoreCol, $c)").as(s"__p${i + 1}")
      }: _*)
    val tier = cuts.indices
      .map(i => when(col(scoreCol) >= col(s"__p$i"), 1).otherwise(0))
      .reduce(_ + _)
    df.crossJoin(broadcast(bounds))
      .withColumn("tier", tier)
      .drop(cuts.indices.map(i => s"__p$i"): _*)
  }

  /** Greedy token-budget selection: walk documents best-first
    * (`scoreCol` desc, `idCol` asc) and keep every row whose running
    * token total stays within `budget` — "fill N training tokens with
    * the best data". Appends `cum_tokens`, the running total through
    * each kept row.
    *
    * 100 TB shape: the global running sum is decomposed so no stage
    * sorts the corpus in one task — a per-score-value window (order by
    * id) gives within-group running sums, and the cross-score offsets
    * come from [[PrefixSum.exclusive]] over the per-score totals
    * frame, itself range-partitioned rather than single-task-windowed:
    * the distinct-score frame is usually tiny (quantized scores) but
    * is not PROVABLY bounded, and a raw continuous score must not
    * silently plan a corpus-sized one-task sort. Token counts are
    * integers, so the decomposed sum is exactly the sequential one.
    */
  def tokenBudgetSelect(df: DataFrame, idCol: String, scoreCol: String,
                        tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive (got $budget)")
    val totals = df.groupBy(col(scoreCol))
      .agg(sum(col(tokenCol)).as("__bucket_tokens"))
    val offsets = PrefixSum.exclusive(totals, Seq(col(scoreCol).desc),
      col("__bucket_tokens"), "__offset")
    val inW = Window.partitionBy(col(scoreCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(offsets.drop("__bucket_tokens")), Seq(scoreCol))
      .withColumn("cum_tokens",
        col("__offset") + sum(col(tokenCol)).over(inW))
      .filter(col("cum_tokens") <= budget)
      .drop("__offset")
  }
}
