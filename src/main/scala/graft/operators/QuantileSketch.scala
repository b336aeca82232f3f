package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dyadic count-min QUANTILE sketch — the mergeable rank/quantile
  * summary that completes the repo's sketch family ([[KmvSketch]]
  * distinct counts, [[CmsSketch]] frequencies,
  * [[graft.text.HeavyHitters]] exact top-k): "what is the q-quantile /
  * the rank of v", answerable from `levels × depth × width` integers,
  * with per-shard sketches that roll up without touching raw data.
  *
  * Construction (Cormode & Muthukrishnan 2005, §4 range queries): the
  * value domain is the integer universe `[0, 2^levels)`; each value
  * feeds one count-min row per dyadic LEVEL (level l counts the prefix
  * `v >> l`), so any rank query decomposes into ≤ `levels` dyadic
  * interval counts, each answered by that level's CMS in O(depth).
  * Everything downstream is integer min/sum arithmetic:
  *
  *  - `rank(v)` = Σ over set bits l of v of est(level l, prefix
  *    `(v >> l) − 1`) — the classic [0, v) dyadic decomposition. Like
  *    every CMS estimate it NEVER underestimates (each element lands in
  *    all its cells); it overestimates only via hash collisions
  *    (≤ 2·levels·N/width with probability ≥ 1 − levels·2^−depth).
  *  - `quantiles(q)` walks the dyadic tree root-to-leaf: at each node
  *    descend into the left child iff the remaining target rank fits in
  *    its estimated count — `levels` bounded steps, each a lookup in
  *    one level's CMS.
  *
  * Unlike GK/KLL summaries — whose content depends on the merge tree,
  * so two equal corpora sharded differently yield different summaries —
  * every operation here is a cell-wise integer add or min: sketches,
  * ranks and quantile walks are IDENTICAL under any partitioning,
  * shard split or merge order. That determinism is what lets the gate
  * oracle replay the whole sketch, every rank and the full tree walk in
  * SQL (the same salted md5 avalanche hash as [[CmsSketch]]), a parity
  * contract no randomized quantile sketch can offer.
  *
  * Values must already be quantized to `[0, 2^levels)` (token counts,
  * scores scaled to a fixed grid, epoch-days...) — out-of-domain values
  * fail loudly rather than silently aliasing. Quantile answers are
  * exact-to-the-grid: the walk returns a universe value, and on data
  * that lives on the grid the q-quantile IS a data value (the
  * PERCENTILE_DISC convention), so precision is set by the
  * quantization, error by (levels, depth, width).
  *
  * With `groupCols` one independent sketch per group, like the CMS —
  * and the same scale postures: the build is ONE map-side-combined
  * aggregation whose shuffle is bounded by groups×levels×depth×width
  * cells per partition (the corpus never shuffles); `merge` is a
  * bounded cell-wise add; `rank` broadcasts the sketch while the
  * MEASURED cell count fits and falls back to a shuffled join for
  * web-scale group domains; the `quantiles` walk iterates over a
  * (groups × #quantiles)-row state frame — never corpus-sized.
  */
object QuantileSketch {

  /** Same posture as [[CmsSketch.DefaultMaxBroadcastCells]]. */
  val DefaultMaxBroadcastCells: Long = 4L * 1000 * 1000

  /** Salted bucket of prefix `p` at level `l`, CMS row `i`. */
  private def bucket(p: Column, l: Int, i: Int, width: Int): Column =
    pmod(Sampling.avalancheKey(concat(p.cast("string"), lit(s":$l:$i"))),
      lit(width.toLong)).cast("int")

  /** A dyadic quantile sketch plus the parameters it was built under
    * (the [[CmsSketch.Cms]] contract: parameter agreement enforced by
    * construction, mismatches fail loudly at plan time). `cells` holds
    * one row per non-empty cell: `(groupCols…, lvl, i, bucket, cnt)`.
    */
  final case class Dq(cells: DataFrame, levels: Int, depth: Int, width: Int,
                      groupCols: Seq[String] = Nil) {

    private def requireSameShape(other: Dq): Unit =
      require(levels == other.levels && depth == other.depth &&
        width == other.width && groupCols == other.groupCols,
        s"quantile-sketch parameter mismatch: ($levels,$depth,$width," +
          s"$groupCols) vs (${other.levels},${other.depth},${other.width}," +
          s"${other.groupCols}) — merging or probing across different " +
          "shapes silently corrupts estimates")

    /** The cell table, persisted on first probe. The quantile walk
      * joins one slice per (level, sketch row) — levels·depth scans —
      * and `rank` another `depth`, each of which would re-run a
      * lazily-built sketch's corpus-sized aggregation (measured: the
      * walk turned a seconds-long build into minutes at sf0.1 before
      * this); persisting makes the build run exactly once (the table
      * itself is sketch-sized: ≤ groups·levels·d·w rows). Call
      * [[release]] when done probing.
      */
    @transient private lazy val probeCells: DataFrame = {
      val m = cells.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m.count()
      m
    }

    @transient private lazy val probeCellCount: Long = probeCells.count()

    /** Drop the persisted cell table (no-op if never probed). */
    def release(): Unit = { cells.unpersist(); () }

    /** Cell-wise merge with a sketch of the SAME shape — the per-shard
      * rollup; the agg never exceeds groups×levels×depth×width groups.
      */
    def merge(other: Dq): Dq = {
      requireSameShape(other)
      val merged = cells.unionByName(other.cells)
        .groupBy((groupCols :+ "lvl" :+ "i" :+ "bucket").map(col): _*)
        .agg(sum(col("cnt")).as("cnt"))
      Dq(merged, levels, depth, width, groupCols)
    }

    /** Per-group element count, exactly: every element contributes 1 to
      * level 0 row 0, so the level-(0,0) cell sum is N.
      */
    def totals: DataFrame = {
      val n = probeCells.where(col("lvl") === 0 && col("i") === 0)
      if (groupCols.isEmpty) n.agg(sum(col("cnt")).as("n"))
      else n.groupBy(groupCols.map(col): _*).agg(sum(col("cnt")).as("n"))
    }

    /** Estimated rank — the number of sketched values STRICTLY below
      * each probe value (within the probe row's group, when grouped),
      * as `rank_est`. Never an underestimate. Probes must lie in
      * `[0, 2^levels)` (fail loudly otherwise; the rank of the domain
      * ceiling is [[totals]]). Duplicate probe rows collapse to one.
      *
      * Plan shape: each probe explodes into its ≤ `levels` dyadic
      * intervals, the sketch joins once per CMS row on
      * `(groupCols, lvl, bucket)` — `depth` joins total regardless of
      * `levels` — and one bounded agg folds min-over-rows /
      * sum-over-intervals back to a row per probe. The sketch side
      * broadcasts under the same measured-size condition as
      * [[CmsSketch.Cms.estimate]].
      */
    def rank(probes: DataFrame, valueCol: String,
             maxBroadcastCells: Long = DefaultMaxBroadcastCells): DataFrame = {
      val useBroadcast = probeCellCount <= maxBroadcastCells
      val v = checkedValue(probes, valueCol, levels)
      val probeCols = probes.columns.map(col).toSeq
      // [0, v) = ⋃ over set bits l: dyadic interval (l, (v >> l) − 1).
      // Unset bits stay as NULL array entries — explode keeps them as
      // null rows, so a probe of 0 (no intervals) still surfaces with
      // rank_est 0 instead of vanishing from the output.
      val ivs = array((0 until levels).map(l =>
        when(shiftright(v, l) % 2 === 1,
          struct(lit(l).as("lvl"), (shiftright(v, l) - 1).as("p")))): _*)
      val exploded = probes
        .select(probeCols :+ explode(ivs).as("__iv"): _*)
        .select(probeCols :+ col("__iv.lvl").as("lvl") :+ col("__iv.p").as("p"): _*)
      // bucket per CMS row is a different hash of (p, lvl) — one join per
      // row i, each keyed (groupCols, lvl, bucket)
      val est = (0 until depth).foldLeft(
        (0 until depth).foldLeft(exploded) { (d, i) =>
          d.withColumn(s"__b$i", pmod(Sampling.avalancheKey(
              concat(col("p").cast("string"), lit(":"),
                col("lvl").cast("string"), lit(s":$i"))),
            lit(width.toLong)).cast("int"))
        }) { (d, i) =>
        val slice = probeCells.where(col("i") === i)
          .select(groupCols.map(col) :+ col("lvl") :+
            col("bucket").as(s"__b$i") :+ col("cnt").as(s"__c$i"): _*)
        d.join(if (useBroadcast) broadcast(slice) else slice,
          groupCols ++ Seq("lvl", s"__b$i"), "left")
      }
      val ivEst = least((0 until depth).map(i =>
        coalesce(col(s"__c$i"), lit(0L))): _*)
      est.withColumn("__ivest", ivEst)
        .groupBy(probeCols: _*)
        .agg(sum(col("__ivest")).as("rank_est"))
    }

    /** q-quantile values per group via the dyadic tree walk: target
      * rank `t = ceil(q·N)` clamped to `[1, N]`; from the root, descend
      * into the left child iff `t ≤` its estimated count, else subtract
      * and go right; the level-0 prefix reached is the answer
      * (PERCENTILE_DISC-convention up to CMS overestimate error).
      * Output: one row per (group, q): `(groupCols…, q, q_value)`;
      * empty groups yield no row.
      *
      * The walk is sketch-sized work either way, in two regimes on the
      * MEASURED cell count (same gate as [[rank]]):
      *  - at or below `maxBroadcastCells`, the cells collect to the
      *    driver ONCE (bounded by the cap, by construction) and the
      *    walk runs driver-side over a hash map — zero joins, no
      *    per-slice broadcast jobs (the distributed walk spent
      *    levels·depth broadcast builds ≈ 10 s of pure scheduling on an
      *    under-cap sketch before this); the result returns as a local
      *    frame. The driver hash is [[Sampling.avalancheKeyLocal]],
      *    spec-pinned identical to the column expression.
      *  - above the cap, `levels` rounds of joins over a
      *    (groups × #quantiles)-row state frame against one level's
      *    cells each, unhinted (AQE upgrades what fits), state
      *    localCheckpointed every few levels so the plan stays shallow.
      * QuantileSketchSpec pins the two regimes row-identical.
      */
    def quantiles(qs: Seq[Double],
                  maxBroadcastCells: Long = DefaultMaxBroadcastCells): DataFrame = {
      require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
        s"quantiles must be in [0, 1]: $qs")
      if (probeCellCount <= maxBroadcastCells) quantilesLocal(qs)
      else quantilesDistributed(qs)
    }

    /** Under-cap walk: the collected cell map IS the index. */
    private def quantilesLocal(qs: Seq[Double]): DataFrame = {
      val spark = cells.sparkSession
      val groupIdx = groupCols.indices
      val collected = probeCells.collect()
      def gkey(r: org.apache.spark.sql.Row): Seq[Any] =
        groupIdx.map(i => r.getAs[Any](groupCols(i)))
      val cellMap = collected.map { r =>
        (gkey(r), r.getAs[Int]("lvl"), r.getAs[Int]("i"),
          r.getAs[Int]("bucket")) -> r.getAs[Long]("cnt")
      }.toMap
      val ns = collected
        .filter(r => r.getAs[Int]("lvl") == 0 && r.getAs[Int]("i") == 0)
        .groupBy(gkey).map { case (g, rs) =>
          g -> rs.map(_.getAs[Long]("cnt")).sum
        }
      val rows = for {
        (g, n) <- ns.toSeq if n > 0
        q <- qs.distinct.sorted
      } yield {
        // ceil(q·N) on the double product — the same quantile-index
        // convention as the distributed ceil(col)·cast(long)
        var t = math.max(math.ceil(q * n).toLong, 1L)
        var p = 0L
        for (l <- (levels - 1) to 0 by -1) {
          val lc = (0 until depth).map { i =>
            val b = (Sampling.avalancheKeyLocal(s"${p * 2}:$l:$i") %
              width.toLong).toInt
            cellMap.getOrElse((g, l, i, b), 0L)
          }.min
          if (t <= lc) p = p * 2
          else { t = t - lc; p = p * 2 + 1 }
        }
        // Seq[Any], NOT Seq(q, p): Long weakly conforms to Double, so
        // an untyped Seq would widen p to Double and poison the
        // LongType slot
        org.apache.spark.sql.Row.fromSeq(g ++ Seq[Any](q, p))
      }
      val schema = org.apache.spark.sql.types.StructType(
        groupCols.map(c => cells.schema(c)) ++ Seq(
          org.apache.spark.sql.types.StructField("q",
            org.apache.spark.sql.types.DoubleType, nullable = false),
          org.apache.spark.sql.types.StructField("q_value",
            org.apache.spark.sql.types.LongType, nullable = false)))
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    }

    /** Over-cap walk: `levels` rounds of unhinted joins over the
      * (groups × #quantiles)-row state frame.
      */
    private def quantilesDistributed(qs: Seq[Double]): DataFrame = {
      val spark = cells.sparkSession
      val qdf = spark.createDataFrame(
        qs.distinct.sorted.map(Tuple1(_))).toDF("q")
      // ceil(q·N) via integer arithmetic on the exactly-representable
      // double q (q·N is exact for the gate's dyadic qs; for arbitrary
      // qs the double product is the standard quantile-index convention)
      var state = totals.where(col("n") > 0).crossJoin(broadcast(qdf))
        .withColumn("__t", greatest(ceil(col("q") * col("n")).cast("long"), lit(1L)))
        .withColumn("__p", lit(0L))
      val stateKeys = groupCols :+ "q"
      for (l <- (levels - 1) to 0 by -1) {
        val lc = col("__p") * 2 // left-child prefix at level l
        val withB = (0 until depth).foldLeft(state) { (d, i) =>
          d.withColumn(s"__b$i", pmod(Sampling.avalancheKey(
              concat(lc.cast("string"), lit(s":$l:$i"))),
            lit(width.toLong)).cast("int"))
        }
        val joined = (0 until depth).foldLeft(withB) { (d, i) =>
          val slice = probeCells.where(col("lvl") === l && col("i") === i)
            .select(groupCols.map(col) :+ col("bucket").as(s"__b$i") :+
              col("cnt").as(s"__c$i"): _*)
          d.join(slice, groupCols :+ s"__b$i", "left")
        }
        val leftCnt = least((0 until depth).map(i =>
          coalesce(col(s"__c$i"), lit(0L))): _*)
        state = joined
          .withColumn("__lc", leftCnt)
          .withColumn("__p", when(col("__t") <= col("__lc"), col("__p") * 2)
            .otherwise(col("__p") * 2 + 1))
          .withColumn("__t", when(col("__t") <= col("__lc"), col("__t"))
            .otherwise(col("__t") - col("__lc")))
          .drop((0 until depth).flatMap(i => Seq(s"__b$i", s"__c$i")) :+ "__lc": _*)
        if (l % 4 == 0 && l > 0) state = state.localCheckpoint()
      }
      state.select((stateKeys.map(col) :+ col("__p").as("q_value")): _*)
    }
  }

  /** DOUBLE-VALUED quantile lane — the quantize-and-track wrapper that
    * removes the caller ceremony the integer contract otherwise
    * demands: a raw float metric gets monitored quantiles while the
    * sketch itself stays on the exact-integer grid (the oracle is not
    * weakened — it replays the SAME integer cells and walk, plus the
    * closed-form scaling trees around them).
    *
    * The grid is derived from the data in one map-side-combined
    * min/max pass: `scale = (2^levels − 1) / (hi − lo)` (1.0 when the
    * column is constant), `v = clamp(⌊(x − lo)·scale⌋)`. Every output
    * row carries the full provenance: the grid value (`q_grid`), the
    * de-scaled `q_value = lo + q_grid / scale` (the CELL'S LEFT EDGE),
    * the `scale`, and `max_abs_err = 1/scale` — a strict bound on
    * |q_value − the true PERCENTILE_DISC of the raw doubles|, because
    * quantization is monotone (ties merge toward the left edge) so
    * the walk lands in the true quantile's cell. Precision is chosen
    * by `levels`; tighten the bound by raising it.
    *
    * Scaling trees are single IEEE expressions over the exact min/max
    * — bit-replayable in SQL like every float in this engine. NULLs
    * are excluded (the sketch contract); an empty frame yields no
    * rows. 100 TB shape: unchanged from [[sketch]] — the extra cost is
    * one min/max aggregation and a broadcast of its single row.
    */
  def quantilesDouble(df: DataFrame, valueCol: String, levels: Int,
                      depth: Int, width: Int, qs: Seq[Double]): DataFrame = {
    val rows = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__x"))
    val top = (1L << levels) - 1
    val stats = rows
      .agg(min(col("__x")).as("__lo"), max(col("__x")).as("__hi"))
      .select(col("__lo"),
        when(col("__hi") > col("__lo"),
            lit(top.toDouble) / (col("__hi") - col("__lo")))
          .otherwise(lit(1.0)).as("__scale"))
    val quantized = rows.crossJoin(broadcast(stats))
      .select(least(greatest(
          floor((col("__x") - col("__lo")) * col("__scale")).cast("long"),
          lit(0L)), lit(top)).as("__v"))
    sketch(quantized, "__v", levels, depth, width)
      .quantiles(qs)
      .crossJoin(broadcast(stats))
      .select(col("q"), col("q_value").as("q_grid"),
        (col("__lo") + col("q_value").cast("double") / col("__scale"))
          .as("q_value"),
        col("__scale").as("scale"),
        (lit(1.0) / col("__scale")).as("max_abs_err"))
  }

  private def checkedValue(df: DataFrame, valueCol: String,
                           levels: Int): Column = {
    val v = col(valueCol).cast("long")
    when(v < 0 || v >= (1L << levels),
        raise_error(concat(
          lit(s"quantile-sketch value outside [0, 2^$levels): "),
          v.cast("string"))))
      .otherwise(v)
  }

  /** Build the dyadic sketch of `valueCol` — one per group when
    * `groupCols` is non-empty: one row per non-empty cell,
    * `(groupCols…, lvl, i, bucket, cnt)`. Values must be integers in
    * `[0, 2^levels)` (fail loudly otherwise); nulls are excluded.
    *
    * With `weightCol` each row contributes its integer weight instead
    * of 1 — the WEIGHTED sketch, cell-for-cell equal to sketching the
    * row replicated `weight` times: `rank` becomes "total weight of
    * values strictly below v" and `quantiles` the weighted
    * (mass-based) quantile — "half the corpus's CHARACTERS live in
    * documents shorter than the w=n_chars median", the corpus-report
    * statistic a plain quantile can't state. Weights must be
    * non-negative longs (fail loudly otherwise); nulls excluded; all
    * guarantees carry over with N = the total weight.
    *
    * 100 TB shape: the corpus pass is ONE map-side-combining
    * pre-aggregation to distinct `(group, value)` pairs — bounded by
    * groups × 2^levels per partition, because the universe is bounded
    * BY CONSTRUCTION — and only those distinct pairs pay the
    * `levels × depth` hash explode into the cell aggregation. Hashing
    * per row instead cost levels·depth md5s × corpus size (measured
    * ~600× more hash work than the distinct table at the gate's
    * 1024-value universe); the cell counts are identical either way,
    * so the oracle replay is unchanged.
    */
  def sketch(df: DataFrame, valueCol: String, levels: Int, depth: Int,
             width: Int, groupCols: Seq[String] = Nil,
             weightCol: Option[String] = None): Dq = {
    require(levels >= 1 && levels <= 40, s"levels out of range: $levels")
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width out of range: $width")
    val rows = weightCol.foldLeft(df.filter(col(valueCol).isNotNull))(
      (d, wc) => d.filter(col(wc).isNotNull))
    val v = checkedValue(rows, valueCol, levels)
    val w = weightCol.map { wc =>
      val c = col(wc).cast("long")
      when(c < 0, raise_error(concat(
          lit("quantile-sketch weight must be non-negative: "),
          c.cast("string"))))
        .otherwise(c)
    }
    // corpus → distinct (group, value) with multiplicity: ≤ 2^levels
    // values per group regardless of corpus size
    val distinctVals = rows
      .select(groupCols.map(col) ++ Seq(v.as("__v")) ++
        w.map(_.as("__w")).toSeq: _*)
      .groupBy(groupCols.map(col) :+ col("__v"): _*)
      .agg(w.map(_ => sum(col("__w"))).getOrElse(count(lit(1))).as("__n"))
      // AQE coalesces the collapsed table's exchange to ONE partition
      // (it is KB-sized), which would serialize the levels×depth
      // salted-md5 cell expansion below — measured at the 10M-row
      // bench: 8.2 s on the one task vs 0.5 s spread (the md5 is the
      // oracle-replay contract, so the fix is parallelism, not a
      // cheaper hash). Round-robin the sketch-sized rows back out;
      // the extra exchange moves ≤ groups·2^levels tiny rows and the
      // cell sums are partitioning-independent integer adds
      .repartition(rows.sparkSession.sparkContext.defaultParallelism)
    val dv = col("__v")
    val cellsCol = explode(array((for (l <- 0 until levels; i <- 0 until depth)
      yield struct(lit(l).as("lvl"), lit(i).as("i"),
        bucket(shiftright(dv, l), l, i, width).as("bucket"))): _*))
    val table = distinctVals
      .select(groupCols.map(col) ++ Seq(cellsCol.as("c"), col("__n")): _*)
      .groupBy(groupCols.map(col) :+ col("c.lvl").as("lvl") :+
        col("c.i").as("i") :+ col("c.bucket").as("bucket"): _*)
      .agg(sum(col("__n")).as("cnt"))
    Dq(table, levels, depth, width, groupCols)
  }
}
