package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch — MERGEABLE approximate frequency table (Cormode &
  * Muthukrishnan 2005), the counting complement of [[KmvSketch]]
  * (distinct counts) and [[graft.text.HeavyHitters]] (exact top-k):
  * "how often does ANY given key occur?", answerable for every key from
  * `depth × width` integers, with per-shard sketches that roll up
  * without touching raw data.
  *
  * The sketch is a d×w count table: row i counts keys under salted hash
  * h_i; `estimate = min_i cnt[i][h_i(x)]` — never an underestimate
  * (every occurrence lands in all d counted cells), overestimates only
  * via collisions (≤ 2N/w with probability ≥ 1 − 2^−d).
  *
  * With `groupCols` the sketch is keyed: one independent d×w table per
  * group (the per-source n-gram frequency question — "how often does
  * this token occur PER domain?"). The grouped build stays one
  * map-side-combined aggregation; its shuffle is bounded by
  * `groups × depth × width` cells, never the corpus.
  *
  * Engine-portable by construction, like the repo's other sketches:
  * the salted hash is the md5 avalanche key of `value ∥ ':' ∥ i`
  * ([[Sampling.avalancheKey]]), and every cell is an exact BIGINT — the
  * gate oracle replays the ENTIRE sketch and every estimate in SQL with
  * zero float parity surface (unlike implementation-defined CMS
  * libraries, whose hash families differ across engines).
  *
  * The (depth, width, groupCols) parameters travel WITH the sketch in
  * the [[Cms]] wrapper, so [[Cms.merge]] and [[Cms.estimate]] can never
  * probe a table built under different parameters — a width mismatch
  * would silently miss every join and coalesce estimates to 0, breaking
  * the one-sided guarantee. Mismatches now fail loudly at plan time.
  *
  * 100 TB shape: the build is one map-side-combined aggregation whose
  * shuffle carries at most groups×depth×width rows PER PARTITION (the
  * hash agg combines occurrences of the same cell before the exchange)
  * — the corpus never shuffles. Merge is cell-wise addition
  * (associative/commutative), so per-shard or per-batch sketches at
  * rest roll up in a bounded agg. Estimation broadcasts the sketch
  * table to the probe side while it fits (≤ groups·d·w rows) and
  * otherwise drops the hint for a shuffled join — see
  * [[Cms.estimate]]'s size-conditional strategy.
  */
object CmsSketch {

  /** Measured grouped-sketch cell counts above this are not
    * broadcast-hinted in [[Cms.estimate]] — a web-scale group domain
    * times d·w cells outgrows the driver/broadcast budget.
    */
  val DefaultMaxBroadcastCells: Long = 4L * 1000 * 1000

  /** A count-min sketch table plus the parameters it was built under.
    * `cells` holds one row per non-empty cell:
    * `(groupCols…, i, bucket, cnt)`. Operations that combine or probe
    * a sketch live here so parameter agreement is enforced by
    * construction.
    */
  final case class Cms(cells: DataFrame, depth: Int, width: Int,
                       groupCols: Seq[String] = Nil) {

    private def requireSameShape(other: Cms): Unit =
      require(depth == other.depth && width == other.width &&
        groupCols == other.groupCols,
        s"CMS parameter mismatch: ($depth,$width,$groupCols) vs " +
          s"(${other.depth},${other.width},${other.groupCols}) — merging or " +
          "probing across different hash shapes silently corrupts estimates")

    /** The cell table, persisted on first probe. Estimation reads it
      * once per sketch row (`depth` slice joins) plus the size
      * measurement, and a lazily-built sketch would re-run its
      * corpus-sized aggregation for EVERY one of those scans —
      * persisting makes the build run exactly once however many probes
      * follow (the table itself is sketch-sized: ≤ groups·d·w rows).
      * Call [[release]] when done probing.
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
      * rollup. Union + sum keeps the bounded-cardinality shape: the agg
      * never exceeds groups×depth×width groups.
      */
    def merge(other: Cms): Cms = {
      requireSameShape(other)
      val merged = cells.unionByName(other.cells)
        .groupBy((groupCols :+ "i" :+ "bucket").map(col): _*)
        .agg(sum(col("cnt")).as("cnt"))
      Cms(merged, depth, width, groupCols)
    }

    /** Estimated occurrence count for each row of `probes.valueCol`
      * (within the probe row's group, when grouped):
      * `min_i cnt[i][h_i(x)]`, with absent cells counting 0.
      *
      * The sketch side broadcasts only while it fits: ungrouped, the
      * cell table is ≤ depth×width rows by construction (a plan-time
      * bound — always hinted). Grouped, it is ≤ groups×depth×width and
      * unbounded in the group cardinality, so the MEASURED cell count
      * decides: at or below `maxBroadcastCells` the d slices broadcast
      * and the probe side never shuffles; above it the hint is dropped
      * and the joins shuffle on (groupCols, bucket) — AQE still
      * upgrades them back to broadcast if the runtime size allows.
      * The deciding count and every slice join read [[probeCells]],
      * so the sketch's corpus aggregation runs exactly once however
      * many probes follow; [[release]] drops the persisted table.
      */
    /** Estimated equi-join cardinality |A ⋈ B| between the two sketched
      * key columns (per group, when grouped) — the classic count-min
      * inner-product estimate (Cormode & Muthukrishnan 2005 §4.2):
      * for each sketch row i, Σ_b cntA[i][b]·cntB[i][b] is an
      * OVERESTIMATE of Σ_v fA(v)·fB(v) (every true product lands in a
      * shared cell; collisions only add), so `min_i` keeps the
      * one-sided guarantee: `join_size_est ≥ |A ⋈ B|` always.
      *
      * The answer comes from the two cell tables alone — the classic
      * use is pricing a join between two 100-TB tables from two
      * sketch files at rest, without touching either corpus. The
      * inner join on (groupCols, i, bucket) is sketch-sized
      * (≤ groups·d·w rows a side); absent cells contribute 0 to the
      * product and drop out of the inner join by construction. Output:
      * one row per group — `(groupCols…, join_size_est)`, exact
      * BIGINTs end to end (zero float surface for the oracle). A group
      * whose sketches share NO cell at all is absent from the output
      * (its estimate is exactly 0 — with d salted rows, even one
      * shared key collides in all d); ungrouped always returns one row.
      */
    def joinSizeEstimate(other: Cms): DataFrame = {
      requireSameShape(other)
      val a = cells.select((groupCols.map(col) :+ col("i") :+ col("bucket") :+
        col("cnt").as("cnt_a")): _*)
      val b = other.cells.select((groupCols.map(col) :+ col("i") :+
        col("bucket") :+ col("cnt").as("cnt_b")): _*)
      val rowSums = a.join(b, groupCols ++ Seq("i", "bucket"))
        .groupBy((groupCols :+ "i").map(col): _*)
        .agg(sum(col("cnt_a") * col("cnt_b")).as("dot"))
      // a sketch row with NO shared buckets has dot = 0 but no surviving
      // row after the inner join — when fewer than `depth` rows remain,
      // the true min is 0, not the min of the rows that did survive
      val est = when(count(lit(1)) < depth, lit(0L))
        .otherwise(min(col("dot"))).as("join_size_est")
      if (groupCols.isEmpty) rowSums.agg(est)
      else rowSums.groupBy(groupCols.map(col): _*).agg(est)
    }

    def estimate(probes: DataFrame, valueCol: String,
                 maxBroadcastCells: Long = DefaultMaxBroadcastCells): DataFrame = {
      val useBroadcast =
        if (groupCols.isEmpty) depth.toLong * width <= maxBroadcastCells
        else probeCellCount <= maxBroadcastCells
      val probed = (0 until depth).foldLeft(probes) { (d, i) =>
        d.withColumn(s"__b$i", bucket(col(valueCol), i, width))
      }
      val est = (0 until depth).foldLeft(probed) { (d, i) =>
        val slice = probeCells.where(col("i") === i)
          .select((groupCols.map(col) :+ col("bucket").as(s"__b$i") :+
            col("cnt").as(s"__c$i")): _*)
        d.join(if (useBroadcast) broadcast(slice) else slice,
          groupCols :+ s"__b$i", "left")
      }
      val counts = (0 until depth).map(i => coalesce(col(s"__c$i"), lit(0L)))
      est.withColumn("cms_est", least(counts: _*))
        .drop((0 until depth).flatMap(i => Seq(s"__b$i", s"__c$i")): _*)
    }
  }

  /** Salted bucket of `c` for sketch row `i`: avalanche(value:i) mod w. */
  private def bucket(c: org.apache.spark.sql.Column, i: Int, width: Int) =
    pmod(Sampling.avalancheKey(concat(c.cast("string"), lit(s":$i"))),
      lit(width.toLong)).cast("int")

  /** Build the d×w sketch of `valueCol` occurrences — one per group
    * when `groupCols` is non-empty: one row per non-empty cell,
    * `(groupCols…, i, bucket, cnt)`. Null values are excluded (they are
    * absence, not a key). Cells never hit stay absent — [[Cms.estimate]]
    * treats them as 0.
    */
  def sketch(df: DataFrame, valueCol: String, depth: Int, width: Int,
             groupCols: Seq[String] = Nil): Cms = {
    require(depth >= 1 && depth <= 16, s"depth out of range: $depth")
    require(width >= 2, s"width out of range: $width")
    val rows = df.filter(col(valueCol).isNotNull)
    val cells = explode(array((0 until depth).map(i =>
      struct(lit(i).as("i"), bucket(col(valueCol), i, width).as("bucket"))): _*))
    val table = rows.select((groupCols.map(col) :+ cells.as("c")): _*)
      .groupBy((groupCols.map(col) :+ col("c.i").as("i") :+
        col("c.bucket").as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))
    Cms(table, depth, width, groupCols)
  }
}
