package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation — the web-scale quality
  * signal a training-data pipeline propagates over a URL/domain link
  * graph (Page et al. 1999; the harmonic/seed variants are the
  * Common-Crawl-era curation idiom: push trust mass out of a small
  * vetted seed set and keep documents whose hosts accumulate it).
  *
  * FIXED-POINT INTEGER power iteration: ranks are BIGINT mass in units
  * of `scale`, every step is integer multiply / add / truncating
  * divide, so the result is a deterministic function of the edge SET —
  * identical under any partitioning, shard order or merge tree, and
  * replayable row-for-row by a chained-CTE SQL oracle
  * ([[PageRank.oracleSql]] generates it from the same parameters).
  * Floating-point PageRank cannot make that promise: contribution sums
  * reassociate differently per partitioning, so no bit-exact parity
  * contract exists for it.
  *
  * Semantics, exactly (one iteration, damping `dampNum/dampDen`,
  * teleport set S — all nodes by default, the seed set when given):
  *
  *   contrib(u→v) = r(u) div outdeg(u)            (truncating div)
  *   inc(v)       = Σ over in-edges of contrib
  *   D            = Σ r(u) over dangling u (outdeg 0)
  *   tele         = (dampDen−dampNum)·n·scale div (dampDen·|S|)
  *   r'(v)        = [v∈S]·tele
  *                + dampNum·(inc(v) + [v∈S]·(D div |S|)) div dampDen
  *
  * Initial mass is `scale` per node (total n·scale). Truncation sheds
  * a few units of mass per step — deterministically, the price of
  * bit-exactness; with scale = 1e9 the relative loss is ≤ n·iters
  * parts per 1e9·n, noise next to the damping geometry.
  *
  * 100 TB shape: the graph is edge-partitioned, never collected. Per
  * iteration: one shuffle of the node-sized rank frame into the join
  * with the (persisted, pre-partitioned) edge table, one edge-sized
  * map-side-combining aggregation of contributions, and a 1-row
  * dangling-mass aggregate that enters the plan via a broadcast cross
  * join — no per-iteration driver collect. Ranks are
  * `localCheckpoint`ed each iteration so the plan stays one-iteration
  * deep instead of growing a 10-iteration lineage (the classic
  * iterative-Spark failure: an un-truncated loop replays every prior
  * iteration per action and overflows the planner at depth ~20).
  * Overflow is guarded up front: `n·scale·(1+dampNum/dampDen)` must
  * fit in a signed 64-bit rank cell, checked against the MEASURED node
  * count, and ANSI mode makes any residual overflow loud, not wrapped.
  */
object PageRank {

  /** Ranks after `iterations` steps: `(node, rank, out_deg)` — `rank`
    * the scaled BIGINT mass, `out_deg` the distinct-edge out-degree.
    *
    * `edges`: one row per directed edge; nulls dropped, duplicate
    * edges collapse (SET semantics — multiplicity is a different
    * operator, weighted PageRank). `seeds`: optional single-column
    * frame of node ids; teleport + dangling mass then flow ONLY to
    * seeds that exist in the graph (personalized PageRank; must
    * intersect the node set non-emptily, else this fails loudly).
    */
  /** `tolPpb`: when set, stop EARLY once the L1 rank movement of an
    * iteration falls to `tolPpb` parts-per-billion of the total mass
    * `n·scale` (`iterations` then caps the loop instead of driving
    * it) — the production posture for graphs whose mixing time is
    * unknown. The check is one bounded agg + a 1-row driver read per
    * iteration; with `tolPpb = None` (the gate/oracle setting) the
    * iteration count is exact and replayable.
    *
    * `checkpointDir`: when set, per-iteration state cuts use a
    * RELIABLE checkpoint into that directory instead of
    * `localCheckpoint` — survives executor loss on a real cluster at
    * the cost of one FS round-trip of the node-sized state per
    * iteration (see [[graft.core.Durable]]; results are bit-identical
    * either way, asserted in GraphSpec).
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iterations: Int, scale: Long = 1000000000L,
            dampNum: Long = 85L, dampDen: Long = 100L,
            seeds: Option[DataFrame] = None,
            tolPpb: Option[Long] = None,
            checkpointDir: Option[String] = None): DataFrame = {
    val cut = new graft.core.Durable(checkpointDir)
    require(iterations >= 1 && iterations <= 100,
      s"iterations out of range: $iterations")
    require(dampDen > 0 && dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < num < den: $dampNum/$dampDen")
    require(scale >= 1000L, s"scale too small for integer ranks: $scale")

    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .join(outdeg, Seq("node"), "left")
      .na.fill(0L, Seq("out_deg"))

    val seeded = seeds match {
      case None => nodes.withColumn("is_seed", lit(true))
      case Some(sd) =>
        val sc = sd.columns.head
        val ss = sd.select(col(sc).cast("long").as("node"))
          .where(col("node").isNotNull).distinct()
        nodes.join(ss.withColumn("is_seed", lit(true)), Seq("node"), "left")
          .na.fill(false, Seq("is_seed"))
    }
    val info = seeded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = info.count()
    val sN = info.where(col("is_seed")).count()
    require(sN > 0, "personalized PageRank seed set does not intersect the graph")
    // the pre-division product dampNum·(inc + dang) is bounded by
    // dampNum·2·(total mass) — the binding 64-bit constraint (a sink
    // hub can receive nearly the whole corpus's mass). Bound it against
    // the MEASURED node count; at 1e9 nodes pick scale ≈ 1e7 — rank
    // resolution trades off directly against graph size.
    require(BigInt(n) * scale * 2 * dampNum <= Long.MaxValue,
      s"n·scale·2·dampNum exceeds 64-bit fixed-point headroom: " +
        s"n=$n scale=$scale dampNum=$dampNum — lower scale")
    // the teleport numerator (dampDen−dampNum)·n·scale has its own
    // 64-bit bound — at small dampNum it exceeds the rank-update guard
    // above (driver-side Scala Longs wrap SILENTLY, no ANSI here)
    require(BigInt(dampDen - dampNum) * n * scale <= Long.MaxValue,
      s"teleport numerator (dampDen−dampNum)·n·scale overflows 64 bits: " +
        s"n=$n scale=$scale damp=$dampNum/$dampDen — lower scale")

    val tele = ((dampDen - dampNum) * n * scale) / (dampDen * sN)

    // state carries (out_deg, is_seed) alongside the rank so no
    // iteration re-joins the node-info table — one join (the edge
    // contribution) and one bounded agg per step
    var state = cut.cut(info.withColumn("rank", lit(scale)))
    var it = 0
    var moved = true
    while (it < iterations && moved) {
      val prev = state
      val dang = state.where(col("out_deg") === 0)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__d"))
      val inc = state.where(col("out_deg") > 0)
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"),
          expr("rank div out_deg").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__inc"))
      state = state.select("node", "out_deg", "is_seed")
        .join(inc, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"), col("out_deg"), col("is_seed"),
          (when(col("is_seed"), lit(tele)).otherwise(lit(0L)) +
            expr(s"($dampNum * (coalesce(__inc, 0L) + " +
              s"(CASE WHEN is_seed THEN __d div $sN ELSE 0L END))) div $dampDen"))
            .as("rank"))
      state = cut.cut(state)
      it += 1
      tolPpb.foreach { tol =>
        val delta = state.select(col("node"), col("rank"))
          .join(prev.select(col("node"), col("rank").as("__pr")), Seq("node"))
          .agg(coalesce(sum(abs(col("rank") - col("__pr"))), lit(0L)))
          .head().getLong(0)
        moved = BigInt(delta) * 1000000000L > BigInt(tol) * n * scale
      }
    }
    val out = cut.cut(state.select("node", "rank", "out_deg"))
    e.unpersist()
    info.unpersist()
    out
  }

  /** [[ranks]] with EDGE WEIGHTS: contributions are proportional to
    * integer edge weight — `contrib(u→v) = (r(u)·w(u,v)) div W(u)` with
    * `W(u)` the node's total out-weight — the multiplicity-aware form
    * (shared-order counts, link frequencies). Duplicate (src, dst) rows
    * SUM their weights; weights must be positive INTEGERS — fractional
    * or non-positive weights abort in-plan, a NULL weight drops the
    * edge exactly like a NULL endpoint.
    * Everything else (teleport, dangling, truncation, determinism, the
    * 64-bit headroom guard — which here also bounds `r·maxW`) matches
    * [[ranks]]; [[weightedOracleSql]] replays it.
    *
    * Same per-iteration shape as the unweighted form, with the
    * contribution product guarded: `r(u)·w ≤ 2·n·scale·maxW` must fit,
    * checked against the MEASURED max out-weight.
    */
  def weightedRanks(edges: DataFrame, srcCol: String, dstCol: String,
                    weightCol: String, iterations: Int,
                    scale: Long = 1000000000L,
                    dampNum: Long = 85L, dampDen: Long = 100L,
                    seeds: Option[DataFrame] = None,
                    checkpointDir: Option[String] = None): DataFrame = {
    val cut = new graft.core.Durable(checkpointDir)
    require(iterations >= 1 && iterations <= 100,
      s"iterations out of range: $iterations")
    require(dampDen > 0 && dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < num < den: $dampNum/$dampDen")
    require(scale >= 1000L, s"scale too small for integer ranks: $scale")

    // integral check first (fractional weights abort, never truncate —
    // the Quantized contract), then positivity; a NULL weight drops the
    // edge like a NULL endpoint does
    val w0 = graft.operators.Quantized.checkedLong(
      col(weightCol), "weighted PageRank")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        when(w0 <= 0, raise_error(concat(
            lit("weighted PageRank needs positive integer weights: "),
            w0.cast("string"))))
          .otherwise(w0).as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("w").isNotNull)
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val outw = e.groupBy(col("src").as("node"))
      .agg(sum(col("w")).as("out_w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .join(outw, Seq("node"), "left")
      .na.fill(0L, Seq("out_w"))

    val seeded = seeds match {
      case None => nodes.withColumn("is_seed", lit(true))
      case Some(sd) =>
        val sc = sd.columns.head
        val ss = sd.select(col(sc).cast("long").as("node"))
          .where(col("node").isNotNull).distinct()
        nodes.join(ss.withColumn("is_seed", lit(true)), Seq("node"), "left")
          .na.fill(false, Seq("is_seed"))
    }
    val info = seeded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = info.count()
    val sN = info.where(col("is_seed")).count()
    require(sN > 0, "personalized PageRank seed set does not intersect the graph")
    val maxW = e.agg(max(col("w"))).head().getLong(0)
    // two binding products: dampNum·2·n·scale (rank update) and
    // r·w ≤ 2·n·scale·maxW (contribution numerator)
    require(BigInt(n) * scale * 2 * dampNum <= Long.MaxValue &&
        BigInt(n) * scale * 2 * maxW <= Long.MaxValue,
      s"n·scale·2·max(dampNum=$dampNum, maxW=$maxW) exceeds 64-bit " +
        s"fixed-point headroom: n=$n scale=$scale — lower scale")
    require(BigInt(dampDen - dampNum) * n * scale <= Long.MaxValue,
      s"teleport numerator (dampDen−dampNum)·n·scale overflows 64 bits: " +
        s"n=$n scale=$scale damp=$dampNum/$dampDen — lower scale")

    val tele = ((dampDen - dampNum) * n * scale) / (dampDen * sN)

    var state = cut.cut(info.withColumn("rank", lit(scale)))
    for (_ <- 1 to iterations) {
      val dang = state.where(col("out_w") === 0)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__d"))
      val inc = state.where(col("out_w") > 0)
        .join(e, col("node") === col("src"))
        .select(col("dst").as("node"),
          expr("(rank * w) div out_w").as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__inc"))
      state = state.select("node", "out_w", "is_seed")
        .join(inc, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"), col("out_w"), col("is_seed"),
          (when(col("is_seed"), lit(tele)).otherwise(lit(0L)) +
            expr(s"($dampNum * (coalesce(__inc, 0L) + " +
              s"(CASE WHEN is_seed THEN __d div $sN ELSE 0L END))) div $dampDen"))
            .as("rank"))
      state = cut.cut(state)
    }
    val out = cut.cut(state.select("node", "rank", "out_w"))
    e.unpersist()
    info.unpersist()
    out
  }

  /** The DuckDB replay of [[weightedRanks]] — [[oracleSql]]'s template
    * with weight-proportional contributions. `edgesSql` must SELECT
    * `src, dst, w` (positive; duplicate pairs sum here).
    */
  def weightedOracleSql(edgesSql: String, iterations: Int,
                        scale: Long = 1000000000L,
                        dampNum: Long = 85L, dampDen: Long = 100L,
                        seedsSql: Option[String] = None): String = {
    val seedCte = seedsSql match {
      case None => "SELECT node, TRUE AS is_seed FROM nodes0"
      case Some(s) =>
        s"""SELECT n.node, (sd.node IS NOT NULL) AS is_seed
            FROM nodes0 n LEFT JOIN (SELECT DISTINCT node FROM ($s)) sd
            ON n.node = sd.node"""
    }
    val iters = (1 to iterations).map { t =>
      s"""pr$t AS MATERIALIZED (
           SELECT i.node,
             (CASE WHEN i.is_seed THEN (SELECT tele FROM consts) ELSE 0 END)
             + ($dampNum * (COALESCE(inc.s, 0)
                 + (CASE WHEN i.is_seed
                    THEN (SELECT COALESCE(SUM(r.rank), 0) FROM pr${t - 1} r
                          JOIN info di ON di.node = r.node AND di.out_w = 0)
                         // (SELECT sn FROM consts)
                    ELSE 0 END))) // $dampDen AS rank
           FROM info i
           LEFT JOIN (
             SELECT e.dst AS node, SUM((r.rank * e.w) // si.out_w) AS s
             FROM pr${t - 1} r
             JOIN info si ON si.node = r.node AND si.out_w > 0
             JOIN edges e ON e.src = r.node
             GROUP BY e.dst) inc
           ON inc.node = i.node)"""
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED (
         SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w
         FROM ($edgesSql) GROUP BY src, dst),
       nodes0 AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       seedflag AS ($seedCte),
       info AS MATERIALIZED (
         SELECT s.node, s.is_seed, COALESCE(d.out_w, 0) AS out_w
         FROM seedflag s LEFT JOIN (
           SELECT src AS node, CAST(SUM(w) AS BIGINT) AS out_w
           FROM edges GROUP BY src) d
         ON s.node = d.node),
       consts AS MATERIALIZED (
         SELECT CAST($scale AS BIGINT) AS scale,
           (SELECT COUNT(*) FROM info) AS n,
           (SELECT COUNT(*) FROM info WHERE is_seed) AS sn,
           ((${dampDen - dampNum} * (SELECT COUNT(*) FROM info) * $scale)
             // ($dampDen * (SELECT COUNT(*) FROM info WHERE is_seed))) AS tele),
       pr0 AS (SELECT node, (SELECT scale FROM consts) AS rank FROM info),
       $iters,
       final AS (
         SELECT p.node, CAST(p.rank AS BIGINT) AS rank,
           CAST(i.out_w AS BIGINT) AS out_w
         FROM pr$iterations p JOIN info i ON i.node = p.node)
       SELECT node, rank, out_w FROM final ORDER BY node"""
  }

  /** The DuckDB replay of [[ranks]]: chained CTEs, one per iteration
    * (recursive CTEs forbid the GROUP BY each step needs), generated
    * from the SAME parameters so query and oracle cannot drift.
    * `edgesSql` must SELECT columns `src, dst` (already non-null;
    * duplicates fine — deduped here) and `seedsSql`, when given, a
    * single column `node`.
    *
    * Iteration CTEs are `AS MATERIALIZED`: each references its
    * predecessor twice (contribution join + dangling-mass subquery),
    * and DuckDB inlines plain CTEs per reference — 8 un-materialized
    * iterations re-evaluate the chain 2^8 times (measured: timeout vs
    * 0.5 s at sf0.001).
    */
  def oracleSql(edgesSql: String, iterations: Int, scale: Long = 1000000000L,
                dampNum: Long = 85L, dampDen: Long = 100L,
                seedsSql: Option[String] = None,
                finalSelect: String = "SELECT node, rank, out_deg FROM final ORDER BY node"): String = {
    val seedCte = seedsSql match {
      case None => "SELECT node, TRUE AS is_seed FROM nodes0"
      case Some(s) =>
        s"""SELECT n.node, (sd.node IS NOT NULL) AS is_seed
            FROM nodes0 n LEFT JOIN (SELECT DISTINCT node FROM ($s)) sd
            ON n.node = sd.node"""
    }
    val iters = (1 to iterations).map { t =>
      s"""pr$t AS MATERIALIZED (
           SELECT i.node,
             (CASE WHEN i.is_seed THEN (SELECT tele FROM consts) ELSE 0 END)
             + ($dampNum * (COALESCE(inc.s, 0)
                 + (CASE WHEN i.is_seed
                    THEN (SELECT COALESCE(SUM(r.rank), 0) FROM pr${t - 1} r
                          JOIN info di ON di.node = r.node AND di.out_deg = 0)
                         // (SELECT sn FROM consts)
                    ELSE 0 END))) // $dampDen AS rank
           FROM info i
           LEFT JOIN (
             SELECT e.dst AS node, SUM(r.rank // si.out_deg) AS s
             FROM pr${t - 1} r
             JOIN info si ON si.node = r.node AND si.out_deg > 0
             JOIN edges e ON e.src = r.node
             GROUP BY e.dst) inc
           ON inc.node = i.node)"""
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ($edgesSql)),
       nodes0 AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       seedflag AS ($seedCte),
       info AS MATERIALIZED (
         SELECT s.node, s.is_seed, COALESCE(d.out_deg, 0) AS out_deg
         FROM seedflag s LEFT JOIN (
           SELECT src AS node, COUNT(*) AS out_deg FROM edges GROUP BY src) d
         ON s.node = d.node),
       consts AS MATERIALIZED (
         SELECT CAST($scale AS BIGINT) AS scale,
           (SELECT COUNT(*) FROM info) AS n,
           (SELECT COUNT(*) FROM info WHERE is_seed) AS sn,
           ((${dampDen - dampNum} * (SELECT COUNT(*) FROM info) * $scale)
             // ($dampDen * (SELECT COUNT(*) FROM info WHERE is_seed))) AS tele),
       pr0 AS (SELECT node, (SELECT scale FROM consts) AS rank FROM info),
       $iters,
       final AS (
         SELECT p.node, CAST(p.rank AS BIGINT) AS rank,
           CAST(i.out_deg AS BIGINT) AS out_deg
         FROM pr$iterations p JOIN info i ON i.node = p.node)
       $finalSelect"""
  }
}
