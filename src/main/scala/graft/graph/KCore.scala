package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-core extraction — the densest-region filter over a link graph
  * (Seidman 1983): iteratively peel every node of degree < k until the
  * remaining subgraph has minimum degree ≥ k. The classic
  * community/spam-cluster signal between [[Triangles]] (local
  * cliquishness) and the dedup resolver's components (reachability):
  * a k-core survives only through MUTUAL support, so a link farm's
  * dense core stands out while its hangers-on peel away.
  *
  * Synchronous peeling: each round removes ALL current sub-k nodes at
  * once. The fixed point (the k-core) is unique — independent of
  * removal order, partitioning, or engine — and the ROUND SCHEDULE of
  * synchronous peeling is deterministic too, which is what lets the
  * oracle replay it as `maxRounds` unrolled CTE stages (the repo's
  * BPE-trainer idiom): stages after convergence are no-ops, so
  * operator and oracle agree exactly whenever the operator converges,
  * and the operator ABORTS LOUDLY if `maxRounds` rounds don't reach
  * the fixed point (rather than returning a half-peeled graph the
  * contract doesn't define).
  *
  * Scale shape, per round: one degree aggregation + two semi-joins of
  * the edge table against the surviving-node set, every shuffle
  * edge-sized or node-sized; survivors are cut per round
  * ([[graft.core.Durable]] — localCheckpoint by default, reliable
  * `checkpoint(dir)` via `checkpointDir` for executor-loss
  * durability) so the plan stays one round deep. Convergence is checked with a 1-row
  * driver read per round (the PageRank/BFS posture). Synchronous
  * rounds on real graphs converge in tens of rounds; a path-graph
  * adversary needs O(n) — that is a property of the PROBLEM (peeling
  * depth), not the engine, and the loud abort prices it honestly.
  */
object KCore {

  /** Nodes of the k-core of the undirected simple graph spanned by
    * `edges`, with their within-core degree: `(node, core_deg)`.
    * Input rows are undirected SET semantics like [[Triangles]]:
    * duplicates/reverses collapse, self-loops and nulls drop.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 24,
            checkpointDir: Option[String] = None): DataFrame =
    converge(edges, srcCol, dstCol, k, maxRounds, checkpointDir)._2

  /** The k-core's EDGE set — canonical `(a, b)` with a < b — for
    * composing downstream graph analytics over the dense region
    * (e.g. PageRank within the core). Same peel, same loud abort.
    */
  def kCoreEdges(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
                 maxRounds: Int = 24,
                 checkpointDir: Option[String] = None): DataFrame =
    converge(edges, srcCol, dstCol, k, maxRounds, checkpointDir)._1

  private def converge(edges: DataFrame, srcCol: String, dstCol: String,
                       k: Int, maxRounds: Int,
                       checkpointDir: Option[String]): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxRounds >= 1 && maxRounds <= 64,
      s"maxRounds out of [1,64]: $maxRounds")
    val cut = new graft.core.Durable(checkpointDir)
    val canon = cut.cut(edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct())

    def degrees(ed: DataFrame): DataFrame =
      ed.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("core_deg"))

    var live = canon
    var deg = cut.cut(degrees(live))
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      val keep = deg.filter(col("core_deg") >= k).select("node")
      val next = cut.cut(live
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
        .select("a", "b"))
      val nextDeg = cut.cut(degrees(next))
      // fixpoint iff no node is below k (checked on the NEW degrees —
      // one bounded agg + 1-row driver read)
      converged = nextDeg.filter(col("core_deg") < k).isEmpty
      live = next
      deg = nextDeg
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore: not converged after $maxRounds synchronous rounds — " +
          "raise maxRounds (peeling depth is a property of the graph; " +
          "a path-like graph needs O(n) rounds)")
    (live, deg)
  }

  /** DuckDB replay of [[kCore]]: `maxRounds` unrolled peel stages over
    * the canonical a<b edge set (stages after convergence are no-ops).
    * `edgesSql` must yield (src, dst). Every stage is MATERIALIZED:
    * each references its predecessor three times, and DuckDB inlines
    * plain CTEs per reference — 3^rounds scan expansion (observed as a
    * file-handle explosion) unless each round is pinned once.
    */
  def oracleSql(edgesSql: String, k: Int, maxRounds: Int = 24): String =
    peelSql(edgesSql, k, maxRounds,
      s"""SELECT node, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
           SELECT a AS node FROM e_$maxRounds
           UNION ALL SELECT b FROM e_$maxRounds)
         GROUP BY node""")

  /** DuckDB replay of [[kCoreEdges]], SYMMETRIZED to (src, dst) both
    * directions — the shape [[PageRank.oracleSql]] consumes, so the
    * two compose into a core-restricted centrality oracle.
    */
  def edgesOracleSql(edgesSql: String, k: Int, maxRounds: Int = 24): String =
    peelSql(edgesSql, k, maxRounds,
      s"""SELECT a AS src, b AS dst FROM e_$maxRounds
         UNION ALL
         SELECT b AS src, a AS dst FROM e_$maxRounds""")

  private def peelSql(edgesSql: String, k: Int, maxRounds: Int,
                      finalSelect: String): String = {
    val stages = (0 until maxRounds).map { j =>
      s"""d_$j AS MATERIALIZED (SELECT node, COUNT(*) AS c FROM (
             SELECT a AS node FROM e_$j UNION ALL SELECT b FROM e_$j)
           GROUP BY node),
         s_$j AS MATERIALIZED (SELECT node FROM d_$j WHERE c >= $k),
         e_${j + 1} AS MATERIALIZED (SELECT a, b FROM e_$j
           WHERE a IN (SELECT node FROM s_$j)
             AND b IN (SELECT node FROM s_$j))"""
    }.mkString(",\n")
    s"""WITH e_0 AS MATERIALIZED (
         SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         FROM ($edgesSql)
         WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
       $stages
       $finalSelect"""
  }
}
