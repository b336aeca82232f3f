package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distances — "how many links from the vetted
  * set is this node?": the curation companion to [[PageRank]]'s
  * seeded trust mass. Where personalized PageRank answers *how much*
  * trust flows, hop distance answers *how directly* — the two together
  * are the classic seed-and-propagate pair (distance caps what mass
  * can't express: a node 14 hops out with freak connectivity still
  * scores mass, but no analyst calls it "near the seeds").
  *
  * Level-synchronous frontier expansion, exactly `min(eccentricity,
  * maxHops)` rounds: per round one edge join + one distinct + one
  * anti-join against the settled set, each shuffling frontier-sized
  * (long, int) rows — never the graph. The settled set is
  * cut per round (the repo's iterative idiom: an untruncated loop
  * replays every prior round per action — [[graft.core.Durable]];
  * localCheckpoint by default, reliable `checkpoint(dir)` via
  * `checkpointDir` for executor-loss durability), and the
  * loop stops EARLY on an empty frontier via a 1-row driver read —
  * same posture as PageRank's convergence stop. Hop distances are
  * integers; the result is the unique BFS fixed point, independent of
  * partitioning — so the recursive-CTE oracle ([[hopsOracleSql]])
  * replays it exactly with `MIN(d)` per node.
  *
  * Edges are DIRECTED as given (symmetrize upstream for undirected
  * semantics); duplicate edges and nulls drop. Seeds outside the graph
  * still appear at hop 0 (they ARE at distance 0 from themselves —
  * same convention as the oracle's seed UNION).
  */
object Bfs {

  /** `(node, hops)` for every node reachable from `seeds` within
    * `maxHops` directed hops; seeds at 0. `seeds` is a single-column
    * frame of node ids (nulls dropped, duplicates collapse).
    */
  def hopDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, maxHops: Int,
                   checkpointDir: Option[String] = None): DataFrame = {
    require(maxHops >= 0 && maxHops <= 64,
      s"maxHops out of [0,64]: $maxHops — a deeper walk than 64 levels " +
        "on a real graph means the seed set or the edge direction is wrong")
    val cut = new graft.core.Durable(checkpointDir)
    val e = cut.cut(edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct())
    val seedCol = seeds.columns.head
    var settled = cut.cut(seeds.filter(col(seedCol).isNotNull)
      .select(col(seedCol).as("node")).distinct()
      .withColumn("hops", lit(0)))
    var frontier = settled.select("node")
    var hop = 0
    var frontierEmpty = frontier.isEmpty
    while (hop < maxHops && !frontierEmpty) {
      hop += 1
      val next = cut.cut(frontier.join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
        .join(settled.select("node"), Seq("node"), "left_anti")
        .withColumn("hops", lit(hop)))
      frontierEmpty = next.isEmpty
      if (!frontierEmpty) {
        settled = cut.cut(settled.unionByName(next))
        frontier = next.select("node")
      }
    }
    settled
  }

  /** DuckDB replay of [[hopDistances]]: recursive closure over
    * DISTINCT (node, depth) states (polynomial — UNION dedups against
    * the whole working table), minimum depth per node.
    */
  def hopsOracleSql(edgesSql: String, seedsSql: String,
                    maxHops: Int): String =
    s"""WITH RECURSIVE e AS (
         SELECT DISTINCT src, dst FROM ($edgesSql)
         WHERE src IS NOT NULL AND dst IS NOT NULL),
       walk(node, d) AS (
         SELECT DISTINCT node, 0 FROM ($seedsSql) WHERE node IS NOT NULL
         UNION
         SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.node
         WHERE w.d < $maxHops)
       SELECT node, CAST(MIN(d) AS INT) AS hops FROM walk GROUP BY node"""
}
