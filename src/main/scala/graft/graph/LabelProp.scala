package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — the cheap
  * community detector between [[graft.dedup.Dedup]]'s connected
  * components (pure reachability) and modularity methods this engine
  * doesn't need: each node adopts the most common label among its
  * neighbors, so dense regions agree on a label in a few rounds while
  * bridges stay contested. The link-farm / topic-cluster signal over
  * the same co-purchase graph the centrality suite reads.
  *
  * Determinism contract: SYNCHRONOUS rounds (every node updates from
  * the round-(t−1) labels) with the (max count, then MIN label)
  * tie-break make round t a pure function of round t−1 — independent
  * of partitioning and engine. Classic sync LPA can oscillate on
  * bipartite-ish structures rather than converge; the operator
  * therefore has FIXED-ROUND semantics (the result after exactly
  * `rounds` steps), which is what the oracle replays as unrolled
  * MATERIALIZED CTE stages (the [[KCore]] idiom — each stage pinned
  * once or DuckDB's per-reference inlining re-scans exponentially).
  *
  * Scale shape, per round: one edge⨝label join (shuffle on node id,
  * edge-sized) + two node-sized aggregations; labels are cut per
  * round ([[graft.core.Durable]] — localCheckpoint by default,
  * reliable checkpoint(dir) for executor-loss durability) so the
  * plan stays one round deep. The argmax resolves as max-count ⨝
  * min-label aggregations, not a rank window — no per-node sort.
  */
object LabelProp {

  /** Community labels after exactly `rounds` synchronous steps:
    * `(node, lab)`. Edges are undirected SET semantics like
    * [[Triangles]]/[[KCore]] (duplicates and reverses collapse,
    * self-loops and nulls drop); labels start as the node's own id.
    */
  def propagate(edges: DataFrame, srcCol: String, dstCol: String,
                rounds: Int = 4,
                checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"rounds out of [1,32]: $rounds")
    val cut = new graft.core.Durable(checkpointDir)
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
    // symmetrized adjacency from one pass (the GraphPack explode
    // idiom — a union of the frame with its swap would run the
    // distinct twice)
    val adj = cut.cut(canon.select(explode(array(
        struct(col("a").as("node"), col("b").as("nb")),
        struct(col("b").as("node"), col("a").as("nb")))).as("e"))
      .select(col("e.node").as("node"), col("e.nb").as("nb")))

    var labels = cut.cut(
      adj.select(col("node")).distinct().withColumn("lab", col("node")))
    var r = 0
    while (r < rounds) {
      r += 1
      val cand = adj
        .join(labels.select(col("node").as("nb"), col("lab")), Seq("nb"))
        .groupBy("node", "lab").agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc) via max-count ⨝ min-label —
      // two bounded aggs, no rank window (the dedup-resolver idiom)
      val mx = cand.groupBy("node").agg(max(col("c")).as("mc"))
      labels = cut.cut(cand
        .join(mx, Seq("node"))
        .filter(col("c") === col("mc"))
        .groupBy("node").agg(min(col("lab")).as("lab")))
    }
    labels
  }

  /** DuckDB replay of [[propagate]]: the same canonicalization,
    * symmetrization and `rounds` unrolled argmax stages, every stage
    * MATERIALIZED. `edgesSql` must yield (src, dst).
    */
  def oracleSql(edgesSql: String, rounds: Int = 4): String = {
    val stages = (1 to rounds).map { r =>
      val prev = s"l_${r - 1}"
      s"""cand_$r AS MATERIALIZED (
           SELECT adj.node, l.lab, COUNT(*) AS c
           FROM adj JOIN $prev l ON l.node = adj.nb
           GROUP BY adj.node, l.lab),
         mx_$r AS MATERIALIZED (
           SELECT node, MAX(c) AS mc FROM cand_$r GROUP BY node),
         l_$r AS MATERIALIZED (
           SELECT c.node, MIN(c.lab) AS lab
           FROM cand_$r c JOIN mx_$r m ON m.node = c.node AND c.c = m.mc
           GROUP BY c.node)"""
    }.mkString(",\n")
    s"""WITH e AS ($edgesSql),
       canon AS MATERIALIZED (
         SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
         FROM e
         WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
       adj AS MATERIALIZED (
         SELECT a AS node, b AS nb FROM canon
         UNION ALL
         SELECT b AS node, a AS nb FROM canon),
       l_0 AS MATERIALIZED (
         SELECT DISTINCT node, node AS lab FROM adj),
       $stages
       SELECT node, lab FROM l_$rounds"""
  }
}
