package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting and local clustering coefficients — the
  * graph-shaped corpus signal PageRank's centrality misses: how CLIQUISH
  * a node's neighborhood is. A domain whose link neighbors all link each
  * other is a community (or a link farm — the classic spam signal);
  * lcc ≈ 0 marks a pure hub. Complements [[PageRank]] (mass flow) and
  * the dedup resolver's connected components (reachability).
  *
  * Algorithm: degree-ordered edge orientation (the MapReduce triangle
  * construction of Suri & Vassilvitskii 2011, "Counting triangles and
  * the curse of the last reducer"). Each undirected edge {u,v} is
  * oriented from the endpoint that is SMALLER in the total order
  * (degree, node) toward the larger. Every triangle then has exactly one
  * vertex with out-edges to the other two — so enumerating out-neighbor
  * pairs (wedges) and checking the closing oriented edge counts each
  * triangle exactly once, no multiplicity correction.
  *
  * Why orientation is the 100 TB shape: out-degree under the degree
  * order is O(√m) for ANY graph (a node with out-degree d has d
  * neighbors of degree ≥ its own, so d² ≤ Σ degrees = 2m), which bounds
  * the wedge explosion per node at C(√m, 2) — a star node of raw degree
  * 10⁸ contributes ZERO wedges (all its edges point inward from the
  * leaves) instead of the 10¹⁶ an unoriented self-join would shuffle.
  * Total wedges are Σ C(outdeg, 2) ≤ O(m^1.5), the algorithm's tight
  * bound, reached only by near-clique graphs.
  *
  * Plan shape: two shuffles beyond the degree computation — the wedge
  * self-join keyed on the apex node, and the closure join keyed on the
  * wedge's (lo, hi) pair against the oriented edge set. Everything is
  * (long, long) rows; no arrays, no strings, no driver collect.
  *
  * All-integer contract: degrees and triangle counts are exact BIGINTs;
  * `lcc = 2·tri / (deg·(deg−1))` is ONE IEEE division of two exact
  * integers (both < 2⁵³ for any feasible graph), so even the float
  * column replays bit-for-bit in the SQL oracle.
  */
object Triangles {

  /** Per-node triangle participation over the undirected simple graph
    * spanned by `edges`: `(node, degree, tri_cnt, lcc)`, one row per
    * node that has at least one edge. Input rows are treated as
    * undirected: duplicates (in either direction) collapse, self-loops
    * drop, nulls drop — SET semantics, like [[PageRank.ranks]].
    */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()

    // deg is read three times (both orientation joins + the output) and
    // oriented three times (both wedge legs + the closure side):
    // Catalyst re-executes shared subtrees per reference, which would
    // re-run the upstream edge derivation ~6× — on a 100 TB graph, six
    // corpus scans. Materialize each once (the PageRank idiom): deg is
    // node-sized, oriented edge-sized — both linear in the graph.
    val deg = canon.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
      .localCheckpoint()

    // orient by the (degree, node) total order; carry each endpoint's
    // order key so the wedge join needs no further degree lookup
    val withOrd = canon
      .join(deg.select(col("node").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("degree").as("db")), Seq("b"))
      .select(col("a"), col("b"),
        struct(col("da").as("d"), col("a").as("n")).as("orda"),
        struct(col("db").as("d"), col("b").as("n")).as("ordb"))
    val oriented = withOrd.select(
      when(col("orda") < col("ordb"), col("a")).otherwise(col("b")).as("src"),
      when(col("orda") < col("ordb"), col("b")).otherwise(col("a")).as("dst"),
      when(col("orda") < col("ordb"), col("ordb")).otherwise(col("orda"))
        .as("dst_ord"))
      .localCheckpoint()

    // wedges at apex u: unordered out-neighbor pairs, emitted once via
    // the dst order; the closing edge is oriented lo→hi BY CONSTRUCTION
    // (both wedge legs already point order-upward from u)
    val lo = oriented.select(col("src").as("u"), col("dst").as("lo"),
      col("dst_ord").as("lo_ord"))
    val hi = oriented.select(col("src").as("u"), col("dst").as("hi"),
      col("dst_ord").as("hi_ord"))
    val wedges = lo.join(hi, Seq("u")).filter(col("lo_ord") < col("hi_ord"))
      .select("u", "lo", "hi")
    val tris = wedges.join(
      oriented.select(col("src").as("lo"), col("dst").as("hi")),
      Seq("lo", "hi"))

    val perNodeTri = tris
      .select(explode(array(col("u"), col("lo"), col("hi"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_cnt"))

    deg.join(perNodeTri, Seq("node"), "left")
      .na.fill(0L, Seq("tri_cnt"))
      .withColumn("lcc",
        when(col("degree") >= 2,
          (col("tri_cnt") * 2).cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"))
          .otherwise(lit(0.0)))
  }

  /** DuckDB replay of [[perNode]]: the canonical a<b edge set, degrees,
    * the textbook three-way x<y<z triangle join (orientation is an
    * EXECUTION strategy — the triangle SET is order-free), per-node
    * participation, and the same single-division lcc.
    */
  def perNodeOracleSql(edgesSql: String): String =
    s"""WITH raw AS ($edgesSql),
       ce AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
              FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL
                AND src <> dst),
       deg AS (SELECT node, COUNT(*) AS degree FROM (
                 SELECT a AS node FROM ce UNION ALL SELECT b FROM ce)
               GROUP BY node),
       tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
               FROM ce e1
               JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b
               JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b),
       pt AS (SELECT node, COUNT(*) AS tri_cnt FROM (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri)
              GROUP BY node)
       SELECT deg.node, deg.degree, COALESCE(pt.tri_cnt, 0) AS tri_cnt,
         CASE WHEN deg.degree >= 2
              THEN CAST(2 * COALESCE(pt.tri_cnt, 0) AS DOUBLE)
                   / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
              ELSE 0.0 END AS lcc
       FROM deg LEFT JOIN pt USING (node)"""
}
