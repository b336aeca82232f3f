package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-row global topology profile of an undirected simple graph:
  * size, degree extremes/moments, and DEGREE ASSORTATIVITY (Newman
  * 2002) — the Pearson correlation of endpoint degrees over edges.
  * Assortativity is the single number that separates social-style
  * graphs (r > 0, hubs link hubs) from web/biological-style graphs
  * (r < 0, hubs link leaves) — for corpus curation it flags whether a
  * link-farm's hubs interconnect (coordinated) or fan out (organic).
  *
  * Everything reduces to EXACT integer sums: per-edge endpoint-degree
  * products and sums over BOTH orientations (the undirected convention
  * — each edge contributes (d_a,d_b) and (d_b,d_a), making Σx = Σy by
  * construction), then one pinned IEEE tree
  * `r = (2m·Σxy − Σx·Σy) / (√(2m·Σx² − (Σx)²) · √(2m·Σy² − (Σy)²))`
  * with two sqrts and one division — replayed expression-for-
  * expression in the oracle, rounded per the transcendental
  * convention. Degenerate graphs (all degrees equal — zero variance)
  * report NULL assortativity rather than 0/0.
  *
  * Scale shape: the degree aggregation, one edge↔degree join pair, and
  * a single-row total aggregate — all linear, nothing collected until
  * the 1-row result. Sums are BIGINT-exact for any graph with
  * Σ d² · max_d < 2⁶³ (a 10⁹-edge graph with max degree 10⁶ is fine);
  * ANSI mode makes overflow loud.
  */
object DegreeProfile {

  /** `(n_nodes, n_edges, min_deg, max_deg, sum_deg_sq, assortativity)`
    * over the undirected simple graph spanned by `edges` (duplicates /
    * reverses collapse, self-loops and nulls drop).
    */
  def profile(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .distinct()
      .localCheckpoint()
    val deg = canon.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("d"))
      .localCheckpoint()

    val nodeStats = deg.agg(
      count(lit(1)).as("n_nodes"), min(col("d")).as("min_deg"),
      max(col("d")).as("max_deg"), sum(col("d") * col("d")).as("sum_deg_sq"))

    // both orientations of every edge: x = src-end degree, y = dst-end
    val withDeg = canon
      .join(deg.select(col("node").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("d").as("db")), Seq("b"))
    val oriented = withDeg.select(explode(array(
        struct(col("da").as("x"), col("db").as("y")),
        struct(col("db").as("x"), col("da").as("y")))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
    val edgeSums = oriented.agg(
      count(lit(1)).as("m2"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))

    val num = col("m2").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = col("m2").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = col("m2").cast("double") * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    nodeStats.crossJoin(edgeSums)
      .select(col("n_nodes"), floor(col("m2") / 2).cast("long").as("n_edges"),
        col("min_deg"), col("max_deg"), col("sum_deg_sq"),
        when(vx > 0 && vy > 0, num / (sqrt(vx) * sqrt(vy)))
          .as("assortativity"))
  }

  /** DuckDB replay of [[profile]] for `edgesSql` yielding (src, dst):
    * same canonical edge set, same integer sums, the identical pinned
    * float tree. Wrap `assortativity` in ROUND at the call site.
    */
  def oracleSql(edgesSql: String): String =
    s"""WITH ce AS (SELECT DISTINCT LEAST(src, dst) AS a,
           GREATEST(src, dst) AS b
         FROM ($edgesSql)
         WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
       deg AS (SELECT node, COUNT(*) AS d FROM (
                 SELECT a AS node FROM ce UNION ALL SELECT b FROM ce)
               GROUP BY node),
       ns AS (SELECT COUNT(*) AS n_nodes, MIN(d) AS min_deg,
                MAX(d) AS max_deg, CAST(SUM(d * d) AS BIGINT) AS sum_deg_sq
              FROM deg),
       ed AS (SELECT da.d AS x, db.d AS y FROM ce
                JOIN deg da ON da.node = ce.a JOIN deg db ON db.node = ce.b
              UNION ALL
              SELECT db.d, da.d FROM ce
                JOIN deg da ON da.node = ce.a JOIN deg db ON db.node = ce.b),
       es AS (SELECT COUNT(*) AS m2, CAST(SUM(x) AS BIGINT) AS sx,
                CAST(SUM(y) AS BIGINT) AS sy,
                CAST(SUM(x * y) AS BIGINT) AS sxy,
                CAST(SUM(x * x) AS BIGINT) AS sxx,
                CAST(SUM(y * y) AS BIGINT) AS syy
              FROM ed)
       SELECT n_nodes, m2 // 2 AS n_edges, min_deg, max_deg, sum_deg_sq,
         CASE WHEN CAST(m2 AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
               AND CAST(m2 AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
              THEN (CAST(m2 AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (SQRT(CAST(m2 AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * SQRT(CAST(m2 AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
              END AS assortativity
       FROM ns CROSS JOIN es"""
}
