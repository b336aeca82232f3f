package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry skill ranking from pairwise preferences — the
  * aggregation step behind preference datasets (RLHF/DPO pair mining,
  * side-by-side eval judging, "which generation wins" dashboards):
  * turn raw (winner, loser) rows into one latent strength per player
  * such that P(i beats j) = w_i / (w_i + w_j).
  *
  * FIXED-POINT INTEGER minorization–maximization (Hunter 2004 MM,
  * in the repo's integer-PageRank discipline): strengths are BIGINT
  * masses in units of `scale`, one MM step is
  *
  *   D_i  = Σ_j (n_ij · K) div (w_i + w_j)     (K = scale², per-term
  *                                              truncating div)
  *   w_i' = max(1, (W_i · K) div D_i)
  *
  * with n_ij the total games between i and j and W_i the win count of
  * i. Every quantity is an exact integer and every division truncates,
  * so `iterations` steps are a deterministic function of the game SET —
  * identical under any partitioning and replayable step-for-step by
  * the chained-CTE SQL oracle ([[oracleSql]]), the parity contract a
  * float MM loop cannot make. The MM map is degree-1 homogeneous
  * (doubling all w doubles all w'), so no normalization step is needed
  * for the ratios; the `max(…, 1)` floor keeps an all-loser at one
  * mass unit instead of a divide-poisoning zero.
  *
  * 100 TB shape: games aggregate once to the (i, j, n_ij) comparison
  * table (pair-cardinality, not game-cardinality — a billion judgments
  * over 10k models is 10⁸ rows max); each iteration is one join of the
  * player-sized strength frame against that table + one
  * map-side-combined sum, `localCheckpoint`ed like every iterative
  * operator here. Overflow is guarded up front against MEASURED
  * counts: max(n_ij)·K and max(W_i)·K must fit in 63 bits (shrink
  * `scale` for astronomically contested pairs), and each iteration's
  * max strength is checked against K so per-term divs cannot truncate
  * to zero mass.
  */
object BradleyTerry {

  /** Strengths after `iterations` MM steps:
    * `(player, skill, n_wins, n_games)`, one row per player that
    * appears in at least one game. Nulls and self-games drop.
    */
  def ranks(games: DataFrame, winnerCol: String, loserCol: String,
            iterations: Int, scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations out of [1,64]: $iterations")
    require(scale >= 1000L, s"scale too small for the div lattice: $scale")
    val k = java.math.BigInteger.valueOf(scale).pow(2)
    require(k.bitLength <= 50,
      s"scale² must fit 50 bits, got ${k.bitLength} (scale $scale)")
    val K = scale * scale

    val g = games
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .select(col(winnerCol).as("win"), col(loserCol).as("lose"))
      .localCheckpoint()
    val pairs = g
      .groupBy(least(col("win"), col("lose")).as("a"),
        greatest(col("win"), col("lose")).as("b"))
      .agg(count(lit(1)).as("n"))
    val sym = pairs.select(explode(array(
        struct(col("a").as("i"), col("b").as("j"), col("n")),
        struct(col("b").as("i"), col("a").as("j"), col("n")))).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.n").as("n"))
      .localCheckpoint()
    val stats = sym.groupBy(col("i").as("player"))
      .agg(sum(col("n")).as("n_games"))
      .join(g.groupBy(col("win").as("player"))
        .agg(count(lit(1)).as("n_wins")), Seq("player"), "left")
      .na.fill(0L, Seq("n_wins"))
      .localCheckpoint()

    // measured overflow guards: every product taken below must fit 63
    // bits with the chosen scale. An empty game list has no maxima (the
    // agg row is all-null) — return the empty strengths frame instead
    // of dereferencing a null max
    val m = stats.agg(max(col("n_wins")), max(col("n_games"))).head()
    if (m.isNullAt(0) || m.isNullAt(1))
      return stats.select(col("player"), lit(scale).as("skill"),
        col("n_wins"), col("n_games"))
    val maxW = m.getLong(0); val maxG = m.getLong(1)
    require(maxW <= Long.MaxValue / K / 4 && maxG <= Long.MaxValue / K / 4,
      s"BradleyTerry: win/game counts ($maxW/$maxG) × scale²=$K would " +
        "overflow 64-bit masses — shrink scale or pre-aggregate players")

    var w = stats.select(col("player"), lit(scale).as("w")).localCheckpoint()
    for (_ <- 1 to iterations) {
      val d = sym
        .join(w.select(col("player").as("i"), col("w").as("wi")), Seq("i"))
        .join(w.select(col("player").as("j"), col("w").as("wj")), Seq("j"))
        .groupBy(col("i").as("player"))
        .agg(sum(expr(s"(n * ${K}L) div (wi + wj)")).as("d"))
      w = d.join(stats.select("player", "n_wins"), Seq("player"))
        .select(col("player"),
          greatest(expr(s"(n_wins * ${K}L) div d"), lit(1L)).as("w"))
        .localCheckpoint()
      // strengths must stay far below K or the per-term div could hit
      // zero and silently erase a pair's evidence — loud, like PageRank
      val wMax = w.agg(max(col("w"))).head().getLong(0)
      require(wMax <= K / 16,
        s"BradleyTerry: strength $wMax approaches scale²=$K — the div " +
          "lattice is exhausted; raise scale")
    }
    stats.join(w, Seq("player"))
      .select(col("player"), col("w").as("skill"), col("n_wins"),
        col("n_games"))
  }

  /** DuckDB replay of [[ranks]] for `gamesSql` yielding
    * (winner, loser): same comparison table, same truncating-div MM
    * steps, MATERIALIZED per iteration against CTE re-inlining.
    */
  def oracleSql(gamesSql: String, iterations: Int,
                scale: Long = 1000000L): String = {
    val K = scale * scale
    val iters = (1 to iterations).map { t =>
      s"""d_$t AS MATERIALIZED (
           SELECT s.i AS player,
             CAST(SUM((s.n * $K) // (wi.w + wj.w)) AS BIGINT) AS d
           FROM sym s
           JOIN w_${t - 1} wi ON wi.player = s.i
           JOIN w_${t - 1} wj ON wj.player = s.j
           GROUP BY s.i),
         w_$t AS MATERIALIZED (
           SELECT d.player,
             CAST(GREATEST((st.n_wins * $K) // d.d, 1) AS BIGINT) AS w
           FROM d_$t d JOIN stats st ON st.player = d.player)"""
    }.mkString(",\n")
    s"""WITH games AS MATERIALIZED (
         SELECT winner, loser FROM ($gamesSql)
         WHERE winner IS NOT NULL AND loser IS NOT NULL
           AND winner <> loser),
       pairs AS (SELECT LEAST(winner, loser) AS a,
                   GREATEST(winner, loser) AS b, COUNT(*) AS n
                 FROM games GROUP BY 1, 2),
       sym AS MATERIALIZED (
         SELECT a AS i, b AS j, n FROM pairs
         UNION ALL SELECT b, a, n FROM pairs),
       stats AS MATERIALIZED (
         SELECT gp.player, CAST(gp.n_games AS BIGINT) AS n_games,
           CAST(COALESCE(wn.n_wins, 0) AS BIGINT) AS n_wins
         FROM (SELECT i AS player, SUM(n) AS n_games FROM sym GROUP BY i) gp
         LEFT JOIN (SELECT winner AS player, COUNT(*) AS n_wins
                    FROM games GROUP BY winner) wn
         ON wn.player = gp.player),
       w_0 AS (SELECT player, CAST($scale AS BIGINT) AS w FROM stats),
       $iters
       SELECT st.player, wf.w AS skill, st.n_wins, st.n_games
       FROM stats st JOIN w_$iterations wf ON wf.player = st.player"""
  }
}
