package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Information-theoretic association and purity over bounded
  * categorical columns — the feature-triage questions a labeling /
  * curation pipeline asks at corpus scale: "does this cheap signal
  * carry information about the label" (mutual information) and "how
  * mixed is each slice" (Gini impurity).
  *
  * Boundedness contract: both columns must be bounded-categorical
  * (quantize continuous signals to a grid first — the [[Quantized]]
  * posture, enforced socially rather than in-plan here because the
  * cells table IS the output: a caller who feeds a raw double sees
  * the blow-up in their result size, not a silent wrong answer).
  *
  * Exactness: every COUNT is an exact BIGINT. Gini is 1 − Σc²/n² —
  * rational, so the emitted double is ONE pinned IEEE tree and the
  * oracle matches bit-for-bit with no rounding. MI needs ln; the
  * table emits PER-CELL contributions rounded per the transcendental
  * convention (a single global float SUM would be
  * addition-order-dependent across engines — the same reason the PSI
  * gate publishes per-bucket rows).
  */
object InfoTheory {

  /** Mutual-information cell table between two categorical columns:
    * one row per observed (x, y) cell with exact `(nxy, nx, ny, n)`
    * masses and the cell's MI contribution
    * `(nxy/n)·ln(nxy·n/(nx·ny))` rounded to `roundAt` decimals.
    * Null rows are excluded. Σ mi_term over the table is the MI in
    * nats; the table keeps the sum composable AND engine-portable.
    *
    * Shape: one (x,y) count shuffle (cell-bounded output), the two
    * marginals derived from the CELLS (no second corpus pass),
    * broadcast-joined back; the total enters via a 1-row broadcast.
    * The bounded-categorical contract is ENFORCED EAGERLY: the
    * marginals ride broadcasts, so a continuous column (cells ≈
    * corpus) aborts past `maxCells` with one cheap count over the
    * already-materialized cell table, BEFORE any broadcast builds —
    * quantize to a grid first.
    *
    * NOT lazy plan construction: calling this runs Spark jobs (the
    * cell checkpoint + the cap count) even if the returned frame is
    * never acted on — the price of the preventive guard. Callers that
    * build plans speculatively or in a loop pay one joint aggregation
    * per call; cache the result, not the call. [[graft.text
    * .SourceOverlap]] and [[VarianceDecomp]] share this posture.
    */
  def miTable(df: DataFrame, xCol: String, yCol: String,
              roundAt: Int = 6, maxCells: Int = 1 << 20): DataFrame = {
    require(maxCells >= 4, s"maxCells too small: $maxCells")
    val joint = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
      .localCheckpoint() // feeds marginals + total + output (4 reads)
    // EAGER cap check — joint is already materialized (the checkpoint
    // above), so the count is cheap, and it fires BEFORE the marginal
    // broadcasts build. The previous in-plan guard evaluated only in
    // the final projection, after the broadcasts had already shipped.
    val cells = joint.count()
    if (cells > maxCells) throw new IllegalArgumentException(
      s"InfoTheory.miTable: $cells cells exceed maxCells=$maxCells — both" +
        " columns must be bounded-categorical (quantize continuous signals" +
        " to a grid first)")
    val mx = joint.groupBy("x").agg(sum(col("nxy")).as("nx"))
    val my = joint.groupBy("y").agg(sum(col("nxy")).as("ny"))
    val total = broadcast(joint.agg(sum(col("nxy")).as("n")))
    val term = (col("nxy").cast("double") / col("n").cast("double")) *
      log(col("nxy").cast("double") * col("n").cast("double") /
        (col("nx").cast("double") * col("ny").cast("double")))
    joint
      .join(broadcast(mx), Seq("x"))
      .join(broadcast(my), Seq("y"))
      .crossJoin(total)
      .select(col("x"), col("y"), col("nxy"), col("nx"), col("ny"), col("n"),
        round(term, roundAt).as("mi_term"))
  }

  /** Per-group Gini impurity of a label column:
    * `(groups…, n, gini)` with gini = 1 − Σc²/n² — 0 for a pure
    * slice, approaching 1 − 1/k for a uniform k-way mix. Σc² rides
    * the DECIMAL(38,0) lane (c² passes 64 bits at ~3e9 rows per
    * label); the division is one pinned IEEE tree — bit-exact, no
    * rounding. Two bounded aggregations, nothing corpus-sized after
    * the first.
    */
  def giniByGroup(df: DataFrame, groupCols: Seq[String],
                  labelCol: String): DataFrame = {
    val d = "decimal(38,0)"
    val g = groupCols.map(col)
    val counts = df
      .filter(col(labelCol).isNotNull)
      .groupBy((g :+ col(labelCol)): _*)
      .agg(count(lit(1)).as("c"))
    counts.groupBy(g: _*)
      .agg(sum(col("c")).as("n"),
        sum((col("c").cast(d) * col("c").cast(d))).as("ss"))
      .select((g :+ col("n") :+
        (lit(1.0) - col("ss").cast("double") /
          (col("n").cast("double") * col("n").cast("double"))).as("gini")): _*)
  }

  /** DuckDB replay of [[miTable]] over `inputSql` yielding (x, y). */
  def miOracleSql(inputSql: String, roundAt: Int = 6): String =
    s"""WITH src AS ($inputSql),
       joint AS (
         SELECT x, y, COUNT(*) AS nxy FROM src
         WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY x, y),
       mx AS (SELECT x AS xk, SUM(nxy) AS nx FROM joint GROUP BY x),
       my AS (SELECT y AS yk, SUM(nxy) AS ny FROM joint GROUP BY y),
       total AS (SELECT SUM(nxy) AS n FROM joint)
       SELECT joint.x, joint.y, CAST(nxy AS BIGINT) AS nxy,
         CAST(nx AS BIGINT) AS nx, CAST(ny AS BIGINT) AS ny,
         CAST(n AS BIGINT) AS n,
         ROUND((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)) *
           LN(CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE) /
              (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))), $roundAt)
           AS mi_term
       FROM joint JOIN mx ON mx.xk = joint.x JOIN my ON my.yk = joint.y
       CROSS JOIN total"""

  /** DuckDB replay of [[giniByGroup]] over `inputSql` yielding the
    * group columns and `label`.
    */
  def giniOracleSql(inputSql: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""WITH src AS ($inputSql),
       counts AS (
         SELECT $g, label, COUNT(*) AS c FROM src
         WHERE label IS NOT NULL GROUP BY $g, label),
       sums AS (
         SELECT $g, SUM(c) AS n, SUM(CAST(c AS HUGEINT) * c) AS ss
         FROM counts GROUP BY $g)
       SELECT $g, CAST(n AS BIGINT) AS n,
         1.0 - CAST(ss AS DOUBLE) /
           (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS gini
       FROM sums"""
  }
}
