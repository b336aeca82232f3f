package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gates — the nightly contract a 100 TB
  * ingest pipeline asserts before promoting a partition: range and
  * consistency predicates, key uniqueness, referential integrity.
  * Kin to [[TableProfiler]] (which DESCRIBES a table; these gates
  * JUDGE it: every row is a named check with an exact violation
  * count and a pass bit the orchestrator can fail a stage on —
  * the same promote/skip posture as
  * [[graft.orchestration.StageRunner]]).
  *
  * Execution shapes, all exact BIGINT:
  *   - predicate gates: ONE scan of the table however many gates are
  *     attached — each gate is a conditional count inside a single
  *     aggregation, unpivoted to tall rows by a bounded `stack` (no
  *     per-gate pass over the data);
  *   - uniqueness: `count(*) − count(distinct keys)` in one
  *     aggregation (two-stage distinct agg — no row explosion);
  *   - referential integrity: a LEFT ANTI join of child keys against
  *     the parent key set, counted — broadcastable when the parent
  *     side is dimension-sized, shuffle-hash otherwise, either way
  *     the optimizer's call.
  *
  * Output schema everywhere: `(check, violations, total, pass)`,
  * driver-safe by construction (one row per gate).
  */
object DataQuality {

  /** A named expectation; `violation` is the predicate that flags a
    * BAD row (gates count violations, not conformances — absence of
    * evidence and evidence of absence hash identically when both
    * engines count the same predicate).
    */
  final case class Gate(name: String, violation: Column)

  private val Schema = Seq("check", "violations", "total", "pass")

  private def withPass(df: DataFrame): DataFrame =
    df.withColumn("pass",
        when(col("violations") === 0L, 1).otherwise(0).cast("int"))
      .select(Schema.map(col): _*)

  /** All predicate gates evaluated in ONE aggregation over `df`,
    * unpivoted to one `(check, violations, total, pass)` row each.
    */
  def predicateGates(df: DataFrame, gates: Seq[Gate]): DataFrame = {
    require(gates.nonEmpty, "predicateGates: no gates given")
    val aggs = count(lit(1)).as("__total") +:
      gates.zipWithIndex.map { case (g, i) =>
        sum(when(g.violation, 1L).otherwise(0L)).as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the 1-row aggregate to tall gate rows — a bounded
    // explode over |gates| structs, the typed equivalent of stack()
    val pairs = gates.zipWithIndex.map { case (g, i) =>
      struct(lit(g.name).as("check"), col(s"__v$i").as("violations"))
    }
    withPass(one
      .select(explode(array(pairs: _*)).as("g"), col("__total").as("total"))
      .select(col("g.check").as("check"),
        col("g.violations").as("violations"), col("total")))
  }

  /** Key-uniqueness gate: violations = rows beyond the first per
    * distinct key tuple (`count(*) − count(distinct keys)`).
    */
  def uniquenessGate(df: DataFrame, keys: Seq[String], name: String): DataFrame =
    withPass(df.agg(
      count(lit(1)).as("total"),
      (count(lit(1)) - count_distinct(struct(keys.map(col): _*)))
        .as("violations"))
      .select(lit(name).as("check"), col("violations"), col("total")))

  /** Referential-integrity gate: child rows whose `fkCol` has no
    * match in the parent's `pkCol` (NULL fks are orphans too — a
    * null foreign key fails the contract loudly rather than
    * vanishing through join semantics).
    */
  def fkGate(child: DataFrame, fkCol: String, parent: DataFrame,
             pkCol: String, name: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("total"))
    val orphans = child.select(col(fkCol))
      .join(parent.select(col(pkCol)), col(fkCol) === col(pkCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
    withPass(orphans.crossJoin(total)
      .select(lit(name).as("check"), col("violations"), col("total")))
  }
}
