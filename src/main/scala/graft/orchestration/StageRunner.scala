package graft.orchestration

import org.apache.spark.sql.DataFrame

import graft.core.{StageRef, StageStorage}

/** §2.10 — idempotent batch re-entrancy: skip a month's work when its
  * output partition already exists and validates
  * (ref: src/pm25ml/combiners/archive/combine_manager.py:59-81,
  * recombiner.py:77-89, spatial_imputation_manager.py:136-168).
  *
  * Plain path+footer checks before running a stage — deliberately not
  * Structured Streaming: there are no unbounded sources, and exists-checks
  * are the faithful (and restartable) semantics.
  */
final class StageRunner(storage: StageStorage) {

  final case class RunReport(month: String, ran: Boolean, reason: String)

  /** Run `compute` for each month whose output is missing or invalid.
    * `expectedRows(month)` < 0 disables the row check; `force` recomputes
    * regardless (the reference's force_recombine).
    */
  def runMonths(out: StageRef, months: Seq[String],
                expectedRows: String => Long,
                compute: String => DataFrame,
                force: Boolean = false): Seq[RunReport] =
    months.map { month =>
      val exp = expectedRows(month)
      val valid = !force && storage.exists(out, month) &&
        (exp < 0 || storage.rowCount(out, month) == exp)
      if (valid) RunReport(month, ran = false, "exists+valid")
      else {
        val df = compute(month)
        storage.writeMonth(df, out, month)
        val got = storage.rowCount(out, month)
        if (exp >= 0 && got != exp)
          throw new IllegalStateException(
            s"stage ${out.name} month $month: wrote $got rows, expected $exp")
        RunReport(month, ran = true, if (force) "forced" else "computed")
      }
    }
}
