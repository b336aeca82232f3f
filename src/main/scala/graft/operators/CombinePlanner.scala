package graft.operators

import graft.core.TemporalConfig

/** Per-month input resolution for the wide combine
  * (ref: src/pm25ml/combiners/archive/combine_planner.py:75-221).
  *
  * Each dataset archives under one of three partition keys:
  *   monthly  → `month=YYYY-MM` (one table per month)
  *   yearly   → `year=YYYY` (one per year, joined onto every month of it)
  *   static   → `type=static` (one table, joined everywhere)
  *
  * Missing-data fallback `COPY_LATEST_AVAILABLE_BEFORE`: when a yearly
  * dataset has no partition for the needed year, substitute the latest
  * earlier available one (ref: export_pipeline.py:68-94,
  * combine_planner.py:118-163).
  */
object CombinePlanner {

  sealed trait DatasetKey
  case object Monthly extends DatasetKey
  case object Yearly extends DatasetKey
  case object Static extends DatasetKey

  sealed trait MissingPolicy
  case object FailOnMissing extends MissingPolicy
  case object CopyLatestAvailableBefore extends MissingPolicy

  final case class DatasetSpec(name: String, key: DatasetKey,
                               missingPolicy: MissingPolicy = FailOnMissing)

  /** One resolved input: which partition value to read for this dataset. */
  final case class ResolvedInput(dataset: String, partition: String)

  final case class MonthPlan(month: String, inputs: Seq[ResolvedInput],
                             expectedRows: Long)

  /** Resolve the partition each dataset contributes to `month`.
    * `available` maps dataset name → the partition values that exist
    * (months for Monthly, years for Yearly, "static" for Static).
    */
  def planMonth(month: String, specs: Seq[DatasetSpec],
                available: Map[String, Seq[String]], nGrids: Long): MonthPlan = {
    val year = month.take(4)
    val inputs = specs.map { spec =>
      val have = available.getOrElse(spec.name, Seq.empty).sorted
      val wanted = spec.key match {
        case Monthly => month
        case Yearly => year
        case Static => "static"
      }
      val resolved =
        if (have.contains(wanted)) Some(wanted)
        else spec.missingPolicy match {
          case CopyLatestAvailableBefore => have.filter(_ < wanted).lastOption
          case FailOnMissing => None
        }
      resolved match {
        case Some(p) => ResolvedInput(spec.name, p)
        case None => throw new IllegalStateException(
          s"dataset ${spec.name}: no partition for $wanted and no fallback")
      }
    }
    val days = TemporalConfig.ofMonths(month, month).daysInMonth(month)
    MonthPlan(month, inputs, nGrids * days)
  }

  def plan(months: Seq[String], specs: Seq[DatasetSpec],
           available: Map[String, Seq[String]], nGrids: Long): Seq[MonthPlan] =
    months.map(planMonth(_, specs, available, nGrids))
}
