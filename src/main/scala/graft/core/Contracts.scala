package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Declared-and-validated schema contracts — the reference's primary
  * correctness mechanism (ref: src/pm25ml/collectors/export_pipeline.py:112-179,
  * archived_file_validator.py:145-225, validate_configuration.py:15-100).
  */
object Contracts {

  sealed trait ValueType
  case object FloatValue extends ValueType
  case object IntValue extends ValueType

  /** What a pipeline promises to produce for one partition. */
  final case class PipelineConfig(
      dataset: String,
      idColumns: Set[String],
      valueColumnTypes: Map[String, ValueType],
      expectedRows: Long) {
    def expectedColumns: Set[String] = idColumns ++ valueColumnTypes.keySet
  }

  final case class Violation(msg: String)

  /** Expected rows from path metadata alone: monthly datasets carry
    * nGrids × daysInMonth rows, yearly/static carry nGrids
    * (ref: validate_configuration.py:83-100).
    */
  def expectedRowsFor(hive: HivePath, nGrids: Long): Long =
    hive.get("month") match {
      case Some(m) => nGrids * java.time.YearMonth.parse(m).lengthOfMonth()
      case None => nGrids
    }

  /** Validate a written frame against its contract. Types accept the
    * reference's widenings: FLOAT accepts float32/float64, INT accepts
    * int64 (ref: archived_file_validator.py:204-225).
    */
  def validate(df: DataFrame, cfg: PipelineConfig, actualRows: Long): Seq[Violation] = {
    val out = Seq.newBuilder[Violation]
    val cols = df.schema.fields.map(f => f.name -> f.dataType).toMap

    if (actualRows != cfg.expectedRows)
      out += Violation(s"rows: expected ${cfg.expectedRows}, got $actualRows")

    val missing = cfg.expectedColumns -- cols.keySet
    if (missing.nonEmpty) out += Violation(s"missing columns: ${missing.toSeq.sorted.mkString(",")}")
    val extra = cols.keySet -- cfg.expectedColumns
    if (extra.nonEmpty) out += Violation(s"unexpected columns: ${extra.toSeq.sorted.mkString(",")}")

    if (cols.get("grid_id").exists(_ != LongType))
      out += Violation(s"grid_id must be int64, got ${cols.get("grid_id")}")
    cols.get("date").foreach { t =>
      if (t != StringType && t != DateType)
        out += Violation(s"date must be string/date, got $t")
    }
    cfg.valueColumnTypes.foreach { case (c, vt) =>
      cols.get(c).foreach { t =>
        val ok = vt match {
          case FloatValue => t == FloatType || t == DoubleType
          case IntValue => t == LongType || t == IntegerType
        }
        if (!ok) out += Violation(s"column $c: expected $vt-compatible, got $t")
      }
    }
    out.result()
  }
}
