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

  /** Fleet preflight over declared processor configs BEFORE anything runs
    * (ref: validate_configuration.py:15-100): every result path carries
    * dataset and country keys; the country is known (it fixes the grid
    * count); the declared row count and id columns match what the path
    * metadata implies (monthly → nGrids × daysInMonth with {grid_id,
    * date}; else nGrids with {grid_id}); and no two processors write the
    * same path.
    */
  def preflight(configs: Seq[(HivePath, PipelineConfig)],
                validCountries: Map[String, Long]): Seq[Violation] = {
    val out = Seq.newBuilder[Violation]
    configs.foreach { case (hive, cfg) =>
      if (hive.get("dataset").isEmpty)
        out += Violation(s"$hive: missing required key 'dataset'")
      hive.get("country") match {
        case None => out += Violation(s"$hive: missing required key 'country'")
        case Some(c) if !validCountries.contains(c) =>
          out += Violation(s"$hive: invalid country '$c'; valid: " +
            validCountries.keys.toSeq.sorted.mkString(", "))
        case Some(c) =>
          val nGrids = validCountries(c)
          val expRows = expectedRowsFor(hive, nGrids)
          if (cfg.expectedRows != expRows)
            out += Violation(s"$hive: expected $expRows rows from path " +
              s"metadata, but config declares ${cfg.expectedRows}")
          val expIds: Set[String] =
            if (hive.get("month").isDefined) Set("date", "grid_id")
            else Set("grid_id")
          if (cfg.idColumns != expIds)
            out += Violation(s"$hive: expected id columns $expIds from " +
              s"path metadata, but config declares ${cfg.idColumns}")
      }
    }
    val dup = configs.groupBy(_._1.path).filter(_._2.size > 1).keys
    dup.toSeq.sorted.foreach { p =>
      out += Violation(s"duplicate result subpath: $p — each processor " +
        "must write a unique path")
    }
    out.result()
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
