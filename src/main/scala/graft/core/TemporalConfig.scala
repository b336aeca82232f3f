package graft.core

import java.time.{LocalDate, YearMonth}

/** Processing period → month/year calendars
  * (ref: src/pm25ml/setup/date_params.py:8-38).
  */
final case class TemporalConfig(startDate: LocalDate, endDate: LocalDate) {
  require(!endDate.isBefore(startDate), "endDate must be >= startDate")

  /** All `YYYY-MM` month ids touched by the period, inclusive. */
  def months: Seq[String] = {
    val start = YearMonth.from(startDate)
    val end = YearMonth.from(endDate)
    Iterator.iterate(start)(_.plusMonths(1))
      .takeWhile(!_.isAfter(end))
      .map(_.toString)
      .toSeq
  }

  /** All years touched by the period. */
  def years: Seq[Int] = (startDate.getYear to endDate.getYear).toSeq

  /** Days in a `YYYY-MM` month id. */
  def daysInMonth(month: String): Int = YearMonth.parse(month).lengthOfMonth()
}

object TemporalConfig {
  def ofMonths(startMonth: String, endMonth: String): TemporalConfig = {
    val s = YearMonth.parse(startMonth)
    val e = YearMonth.parse(endMonth)
    TemporalConfig(s.atDay(1), e.atEndOfMonth())
  }
}
