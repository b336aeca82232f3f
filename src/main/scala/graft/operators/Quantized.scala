package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The quantized-grid input contract shared by the exact-parity
  * operators ([[Moments]], [[Drift.ksTable]], the streaming moments
  * twin): values must already BE integers — a silent `cast("long")`
  * would truncate 3.7 to 3 and quietly corrupt every downstream sum,
  * so fractional inputs abort in-plan instead (quantize explicitly
  * first: `floor`, a grid multiply, [[Winsorize]] — the caller chooses
  * the grid, the operator never guesses).
  */
object Quantized {

  /** `c` as LongType, aborting loudly on fractional values. Nulls pass
    * through (callers filter or exclude them). Values beyond 2^53 pass
    * unharmed: the double-precision comparison is an identity there and
    * the returned cast is from the ORIGINAL column.
    */
  def checkedLong(c: Column, who: String): Column = {
    val d = c.cast("double")
    when(d.isNotNull && d =!= floor(d),
        raise_error(concat(
          lit(s"$who expects integral values (quantize to a grid first): "),
          d.cast("string"))))
      .otherwise(c.cast("long"))
  }
}
