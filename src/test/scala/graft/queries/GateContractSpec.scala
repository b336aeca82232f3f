package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants the gate depends on: unique query
  * names across packs (a toMap collision silently shrinks the gate) and
  * full oracle coverage (the repo claims zero rows-only entries — a
  * query landing without its oracle would quietly weaken the gate).
  */
class GateContractSpec extends AnyFunSuite {

  test("every registered query has an oracle, and nothing is orphaned") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert((q -- o) === Set.empty[String],
      "queries missing an oracle (would downgrade to rows-only)")
    assert((o -- q) === Set.empty[String],
      "oracles without a query (dead SQL the driver never compares)")
  }

  test("query names are unique across packs (no toMap overwrite)") {
    // queries itself throws on duplicates; touching it here pins that
    assert(graft.SparkEntry.queries.nonEmpty)
  }

  test("no gate query emits a negative zero (the round-6 landmine class)") {
    // The driver hashes raw float bits, so -0.0 vs +0.0 is a red row
    // even though SQL/Python equality calls them equal. Spark's
    // BigDecimal round never emits -0.0 but raw arithmetic can
    // (e.g. a product of a negative and a zero); DuckDB's double ROUND
    // does (the two-round ann_pca_covariance red row). This scan runs
    // EVERY query at sf0.001 and fails if any float column carries a
    // negative zero — so a data refresh can't resurrect the landmine on
    // a query nobody touched. (The oracle side is covered by
    // check.py's sign-of-zero-exact compare.)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val spark = graft.TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    // detect -0.0 via its string form (ANSI mode forbids the 1/x trick):
    // Spark renders the sign, so -0.0 → "-0.0" while +0.0 → "0.0"
    def negZero(c: org.apache.spark.sql.Column) =
      c === lit(0.0) && c.cast("string").startsWith("-")
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val df = fn(spark, sf)
        val checks = df.schema.fields.flatMap { f =>
          f.dataType match {
            case DoubleType | FloatType =>
              Some(sum(when(negZero(col(f.name).cast("double")), 1)
                .otherwise(0)).as(f.name))
            case ArrayType(DoubleType | FloatType, _) =>
              Some(sum(when(exists(col(f.name),
                x => negZero(x.cast("double"))), 1).otherwise(0)).as(f.name))
            case _ => None
          }
        }
        if (checks.isEmpty) Seq.empty
        else {
          val row = df.agg(checks.head, checks.tail: _*).head()
          checks.indices.collect {
            case i if !row.isNullAt(i) && row.getLong(i) > 0 =>
              s"$name.${row.schema.fieldNames(i)}: ${row.getLong(i)} rows"
          }
        }
    }
    assert(offenders.isEmpty,
      s"negative zeros in gate output (normalize with + 0.0 / abs-guard):\n" +
        offenders.mkString("\n"))
  }
}
