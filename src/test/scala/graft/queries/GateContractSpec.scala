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
}
