package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry's own invariants: every declared query is either
  * oracle-gated or carries a contract-twin annotation explaining why it
  * is engine-only — the set stays provably residual (r15 verdict
  * item 2), never a list a reviewer must re-derive. */
class ContractSpec extends AnyFunSuite {

  test("every engine-only entry carries a contract-twin annotation") {
    val engineOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(engineOnly == SparkEntry.contractTwin.keySet,
      s"unannotated engine-only entries: " +
        s"${(engineOnly -- SparkEntry.contractTwin.keySet).toSeq.sorted}; " +
        s"stale annotations: " +
        s"${(SparkEntry.contractTwin.keySet -- engineOnly).toSeq.sorted}")
  }

  test("every oracle entry has a registered query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.toSeq.sorted}")
  }

  test("named gated twins in the annotations exist in the oracle set") {
    val named = SparkEntry.contractTwin.values
      .flatMap("""q\d+[a-z]?_[a-z0-9_]+""".r.findAllIn(_)).toSet
    val missing = named.filterNot(SparkEntry.oracleSql.contains)
    assert(missing.isEmpty, s"annotation names unknown twins: " +
      s"${missing.toSeq.sorted}")
  }
}
