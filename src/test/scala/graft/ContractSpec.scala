package graft

/** Driver-contract invariants: every query has an oracle (the driver
  * records only a weaker rows-only check otherwise), and the flagship
  * entry returns rows (the driver's smoke check). */
class ContractSpec extends SparkSpec {

  test("every SparkEntry.queries key has an oracleSql entry, and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("entry() returns rows on sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
