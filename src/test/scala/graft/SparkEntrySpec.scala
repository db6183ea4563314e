package graft

/** Registry invariants of the driver contract itself — drift here is
  * silent at the gate (a query without an oracle entry degrades to a
  * weaker rows-only check; an oracle without a query is dead SQL).
  */
class SparkEntrySpec extends SparkSpecBase {

  test("queries and oracleSql cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) === Set.empty, s"queries without oracle: ${q -- o}")
    assert((o -- q) === Set.empty, s"oracles without query: ${o -- q}")
  }

  test("flagship entry returns rows at sf0.001 (the driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no oracle SQL is empty or references another engine's tables") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, k)
      // the oracle runs over views named exactly like the parquet tables
      assert(!sql.contains("read_parquet"), s"$k must use the table views")
    }
  }
}
