package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract: entry() returns rows; every oracle key has a
  * matching query; all query names are unique. */
class EntrySpec extends AnyFunSuite {

  test("entry() produces rows on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).limit(1).count() == 1)
  }

  test("oracleSql keys ⊆ queries keys; names unique") {
    val q = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(q.keySet))
    assert(q.size == 80, s"expected 80 registry entries, got ${q.size}")
    // round-3 gate: EVERY registry entry is oracle-backed (the last two
    // rows-only paths — SR parse, brackets roundtrip — got det oracles)
    assert(SparkEntry.oracleSql.keySet == q.keySet)
  }
}
