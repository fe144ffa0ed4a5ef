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
    assert(q.size == 49, s"expected 49 registry entries, got ${q.size}")
    // round-2 gate: the KG/mm core must be oracle-backed (VERDICT r1 #1)
    val oracleBacked = SparkEntry.oracleSql.keySet
    assert(Seq("kg_pipeline_analyze", "kg_eval_possynt", "kg_conll_export",
      "kg_conll_text", "kg_select_conllu", "kg_select_sentences",
      "kg_sorted_ntriples", "mm_media_meta", "mm_frame_dups")
      .forall(oracleBacked.contains))
  }
}
