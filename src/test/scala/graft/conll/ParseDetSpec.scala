package graft.conll

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.KgOracle

/** Hand-derivation gate for the deterministic SR-parse corpus
  * (KgOracle.parsePos / parseTree, the kg_pipeline_parse oracle): runs
  * the REAL parse cascade (Pipeline.parseCascade — remove-ID, penn link,
  * olia closure, initialize-SHIFT, REDUCE-english-{1..4} at the
  * reference budgets {5}{5}{5}{3}, REDUCE-to-HEAD) over one full-cycle
  * doc holding one sentence per pattern, and asserts the converged graph
  * equals, TRIPLE FOR TRIPLE, the closed form the DuckDB oracle encodes.
  *
  * P6 (8-noun chain) exercises the BUDGET CAP: rule (1) reduces exactly
  * one noun per iteration (only the pair whose head's successor is
  * non-noun matches its guard), needs 7 iterations, gets {5} — tokens
  * 7..3 reduce onto 8, tokens 1/2 strand with residual SHIFT edges, and
  * rule (8) stays blocked by the npClasses guard (token 8's SHIFT
  * predecessor is a Noun).
  *
  * The parseTree table was derived BY HAND from ParseScripts /
  * examples/sparql/parse/REDUCE-english-{1..4}.sparql, statement by
  * statement. Worked trace for P5 (NN HYPH NN RB VBZ NN), the pattern
  * needing a second fixpoint iteration:
  *   init-SHIFT: 1→2→3→4→5→6
  *   R1 (0a) hyphen=2: del(1 S 2)(2 S 3); 1 RED 3 mwe; 2 RED 1 hyph
  *   R3 it1 (9) obj: del(5 S 6); 6 RED 5 obj
  *         (11) preverbal adv=4, last=3: del(3 S 4)(4 S 5), ins(3 S 5);
  *              4 RED 5 adv
  *   R3 it2 (8) sbj=3 (now SHIFTed to vfin 5): del(3 S 5); 3 RED 5 sbj
  *   REDUCE-to-HEAD: HEAD(root 5) stays :s_0; all SHIFT consumed.
  */
class ParseDetSpec extends AnyFunSuite {

  private val words = (1 to KgOracle.parseCycle).map(i => f"w$i%02d").toArray
  private lazy val sents = SpanParser.parseDoc(
    InputDoc("d1", KgOracle.parseSpansFor(words)), KgOracle.detParseCols)
  private lazy val outGraphs: Seq[SentGraph] = sents.map { s =>
    val g = SentGraph(s)
    for ((script, n) <- Pipeline.parseCascade) script.run(g, n)
    g
  }

  test("one full cycle yields one sentence per pattern") {
    assert(sents.length == KgOracle.parsePos.length)
    assert(sents.map(_.triples.count(_.p == "conll:WORD")) ==
      KgOracle.parsePos.map(_.length))
  }

  test("truncated trailing sentences are dropped (completeness guard)") {
    // 40 words: P0 (6) complete, P1 needs 6 more but only 5 remain → drop
    val s2 = SpanParser.parseDoc(
      InputDoc("d2", KgOracle.parseSpansFor(words.take(11))), KgOracle.detParseCols)
    assert(s2.length == 1)
    assert(s2.head.triples.count(_.p == "conll:WORD") == 6)
  }

  /** The oracle's closed form, built from the same constants parseSql
    * embeds as VALUES tables (shared with DetSeedSweepSpec). */
  private def expectedTriples(n: Int, j: Int, ws: Seq[String]): Set[Triple] =
    DetClosedForms.parseTriples(n, j, ws)

  for (j <- KgOracle.parsePos.indices) {
    test(s"pattern P$j: converged graph == hand-derived closed form, exactly") {
      val ws = words.slice(KgOracle.parseOffsets(j), KgOracle.parseOffsets(j + 1)).toSeq
      val got = outGraphs(j).all.toSet
      val exp = expectedTriples(j + 1, j, ws)
      val extra = got -- exp
      val missing = exp -- got
      assert(extra.isEmpty && missing.isEmpty,
        s"\nextra=${extra.toSeq.sortBy(t => (t.s, t.p, t.o)).mkString("\n  ", "\n  ", "")}" +
          s"\nmissing=${missing.toSeq.sortBy(t => (t.s, t.p, t.o)).mkString("\n  ", "\n  ", "")}")
    }
  }

  test("per-tag OLiA closure: spot checks against the mini ontology") {
    val types = KgOracle.parseTagTypes
    assert(types("NN").toSet == Set("olia:CommonNoun", "olia:Noun", "olia:Nominal"))
    assert(types("VBZ").toSet ==
      Set("olia:FiniteVerb", "olia:Verb", "olia:MorphosyntacticCategory"))
    assert(types("JJ").toSet == Set("olia:Adjective", "olia:AdjectivalHead"))
    assert(types("VB").toSet == Set("olia:Verb", "olia:MorphosyntacticCategory"))
    assert(types("TO").toSet == Set("olia:InfinitiveParticle"))
    assert(types("PRP").toSet ==
      Set("olia:PersonalPronoun", "olia:Pronoun", "olia:Nominal"))
  }
}
