package graft.conll

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.KgOracle

/** Hand-derivation gate for the deterministic bracketing corpus
  * (KgOracle.bracketCells / bracketParse, the kg_brackets_roundtrip
  * oracle): runs the REAL path (BracketsParser column detection + cell
  * splitting + stack fold → powla tree → tree2bracket) and asserts the
  * converged graph equals the closed form TRIPLE FOR TRIPLE.
  *
  * Worked trace, shape 0 — cells "(S(NP*" "*)" "(VP*" "*))" re-split to
  * ["(S","(NP",u1,u2,")","(VP",u3,u4,")",")"] and folded:
  *   :b1{S} ← push; :b2{NP} parent :b1 ← push; u1,u2 parent :b2 (u1 next
  *   u2); ")" pops :b2 (lastSibling); :b3{VP}: :b2 powla:next :b3,
  *   parent :b1; u3,u4 parent :b3; "))" pops :b3, :b1.
  * tree2bracket: first/last per node (:b1 F :b2 L :b3; :b2 F u1 L u2;
  * :b3 F u3 L u4); bracket strings walk the tmp:first / tmp:last
  * ancestor chains depth-ordered → u1 "(S (NP *", u2 "* )", u3
  * "(VP *", u4 "* ))"; then the whole powla tree is deleted (stages
  * 3-5), leaving the CoNLL core + the PARSE literals only.
  */
class BracketsDetSpec extends AnyFunSuite {

  // two docs of 8 words each, engineered so both shapes occur: shape is
  // md5(first word of sentence) — "w1" hashes into 0-7 (shape 0) or not
  private def run(words: Array[String]): Seq[SentGraph] = {
    val sents = BracketsParser.parseDoc(
      InputDoc("d1", KgOracle.bracketSpansFor(words)), KgOracle.detBracketCols)
    sents.map { s =>
      val g = SentGraph(s)
      TreesScripts.tree2bracket.run(g, 1)
      g
    }
  }

  private def expectedTriples(n: Int, shape: Int, ws: Seq[String]): Set[Triple] =
    DetClosedForms.bracketTriples(n, shape, ws)

  test("both shapes occur in the probe vocabulary") {
    val shapes = (1 to 50).map(i => KgOracle.bracketShapeOf(s"w$i")).toSet
    assert(shapes == Set(0, 1))
  }

  for (shape <- 0 to 1) {
    test(s"shape $shape: converged graph == hand-derived closed form, exactly") {
      // find a first word selecting this shape; the rest are arbitrary
      val first = (1 to 100).map(i => s"w$i")
        .find(w => KgOracle.bracketShapeOf(w) == shape).get
      val ws = Array(first, "xa", "xb", "xc")
      val g = run(ws).head
      val got = g.all.toSet
      val exp = expectedTriples(1, shape, ws.toSeq)
      val extra = got -- exp
      val missing = exp -- got
      assert(extra.isEmpty && missing.isEmpty,
        s"\nextra=${extra.toSeq.sortBy(t => (t.s, t.p, t.o)).mkString("\n  ", "\n  ", "")}" +
          s"\nmissing=${missing.toSeq.sortBy(t => (t.s, t.p, t.o)).mkString("\n  ", "\n  ", "")}")
    }
  }

  /** Span-URI mode: base core minus the PARSE literal (no tree2bracket —
    * the tree stays) plus the hand-derived per-shape span-URI tree. */
  private def expectedSpanTriples(n: Int, shape: Int, ws: Seq[String]): Set[Triple] =
    DetClosedForms.bracketSpanTriples(n, shape, ws)

  for (shape <- 0 to 1) {
    test(s"shape $shape span URIs == hand-derived trace (incl. the last-scan overshoot)") {
      val first = (1 to 100).map(i => s"w$i")
        .find(w => KgOracle.bracketShapeOf(w) == shape).get
      val ws = Array(first, "xa", "xb", "xc")
      val sents = BracketsParser.parseDoc(
        InputDoc("d1", KgOracle.bracketSpansFor(ws)), KgOracle.detBracketCols,
        spanUris = true)
      val got = sents.head.triples.toSet
      val exp = expectedSpanTriples(1, shape, ws.toSeq)
      val extra = got -- exp
      val missing = exp -- got
      assert(extra.isEmpty && missing.isEmpty,
        s"\nextra=${extra.toSeq.sortBy(t => (t.s, t.p, t.o)).mkString("\n  ", "\n  ", "")}" +
          s"\nmissing=${missing.toSeq.sortBy(t => (t.s, t.p, t.o)).mkString("\n  ", "\n  ", "")}")
    }
  }

  test("span URIs merge co-extensional nodes (the reference's documented lossy case)") {
    // (A (B w1 w2)) — A and B span the same tokens, so both mint
    // :s1_1_s1_2: one node carries both rdf:values and a self
    // powla:hasParent (getTTL emits B hasParent stack-top == itself).
    val d = InputDoc("d1", Seq(
      Span("token", "w1\tN\t(A(B*", "", 0),
      Span("token", "w2\tN\t*))", "", 1)))
    val t = BracketsParser.parseDoc(d, Seq("WORD", "POS", "PARSE"), spanUris = true)
      .head.triples.toSet
    val u = ":s1_1_s1_2"
    assert(t.contains(Triple(u, "rdf:value", "A", false)))
    assert(t.contains(Triple(u, "rdf:value", "B", false)))
    assert(t.contains(Triple(u, "powla:hasParent", u, true)))
    assert(t.contains(Triple(":s1_1", "powla:hasParent", u, true)))
    assert(t.contains(Triple(":s1_2", "powla:hasParent", u, true)))
    // and no other node URIs exist
    assert(!t.exists(tr => tr.s.startsWith(":b") || tr.o.startsWith(":b")))
  }

  test("multi-sentence doc: per-doc URI counter leaves no residue; chain intact") {
    // 9 words → 2 sentences (trailing word dropped)
    val ws = (1 to 9).map(i => s"w$i").toArray
    val gs = run(ws)
    assert(gs.length == 2)
    val all = gs.zipWithIndex.flatMap { case (g, i) =>
      val exp = expectedTriples(i + 1, KgOracle.bracketShapeOf(ws(i * 4)),
        ws.slice(i * 4, i * 4 + 4).toSeq)
      val got = g.all.toSet
      (got -- exp) ++ (exp -- got)
    }
    assert(all.isEmpty, all.mkString("\n"))
  }
}
