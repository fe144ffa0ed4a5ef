package graft.conll

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.KgOracle

/** Hand-derivation gate for the glue corpus (kg_xmltsv_emptyword):
  * XmlTsvParser over `<doc><s> t1..t8 <g/> t9..t15 </s>...</doc>` then
  * trees/emptyNode2Word, asserted TRIPLE FOR TRIPLE against the closed
  * form the DuckDB oracle encodes.
  *
  * Trace: the self-closing `<g/>` is a childless powla:Node (:x{2k+1},
  * document-global counter: doc=1, s_k=2k, g_k=2k+1). emptyNode2Word
  * stage (1) materializes `:x{2k+1}_word` (a nif:Word, conll:WORD "",
  * hasParent the g node); stage (2) splices it into nif:nextWord —
  * only the (t8, t9) pair satisfies both precedes-path guards
  * (prec(t8) reaches the empty via t8 →next :x_g →hasParent-child;
  * prec(empty) = {t9..} excludes earlier successors, and later pairs
  * cannot reach the empty at all); stages (2a)/(2b)/(3a)/(3b) are no-ops
  * on the now-linear chain; stage (4) walks the chain's conll:HEAD
  * closure to the sentence node and defaults the empty's HEAD to it.
  */
class XmlGlueDetSpec extends AnyFunSuite {

  private val words = (1 to 2 * KgOracle.SENT_LEN).map(i => f"w$i%02d").toArray

  private def expectedTriples(n: Int, ws: Seq[String]): Set[Triple] =
    DetClosedForms.glueTriples("d1", n, ws)

  test("glue corpus: engine == closed form, both sentences, exactly") {
    val sents = XmlTsvParser.parseDoc(InputDoc("d1", KgOracle.xmlGlueSpansFor("d1", words)), KgOracle.detXmlCols)
    assert(sents.length == 2)
    for ((s, i) <- sents.zipWithIndex) {
      val g = SentGraph(s)
      TreesScripts.emptyNode2Word.run(g, 1)
      val got = g.all.toSet
      val exp = expectedTriples(i + 1,
        words.slice(i * KgOracle.SENT_LEN, (i + 1) * KgOracle.SENT_LEN).toSeq)
      val extra = got -- exp
      val missing = exp -- got
      assert(extra.isEmpty && missing.isEmpty,
        s"sentence ${i + 1}:" +
          s"\nextra=${extra.toSeq.sortBy(t => (t.s, t.p, t.o)).mkString("\n  ", "\n  ", "")}" +
          s"\nmissing=${missing.toSeq.sortBy(t => (t.s, t.p, t.o)).mkString("\n  ", "\n  ", "")}")
    }
  }
}
