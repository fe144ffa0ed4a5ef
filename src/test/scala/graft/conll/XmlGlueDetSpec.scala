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

  private def glueSpans(ws: Array[String]): Seq[Span] = {
    val spans = scala.collection.mutable.ArrayBuffer[Span]()
    var off = 0
    def add(kind: String, t: String): Unit = { spans += Span(kind, t, "", off); off += 1 }
    add("markup", """<doc id="d1">""")
    for (k <- 0 until ws.length / KgOracle.SENT_LEN) {
      add("markup", "<s>")
      for (t <- 0 until KgOracle.SENT_LEN) {
        val w = ws(k * KgOracle.SENT_LEN + t)
        add("token", s"$w\t${KgOracle.uposFromHex(KgOracle.md5hex(w).charAt(0))}")
        if (t + 1 == KgOracle.GLUE_AT) add("markup", "<g/>")
      }
      add("markup", "</s>")
    }
    add("markup", "</doc>")
    spans.toSeq
  }

  private def expectedTriples(n: Int, ws: Seq[String]): Set[Triple] = {
    val out = scala.collection.mutable.Set[Triple]()
    val sN = s":s${n}_0"
    val sNode = s":x${2 * n}"
    val gNode = s":x${2 * n + 1}"
    val gWord = s"${gNode}_word"
    out += Triple(sN, "rdf:type", "nif:Sentence", oUri = true)
    if (n > 1) out += Triple(s":s${n - 1}_0", "nif:nextSentence", sN, oUri = true)
    for ((w, idx) <- ws.zipWithIndex) {
      val tid = idx + 1
      val uri = s":s${n}_$tid"
      out += Triple(uri, "rdf:type", "nif:Word", oUri = true)
      out += Triple(uri, "conll:WORD", w, oUri = false)
      out += Triple(uri, "conll:UPOS",
        KgOracle.uposFromHex(KgOracle.md5hex(w).charAt(0)), oUri = false)
      out += Triple(uri, "conll:HEAD", sN, oUri = true)
      out += Triple(uri, "powla:hasParent", sNode, oUri = true)
      if (tid < ws.length) {
        val nxt = s":s${n}_${tid + 1}"
        out += Triple(uri, "nif:nextWord",
          if (tid == KgOracle.GLUE_AT) gWord else nxt, oUri = true)
        out += Triple(uri, "powla:next",
          if (tid == KgOracle.GLUE_AT) gNode else nxt, oUri = true)
      }
    }
    out += Triple(gWord, "nif:nextWord", s":s${n}_${KgOracle.GLUE_AT + 1}", oUri = true)
    out += Triple(gNode, "powla:next", s":s${n}_${KgOracle.GLUE_AT + 1}", oUri = true)
    out += Triple(":x1", "rdf:type", "powla:Node", oUri = true)
    out += Triple(":x1", "rdf:type", "conll:XML_DATA", oUri = true)
    out += Triple(":x1", "rdf:value", "doc", oUri = false)
    out += Triple(":x1", "x:id", "d1", oUri = false)
    out += Triple(sNode, "rdf:type", "powla:Node", oUri = true)
    out += Triple(sNode, "rdf:type", "conll:XML_DATA", oUri = true)
    out += Triple(sNode, "rdf:value", "s", oUri = false)
    out += Triple(sNode, "powla:hasParent", ":x1", oUri = true)
    out += Triple(gNode, "rdf:type", "powla:Node", oUri = true)
    out += Triple(gNode, "rdf:type", "conll:XML_DATA", oUri = true)
    out += Triple(gNode, "rdf:value", "g", oUri = false)
    out += Triple(gNode, "powla:hasParent", sNode, oUri = true)
    out += Triple(gWord, "rdf:type", "nif:Word", oUri = true)
    out += Triple(gWord, "conll:WORD", "", oUri = false)
    out += Triple(gWord, "powla:hasParent", gNode, oUri = true)
    out += Triple(gWord, "conll:HEAD", sN, oUri = true)
    out.toSet
  }

  test("glue corpus: engine == closed form, both sentences, exactly") {
    val sents = XmlTsvParser.parseDoc(InputDoc("d1", glueSpans(words)), KgOracle.detXmlCols)
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
