package graft.conll

import graft.queries.KgOracle

/** Hand-derived closed forms of the deterministic det-corpus paths —
  * the SAME tables the DuckDB oracles encode as VALUES/CTEs, expressed
  * in Scala so specs (ParseDetSpec, BracketsDetSpec, DetSeedSweepSpec)
  * can assert engine == closed form TRIPLE FOR TRIPLE on arbitrary word
  * arrays, not just the fixed instances the driver gate runs.
  *
  * Every form is a pure function of the word array: POS/shape/attributes
  * derive from md5(word) exactly as the generators do, so the words
  * themselves are free variables — which is what makes a randomized
  * sweep sound.
  */
object DetClosedForms {

  /** Converged parse-cascade output for sentence n of pattern j
    * (KgOracle.parseTree / parseShiftLeft, derived by hand from the
    * REDUCE-english rules — see ParseDetSpec's worked traces). */
  def parseTriples(n: Int, j: Int, ws: Seq[String]): Set[Triple] = {
    val types = KgOracle.parseTagTypes
    val tree = KgOracle.parseTree(j)
    val out = scala.collection.mutable.Set[Triple]()
    out += Triple(s":s${n}_0", "rdf:type", "nif:Sentence", oUri = true)
    if (n > 1) out += Triple(s":s${n - 1}_0", "nif:nextSentence", s":s${n}_0", oUri = true)
    for ((w, idx) <- ws.zipWithIndex) {
      val tid = idx + 1
      val uri = s":s${n}_$tid"
      out += Triple(uri, "rdf:type", "nif:Word", oUri = true)
      if (tid < ws.length)
        out += Triple(uri, "nif:nextWord", s":s${n}_${tid + 1}", oUri = true)
      out += Triple(uri, "conll:WORD", w, oUri = false)
      out += Triple(uri, "conll:LEMMA",
        KgOracle.parseLemmaForced.getOrElse((j, tid), "l" + w), oUri = false)
      val pos = KgOracle.parsePos(j)(idx)
      out += Triple(uri, "conll:POS", pos, oUri = false)
      val h = tree.get(tid).map(_._1).getOrElse(0)
      out += Triple(uri, "conll:HEAD", s":s${n}_$h", oUri = true)
      tree.get(tid).foreach { case (_, e) =>
        out += Triple(uri, "conll:EDGE", e, oUri = false)
      }
      types(pos).foreach(c => out += Triple(uri, "rdf:type", c, oUri = true))
    }
    // budget-capped fixpoints strand SHIFT edges (P6)
    for ((f, t) <- KgOracle.parseShiftLeft(j))
      out += Triple(s":s${n}_$f", "conll:SHIFT", s":s${n}_$t", oUri = true)
    out.toSet
  }

  /** Converged tree2bracket output for sentence n of the given shape
    * (KgOracle.bracketParse — see BracketsDetSpec's worked trace). */
  def bracketTriples(n: Int, shape: Int, ws: Seq[String]): Set[Triple] = {
    val out = scala.collection.mutable.Set[Triple]()
    out += Triple(s":s${n}_0", "rdf:type", "nif:Sentence", oUri = true)
    if (n > 1) out += Triple(s":s${n - 1}_0", "nif:nextSentence", s":s${n}_0", oUri = true)
    for ((w, idx) <- ws.zipWithIndex) {
      val tid = idx + 1
      val uri = s":s${n}_$tid"
      out += Triple(uri, "rdf:type", "nif:Word", oUri = true)
      if (tid < ws.length)
        out += Triple(uri, "nif:nextWord", s":s${n}_${tid + 1}", oUri = true)
      out += Triple(uri, "conll:WORD", w, oUri = false)
      out += Triple(uri, "conll:POS",
        KgOracle.uposFromHex(KgOracle.md5hex(w).charAt(0)), oUri = false)
      out += Triple(uri, "conll:HEAD", s":s${n}_0", oUri = true) // no HEAD column
      out += Triple(uri, "conll:PARSE", KgOracle.bracketParse(shape)(idx), oUri = false)
    }
    out.toSet
  }

  /** Span-URI mode: base core minus the PARSE literal (no tree2bracket —
    * the tree stays) plus the hand-derived per-shape span-URI tree
    * (KgOracle.bracketSpanTpl, incl. the reference's last-scan
    * overshoot). */
  def bracketSpanTriples(n: Int, shape: Int, ws: Seq[String]): Set[Triple] = {
    val base = bracketTriples(n, shape, ws).filterNot(_.p == "conll:PARSE")
    val tree = KgOracle.bracketSpanTpl.collect {
      case (sh, s, p, o, u) if sh == shape =>
        Triple(s.replace("%", n.toString), p,
          if (u) o.replace("%", n.toString) else o, oUri = u)
    }
    base ++ tree
  }

  /** Plain det-corpus parse (the base token table every analyze-family
    * oracle builds on): ID/WORD/UPOS/HEAD/EDGE with the deterministic
    * md5-derived attributes and the tid/2 tree; trailing partial
    * sentences kept. */
  def detTriples(n: Int, ws: Seq[String]): Set[Triple] = {
    val ntok = ws.length
    val out = scala.collection.mutable.Set[Triple]()
    val sent = s":s${n}_0"
    out += Triple(sent, "rdf:type", "nif:Sentence", oUri = true)
    if (n > 1) out += Triple(s":s${n - 1}_0", "nif:nextSentence", sent, oUri = true)
    for ((w, idx) <- ws.zipWithIndex) {
      val tid = idx + 1
      val uri = s":s${n}_$tid"
      val h = KgOracle.md5hex(w)
      out += Triple(uri, "rdf:type", "nif:Word", oUri = true)
      if (tid < ntok) out += Triple(uri, "nif:nextWord", s":s${n}_${tid + 1}", oUri = true)
      out += Triple(uri, "conll:ID", tid.toString, oUri = false)
      out += Triple(uri, "conll:WORD", w, oUri = false)
      out += Triple(uri, "conll:UPOS", KgOracle.uposFromHex(h.charAt(0)), oUri = false)
      out += Triple(uri, "conll:HEAD",
        s":s${n}_${if (tid == 1) 0 else tid / 2}", oUri = true)
      out += Triple(uri, "conll:EDGE",
        if (tid == 1) "root" else KgOracle.edgeFromHex(h.charAt(1)), oUri = false)
    }
    out.toSet
  }

  /** SRL path (KgOracle.srlSql's closed form): 15-token sentences with
    * predicates at tid 4/10, role cells at tid 2/6 (→ pred 4) and 8/12
    * (→ pred 10); trailing partial sentences KEPT — a role whose
    * predicate ROW is missing drops, its subPropertyOf axiom stays (the
    * cell exists). ws is the sentence's token list (length ≤ 15). */
  def srlTriples(n: Int, ws: Seq[String]): Set[Triple] = {
    val ntok = ws.length
    val out = scala.collection.mutable.Set[Triple]()
    val sent = s":s${n}_0"
    out += Triple(sent, "rdf:type", "nif:Sentence", oUri = true)
    if (n > 1) out += Triple(s":s${n - 1}_0", "nif:nextSentence", sent, oUri = true)
    for ((w, idx) <- ws.zipWithIndex) {
      val tid = idx + 1
      val uri = s":s${n}_$tid"
      out += Triple(uri, "rdf:type", "nif:Word", oUri = true)
      if (tid < ntok) out += Triple(uri, "nif:nextWord", s":s${n}_${tid + 1}", oUri = true)
      out += Triple(uri, "conll:ID", tid.toString, oUri = false)
      out += Triple(uri, "conll:WORD", w, oUri = false)
      out += Triple(uri, "conll:HEAD", sent, oUri = true)
      if (tid == 4 || tid == 10) out += Triple(uri, "conll:PRED", "y", oUri = false)
    }
    if (ntok >= 4) {
      if (ntok >= 2) out += Triple(s":s${n}_4", "conll:A0", s":s${n}_2", oUri = true)
      if (ntok >= 6) out += Triple(s":s${n}_4", "conll:A1", s":s${n}_6", oUri = true)
    }
    if (ntok >= 10) {
      if (ntok >= 8) out += Triple(s":s${n}_10", "conll:A0", s":s${n}_8", oUri = true)
      if (ntok >= 12) out += Triple(s":s${n}_10", "conll:A2", s":s${n}_12", oUri = true)
    }
    if (ntok >= 2) out += Triple("conll:A0", "rdfs:subPropertyOf", "conll:PRED-ARG", oUri = true)
    if (ntok >= 6) out += Triple("conll:A1", "rdfs:subPropertyOf", "conll:PRED-ARG", oUri = true)
    if (ntok >= 12) out += Triple("conll:A2", "rdfs:subPropertyOf", "conll:PRED-ARG", oUri = true)
    out.toSet
  }

  /** Dirty-TSV path AFTER remove-IGNORE (KgOracle.dirtySql's closed
    * form): `<s>` markup as break, two '#' comments joined by '\n' onto
    * the sentence node, skipped `<note/>`, '_' empty EDGE on odd tids,
    * 'O' empty UPOS at tid 13, inline '#' comment stripped at tid 8, and
    * NO residue of the IGNORE column. */
  def dirtyTriples(docId: String, n: Int, ws: Seq[String]): Set[Triple] = {
    val ntok = ws.length
    val out = scala.collection.mutable.Set[Triple]()
    val sent = s":s${n}_0"
    out += Triple(sent, "rdf:type", "nif:Sentence", oUri = true)
    if (n > 1) out += Triple(s":s${n - 1}_0", "nif:nextSentence", sent, oUri = true)
    out += Triple(sent, "rdfs:comment", s"doc $docId sent $n\nw ${ws.head}", oUri = false)
    for ((w, idx) <- ws.zipWithIndex) {
      val tid = idx + 1
      val uri = s":s${n}_$tid"
      out += Triple(uri, "rdf:type", "nif:Word", oUri = true)
      if (tid < ntok) out += Triple(uri, "nif:nextWord", s":s${n}_${tid + 1}", oUri = true)
      out += Triple(uri, "conll:ID", tid.toString, oUri = false)
      out += Triple(uri, "conll:WORD", w, oUri = false)
      if (tid != 13)
        out += Triple(uri, "conll:UPOS",
          KgOracle.uposFromHex(KgOracle.md5hex(w).charAt(0)), oUri = false)
      if (tid % 2 == 0)
        out += Triple(uri, "conll:EDGE", if (tid == 8) "amod" else "det", oUri = false)
      out += Triple(uri, "conll:HEAD", sent, oUri = true)
    }
    out.toSet
  }

  /** XML glue path AFTER emptyNode2Word (KgOracle.xmltsvEmptySql's
    * closed form — trace in XmlGlueDetSpec): document-global powla
    * counter (doc=:x1, s_n=:x{2n}, g_n=:x{2n+1}), the `<g/>` node's
    * materialized empty nif:Word spliced into the nextWord chain at
    * GLUE_AT with its HEAD defaulted to the sentence node. */
  def glueTriples(docId: String, n: Int, ws: Seq[String]): Set[Triple] = {
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
    out += Triple(":x1", "x:id", docId, oUri = false)
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

  /** Plain XML-TSV path AFTER xAttributes2value (KgOracle.xmltsvSql's
    * closed form): re-asserted `:x1` doc node (rdf:value folded to
    * `doc id="D"`, x:id kept), `:x{n+1}` s-node on the document-global
    * counter, token hasParent/next chains; trailing partial sentences
    * KEPT. */
  def xmltsvTriples(docId: String, n: Int, ws: Seq[String]): Set[Triple] = {
    val ntok = ws.length
    val out = scala.collection.mutable.Set[Triple]()
    val sent = s":s${n}_0"
    val sNode = s":x${n + 1}"
    out += Triple(sent, "rdf:type", "nif:Sentence", oUri = true)
    if (n > 1) out += Triple(s":s${n - 1}_0", "nif:nextSentence", sent, oUri = true)
    for ((w, idx) <- ws.zipWithIndex) {
      val tid = idx + 1
      val uri = s":s${n}_$tid"
      out += Triple(uri, "rdf:type", "nif:Word", oUri = true)
      if (tid < ntok) {
        out += Triple(uri, "nif:nextWord", s":s${n}_${tid + 1}", oUri = true)
        out += Triple(uri, "powla:next", s":s${n}_${tid + 1}", oUri = true)
      }
      out += Triple(uri, "conll:WORD", w, oUri = false)
      out += Triple(uri, "conll:UPOS",
        KgOracle.uposFromHex(KgOracle.md5hex(w).charAt(0)), oUri = false)
      out += Triple(uri, "conll:HEAD", sent, oUri = true)
      out += Triple(uri, "powla:hasParent", sNode, oUri = true)
    }
    out += Triple(":x1", "rdf:type", "powla:Node", oUri = true)
    out += Triple(":x1", "rdf:type", "conll:XML_DATA", oUri = true)
    out += Triple(":x1", "rdf:value", s"""doc id="$docId"""", oUri = false)
    out += Triple(":x1", "x:id", docId, oUri = false)
    out += Triple(sNode, "rdf:type", "powla:Node", oUri = true)
    out += Triple(sNode, "rdf:type", "conll:XML_DATA", oUri = true)
    out += Triple(sNode, "rdf:value", "s", oUri = false)
    out += Triple(sNode, "powla:hasParent", ":x1", oUri = true)
    out.toSet
  }

  /** TenTen path (KgOracle.tentenSql's closed form): 3-token 9-column
    * sentences extracted from escaped vertical data tags; powla nodes on
    * a document-global counter (doc=:x1, sentence 1's <s>=:x2, the
    * REPAIRED childless <note>=:x3, sentence i>1's <s>=:x{i+2}); in
    * sentence 1 the note is spliced into the sibling chain between
    * tokens 1 and 2. */
  def tentenTriples(n: Int, ws: Seq[String]): Set[Triple] = {
    val out = scala.collection.mutable.Set[Triple]()
    val sent = s":s${n}_0"
    val sX = if (n == 1) ":x2" else s":x${n + 2}"
    out += Triple(sent, "rdf:type", "nif:Sentence", oUri = true)
    if (n > 1) out += Triple(s":s${n - 1}_0", "nif:nextSentence", sent, oUri = true)
    for ((w, idx) <- ws.zipWithIndex) {
      val tid = idx + 1
      val uri = s":s${n}_$tid"
      out += Triple(uri, "rdf:type", "nif:Word", oUri = true)
      if (tid < KgOracle.TT_LEN)
        out += Triple(uri, "nif:nextWord", s":s${n}_${tid + 1}", oUri = true)
      out += Triple(uri, "conll:WORD", w, oUri = false)
      out += Triple(uri, "conll:POS",
        KgOracle.uposFromHex(KgOracle.md5hex(w).charAt(0)), oUri = false)
      for (k <- 1 to 7) out += Triple(uri, s"conll:F$k", "x", oUri = false)
      out += Triple(uri, "conll:HEAD", sent, oUri = true)
      out += Triple(uri, "powla:hasParent", sX, oUri = true)
      if (n > 1 && tid < KgOracle.TT_LEN)
        out += Triple(uri, "powla:next", s":s${n}_${tid + 1}", oUri = true)
    }
    out += Triple(":x1", "rdf:type", "powla:Node", oUri = true)
    out += Triple(":x1", "rdf:type", "conll:XML_DATA", oUri = true)
    out += Triple(":x1", "rdf:value", "doc", oUri = false)
    out += Triple(sX, "powla:hasParent", ":x1", oUri = true)
    out += Triple(sX, "rdf:type", "powla:Node", oUri = true)
    out += Triple(sX, "rdf:type", "conll:XML_DATA", oUri = true)
    out += Triple(sX, "rdf:value", "s", oUri = false)
    if (n == 1) {
      out += Triple(":x3", "powla:hasParent", ":x2", oUri = true)
      out += Triple(":x3", "rdf:type", "powla:Node", oUri = true)
      out += Triple(":x3", "rdf:type", "conll:XML_DATA", oUri = true)
      out += Triple(":x3", "rdf:value", "note", oUri = false)
      out += Triple(":s1_1", "powla:next", ":x3", oUri = true)
      out += Triple(":x3", "powla:next", ":s1_2", oUri = true)
      out += Triple(":s1_2", "powla:next", ":s1_3", oUri = true)
    }
    out.toSet
  }

  /** Segment-splitter path (KgOracle.segmentsSql's closed form): 4-token
    * single-WORD sentences; the '#newsegment' comment the splitter
    * synthesizes surfaces as rdfs:comment on the FOLLOWING sentence —
    * sentences at position si with si % 3 == 0 (si = sent - 1 > 0). */
  def segTriples(n: Int, ws: Seq[String]): Set[Triple] = {
    val out = scala.collection.mutable.Set[Triple]()
    out += Triple(s":s${n}_0", "rdf:type", "nif:Sentence", oUri = true)
    if (n > 1) out += Triple(s":s${n - 1}_0", "nif:nextSentence", s":s${n}_0", oUri = true)
    if (n > 1 && (n - 1) % 3 == 0)
      out += Triple(s":s${n}_0", "rdfs:comment", "newsegment", oUri = false)
    for ((w, idx) <- ws.zipWithIndex) {
      val tid = idx + 1
      val uri = s":s${n}_$tid"
      out += Triple(uri, "rdf:type", "nif:Word", oUri = true)
      if (tid < ws.length)
        out += Triple(uri, "nif:nextWord", s":s${n}_${tid + 1}", oUri = true)
      out += Triple(uri, "conll:WORD", w, oUri = false)
      out += Triple(uri, "conll:HEAD", s":s${n}_0", oUri = true)
    }
    out.toSet
  }
}
