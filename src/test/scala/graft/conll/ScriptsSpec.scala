package graft.conll

import org.scalatest.funsuite.AnyFunSuite

/** Rewrite-script semantics on hand-built sentences; expectations derived
  * by hand-executing the SPARQL sources (examples/sparql/analyze, parse).
  */
class ScriptsSpec extends AnyFunSuite {

  private val cols = Seq("ID", "WORD", "UPOS", "HEAD", "EDGE")

  private def parse(rows: Seq[String], cs: Seq[String] = cols): SentGraph = {
    val spans = (rows :+ "").zipWithIndex.map { case (r, i) =>
      Span(if (r.isEmpty) "sentence_break" else "token", r, "", i)
    }
    SentGraph(SpanParser.parseDoc(InputDoc("d", spans), cs).head)
  }

  // "the quick fox jumps the dog ." — a well-formed UD micro-sentence
  private def udSentence(): SentGraph = parse(Seq(
    "1\tthe\tDET\t3\tdet",
    "2\tquick\tADJ\t3\tamod",
    "3\tfox\tNOUN\t4\tnsubj",
    "4\tjumps\tVERB\t0\troot",
    "5\tthe\tDET\t6\tdet",
    "6\tdog\tNOUN\t4\tobj",
    "7\t.\tPUNCT\t4\tpunct"
  ))

  test("remove-IGNORE deletes exactly the IGNORE triples") {
    val g = parse(Seq("1\tx\tfoo\t0\troot"), Seq("ID", "WORD", "IGNORE", "HEAD", "EDGE"))
    assert(g.pairs("conll:IGNORE").nonEmpty)
    AnalyzeScripts.removeIgnore.run(g)
    assert(g.pairs("conll:IGNORE").isEmpty)
    assert(g.pairs("conll:WORD").nonEmpty)
  }

  test("UPOS-to-POSsynt base + guard ordering") {
    val g = udSentence()
    AnalyzeScripts.uposToPossynt.run(g)
    def ps(tok: Int) = g.objects(s":s1_$tok", "conll:POSsynt_UPOS").toSet
    assert(ps(1) == Set("AN")) // DET
    assert(ps(2) == Set("AN")) // ADJ
    assert(ps(3) == Set("N"))  // NOUN
    assert(ps(4) == Set("V"))  // VERB
    assert(ps(6) == Set("N"))
    assert(ps(7) == Set("X"))  // PUNCT
  }

  test("UPOS-to-POSsynt ADP gets the two-valued set {RN,AN}") {
    val g = parse(Seq("1\tover\tADP\t0\troot"))
    AnalyzeScripts.uposToPossynt.run(g)
    assert(g.objects(":s1_1", "conll:POSsynt_UPOS").toSet == Set("RN", "AN"))
  }

  test("EDGE-to-POSsynt maps word and head classes") {
    val g = udSentence()
    AnalyzeScripts.edgeToPossynt.run(g)
    def ps(tok: Int) = g.objects(s":s1_$tok", "conll:POSsynt_UD").toSet
    assert(ps(1) == Set("AN")) // det
    assert(ps(2) == Set("AN")) // amod
    assert(ps(3) == Set("N"))  // nsubj (head jumps gets V)
    assert(ps(4) == Set("V"))
    assert(ps(5) == Set("AN"))
    assert(ps(6) == Set("N"))
    assert(ps(7) == Set("X"))  // punct
  }

  test("EDGE-to-POSsynt propagation via conj (two hops per run)") {
    // x1 --nsubj--> x2(verb); x3 --conj--> x1; x4 --conj--> x3: two
    // duplicated propagation statements reach x4 in a single script run.
    val g = parse(Seq(
      "1\ta\tNOUN\t2\tnsubj",
      "2\tv\tVERB\t0\troot",
      "3\tb\tNOUN\t1\tconj",
      "4\tc\tNOUN\t3\tconj"
    ))
    AnalyzeScripts.edgeToPossynt.run(g)
    assert(g.objects(":s1_3", "conll:POSsynt_UD").toSet == Set("N"))
    assert(g.objects(":s1_4", "conll:POSsynt_UD").toSet == Set("N"))
  }

  test("consolidate prunes disagreeing alternatives and sets match flags") {
    val g = udSentence()
    AnalyzeScripts.uposToPossynt.run(g)
    AnalyzeScripts.edgeToPossynt.run(g)
    AnalyzeScripts.consolidatePossynt.run(g)
    for (tok <- Seq(1, 2, 3, 4, 5, 6, 7))
      assert(g.objects(s":s1_$tok", "conll:POSsynt_match") == Seq("1"),
        s"tok $tok should match")
  }

  test("consolidate keeps the agreeing value for ADP {RN,AN} vs case→AN") {
    val g = parse(Seq(
      "1\tover\tADP\t2\tcase",
      "2\tdog\tNOUN\t0\troot"
    ))
    AnalyzeScripts.uposToPossynt.run(g)   // over: {RN, AN}
    AnalyzeScripts.edgeToPossynt.run(g)   // over: AN (case), dog: N
    AnalyzeScripts.consolidatePossynt.run(g)
    assert(g.objects(":s1_1", "conll:POSsynt_UPOS").toSet == Set("AN"))
    assert(g.objects(":s1_1", "conll:POSsynt_match") == Seq("1"))
  }

  test("fixpoint: script converges and respects MAXITERATE cap") {
    val g = udSentence()
    val it = AnalyzeScripts.uposToPossynt.run(g, maxIter = 999)
    assert(it == 2) // 2nd iteration detects no change and stops
    val v0 = g.version
    AnalyzeScripts.uposToPossynt.run(g, maxIter = 999)
    assert(g.version == v0) // idempotent at fixpoint (RDF set semantics)
  }

  // --- SR parser cascade ---

  private val parseCols = Seq("WORD", "POS")

  test("SR parser builds the expected tree for 'the quick fox jumps .'") {
    val g = parse(Seq(
      "the\tDT", "quick\tJJ", "fox\tNN", "jumps\tVBZ", ".\t."
    ), parseCols)
    for ((script, n) <- Pipeline.parseCascade) script.run(g, n)
    def head(tok: Int) = g.objects(s":s1_$tok", "conll:HEAD")
    def edge(tok: Int) = g.objects(s":s1_$tok", "conll:EDGE")
    assert(head(1) == Seq(":s1_3") && edge(1) == Seq("det"))   // the → fox
    assert(head(2) == Seq(":s1_3") && edge(2) == Seq("nmod"))  // quick → fox
    assert(head(3) == Seq(":s1_4") && edge(3) == Seq("sbj"))   // fox → jumps
    assert(head(4) == Seq(":s1_0"))                            // root stays on sentence
    assert(g.pairs("conll:REDUCE").isEmpty)                    // all consumed
  }

  test("SR parser: noun compound reduces right-most noun as head") {
    val g = parse(Seq("data\tNN", "table\tNN", "runs\tVBZ", ".\t."), parseCols)
    for ((script, n) <- Pipeline.parseCascade) script.run(g, n)
    assert(g.objects(":s1_1", "conll:HEAD") == Seq(":s1_2"))
    assert(g.objects(":s1_1", "conll:EDGE") == Seq("nmod"))
    assert(g.objects(":s1_2", "conll:HEAD") == Seq(":s1_3")) // table = sbj of runs
  }

  test("link-UPOS-simple types words through the ontology closure") {
    val g = parse(Seq("1\tfox\tNOUN\t0\troot"))
    val t2c = Ontology.tagToConcepts(Ontology.miniOlia, Ontology.GRAPH_UD, Ontology.keepOlia)
    LinkScripts.linkUposSimple(t2c).run(g)
    val types = g.objects(":s1_1", "rdf:type").toSet
    assert(types.contains("olia:CommonNoun"))
    assert(types.contains("olia:Noun")) // via subclass closure
  }

  test("infer-olia-concepts closes over subClassOf+") {
    val g = parse(Seq("1\tfox\tNOUN\t0\troot"))
    g.add(Triple(":s1_1", "rdf:type", "olia:CommonNoun", true))
    val sup = Ontology.superClosure(Ontology.miniOlia, Ontology.GRAPH_UD, Ontology.keepOlia)
    LinkScripts.inferOliaConcepts(sup).run(g)
    assert(g.objects(":s1_1", "rdf:type").contains("olia:Noun"))
  }

  test("link-penn-POS full: 5 matching modes, layered closure, annotation cleanup") {
    val g = parse(Seq("jumps\tVBZ"), Seq("WORD", "POS"))
    val links = Ontology.pennLinks(Ontology.miniOlia, Ontology.GRAPH_PENN)
    LinkScripts.linkPennPosFull(links).run(g)
    val types = g.objects(":s1_1", "rdf:type").toSet
    // exact mode: VBZ instance → penn:FiniteVerb → olia:FiniteVerb (one
    // link step; olia-internal closure NOT visible in the penn graph)
    assert(types.contains("penn:FiniteVerb") && types.contains("olia:FiniteVerb"))
    assert(!types.contains("olia:Verb") || types.contains("olia:Verb")) // via fuzzy below
    // starting-with mode: "VB.*" → penn:AnyVerb → olia:Verb
    assert(types.contains("penn:AnyVerb") && types.contains("olia:Verb"))
    // branch 1 replicates the hasTag relation onto the word
    assert(g.has(":s1_1", "oliasys:hasTag", "VBZ"))
    // remove-annotation-model strips penn:/oliasys:, keeps olia:
    LinkScripts.removeAnnotationModel().run(g)
    val after = g.objects(":s1_1", "rdf:type").toSet
    assert(!after.exists(_.startsWith("penn:")))
    assert(!g.has(":s1_1", "oliasys:hasTag", "VBZ"))
    assert(after.contains("olia:FiniteVerb"))
    // infer-olia-concepts closes within olia.owl
    val sup = Ontology.superClosure(Ontology.miniOlia, Ontology.GRAPH_OLIA, Ontology.keepOlia)
    LinkScripts.inferOliaConcepts(sup).run(g)
    assert(g.has(":s1_1", "rdf:type", "olia:MorphosyntacticCategory"))
  }

  test("link-penn-POS containing mode: tags containing J → AdjectivalHead") {
    val g = parse(Seq("quick\tJJR"), Seq("WORD", "POS")) // JJR not an exact tag
    val links = Ontology.pennLinks(Ontology.miniOlia, Ontology.GRAPH_PENN)
    LinkScripts.linkPennPosFull(links).run(g)
    assert(g.has(":s1_1", "rdf:type", "olia:AdjectivalHead"))
  }

  test("remove-annotation-model deletes ud:/penn: triples only") {
    val g = parse(Seq("1\tfox\tNOUN\t0\troot"))
    g.add(Triple(":s1_1", "rdf:type", "ud:NOUN", true))
    g.add(Triple(":s1_1", "rdf:type", "olia:Noun", true))
    LinkScripts.removeAnnotationModel().run(g)
    val types = g.objects(":s1_1", "rdf:type").toSet
    assert(!types.contains("ud:NOUN"))
    assert(types.contains("olia:Noun"))
  }
}
