package graft.conll

import org.scalatest.funsuite.AnyFunSuite

/** S3 conformance reader + K4 traced execution. */
class TtlRoundtripSpec extends AnyFunSuite {

  private val cols = Seq("ID", "WORD", "UPOS", "HEAD", "EDGE")

  private def sentence(rows: Seq[String]): Sentence = {
    val spans = (rows :+ "").zipWithIndex.map { case (r, i) =>
      Span(if (r.isEmpty) "sentence_break" else "token", r, "", i)
    }
    SpanParser.parseDoc(InputDoc("d", spans), cols).head
  }

  test("K1 TTL → TtlParser roundtrip is the identity on the triple set") {
    val s = sentence(Seq(
      "1\tthe\tDET\t2\tdet",
      "2\tfox \"quoted\" & co\tNOUN\t0\troot"
    ))
    val ttl = Serializers.toCanonicalTtl(s, cols)
    val parsed = TtlParser.parseChunk(ttl)
    assert(parsed.toSet == s.triples.toSet,
      s"missing=${s.triples.toSet diff parsed.toSet} extra=${parsed.toSet diff s.triples.toSet}")
  }

  test("TtlParser handles comma object lists and the 'a' keyword") {
    val t = TtlParser.parseChunk(
      """:s1_1 a nif:Word; conll:IGNORE "2" , "DT" , "the"; conll:HEAD :s1_3 .""")
    assert(t.toSet == Set(
      Triple(":s1_1", "rdf:type", "nif:Word", true),
      Triple(":s1_1", "conll:IGNORE", "2", false),
      Triple(":s1_1", "conll:IGNORE", "DT", false),
      Triple(":s1_1", "conll:IGNORE", "the", false),
      Triple(":s1_1", "conll:HEAD", ":s1_3", true)))
  }

  test("parseDocument chunks at blank lines, skips @prefix and comments") {
    val doc =
      """@prefix conll: <http://ufal.mff.cuni.cz/conll2009-st/task-description.html#> .
        |# comment
        |:s1_0 a nif:Sentence .
        |
        |:s2_0 a nif:Sentence .""".stripMargin
    val chunks = TtlParser.parseDocument(doc)
    assert(chunks.length == 2)
    assert(chunks(0) == Seq(Triple(":s1_0", "rdf:type", "nif:Sentence", true)))
  }

  test("K1 document writer: one prefix block, chunked sentences, full roundtrip") {
    val spans = Seq(
      "1\ta\tDET\t2\tdet", "2\tb\tNOUN\t0\troot", "",
      "1\tc\tVERB\t0\troot", ""
    ).zipWithIndex.map { case (r, i) =>
      Span(if (r.isEmpty) "sentence_break" else "token", r, "", i)
    }
    val sents = SpanParser.parseDoc(InputDoc("d", spans), cols)
    val doc = Serializers.toCanonicalTtlDocument(sents, cols, "urn:graft:d#")
    assert(doc.linesIterator.count(_.startsWith("@prefix")) == prefixCount)
    val chunks = TtlParser.parseDocument(doc)
    assert(chunks.length == 2)
    assert(chunks.flatten.toSet == sents.flatMap(_.triples).toSet)
  }

  private val prefixCount = Serializers.prefixes.size // incl. base, excl. rdf:type alias

  test("segment splitter collapses blank runs into #newsegment (S10)") {
    val d = InputDoc("d", Seq(
      Span("token", "1\tx\tNOUN\t0\troot", "", 0),
      Span("sentence_break", "", "", 1),
      Span("sentence_break", "", "", 2),
      Span("sentence_break", "", "", 3),
      Span("token", "1\ty\tNOUN\t0\troot", "", 4)
    ))
    val out = SegmentSplitter.insertNewSegmentComments(d)
    val kinds = out.spans.map(s => (s.kind, s.text))
    assert(kinds == Seq(
      ("token", "1\tx\tNOUN\t0\troot"),
      ("sentence_break", ""),
      ("comment", "#newsegment"),
      ("token", "1\ty\tNOUN\t0\troot")))
    // downstream: the comment lands on the following sentence
    val sents = SpanParser.parseDoc(out, cols)
    assert(sents(1).triples.exists(t => t.p == "rdfs:comment" && t.o == "newsegment"))
    // idempotent: re-splitting the already-collapsed stream changes
    // nothing (no 2+ blank run survives the first pass)
    val again = SegmentSplitter.insertNewSegmentComments(out)
    assert(again.spans.map(s => (s.kind, s.text)) == kinds)
  }

  test("parseTtl keeps source numbering across dropped sentences; fallback is counted") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val doc = InputDoc("d", Seq(
      Span("token", "1\ta\tDET\t0\troot", "", 0),
      Span("sentence_break", "", "", 1),
      Span("token", "1\tb\tNOUN\t0\troot", "", 2),
      Span("sentence_break", "", "", 3),
      Span("token", "1\tc\tVERB\t0\troot", "", 4)))
    val sents = SpanParser.parseDoc(doc, cols)
    assert(sents.map(_.sent) == Seq(1L, 2L, 3L))
    val blocks = sents.map(s => Serializers.toCanonicalTtl(s, cols))

    // re-ingesting output that DROPPED sentence 2: numbering sticks to
    // the source (1, 3), no silent positional renumbering, no fallback
    val holey = Seq(blocks(0), blocks(2)).mkString("\n\n")
    val acc1 = spark.sparkContext.longAccumulator("ttl_sent_fallbacks")
    val got = Pipeline.parseTtl(Seq(("d", holey)).toDS(), Some(acc1))
      .collect().sortBy(_.sent)
    assert(got.map(_.sent).toSeq == Seq(1L, 3L))
    assert(acc1.value == 0L)

    // a chunk whose :s{n}_0 sentence node is missing: continues from the
    // last recovered number and counts the fallback
    val noNode = blocks(2).split("\n").filterNot(_.startsWith(":s3_0")).mkString("\n")
    val mixed = Seq(blocks(0), noNode).mkString("\n\n")
    val acc2 = spark.sparkContext.longAccumulator("ttl_sent_fallbacks")
    val got2 = Pipeline.parseTtl(Seq(("d", mixed)).toDS(), Some(acc2))
      .collect().sortBy(_.sent)
    assert(got2.map(_.sent).toSeq == Seq(1L, 2L))
    assert(acc2.value == 1L)

    // a synthesized number must never collide with a LATER numbered
    // chunk: chunks [1, ?, 2] number as 1, 3, 2 — not 1, 2, 2
    val noNode2 = blocks(1).split("\n").filterNot(_.startsWith(":s2_0")).mkString("\n")
    val collide = Seq(blocks(0), noNode2, blocks(1)).mkString("\n\n")
    val acc3 = spark.sparkContext.longAccumulator("ttl_sent_fallbacks")
    val got3 = Pipeline.parseTtl(Seq(("d", collide)).toDS(), Some(acc3)).collect()
    assert(got3.map(_.sent).sorted.toSeq == Seq(1L, 2L, 3L), "no duplicate sentence numbers")
    assert(acc3.value == 1L)
  }

  test("TTL ingestion: K1 document → parseTtl → rewrite equals the direct path") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val docs = DocGen.docs(spark, 8)
    val direct = Pipeline.rewriteTriples(
      Pipeline.parse(docs, DocGen.columns), Pipeline.analyzeCascade)
    // serialize every doc to canonical TTL, then ingest the TTL stream
    val ttlDocs = Pipeline.parse(docs, DocGen.columns)
      .groupByKey(_.docId)
      .mapGroups { (id, sents) =>
        (id, Serializers.toCanonicalTtlDocument(sents.toSeq, DocGen.columns, s"urn:graft:$id#"))
      }
    val viaTtl = Pipeline.rewriteTriples(Pipeline.parseTtl(ttlDocs), Pipeline.analyzeCascade)
    assert(direct.toDF().exceptAll(viaTtl.toDF()).isEmpty)
    assert(viaTtl.toDF().exceptAll(direct.toDF()).isEmpty)
  }

  test("K2 text rendering: global.columns header + TAB rows + sentence breaks") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val rows = Seq("1\ta\tDET\t2\tdet", "2\tb\tNOUN\t0\troot", "", "1\tc\tVERB\t0\troot", "")
    val spans = rows.zipWithIndex.map { case (r, i) =>
      Span(if (r.isEmpty) "sentence_break" else "token", r, "", i)
    }
    val sents = SpanParser.parseDoc(InputDoc("d", spans), cols)
    val t = spark.createDataset(sents.flatMap(s =>
      s.triples.map(tr => TripleRow(s.docId, s.sent, tr.s, tr.p, tr.o, tr.oUri)))).toDF()
    val text = Serializers.toConllText(t, Seq("ID", "WORD", "UPOS"))
      .select($"text").as[String].head()
    assert(text ==
      "# global.columns = ID WORD UPOS\n" +
        "1\ta\tDET\n2\tb\tNOUN\n\n1\tc\tVERB")
  }

  test("runTraced dumps one sorted snapshot per changed statement (K4 gating)") {
    val g = SentGraph(sentence(Seq(
      "1\tthe\tDET\t2\tdet",
      "2\tfox\tNOUN\t0\troot")))
    val dumps = AnalyzeScripts.uposToPossynt.runTraced(g, maxIter = 5)
    // statements 1 (N for fox) and 3 (AN for the) change the graph; the
    // guarded re-run in iteration 2 changes nothing → exactly 2 dumps
    assert(dumps.map(d => (d.iteration, d.statement)) == Seq((1, 1), (1, 3)))
    // each dump is sorted and the last reflects the final state
    assert(dumps.forall(d => d.lines == d.lines.sorted))
    val finalLines = g.all.map { t =>
      val o = if (t.oUri) t.o else "\"" + t.o + "\""
      s"${t.s} ${t.p} $o ."
    }.sorted
    assert(dumps.last.lines == finalLines)
    // traced and untraced execution converge to the same graph
    val g2 = SentGraph(sentence(Seq(
      "1\tthe\tDET\t2\tdet",
      "2\tfox\tNOUN\t0\troot")))
    AnalyzeScripts.uposToPossynt.run(g2, 5)
    assert(g.all.toSet == g2.all.toSet)
  }
}
