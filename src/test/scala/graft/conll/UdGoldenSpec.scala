package graft.conll

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source
import java.util.zip.GZIPInputStream
import java.io.FileInputStream
import graft.tools.PrScore

/** End-to-end goldens on the reference's OWN bundled corpus
  * (data/ud/UD_English-master/en-ud-dev.conllu.gz) against the outputs the
  * reference documents for it verbatim in examples/README.md:54-92,115-252
  * — the project's P/R oracle (target ≥ 0.95, BASELINE.json).
  *
  * Sentence 1 is "From the AP comes this story :"; the README shows its
  * full TTL for the convert pipeline and for each analyze stage, plus the
  * eval-POSsynt SELECT table. We assert exact triple equality (P = R = 1).
  */
class UdGoldenSpec extends AnyFunSuite {

  private val corpus = "/root/reference/data/ud/UD_English-master/en-ud-dev.conllu.gz"
  private val convertCols =
    Seq("ID", "WORD", "LEMMA", "UPOS", "POS", "FEAT", "HEAD", "EDGE", "DEPS", "MISC")
  private val analyzeCols =
    Seq("IGNORE", "WORD", "IGNORE", "UPOS", "IGNORE", "IGNORE", "HEAD", "EDGE", "IGNORE", "IGNORE")

  private lazy val lines: Seq[String] = {
    val src = Source.fromInputStream(new GZIPInputStream(new FileInputStream(corpus)), "UTF-8")
    try src.getLines().toVector finally src.close()
  }

  private def docOf(ls: Seq[String]): InputDoc =
    InputDoc("ud", ls.zipWithIndex.map { case (l, i) =>
      Span(
        if (l.trim.isEmpty) "sentence_break"
        else if (l.startsWith("#")) "comment"
        else "token",
        l, "", i)
    })

  private def uri(s: Int, t: Any) = s":s${s}_$t"

  test("convert pipeline reproduces the documented TTL for sentence 1 exactly") {
    val sents = SpanParser.parseDoc(docOf(lines.take(8)), convertCols)
    assert(sents.length == 1)
    val got = sents.head.triples.toSet
    // expected triples transcribed from examples/README.md:58-69
    def tok(id: Int, word: String, lemma: String, upos: String, pos: String,
        feat: Option[String], head: Int, edge: String, next: Boolean): Set[Triple] = {
      val u = uri(1, id)
      Set(
        Triple(u, "rdf:type", "nif:Word", true),
        Triple(u, "conll:ID", id.toString, false),
        Triple(u, "conll:WORD", word, false),
        Triple(u, "conll:LEMMA", lemma, false),
        Triple(u, "conll:UPOS", upos, false),
        Triple(u, "conll:POS", pos, false),
        Triple(u, "conll:HEAD", uri(1, head), true),
        Triple(u, "conll:EDGE", edge, false)
      ) ++ feat.map(f => Triple(u, "conll:FEAT", f, false)).toSet ++
        (if (next) Set(Triple(u, "nif:nextWord", uri(1, id + 1), true)) else Set.empty[Triple])
    }
    val expected =
      Set(Triple(":s1_0", "rdf:type", "nif:Sentence", true)) ++
        tok(1, "From", "from", "ADP", "IN", None, 3, "case", next = true) ++
        tok(2, "the", "the", "DET", "DT", Some("Definite=Def|PronType=Art"), 3, "det", next = true) ++
        tok(3, "AP", "AP", "PROPN", "NNP", Some("Number=Sing"), 4, "nmod", next = true) ++
        tok(4, "comes", "come", "VERB", "VBZ",
          Some("Mood=Ind|Number=Sing|Person=3|Tense=Pres|VerbForm=Fin"), 0, "root", next = true) ++
        tok(5, "this", "this", "DET", "DT", Some("Number=Sing|PronType=Dem"), 6, "det", next = true) ++
        tok(6, "story", "story", "NOUN", "NN", Some("Number=Sing"), 4, "nsubj", next = true) ++
        tok(7, ":", ":", "PUNCT", ":", None, 4, "punct", next = false)
    val s = PrScore.score(got, expected)
    assert(s.precision == 1.0 && s.recall == 1.0,
      s"P=${s.precision} R=${s.recall} fp=${got diff expected} fn=${expected diff got}")
  }

  test("analyze parse: multi-valued IGNORE set matches examples/README.md:124-131") {
    val sents = SpanParser.parseDoc(docOf(lines.take(8)), analyzeCols)
    val g = SentGraph(sents.head)
    assert(g.objects(":s1_2", "conll:IGNORE").toSet ==
      Set("2", "DT", "Definite=Def|PronType=Art", "the"))
    assert(g.objects(":s1_7", "conll:IGNORE").toSet == Set(":", "7"))
  }

  test("analyze cascade output matches examples/README.md:215-240 exactly (sentence 1)") {
    val sents = SpanParser.parseDoc(docOf(lines.take(8)), analyzeCols)
    val g = SentGraph(sents.head)
    for ((script, n) <- Pipeline.analyzeCascade) script.run(g, n)
    val got = g.all.toSet
    def tok(id: Int, word: String, upos: String, head: Int, edge: String,
        psUd: String, psUpos: String, m: String, next: Boolean): Set[Triple] = {
      val u = uri(1, id)
      Set(
        Triple(u, "rdf:type", "nif:Word", true),
        Triple(u, "conll:WORD", word, false),
        Triple(u, "conll:UPOS", upos, false),
        Triple(u, "conll:HEAD", uri(1, head), true),
        Triple(u, "conll:EDGE", edge, false),
        Triple(u, "conll:POSsynt_UD", psUd, false),
        Triple(u, "conll:POSsynt_UPOS", psUpos, false),
        Triple(u, "conll:POSsynt_match", m, false)
      ) ++ (if (next) Set(Triple(u, "nif:nextWord", uri(1, id + 1), true)) else Set.empty[Triple])
    }
    val expected =
      Set(Triple(":s1_0", "rdf:type", "nif:Sentence", true)) ++
        tok(1, "From", "ADP", 3, "case", "AN", "AN", "1", next = true) ++
        tok(2, "the", "DET", 3, "det", "AN", "AN", "1", next = true) ++
        tok(3, "AP", "PROPN", 4, "nmod", "N", "N", "1", next = true) ++
        tok(4, "comes", "VERB", 0, "root", "V", "V", "1", next = true) ++
        tok(5, "this", "DET", 6, "det", "AN", "AN", "1", next = true) ++
        tok(6, "story", "NOUN", 4, "nsubj", "N", "N", "1", next = true) ++
        tok(7, ":", "PUNCT", 4, "punct", "X", "X", "1", next = false)
    val s = PrScore.score(got, expected)
    assert(s.precision == 1.0 && s.recall == 1.0,
      s"P=${s.precision} R=${s.recall} fp=${got diff expected} fn=${expected diff got}")
  }

  test("eval-POSsynt SELECT matches the documented table rows (sentence 1)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val sents = SpanParser.parseDoc(docOf(lines.take(8)), analyzeCols)
      .map { s => val g = SentGraph(s)
        Pipeline.analyzeCascade.foreach { case (sc, n) => sc.run(g, n) }
        SentGraph.toSentence(s.docId, s.sent, s.comments, g) }
    val t = spark.createDataset(sents.flatMap(s =>
      s.triples.map(tr => TripleRow(s.docId, s.sent, tr.s, tr.p, tr.o, tr.oUri)))).toDF
    val rows = Serializers.evalPossyntSelect(t)
      .orderBy($"sent", $"subj")
      .select($"word", $"upos", $"udep", $"POSsynt_UPOS", $"POSsynt_UDEP", $"match")
      .as[(String, String, String, String, String, String)].collect().toSeq
    val expected = Seq(
      ("From", "ADP", "case", "AN", "AN", "1"),
      ("the", "DET", "det", "AN", "AN", "1"),
      ("AP", "PROPN", "nmod", "N", "N", "1"),
      ("comes", "VERB", "root", "V", "V", "1"),
      ("this", "DET", "det", "AN", "AN", "1"),
      ("story", "NOUN", "nsubj", "N", "N", "1"),
      (":", "PUNCT", "punct", "X", "X", "1"))
    assert(rows.toSet == expected.toSet)
  }

  test("K2 roundtrip matches examples/README.md:84-90 (-conll ID WORD LEMMA FEAT)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val sents = SpanParser.parseDoc(docOf(lines.take(8)), convertCols)
    val t = spark.createDataset(sents.flatMap(s =>
      s.triples.map(tr => TripleRow(s.docId, s.sent, tr.s, tr.p, tr.o, tr.oUri)))).toDF
    val out = Serializers.toConllTsv(t, Seq("ID", "WORD", "LEMMA", "FEAT"))
      .orderBy($"sent", $"tok")
      .select($"ID", $"WORD", $"LEMMA", $"FEAT")
      .as[(String, String, String, String)].collect().toSeq
    assert(out.take(3) == Seq(
      ("1", "From", "from", "_"),
      ("2", "the", "the", "Definite=Def|PronType=Art"),
      ("3", "AP", "AP", "Number=Sing")))
  }

  test("whole corpus parses: 2002 sentences, stable triple count, all words chained") {
    val sents = SpanParser.parseDoc(docOf(lines), convertCols)
    assert(sents.length > 1900, s"got ${sents.length} sentences")
    // every non-final token in every sentence has exactly one nextWord
    for (s <- sents.take(50)) {
      val g = SentGraph(s)
      val words = g.words
      val withNext = words.count(w => g.objects(w, "nif:nextWord").nonEmpty)
      assert(withNext == words.size - 1)
    }
    // nextSentence chain is complete
    val total = sents.map(_.triples.count(_.p == "nif:nextSentence")).sum
    assert(total == sents.length - 1)
  }
}
