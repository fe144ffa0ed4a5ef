package graft.conll

import org.scalatest.funsuite.AnyFunSuite

/** S9: TenTen (SketchEngine vertical) pre-processor — semantics from
  * TenTen2XMLTSV.java (extract embedded CoNLL from data tags, '/'→TAB
  * outside brackets, split bracket runs, repair unbalanced closers). */
class TenTenSpec extends AnyFunSuite {

  // two 9-field rows (8 slashes = the CoNLL-row threshold) wrapped in
  // escaped <s> markup, with a `</s><s>` run that must split
  private val row1 = "The/DT/the/x/x/x/x/2/det"
  private val row2 = "dog/NN/dog/x/x/x/x/0/root"
  private val row3 = "runs/VBZ/run/x/x/x/x/0/root"
  private val left =
    s"<left>&lt;s&gt; $row1 $row2 &lt;/s&gt;&lt;s&gt; $row3 &lt;/s&gt;</left>"

  test("data-tag content: rows '/'→TAB, bracket runs split, escapes undone") {
    val out = TenTen.convert(Seq(left))
    assert(out == Seq(
      "<s>",
      row1.replace('/', '\t'),
      row2.replace('/', '\t'),
      "</s>", "<s>",
      row3.replace('/', '\t'),
      "</s>"))
  }

  test("keep: non-matching lines pass through or drop") {
    val lines = Seq("<doc id=\"1\">", left, "</doc>")
    assert(TenTen.convert(lines, keep = false).count(_ == "<s>") == 2)
    val kept = TenTen.convert(lines, keep = true)
    assert(kept.head == "<doc id=\"1\">" && kept.last == "</doc>")
  }

  test("repair: a closing bracket without an opening gets one synthesized") {
    val broken = s"<left>$row1 &lt;/p&gt;</left>"
    val out = TenTen.convert(Seq(broken), repair = true)
    assert(out == Seq(row1.replace('/', '\t'), "<p>", "</p>"))
    // balanced input: no artificial brackets
    val ok = TenTen.convert(Seq(left), repair = true)
    assert(ok.count(_ == "<s>") == 2)
  }

  test("bracket-bearing heading line: '/' replaced only outside brackets") {
    val heading = "<left>a/b&lt;g x=\"1/2\"&gt;c/d/e/f/g/h/i</left>"
    val out = TenTen.convert(Seq(heading))
    // the 1/2 inside the bracket survives; outside slashes become tabs
    assert(out.exists(l => l.contains("<g x=\"1/2\">") && l.contains("a\tb")))
  }

  test("property: repair synthesizes exactly one opener per unmatched closer") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // random bracket scripts over 3 element names, as escaped content
    val genOp = Gen.oneOf("s", "p", "g").flatMap(n =>
      Gen.oneOf(s"&lt;$n&gt;", s"&lt;/$n&gt;"))
    val genScript = Gen.chooseNum(1, 12).flatMap(k => Gen.listOfN(k, genOp))
    val p = Prop.forAll(genScript) { ops =>
      val content = (ops :+ row1).mkString(" ")
      val out = TenTen.convert(Seq(s"<left>$content</left>"), repair = true)
      // count unmatched closers with the straightforward stack
      val stack = scala.collection.mutable.ArrayBuffer[String]()
      var unmatched = 0
      for (op <- ops) {
        val name = op.replaceAll("&lt;|&gt;|/", "")
        if (op.contains("/")) {
          val i = stack.indexOf(name)
          if (i < 0) unmatched += 1 else stack.remove(i)
        } else stack += name
      }
      val artificial = out.size - (ops.size + 1) // beyond input lines
      artificial == unmatched
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  test("S9 → S7 integration: repaired lines parse as XML-TSV") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val docs = TenTen.repairDocs(Seq(("d1", Seq(left))).toDS)
    val sents = docs.flatMap(d =>
      XmlTsvParser.parseDoc(d, Seq("WORD", "POS", "LEMMA", "F1", "F2", "F3", "F4", "HEAD", "EDGE")))
      .collect()
    assert(sents.length == 2) // <s> is a breaking element
    assert(sents(0).triples.count(_.p == "conll:WORD") == 2)
    assert(sents(1).triples.count(_.p == "conll:WORD") == 1)
    assert(sents(0).triples.exists(t => t.p == "conll:WORD" && t.o == "The"))
    // HEAD column resolves to token URIs through the shared CoNLL core
    assert(sents(0).triples.exists(t => t.p == "conll:HEAD" && t.o == ":s1_2"))
  }
}
