package graft.conll

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck properties from FIXTURES.md §3 / SURVEY §5:
  * span-sequence preservation, determinism, fixpoint termination ≤
  * MAXITERATE, insert idempotence (set semantics).
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 40): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  private val genDocId: Gen[Long] = Gen.choose(0L, 100000L)

  test("property: parse is deterministic and pure (same doc → same triples)") {
    check(Prop.forAll(genDocId) { id =>
      val d = DocGen.genDoc(42L, id)
      SpanParser.parseDoc(d, DocGen.columns) == SpanParser.parseDoc(d, DocGen.columns)
    })
  }

  test("property: parsing preserves the span sequence (kind,text,media_ref,order)") {
    check(Prop.forAll(genDocId) { id =>
      val d = DocGen.genDoc(42L, id)
      val before = d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))
      SpanParser.parseDoc(d, DocGen.columns)
      before == d.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))
    })
  }

  test("property: every cascade converges within MAXITERATE and is idempotent at fixpoint") {
    val cascades = Pipeline.analyzeCascade ++ Pipeline.linkCascade ++ Pipeline.parseCascade
    check(Prop.forAll(genDocId) { id =>
      SpanParser.parseDoc(DocGen.genDoc(42L, id), DocGen.columns).forall { sentence =>
        val g = SentGraph(sentence)
        cascades.forall { case (script, _) =>
          val it = script.run(g, Rules.MAXITERATE)
          val v = g.version
          script.runOnce(g)
          it < Rules.MAXITERATE && g.version == v
        }
      }
    }, n = 25)
  }

  test("property: duplicate insert and absent delete are no-ops (set semantics)") {
    check(Prop.forAll(genDocId) { id =>
      SpanParser.parseDoc(DocGen.genDoc(42L, id), DocGen.columns).take(2).forall { s =>
        val g = SentGraph(s)
        val n = g.size
        val noDup = s.triples.forall(t => !g.add(t))
        noDup && g.size == n &&
          !g.remove(Triple(":nope", "conll:NOPE", "x", false)) && g.size == n
      }
    })
  }

  test("property: SentGraph round-trips the inserted triple set exactly") {
    check(Prop.forAll(genDocId) { id =>
      SpanParser.parseDoc(DocGen.genDoc(42L, id), DocGen.columns).take(2).forall { s =>
        val g = SentGraph(s)
        g.all.toSet == s.triples.toSet && g.size == s.triples.distinct.size
      }
    })
  }

  test("property: parse → toConllTsv round-trips arbitrary safe cell matrices") {
    // safe alphabet: no tabs/newlines/'#'/escaping-relevant chars, cells
    // never matching the empty-cell pattern — the exact-identity domain
    // (escaped/empty variants are covered by SerializersSpec and
    // kg_tsv_fidelity)
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val genCell = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
      .suchThat(c => !SpanParser.isEmptyCell(c))
    val genRow = Gen.listOfN(3, genCell) // WORD, UPOS, EDGE
    val genSentence = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, genRow))
    val cols = Seq("ID", "WORD", "UPOS", "EDGE")
    check(Prop.forAll(genSentence) { rows =>
      val spans = rows.zipWithIndex.map { case (cells, i) =>
        Span("token", s"${i + 1}\t${cells.mkString("\t")}", "", i)
      }
      val sents = SpanParser.parseDoc(InputDoc("dp", spans), cols)
      val t = spark.createDataset(sents.flatMap(s =>
        s.triples.map(tr => TripleRow(s.docId, s.sent, tr.s, tr.p, tr.o, tr.oUri)))).toDF()
      val out = Serializers.toConllTsv(t, cols)
        .orderBy($"tok")
        .select($"ID", $"WORD", $"UPOS", $"EDGE")
        .as[(String, String, String, String)].collect()
      out.toList == rows.zipWithIndex.map { case (cells, i) =>
        ((i + 1).toString, cells(0), cells(1), cells(2))
      }
    }, n = 15)
  }

  test("property: lexiconumeric key is order-isomorphic to numeric token order") {
    val genTok = Gen.choose(0, 5000)
    check(Prop.forAll(genTok, genTok) { (a, b) =>
      val ka = graft.functions.Lexiconumeric.keyString(s":s1_$a")
      val kb = graft.functions.Lexiconumeric.keyString(s":s1_$b")
      (a == b) || ((a < b) == (ka < kb))
    }, n = 200)
  }
}
