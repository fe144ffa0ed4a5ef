package graft.conll

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source
import java.io.FileInputStream
import java.util.zip.GZIPInputStream

/** S4 bridge: reading the reference's own bundled .conllu.gz through
  * Spark's text source must yield the identical parse as a direct
  * in-memory read. */
class TsvIngestSpec extends AnyFunSuite {

  private val corpus =
    "/root/reference/data/ud/UD_English-master/en-ud-dev.conllu.gz"
  private val cols =
    Seq("ID", "WORD", "LEMMA", "UPOS", "POS", "FEAT", "HEAD", "EDGE", "DEPS", "MISC")

  test("readFiles over the bundled en-ud-dev.conllu.gz == direct read") {
    val spark = graft.TestSpark.spark
    val docs = TsvIngest.readFiles(spark, corpus).collect()
    assert(docs.length == 1)
    // extension + compression suffix both stripped from the doc id
    assert(docs.head.doc_id == "en-ud-dev")

    val src = Source.fromInputStream(
      new GZIPInputStream(new FileInputStream(corpus)), "UTF-8")
    val text = try src.mkString finally src.close()

    // identical span classification and identical parse
    assert(docs.head.spans == TsvIngest.toSpans(text))
    val viaSpark = SpanParser.parseDoc(docs.head, cols)
    val direct = SpanParser.parseDoc(InputDoc("en-ud-dev", TsvIngest.toSpans(text)), cols)
    assert(viaSpark.length == direct.length)
    assert(viaSpark == direct)
    // the known corpus shape: ~2k sentences
    assert(viaSpark.length == 2002)
  }
}
