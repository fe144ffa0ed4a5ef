package graft.conll

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class PipelineManagerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val analyzeJson =
    """{
      "input": { "docs": 20 },
      "pipeline": [
        { "class": "CoNLLStreamExtractor",
          "columns": ["ID","WORD","LEMMA","UPOS","POS","FEAT","HEAD","EDGE","DEPS","MISC"] },
        { "class": "CoNLLRDFUpdater", "updates": [
            {"path": "examples/sparql/remove-IGNORE.sparql", "iter": "1"},
            {"path": "examples/sparql/analyze/UPOS-to-POSsynt.sparql", "iter": "1"},
            {"path": "examples/sparql/analyze/EDGE-to-POSsynt.sparql", "iter": "1"},
            {"path": "examples/sparql/analyze/consolidate-POSsynt.sparql", "iter": "1"} ] },
        { "class": "CoNLLRDFFormatter", "mode": "triples" }
      ]
    }"""

  test("JSON config builds and runs the analyze pipeline (K7)") {
    import spark.implicits._
    val out = PipelineManager.run(spark, analyzeJson).cache()
    assert(out.count() > 0)
    assert(out.filter($"pred" === "conll:POSsynt_match").count() > 0)
    out.unpersist()
  }

  test("JSON config with conll formatter mode produces the TSV shape") {
    val json = analyzeJson.replace("\"mode\": \"triples\"",
      "\"mode\": \"conll\", \"columns\": [\"WORD\",\"UPOS\",\"POSsynt_match\"]")
    val out = PipelineManager.run(spark, json)
    assert(out.columns.toSet == Set("doc_id", "sent", "tok", "WORD", "UPOS", "POSsynt_match"))
    assert(out.count() > 0)
  }

  test("iter 'u' and the {u}/{n} path suffixes map to the fixpoint cap (U1)") {
    // "iter": "u" — the reference's run-to-fixpoint marker
    val cfgU = PipelineManager.parseConfig(
      """{"input":{"docs":1},"pipeline":[
        {"class":"CoNLLRDFUpdater","updates":[
          {"path":"sparql/parse/REDUCE-english-1.sparql","iter":"u"}]}]}""")
    assert(cfgU.updates.head._2 == Rules.MAXITERATE)
    // literal {u} suffix on the path, as the reference CLI writes it
    // (CoNLLRDFCommandLine.parseUpdate:266-274)
    val cfgSuffix = PipelineManager.parseConfig(
      """{"input":{"docs":1},"pipeline":[
        {"class":"CoNLLRDFUpdater","updates":[
          {"path":"sparql/parse/REDUCE-english-1.sparql{u}"}]}]}""")
    assert(cfgSuffix.updates.head._1.name == "REDUCE-english-1")
    assert(cfgSuffix.updates.head._2 == Rules.MAXITERATE)
    // {n} suffix carries the count when no explicit iter is given
    val cfgN = PipelineManager.parseConfig(
      """{"input":{"docs":1},"pipeline":[
        {"class":"CoNLLRDFUpdater","updates":[
          {"path":"sparql/parse/REDUCE-english-1.sparql{3}"}]}]}""")
    assert(cfgN.updates.head._2 == 3)
  }

  test("iteration suffix {n} is honored; unknown scripts fail fast (U1)") {
    val cfg = PipelineManager.parseConfig(
      """{"input":{"docs":1},"pipeline":[
        {"class":"CoNLLRDFUpdater","updates":[
          {"path":"sparql/parse/REDUCE-english-1.sparql","iter":"5"}]}]}""")
    assert(cfg.updates.head._1.name == "REDUCE-english-1")
    assert(cfg.updates.head._2 == 5)
    assertThrows[IllegalArgumentException] {
      PipelineManager.parseConfig(
        """{"input":{"docs":1},"pipeline":[
          {"class":"CoNLLRDFUpdater","updates":[{"path":"no-such.sparql"}]}]}""")
    }
  }
}
