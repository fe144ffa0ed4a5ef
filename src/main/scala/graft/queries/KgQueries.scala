package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.conll._

/** Full-fidelity KG pipeline entries (not SQL-expressible → rows-only
  * driver checks; correctness is covered by the ScalaTest golden suites
  * on hand-derived reference semantics).
  *
  * Input is the deterministic span-table generator (BASELINE.json
  * input_hint shape); document count scales with the sf directory so
  * bench runs grow with scale factor.
  */
object KgQueries {

  def nDocsFor(dir: String): Long = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.001)
    math.max((sf * 100000).toLong, 100L)
  }

  private def docs(s: SparkSession, dir: String) = DocGen.docs(s, nDocsFor(dir))

  val all: Seq[Q] = Seq(
    Q(
      // analyze-ud cascade: parse → remove-IGNORE → UPOS/EDGE-to-POSsynt →
      // consolidate → triples
      "kg_pipeline_analyze",
      (s, dir) => Pipeline.triples(
        Pipeline.rewrite(Pipeline.parse(docs(s, dir), DocGen.columns),
          Pipeline.analyzeCascade)).toDF,
      None
    ),
    Q(
      // parse-ud cascade: penn link → SR-parser generations → REDUCE-to-HEAD
      "kg_pipeline_parse",
      (s, dir) => Pipeline.triples(
        Pipeline.rewrite(Pipeline.parse(docs(s, dir), DocGen.columns),
          Pipeline.parseCascade)).toDF,
      None
    ),
    Q(
      // link-ud cascade + gazetteer entity links + CC canonicalization
      "kg_pipeline_link",
      (s, dir) => {
        import s.implicits._
        val t = Pipeline.triples(
          Pipeline.rewrite(Pipeline.parse(docs(s, dir), DocGen.columns),
            Pipeline.linkCascade)).toDF
        val vocab = t.filter($"pred" === "conll:WORD").select($"obj".as("word"))
        val gaz = EntityLinker.gazetteerFromVocab(vocab)
        t.unionByName(EntityLinker.linkBroadcast(t, gaz))
      },
      None
    ),
    Q(
      // K2 sink: CoNLL TSV reconstruction from triples
      "kg_conll_export",
      (s, dir) => {
        val t = Pipeline.triples(Pipeline.parse(docs(s, dir), DocGen.columns)).toDF
        Serializers.toConllTsv(t, DocGen.columns)
      },
      None
    ),
    Q(
      // K4 sink: sorted N-Triples diff-oracle lines
      "kg_sorted_ntriples",
      (s, dir) => {
        val t = Pipeline.triples(Pipeline.parse(docs(s, dir), DocGen.columns))
        Serializers.toSortedNTriples(t).toDF("line")
      },
      None
    ),
    Q(
      // K3: eval-POSsynt SELECT over the analyze cascade output
      "kg_eval_possynt",
      (s, dir) => {
        val t = Pipeline.triples(
          Pipeline.rewrite(Pipeline.parse(docs(s, dir), DocGen.columns),
            Pipeline.analyzeCascade)).toDF
        Serializers.evalPossyntSelect(t)
      },
      None
    ),
    Q(
      // multimodal: media table → batched stub decode → typed metadata
      "mm_media_meta",
      (s, dir) =>
        graft.functions.Multimodal.extractMeta(
          graft.functions.Multimodal.mediaTable(docs(s, dir))).toDF,
      None
    ),
    Q(
      // multimodal: frame sampling + duplicate-frame buckets
      "mm_frame_dups",
      (s, dir) =>
        graft.functions.Multimodal.dupFrames(
          graft.functions.Multimodal.sampleFrames(
            graft.functions.Multimodal.mediaTable(docs(s, dir)))),
      None
    ),
    Q(
      // S3 ingest: canonical TTL documents re-ingested and rewritten —
      // the CoNLLRDFUpdater input mode (equivalence with the direct path
      // is asserted in TtlRoundtripSpec)
      "kg_ttl_ingest",
      (s, dir) => {
        import s.implicits._
        val parsed = Pipeline.parse(docs(s, dir), DocGen.columns)
        val ttlDocs = parsed.groupByKey(_.docId).mapGroups { (id, sents) =>
          (id, Serializers.toCanonicalTtlDocument(sents.toSeq, DocGen.columns, s"urn:graft:$id#"))
        }
        Pipeline.rewriteTriples(Pipeline.parseTtl(ttlDocs), Pipeline.analyzeCascade).toDF
      },
      None
    ),
    Q(
      // K2 text sink: per-document CoNLL text with global.columns header
      "kg_conll_text",
      (s, dir) => {
        val t = Pipeline.triples(Pipeline.parse(docs(s, dir), DocGen.columns)).toDF
        Serializers.toConllText(t, Seq("ID", "WORD", "UPOS", "HEAD", "EDGE"))
      },
      None
    ),
    Q(
      // S7: XML-TSV source → powla tree triples + xAttributes2value
      "kg_xmltsv_powla",
      (s, dir) => {
        import s.implicits._
        val d = DocGen.xmlDocs(s, nDocsFor(dir) / 4)
        val sents = d.flatMap(x => XmlTsvParser.parseDoc(x, Seq("WORD", "POS")))
        Pipeline.triples(Pipeline.rewrite(sents,
          Seq(TreesScripts.xAttributes2value -> 1))).toDF
      },
      None
    ),
    Q(
      // S8 + trees: brackets source → powla trees → emptyNode2Word →
      // tree2bracket roundtrip
      "kg_brackets_roundtrip",
      (s, dir) => {
        import s.implicits._
        val cols = Seq("WORD", "POS", "PARSE")
        val d = DocGen.bracketDocs(s, nDocsFor(dir) / 4)
        val sents = d.flatMap(x => BracketsParser.parseDoc(x, cols))
        Pipeline.triples(Pipeline.rewrite(sents,
          Seq(TreesScripts.tree2bracket -> 1))).toDF
      },
      None
    )
  )
}
