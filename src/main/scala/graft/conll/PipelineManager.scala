package graft.conll

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._
import Rules.Script

/** K7: JSON-configured pipeline composition (the reference's
  * CoNLLRDFManager, CoNLLRDFManager.java:150-201) — component stacks as a
  * JSON document, mirroring examples/analyze-ud.json / parse-ud.json:
  *
  * {
  *   "input":   { "docs": 1000 } | { "parquet": "/path" },
  *   "pipeline": [
  *     { "class": "CoNLLStreamExtractor", "columns": ["ID","WORD",...] },
  *     { "class": "CoNLLRDFUpdater",
  *       "updates": [ {"path": "remove-IGNORE", "iter": "1"},
  *                    {"path": "REDUCE-english-1", "iter": "5"} ] },
  *     { "class": "CoNLLRDFFormatter", "mode": "triples" | "conll",
  *       "columns": [...] }
  *   ]
  * }
  *
  * Update scripts are referenced by registry name (the compiled
  * equivalents of examples/sparql/), with the reference's `{n}` iteration
  * suffix carried by "iter". JSON parsing uses Spark's bundled Jackson —
  * no extra dependency.
  */
object PipelineManager {

  /** Registry of compiled scripts by their reference script name. */
  val scriptRegistry: Map[String, Script] = {
    val links = Ontology.pennLinks(Ontology.miniOlia, Ontology.GRAPH_PENN)
    val t2c = Ontology.tagToConcepts(Ontology.miniOlia, Ontology.GRAPH_UD, Ontology.keepOlia)
    val supUd = Ontology.superClosure(Ontology.miniOlia, Ontology.GRAPH_UD, Ontology.keepOlia)
    val supOlia = Ontology.superClosure(Ontology.miniOlia, Ontology.GRAPH_OLIA, Ontology.keepOlia)
    Seq(
      AnalyzeScripts.removeId,
      AnalyzeScripts.removeIgnore,
      AnalyzeScripts.uposToPossynt,
      AnalyzeScripts.edgeToPossynt,
      AnalyzeScripts.consolidatePossynt,
      LinkScripts.linkUposSimple(t2c),
      LinkScripts.linkPennPosFull(links),
      LinkScripts.inferOliaConcepts(supOlia),
      LinkScripts.removeAnnotationModel(),
      ParseScripts.initializeShift,
      ParseScripts.reduceEnglish1,
      ParseScripts.reduceEnglish2,
      ParseScripts.reduceEnglish3,
      ParseScripts.reduceEnglish4,
      ParseScripts.reduceToHead,
      TreesScripts.xAttributes2value,
      TreesScripts.emptyNode2Word,
      TreesScripts.tree2bracket
    ).map(s => s.name -> s).toMap ++ Map(
      "infer-olia-concepts-ud" -> LinkScripts.inferOliaConcepts(supUd).copy(name = "infer-olia-concepts-ud")
    )
  }

  final case class Config(
      input: Either[Long, String], // docs count | parquet path
      columns: Seq[String],
      updates: Seq[(Script, Int)],
      format: String,              // triples | conll | ntriples
      formatColumns: Seq[String])

  def parseConfig(json: String): Config = {
    val root: JsonNode = new ObjectMapper().readTree(json)
    val input = Option(root.get("input")) match {
      case Some(i) if i.has("parquet") => Right(i.get("parquet").asText())
      case Some(i) if i.has("docs") => Left(i.get("docs").asLong())
      case _ => Left(1000L)
    }
    var columns: Seq[String] = DocGen.columns
    var updates: Seq[(Script, Int)] = Seq.empty
    var format = "triples"
    var formatColumns: Seq[String] = Seq.empty
    for (stage <- root.get("pipeline").elements().asScala) {
      stage.get("class").asText() match {
        case "CoNLLStreamExtractor" =>
          if (stage.has("columns"))
            columns = stage.get("columns").elements().asScala.map(_.asText()).toSeq
        case "CoNLLRDFUpdater" =>
          val SuffixRe = "\\{([0-9]+|u|\\*)\\}$".r
          updates = stage.get("updates").elements().asScala.map { u =>
            val rawPath = u.get("path").asText()
            // reference `script.sparql{n}` / `{u}` / `{*}` iteration suffix
            // (CoNLLRDFCommandLine.parseUpdate:266-274: no suffix → 1,
            // "u" → "*" → run to fixpoint capped at MAXITERATE)
            val suffixIter = SuffixRe.findFirstMatchIn(rawPath).map(_.group(1))
            val name = SuffixRe.replaceFirstIn(rawPath, "")
              .replaceAll("^.*/", "").replaceAll("\\.sparql$", "")
            val iterStr =
              if (u.has("iter")) u.get("iter").asText()
              else suffixIter.getOrElse("1")
            val iter = iterStr match {
              case "u" | "*" => Rules.MAXITERATE
              case n => n.toInt
            }
            val script = scriptRegistry.getOrElse(name,
              throw new IllegalArgumentException(s"unknown update script: $name"))
            script -> iter
          }.toSeq
        case "CoNLLRDFFormatter" =>
          if (stage.has("mode")) format = stage.get("mode").asText().toLowerCase
          if (stage.has("columns"))
            formatColumns = stage.get("columns").elements().asScala.map(_.asText()).toSeq
        case other =>
          throw new IllegalArgumentException(s"unknown pipeline class: $other")
      }
    }
    Config(input, columns, updates, format, formatColumns)
  }

  /** Build and run the configured pipeline. */
  def run(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    val cfg = parseConfig(json)
    val raw: Dataset[InputDoc] = cfg.input match {
      case Left(n) => DocGen.docs(spark, n)
      case Right(path) => spark.read.parquet(path).as[InputDoc]
    }
    // U18: external input is UTF-8-validated; rejects are counted in the
    // named accumulator (surfaces in the Spark UI / status API). The
    // manager mirrors the reference CLI, which aborts on malformed bytes —
    // strict mode also drops docs whose upstream decode left U+FFFD.
    val docs = Pipeline.validateUtf8(raw,
      spark.sparkContext.longAccumulator("utf8_rejected"),
      rejectReplacementChar = true)
    cfg.format match {
      case "conll" => Serializers.toConllTsv(
        Pipeline.rewriteTriples(Pipeline.parse(docs, cfg.columns), cfg.updates).toDF(),
        if (cfg.formatColumns.nonEmpty) cfg.formatColumns else cfg.columns)
      case "ntriples" => Serializers.toSortedNTriples(
        Pipeline.rewriteTriples(Pipeline.parse(docs, cfg.columns), cfg.updates))
        .toDF("line")
      // K5/K6 diagnostics: per-sentence renderers, narrow map
      case "dot" | "grammar" | "debug" | "semantics" =>
        val sents = Pipeline.rewrite(Pipeline.parse(docs, cfg.columns), cfg.updates)
        val outCols =
          if (cfg.formatColumns.nonEmpty) cfg.formatColumns else cfg.columns
        cfg.format match {
          case "dot" =>
            sents.map(s => (s.docId, s.sent, Viz.toDot(s)))
              .toDF("doc_id", "sent", "dot")
          case "grammar" =>
            sents.map(s => (s.docId, s.sent, Viz.asciiTree(s)))
              .toDF("doc_id", "sent", "grammar")
          case "semantics" =>
            sents.map(s => (s.docId, s.sent, Viz.termGraph(s)))
              .toDF("doc_id", "sent", "semantics")
          case _ =>
            sents.map(s => (s.docId, s.sent,
                Viz.colorTtl(Serializers.toCanonicalTtl(s, outCols))))
              .toDF("doc_id", "sent", "ttl_ansi")
        }
      case _ =>
        Pipeline.rewriteTriples(Pipeline.parse(docs, cfg.columns), cfg.updates).toDF()
    }
  }
}
