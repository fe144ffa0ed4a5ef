package graft.conll

import scala.collection.mutable
import java.util.regex.Pattern

/** Span-sequence → per-sentence triple graphs, reproducing the reference's
  * TSV→RDF semantics (SURVEY §2.1 S1/S2/S5):
  *
  *  - empty-cell pattern `^(O|-|--|_|__)?$` skips the cell entirely
  *    (Format2RDF.java:61);
  *  - `ID` column overrides the positional token id and must be an integer
  *    (CoNLL2RDF.java:112-117);
  *  - `HEAD[n]` columns emit object properties `conll:HEADn :s{sent}_{v}`,
  *    `0` resolving to the sentence node (CoNLL2RDF.java:130-131);
  *  - if no HEAD column is declared, every token depends on the sentence
  *    node (CoNLL2RDF.java:154-155);
  *  - literal escaping: `&`→`&amp;`, `"`→`&quot;`, `\`→`\\`
  *    (CoNLL2RDF.java:138);
  *  - trailing `*-ARGs` columns emit SRL role triples `<pred_i> conll:<role>
  *    <word>` plus `rdfs:subPropertyOf` axioms (CoNLL2RDF.java:139-150);
  *  - sentence chaining `nif:nextSentence`, token chaining `nif:nextWord`
  *    in file order (CoNLL2RDF.java:102-104,120-123);
  *  - full-line comments become `rdfs:comment` on the sentence node, joined
  *    by newline (CoNLLStreamExtractor.java:153-165); the CoNLL-U Plus
  *    header `# global.columns = ...` overrides the column schema
  *    (CoNLLStreamExtractor.java:174-218);
  *  - `<s>`/`<p>` markup acts as a sentence break; other single-line XML
  *    markup is skipped (CoNLL2RDF.java:74-75).
  *
  * Parsing is per-document and runs inside Dataset[InputDoc].flatMap —
  * sequential within a doc (the format is inherently stateful), parallel
  * across docs.
  */
object SpanParser {

  private val EmptyCell = Pattern.compile("^(O|-|--|_|__)?$")
  private val GlobalColumns = Pattern.compile("^#\\s*global\\.columns\\s*=\\s*(.*)$")
  private val SPMarkup = Pattern.compile("<[\\/]?[psPS]( [^>]*>|>)")
  private val OtherMarkup = Pattern.compile("^<[^>]*>$")
  private val ArgsSuffix = "[\\-_]*[Aa][rR][gG][sS]$"

  def escapeLit(v: String): String =
    if (v.indexOf('&') < 0 && v.indexOf('"') < 0 && v.indexOf('\\') < 0) v
    else v.replace("&", "&amp;").replace("\"", "&quot;").replace("\\", "\\\\")

  /** `^(O|-|--|_|__)?$` without the regex engine (hot path). */
  def isEmptyCell(v: String): Boolean = v.length match {
    case 0 => true
    case 1 => v == "O" || v == "-" || v == "_"
    case 2 => v == "--" || v == "__"
    case _ => false
  }

  /** Parse one document's span sequence into sentences.
    *
    * @param cols declared column labels (positional); overridden by a
    *             `# global.columns = ...` comment if present.
    */
  /** Per-schema metadata, computed once per columns vector (hot path:
    * avoids regex + string building per cell). */
  private[conll] final class SchemaMeta(val cs: Vector[String]) {
    val isHead: Array[Boolean] = cs.map(_.toUpperCase.matches("^HEAD[0-9]*$")).toArray
    val colPred: Array[String] = cs.map(c => s"conll:$c").toArray
    val hasHead: Boolean = isHead.exists(identity)
    val hasArgs: Boolean = cs.nonEmpty && cs.last.toLowerCase.matches(".*args$")
    // predicate-marker column: ARGs label with the whole -ARGs suffix
    // stripped (CoNLL2RDF.java:148); subPropertyOf target keeps -ARG,
    // dropping only the trailing s (CoNLL2RDF.java:146)
    val predColName: String = if (hasArgs) cs.last.replaceAll(ArgsSuffix, "") else ""
    val argBase: String =
      if (hasArgs) cs.last.replaceFirst("([\\-_]*[Aa][rR][gG])[sS]$", "$1") else ""
    val predCol: Int = if (hasArgs) cs.indexOf(predColName) else -1
    val idCol: Int = cs.indexWhere(_.equalsIgnoreCase("ID"))
  }

  /** One sentence's token rows → triple graph (the S2 core, shared with the
    * XML-TSV and bracketing sources). */
  private[conll] def buildSentence(
      docId: String,
      sent: Long,
      rows: Seq[(Int, String, Array[String])],
      comments: Seq[String],
      meta: SchemaMeta,
      linkPrev: Boolean
  ): Sentence = {
    val cs = meta.cs
    val hasHead = meta.hasHead
    val hasArgs = meta.hasArgs
    val argBase = meta.argBase
    val predCol = meta.predCol

    val g = mutable.LinkedHashSet[Triple]()
    val sentNode = s":s${sent}_0"
    if (linkPrev)
      g += Triple(s":s${sent - 1}_0", "nif:nextSentence", sentNode, oUri = true)
    g += Triple(sentNode, "rdf:type", "nif:Sentence", oUri = true)

    // SRL: the i-th ARGs column refers to the i-th predicate-marked row.
    val predicates = mutable.ArrayBuffer[String]()
    val argTriples = mutable.ArrayBuffer[(Int, String, String)]() // (predIdx, role, wordUri)
    val argProps = mutable.LinkedHashSet[String]()

    var prevUri: String = null
    for ((_, idString, cells) <- rows) {
      val uri = s":s${sent}_$idString"
      if (prevUri != null)
        g += Triple(prevUri, "nif:nextWord", uri, oUri = true)
      prevUri = uri
      g += Triple(uri, "rdf:type", "nif:Word", oUri = true)
      var i = 0
      while (i < cells.length) {
        val v = cells(i).trim
        if (!isEmptyCell(v)) {
          if (i < cs.length && meta.isHead(i)) {
            g += Triple(uri, meta.colPred(i), s":s${sent}_$v", oUri = true)
          } else if (i < cs.length - 1 || (i == cs.length - 1 && !hasArgs)) {
            if (i < cs.length)
              g += Triple(uri, meta.colPred(i), escapeLit(v), oUri = false)
          } else if (hasArgs) {
            // i-th physical ARGs column (may overflow declared schema)
            argTriples += ((i + 1 - cs.length, v, uri))
            argProps += v
          }
          if (predCol >= 0 && i == predCol) predicates += uri
        }
        i += 1
      }
      if (!hasHead)
        g += Triple(uri, "conll:HEAD", sentNode, oUri = true)
    }
    for ((pi, role, wordUri) <- argTriples; if pi >= 0 && pi < predicates.length)
      g += Triple(predicates(pi), s"conll:$role", wordUri, oUri = true)
    for (role <- argProps)
      g += Triple(s"conll:$role", "rdfs:subPropertyOf", s"conll:$argBase", oUri = true)

    if (comments.nonEmpty)
      g += Triple(sentNode, "rdfs:comment", escapeLit(comments.mkString("\n")), oUri = false)

    Sentence(docId, sent, comments, g.toSeq)
  }

  def parseDoc(doc: InputDoc, cols: Seq[String]): Seq[Sentence] = {
    var columns: Vector[String] = cols.toVector
    var meta = new SchemaMeta(columns)
    val sentences = mutable.ArrayBuffer[Sentence]()

    var sent = 1L
    var tok = 0
    var rows = mutable.ArrayBuffer[(Int, String, Array[String])]() // (tok, idString, cells)
    var comments = mutable.ArrayBuffer[String]()

    def flush(): Unit = {
      if (rows.nonEmpty) {
        sentences += buildSentence(doc.doc_id, sent, rows.toSeq, comments.toSeq, meta,
          linkPrev = sent > 1L)
        sent += 1
        tok = 0
        rows = mutable.ArrayBuffer()
        comments = mutable.ArrayBuffer()
      }
    }

    for (span <- doc.spans.sortBy(_.offset)) {
      span.kind match {
        case "media" => // opaque payload; preserved upstream, ignored here
        case "sentence_break" => flush()
        case "comment" =>
          val m = GlobalColumns.matcher(span.text.trim)
          if (m.matches()) {
            columns = m.group(1).trim.split("\\s+").toVector
            meta = new SchemaMeta(columns)
            // the reference PEEKS for global.columns and resets the stream
            // (CoNLLStreamExtractor.findFieldsFromComments), so the line
            // also flows through as an ordinary comment → rdfs:comment;
            // the formatter later re-discovers columns from it
            // (CoNLLRDFFormatter.findColumnNamesInRDFBuffer)
            comments += span.text.trim.replaceFirst("^#\\s?", "")
          } else {
            comments += span.text.trim.replaceFirst("^#\\s?", "")
          }
        case "markup" =>
          val stripped = SPMarkup.matcher(span.text).replaceAll("").trim
          if (stripped.isEmpty) flush() // <s>/<p> double as sentence breaks
          else if (OtherMarkup.matcher(stripped).matches()) () // skip other XML
          else () // markup with trailing text: out of scope for core TSV path
        case _ => // "token"
          // fast path: lines without '<' or '#' skip the regex machinery
          val raw = span.text
          var line =
            if (raw.indexOf('<') >= 0) SPMarkup.matcher(raw).replaceAll("").trim
            else raw.trim
          if (raw.indexOf('<') >= 0 && OtherMarkup.matcher(line).matches()) ()
          else if (line.isEmpty) flush()
          else {
            if (line.indexOf('#') >= 0) line = line.replaceFirst("#.*", "").trim
            if (line.nonEmpty) {
              tok += 1
              val cells = line.split("\t", -1)
              val idCol = meta.idCol
              // NOTE: the reference declares "ID must contain integers" but
              // its check is dead code (the catch at CoNLL2RDF.java:116 can
              // never fire — nothing parses the int); IDs pass through
              // verbatim, e.g. CoNLL-U ranges "1-2" mint :s1_1-2. We match
              // the actual behavior, only failing on a missing cell.
              val idString =
                if (idCol >= 0) {
                  if (idCol >= cells.length)
                    throw new ArrayIndexOutOfBoundsException(
                      "if defined as label, the ID column is obligatory")
                  cells(idCol).trim
                } else tok.toString
              rows += ((tok, idString, cells))
            }
          }
      }
    }
    flush()
    sentences.toSeq
  }
}
