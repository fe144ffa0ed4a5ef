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
    v.replace("&", "&amp;").replace("\"", "&quot;").replace("\\", "\\\\")

  def isEmptyCell(v: String): Boolean = EmptyCell.matcher(v).matches()

  /** Parse one document's span sequence into sentences.
    *
    * @param cols declared column labels (positional); overridden by a
    *             `# global.columns = ...` comment if present.
    */
  def parseDoc(doc: InputDoc, cols: Seq[String]): Seq[Sentence] = {
    var columns: Vector[String] = cols.toVector
    val sentences = mutable.ArrayBuffer[Sentence]()

    var sent = 1L
    var tok = 0
    var rows = mutable.ArrayBuffer[(Int, String, Array[String])]() // (tok, idString, cells)
    var comments = mutable.ArrayBuffer[String]()

    def headCols(cs: Vector[String]): Seq[Int] =
      cs.indices.filter(i => cs(i).toUpperCase.matches("^HEAD[0-9]*$"))

    def flush(): Unit = {
      if (rows.nonEmpty) {
        val cs = columns
        val hasHead = headCols(cs).nonEmpty
        val hasArgs = cs.nonEmpty && cs.last.toLowerCase.matches(".*args$")
        // predicate-marker column: ARGs label with the whole -ARGs suffix
        // stripped (CoNLL2RDF.java:148); subPropertyOf target keeps -ARG,
        // dropping only the trailing s (CoNLL2RDF.java:146)
        val predColName = if (hasArgs) cs.last.replaceAll(ArgsSuffix, "") else ""
        val argBase =
          if (hasArgs) cs.last.replaceFirst("([\\-_]*[Aa][rR][gG])[sS]$", "$1") else ""
        val predCol = if (hasArgs) cs.indexOf(predColName) else -1

        val g = mutable.LinkedHashSet[Triple]()
        val sentNode = s":s${sent}_0"
        if (sent > 1L)
          g += Triple(s":s${sent - 1}_0", "nif:nextSentence", sentNode, oUri = true)
        g += Triple(sentNode, "rdf:type", "nif:Sentence", oUri = true)

        // SRL: the i-th ARGs column refers to the i-th predicate-marked row.
        val predicates = mutable.ArrayBuffer[String]()
        val argTriples = mutable.ArrayBuffer[(Int, String, String)]() // (predIdx, role, wordUri)
        val argProps = mutable.LinkedHashSet[String]()

        var prevUri: String = null
        for (((t, idString, cells), _) <- rows.zipWithIndex) {
          val uri = s":s${sent}_$idString"
          if (prevUri != null)
            g += Triple(prevUri, "nif:nextWord", uri, oUri = true)
          prevUri = uri
          g += Triple(uri, "rdf:type", "nif:Word", oUri = true)
          var i = 0
          while (i < cells.length) {
            val v = cells(i).trim
            if (!isEmptyCell(v)) {
              if (i < cs.length && cs(i).toUpperCase.matches("^HEAD[0-9]*$")) {
                g += Triple(uri, s"conll:${cs(i)}", s":s${sent}_$v", oUri = true)
              } else if (i < cs.length - 1 || (i == cs.length - 1 && !hasArgs)) {
                if (i < cs.length)
                  g += Triple(uri, s"conll:${cs(i)}", escapeLit(v), oUri = false)
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
          val _ = t
        }
        for ((pi, role, wordUri) <- argTriples; if pi >= 0 && pi < predicates.length)
          g += Triple(predicates(pi), s"conll:$role", wordUri, oUri = true)
        for (role <- argProps)
          g += Triple(s"conll:$role", "rdfs:subPropertyOf", s"conll:$argBase", oUri = true)

        if (comments.nonEmpty)
          g += Triple(sentNode, "rdfs:comment", escapeLit(comments.mkString("\n")), oUri = false)

        sentences += Sentence(doc.doc_id, sent, comments.toSeq, g.toSeq)
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
          } else {
            comments += span.text.trim.replaceFirst("^#\\s?", "")
          }
        case "markup" =>
          val stripped = SPMarkup.matcher(span.text).replaceAll("").trim
          if (stripped.isEmpty) flush() // <s>/<p> double as sentence breaks
          else if (OtherMarkup.matcher(stripped).matches()) () // skip other XML
          else () // markup with trailing text: out of scope for core TSV path
        case _ => // "token"
          var line = SPMarkup.matcher(span.text).replaceAll("").trim
          if (OtherMarkup.matcher(line).matches()) ()
          else if (line.isEmpty) flush()
          else {
            line = line.replaceFirst("#.*", "").trim
            if (line.nonEmpty) {
              tok += 1
              val cells = line.split("\t", -1)
              val idCol = columns.indexWhere(_.equalsIgnoreCase("ID"))
              val idString =
                if (idCol >= 0) {
                  if (idCol >= cells.length)
                    throw new ArrayIndexOutOfBoundsException(
                      "if defined as label, the ID column is obligatory")
                  val v = cells(idCol).trim
                  if (!v.matches("-?[0-9]+"))
                    throw new NumberFormatException("the ID column must contain integers, only")
                  v
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
