package graft.conll

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S4 bridge: raw CoNLL TSV text files → the span-table contract. The
  * reference consumes byte streams (gz handled by the shell); Spark's
  * text source handles compression codecs natively, so `.conllu` /
  * `.conllu.gz` paths/globs work as-is.
  *
  * One file = one document (`wholetext`): right for corpus files up to
  * executor-memory size. A 100 TB ingest pre-splits giant files into the
  * span table by sentence boundaries offline — this helper is the
  * migration on-ramp for existing corpora, not the bulk path (the bulk
  * path IS the span table).
  */
object TsvIngest {

  /** Classify raw lines exactly like the stream reader would: empty →
    * sentence_break, '#' → comment, single-line XML → markup, else
    * token. SpanParser re-applies the markup/comment semantics (this
    * classification only routes span kinds). */
  def toSpans(text: String): Seq[Span] =
    text.split("\n", -1).toSeq.zipWithIndex.map { case (line, i) =>
      val t = line.trim
      val kind =
        if (t.isEmpty) "sentence_break"
        else if (t.startsWith("#")) "comment"
        else if (t.startsWith("<") && t.endsWith(">")) "markup"
        else "token"
      Span(kind, line, "", i)
    }

  /** Read text files (path or glob; gz transparent) into InputDocs, one
    * per file, doc_id = the file name with the CoNLL-family extension and
    * any compression suffix stripped (corpus/file.conllu.gz → "corpus/
    * file"-less "file" — the id a downstream join or oracle sees should
    * not depend on how the corpus was compressed or suffixed on disk). */
  def readFiles(spark: SparkSession, path: String): Dataset[InputDoc] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(
        regexp_extract(input_file_name(),
          "([^/]+?)(\\.(conllu|conll|tsv))?(\\.gz)?$", 1).as("doc_id"),
        col("value"))
      .as[(String, String)]
      .map { case (name, text) => InputDoc(name, toSpans(text)) }
  }
}
