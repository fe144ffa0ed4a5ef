package graft.conll

import scala.collection.mutable

/** S10: the reference's SimpleLineBreakSplitter
  * (SimpleLineBreakSplitter.java:13-28) — a run of 2+ blank lines marks a
  * segment boundary; insert a `#newsegment` comment span so downstream
  * components see the boundary as sentence metadata. Pure per-doc span
  * transform (narrow). */
object SegmentSplitter {

  def insertNewSegmentComments(doc: InputDoc): InputDoc = {
    val out = mutable.ArrayBuffer[Span]()
    var blanks = 0
    var off = 0
    def push(kind: String, text: String, media: String): Unit = {
      out += Span(kind, text, media, off); off += 1
    }
    for (s <- doc.spans.sortBy(_.offset)) {
      val isBlank = s.kind == "sentence_break" ||
        (s.kind == "token" && s.text.trim.isEmpty)
      if (isBlank) {
        blanks += 1
        // collapse the run to one break + a #newsegment marker
        if (blanks == 1) push(s.kind, s.text, s.media_ref)
        else if (blanks == 2) push("comment", "#newsegment", "")
      } else {
        blanks = 0
        push(s.kind, s.text, s.media_ref)
      }
    }
    InputDoc(doc.doc_id, out.toSeq)
  }
}
