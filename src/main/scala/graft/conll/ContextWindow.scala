package graft.conll

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bounded sentence-context windows (SURVEY §1.4, §2.3 U14): the
  * reference's lookback/lookahead named graphs
  * (CoNLLRDFUpdater.java:131-132,536-561,844-894) give each sentence's
  * update scripts read access to the previous/next N sentences.
  *
  * Spark-native: a window over the sentence ordinal per document —
  * `rowsBetween(-lookback, -1)` / `(1, lookahead)` with collect_list —
  * ONE shuffle by (docId), no streaming state store. At 100 TB documents
  * are the partition unit, so the shuffle is by the natural key and
  * bounded by per-doc sentence counts.
  */
object ContextWindow {

  final case class SentenceWithContext(
      sentence: Sentence,
      lookback: Seq[Sentence],
      lookahead: Seq[Sentence])

  def attach(
      sents: Dataset[Sentence],
      lookback: Int,
      lookahead: Int
  ): Dataset[SentenceWithContext] = {
    import sents.sparkSession.implicits._
    val w = Window.partitionBy($"docId").orderBy($"sent")
    sents
      .withColumn("lb", collect_list(struct($"docId", $"sent", $"comments", $"triples"))
        .over(w.rowsBetween(-lookback.toLong, -1)))
      .withColumn("la", collect_list(struct($"docId", $"sent", $"comments", $"triples"))
        .over(w.rowsBetween(1, lookahead.toLong)))
      .select(
        struct($"docId", $"sent", $"comments", $"triples").as("sentence"),
        $"lb".as("lookback"), $"la".as("lookahead"))
      .as[SentenceWithContext]
  }

  /** Run a context-aware rewrite: the rule sees (sentence, lookback,
    * lookahead) and returns the rewritten sentence. Narrow after the one
    * context shuffle. */
  def rewriteWithContext(
      ctx: Dataset[SentenceWithContext]
  )(rule: SentenceWithContext => Sentence): Dataset[Sentence] = {
    import ctx.sparkSession.implicits._
    ctx.map(rule)
  }

  /** Demonstration cross-sentence rule (the reference exposes lookback/
    * lookahead graphs to user scripts, README.md:160-166, but bundles no
    * script that uses them): a sentence-initial pronoun is annotated with
    * the nearest preceding sentence's subject surface form as
    * `conll:ANTECEDENT` — the lookback graph read is the point, not the
    * linguistics. */
  def pronounAntecedent(c: SentenceWithContext): Sentence = {
    val g = SentGraph(c.sentence)
    val firstWord = g.words.headOption
    val isPronoun = firstWord.exists(w =>
      g.objects(w, "conll:UPOS").contains("PRON"))
    if (isPronoun) {
      val antecedent = c.lookback.reverseIterator.flatMap { prev =>
        val pg = SentGraph(prev)
        pg.pairs("conll:EDGE").collect {
          case (w, "nsubj", _) => pg.objects(w, "conll:WORD").headOption
        }.flatten.lastOption
      }.find(_ => true)
      antecedent.foreach(a =>
        g.add(Triple(firstWord.get, "conll:ANTECEDENT", a, oUri = false)))
    }
    SentGraph.toSentence(c.sentence.docId, c.sentence.sent, c.sentence.comments, g)
  }

  /** Lookahead mirror of [[pronounAntecedent]] (the reference exposes BOTH
    * window graphs — CoNLLRDFUpdater.java:131-132): a sentence-initial
    * pronoun is annotated with the last nsubj surface of the NEAREST
    * following sentence (within the window) that has one, as
    * `conll:POSTCEDENT`. */
  def pronounCataphor(c: SentenceWithContext): Sentence = {
    val g = SentGraph(c.sentence)
    val firstWord = g.words.headOption
    val isPronoun = firstWord.exists(w =>
      g.objects(w, "conll:UPOS").contains("PRON"))
    if (isPronoun) {
      val postcedent = c.lookahead.iterator.flatMap { nxt =>
        val pg = SentGraph(nxt)
        pg.pairs("conll:EDGE").collect {
          case (w, "nsubj", _) => pg.objects(w, "conll:WORD").headOption
        }.flatten.lastOption
      }.find(_ => true)
      postcedent.foreach(a =>
        g.add(Triple(firstWord.get, "conll:POSTCEDENT", a, oUri = false)))
    }
    SentGraph.toSentence(c.sentence.docId, c.sentence.sent, c.sentence.comments, g)
  }
}
