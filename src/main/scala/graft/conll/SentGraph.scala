package graft.conll

import scala.collection.mutable

/** Mutable per-sentence triple store with predicate indexes — the executor
  * state for one sentence's rewrite cascade.
  *
  * Semantics mirror a Jena Model under SPARQL Update
  * (reference: CoNLLRDFUpdater.executeUpdates, CoNLLRDFUpdater.java:284-398):
  *  - RDF set semantics: duplicate inserts are no-ops;
  *  - each update statement evaluates its WHERE against the pre-statement
  *    state (callers collect matches first, then apply — see Script);
  *  - change detection via a mutation counter (the reference uses a
  *    ChangedListener, CoNLLRDFUpdater.java:321-345).
  *
  * This is deliberately NOT a DataFrame: sentence graphs are tiny
  * (10²–10³ triples) and the bundled rules need per-sentence fixpoint
  * iteration with order-dependent NOT-EXISTS guards. Running those as
  * global DataFrame passes would cost (statements × iterations) shuffles
  * and change the convergence unit from sentence to corpus. Instead the
  * cascade runs inside Dataset[Sentence].map — embarrassingly parallel,
  * shuffle-free, and faithful to the reference's share-nothing workers
  * (SURVEY §2.3 U15, §4).
  */
final class SentGraph private (init: Iterable[Triple]) {

  private val triples = mutable.LinkedHashSet[Triple]()
  // predicate → (subject → objects); the rules' BGPs are all
  // predicate-restricted, so this is the only index needed.
  private val spo = mutable.HashMap[String, mutable.LinkedHashMap[String, mutable.LinkedHashSet[(String, Boolean)]]]()

  private var mutations: Long = 0L

  init.foreach(add)
  mutations = 0L

  def version: Long = mutations

  def add(t: Triple): Boolean = {
    val added = triples.add(t)
    if (added) {
      spo.getOrElseUpdate(t.p, mutable.LinkedHashMap())
        .getOrElseUpdate(t.s, mutable.LinkedHashSet())
        .add((t.o, t.oUri))
      mutations += 1
    }
    added
  }

  def remove(t: Triple): Boolean = {
    val removed = triples.remove(t)
    if (removed) {
      val bySubj = spo(t.p)
      val objs = bySubj(t.s)
      objs.remove((t.o, t.oUri))
      if (objs.isEmpty) bySubj.remove(t.s)
      if (bySubj.isEmpty) spo.remove(t.p)
      mutations += 1
    }
    removed
  }

  /** All (subject, object, objIsUri) for a predicate, insertion-ordered. */
  def pairs(p: String): Seq[(String, String, Boolean)] =
    spo.get(p) match {
      case Some(bySubj) =>
        bySubj.iterator.flatMap { case (s, os) => os.iterator.map { case (o, u) => (s, o, u) } }.toSeq
      case None => Seq.empty
    }

  /** Objects of (s, p). */
  def objects(s: String, p: String): Seq[String] =
    spo.get(p).flatMap(_.get(s)).map(_.iterator.map(_._1).toSeq).getOrElse(Seq.empty)

  /** Subjects with (p, o). */
  def subjects(p: String, o: String): Seq[String] =
    spo.get(p) match {
      case Some(bySubj) => bySubj.iterator.collect { case (s, os) if os.exists(_._1 == o) => s }.toSeq
      case None => Seq.empty
    }

  def has(s: String, p: String): Boolean =
    spo.get(p).exists(_.contains(s))

  def has(s: String, p: String, o: String): Boolean =
    spo.get(p).flatMap(_.get(s)).exists(_.exists(_._1 == o))

  def size: Int = triples.size

  def all: Seq[Triple] = triples.toSeq

  /** Subjects of rdf:type nif:Word — the word nodes. */
  def words: Seq[String] = subjects("rdf:type", "nif:Word")
}

object SentGraph {
  def apply(sentence: Sentence): SentGraph = new SentGraph(sentence.triples)
  def empty: SentGraph = new SentGraph(Nil)

  def toSentence(docId: String, sent: Long, comments: Seq[String], g: SentGraph): Sentence =
    Sentence(docId, sent, comments, g.all)
}
