package graft.conll

import scala.collection.mutable

/** Named-graph ontology support (SURVEY §2.3 U14, §2.4 U12c).
  *
  * The reference loads OLiA annotation/linking models into Jena named
  * graphs and navigates them with property paths per sentence
  * (link-UPOS-simple.sparql:14-25, infer-olia-concepts.sparql:14-17).
  * Ontologies are small and read-only, so the Spark-native plan is:
  * compute the transitive closures ONCE on the driver, broadcast the
  * resulting maps, and turn every per-sentence path traversal into a map
  * lookup — never a distributed graph walk.
  */
final case class OntTriple(graph: String, s: String, p: String, o: String)

object Ontology {

  val SUBCLASS = "rdfs:subClassOf"
  val EQUIV = "owl:equivalentClass"
  val UNION = "owl:unionOf"
  val INTERSECTION = "owl:intersectionOf"
  val FIRST = "rdf:first"
  val REST = "rdf:rest"
  val HAS_TAG = "oliasys:hasTag"
  val TYPE = "rdf:type"

  /** Generic reachability closure from each node over the link-UPOS-simple
    * alternation path `(a|subClassOf|intersectionOf|unionOf|(rest* /first)
    * |equivalentClass|^equivalentClass)*`, restricted to a target-namespace
    * filter (`strstarts(str(?c),"http://purl.org/olia/olia")`).
    */
  def pathClosure(
      triples: Seq[OntTriple],
      graph: String,
      keep: String => Boolean
  ): Map[String, Seq[String]] = {
    val inGraph = triples.filter(_.graph == graph)
    val fwdPreds = Set(TYPE, SUBCLASS, INTERSECTION, UNION, REST, FIRST, EQUIV)
    val succ = mutable.HashMap[String, mutable.LinkedHashSet[String]]()
    for (t <- inGraph) {
      if (fwdPreds(t.p)) succ.getOrElseUpdate(t.s, mutable.LinkedHashSet()) += t.o
      if (t.p == EQUIV) succ.getOrElseUpdate(t.o, mutable.LinkedHashSet()) += t.s // ^equivalentClass
    }
    val nodes = inGraph.flatMap(t => Seq(t.s, t.o)).distinct
    nodes.map { n =>
      val seen = mutable.LinkedHashSet(n)
      val queue = mutable.Queue(n)
      while (queue.nonEmpty) {
        val x = queue.dequeue()
        for (y <- succ.getOrElse(x, mutable.LinkedHashSet()); if seen.add(y)) queue += y
      }
      n -> seen.toSeq.filter(keep)
    }.toMap
  }

  /** tag literal → all reachable kept concepts, via oliasys:hasTag then the
    * alternation-path closure (link-UPOS-simple.sparql:17-22). */
  def tagToConcepts(
      triples: Seq[OntTriple],
      graph: String,
      keep: String => Boolean
  ): Map[String, Seq[String]] = {
    val closure = pathClosure(triples, graph, keep)
    triples.filter(t => t.graph == graph && t.p == HAS_TAG)
      .groupBy(_.o)
      .map { case (tag, ts) =>
        tag -> ts.flatMap(t => closure.getOrElse(t.s, Seq.empty)).distinct
      }
  }

  /** concept → strict supers over (subClassOf|equivalentClass)+ within the
    * kept namespace (infer-olia-concepts.sparql:14-17). */
  def superClosure(
      triples: Seq[OntTriple],
      graph: String,
      keep: String => Boolean
  ): Map[String, Seq[String]] = {
    val succ = mutable.HashMap[String, mutable.LinkedHashSet[String]]()
    for (t <- triples if t.graph == graph && (t.p == SUBCLASS || t.p == EQUIV))
      succ.getOrElseUpdate(t.s, mutable.LinkedHashSet()) += t.o
    succ.keys.map { n =>
      val seen = mutable.LinkedHashSet[String]()
      val queue = mutable.Queue(n)
      while (queue.nonEmpty) {
        val x = queue.dequeue()
        for (y <- succ.getOrElse(x, mutable.LinkedHashSet()); if seen.add(y)) queue += y
      }
      n -> seen.toSeq.filter(keep)
    }.toMap
  }

  /** Deterministic mini-OLiA fixture (FIXTURES.md F4): the UD/Penn tag
    * classes the REDUCE parser needs, with ≥2-level subclass chains and
    * one union list to exercise the alternation-path closure. Shapes
    * follow the public OLiA models (purl.org/olia), synthesized — no
    * network load.
    */
  val GRAPH_UD = "graph:ud-pos-all"
  val GRAPH_PENN = "graph:penn"

  val miniOlia: Seq[OntTriple] = {
    def g(s: String, p: String, o: String) = OntTriple(GRAPH_PENN, s, p, o)
    val penn = Seq(
      // tag classes (annotation model) linked to reference classes
      g("penn:NN", HAS_TAG, "NN"), g("penn:NN", SUBCLASS, "olia:CommonNoun"),
      g("penn:NNS", HAS_TAG, "NNS"), g("penn:NNS", SUBCLASS, "olia:CommonNoun"),
      g("penn:NNP", HAS_TAG, "NNP"), g("penn:NNP", SUBCLASS, "olia:ProperNoun"),
      g("penn:PRP", HAS_TAG, "PRP"), g("penn:PRP", SUBCLASS, "olia:PersonalPronoun"),
      g("penn:VBZ", HAS_TAG, "VBZ"), g("penn:VBZ", SUBCLASS, "olia:FiniteVerb"),
      g("penn:VBD", HAS_TAG, "VBD"), g("penn:VBD", SUBCLASS, "olia:FiniteVerb"),
      g("penn:VBP", HAS_TAG, "VBP"), g("penn:VBP", SUBCLASS, "olia:FiniteVerb"),
      g("penn:VB", HAS_TAG, "VB"), g("penn:VB", SUBCLASS, "olia:Verb"),
      g("penn:VBN", HAS_TAG, "VBN"), g("penn:VBN", SUBCLASS, "olia:Participle"),
      g("penn:VBG", HAS_TAG, "VBG"), g("penn:VBG", SUBCLASS, "olia:Gerund"),
      g("penn:JJ", HAS_TAG, "JJ"), g("penn:JJ", SUBCLASS, "olia:Adjective"),
      g("penn:RB", HAS_TAG, "RB"), g("penn:RB", SUBCLASS, "olia:Adverb"),
      g("penn:DT", HAS_TAG, "DT"), g("penn:DT", SUBCLASS, "olia:Determiner"),
      g("penn:CD", HAS_TAG, "CD"), g("penn:CD", SUBCLASS, "olia:CardinalNumber"),
      g("penn:IN", HAS_TAG, "IN"), g("penn:IN", SUBCLASS, "olia:Preposition"),
      g("penn:HYPH", HAS_TAG, "HYPH"), g("penn:HYPH", SUBCLASS, "olia:Punctuation"),
      g("penn:TO", HAS_TAG, "TO"), g("penn:TO", SUBCLASS, "olia:InfinitiveParticle"),
      // reference-model hierarchy (≥3 levels)
      g("olia:CommonNoun", SUBCLASS, "olia:Noun"),
      g("olia:ProperNoun", SUBCLASS, "olia:Noun"),
      g("olia:Noun", SUBCLASS, "olia:Nominal"),
      g("olia:PersonalPronoun", SUBCLASS, "olia:Pronoun"),
      g("olia:Pronoun", SUBCLASS, "olia:Nominal"),
      g("olia:FiniteVerb", SUBCLASS, "olia:Verb"),
      g("olia:Participle", SUBCLASS, "olia:NonFiniteVerb"),
      g("olia:Gerund", SUBCLASS, "olia:NonFiniteVerb"),
      g("olia:NonFiniteVerb", SUBCLASS, "olia:Verb"),
      g("olia:Verb", SUBCLASS, "olia:MorphosyntacticCategory"),
      g("olia:Adjective", EQUIV, "olia:AdjectivalHead"),
      // one union list: olia:Modifier = unionOf(Adjective, Adverb)
      g("olia:Modifier", UNION, "_:l1"),
      g("_:l1", FIRST, "olia:Adjective"), g("_:l1", REST, "_:l2"),
      g("_:l2", FIRST, "olia:Adverb"), g("_:l2", REST, "rdf:nil")
    )
    // UD graph: UPOS tag classes (same shapes, graph-scoped)
    def u(s: String, p: String, o: String) = OntTriple(GRAPH_UD, s, p, o)
    val ud = Seq(
      ("NOUN", "olia:CommonNoun"), ("PROPN", "olia:ProperNoun"),
      ("PRON", "olia:Pronoun"), ("VERB", "olia:Verb"), ("AUX", "olia:AuxiliaryVerb"),
      ("ADJ", "olia:Adjective"), ("ADV", "olia:Adverb"), ("ADP", "olia:Preposition"),
      ("DET", "olia:Determiner"), ("NUM", "olia:CardinalNumber"),
      ("SCONJ", "olia:SubordinatingConjunction"), ("CONJ", "olia:CoordinatingConjunction"),
      ("PART", "olia:Particle"), ("PUNCT", "olia:Punctuation")
    ).flatMap { case (tag, cls) =>
      Seq(u(s"ud:$tag", HAS_TAG, tag), u(s"ud:$tag", SUBCLASS, cls))
    } ++ Seq(
      u("olia:CommonNoun", SUBCLASS, "olia:Noun"),
      u("olia:ProperNoun", SUBCLASS, "olia:Noun"),
      u("olia:AuxiliaryVerb", SUBCLASS, "olia:Verb"),
      u("olia:SubordinatingConjunction", SUBCLASS, "olia:Conjunction"),
      u("olia:CoordinatingConjunction", SUBCLASS, "olia:Conjunction")
    )
    penn ++ ud
  }

  def keepOlia(uri: String): Boolean = uri.startsWith("olia:")
}
