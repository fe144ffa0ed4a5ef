package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.ConnectedComponents

/** KG-construction-shaped queries over the `documents` table: tokenize,
  * emit CoNLL-RDF-style triples, POSsynt classification (the reference's
  * analyze cascade semantics — examples/sparql/analyze/UPOS-to-POSsynt.sparql),
  * entity linking, and connected-component canonicalization.
  *
  * These mirror the library pipeline in an SQL-expressible form so the
  * DuckDB oracle can check them end-to-end; the span-table pipeline in
  * graft.conll is the full-fidelity path.
  */
object TextQueries {

  /** doc_id, tok (1-based), word — whitespace tokenization, the oracle-
    * parallel of the span parser's token extraction. */
  def tokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // widened: the explode multiplies rows ~54× BEFORE the first shuffle,
    // so an under-split scan makes the whole map side single-threaded
    // (Tables.widened is a no-op on a properly-split corpus)
    Tables.widened(s, dir, "documents")
      .select($"doc_id", posexplode(split($"text", "\\s+")).as(Seq("pos", "word")))
      .select($"doc_id", ($"pos" + 1).cast("bigint").as("tok"), $"word")
  }

  /** Shared DuckDB CTE producing the identical token table. */
  val tokensCte: String =
    """WITH tk AS (
      SELECT doc_id, CAST(i AS BIGINT) AS tok, w AS word FROM (
        SELECT doc_id, unnest(words) AS w, unnest(range(1, len(words)+1)) AS i
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS words FROM documents) t0) t1
    )"""

  private def md5s(c: Column): Column = md5(c.cast("binary"))

  /** Deterministic pseudo-UPOS tag from the word's md5 — stands in for an
    * upstream tagger so the POSsynt cascade is oracle-checkable. */
  private def uposOf(word: Column): Column = {
    val h = substring(md5s(word), 1, 1)
    when(h.isin("0", "1", "2", "3"), "NOUN")
      .when(h.isin("4", "5"), "VERB")
      .when(h === "6", "ADJ")
      .when(h === "7", "ADV")
      .when(h === "8", "ADP")
      .when(h === "9", "AUX")
      .when(h === "a", "DET")
      .when(h === "b", "PRON")
      .when(h === "c", "SCONJ")
      .when(h === "d", "CONJ")
      .when(h === "e", "PART")
      .otherwise("PUNCT")
  }

  private[queries] val uposSql =
    """CASE WHEN substring(md5(word),1,1) IN ('0','1','2','3') THEN 'NOUN'
        WHEN substring(md5(word),1,1) IN ('4','5') THEN 'VERB'
        WHEN substring(md5(word),1,1) = '6' THEN 'ADJ'
        WHEN substring(md5(word),1,1) = '7' THEN 'ADV'
        WHEN substring(md5(word),1,1) = '8' THEN 'ADP'
        WHEN substring(md5(word),1,1) = '9' THEN 'AUX'
        WHEN substring(md5(word),1,1) = 'a' THEN 'DET'
        WHEN substring(md5(word),1,1) = 'b' THEN 'PRON'
        WHEN substring(md5(word),1,1) = 'c' THEN 'SCONJ'
        WHEN substring(md5(word),1,1) = 'd' THEN 'CONJ'
        WHEN substring(md5(word),1,1) = 'e' THEN 'PART'
        ELSE 'PUNCT' END"""

  val all: Seq[Q] = Seq(
    Q(
      "q14_tokenize",
      (s, dir) => {
        import s.implicits._
        tokens(s, dir).orderBy($"doc_id", $"tok")
      },
      Some(s"$tokensCte SELECT doc_id, tok, word FROM tk ORDER BY doc_id, tok")
    ),
    Q(
      // Triple extraction: the canonical CoNLL-RDF shapes — conll:WORD
      // literal, rdf:type nif:Word, nif:nextWord chain (SURVEY §1.2).
      "q15_conll_triples",
      (s, dir) => {
        import s.implicits._
        val tk = tokens(s, dir)
          .withColumn("subj", concat(lit(":d"), $"doc_id", lit("_"), $"tok"))
        val w = Window.partitionBy($"doc_id").orderBy($"tok")
        val wordT = tk.select($"subj", lit("conll:WORD").as("pred"), $"word".as("obj"))
        val typeT = tk.select($"subj", lit("rdf:type").as("pred"), lit("nif:Word").as("obj"))
        val nextT = tk.withColumn("nw", lead($"subj", 1).over(w))
          .filter($"nw".isNotNull)
          .select($"subj", lit("nif:nextWord").as("pred"), $"nw".as("obj"))
        wordT.unionByName(typeT).unionByName(nextT)
          .orderBy($"subj", $"pred", $"obj")
      },
      Some(s"""$tokensCte, t2 AS (
          SELECT *, ':d' || doc_id || '_' || tok AS subj,
            lead(':d' || doc_id || '_' || tok) OVER (PARTITION BY doc_id ORDER BY tok) AS nw
          FROM tk)
        SELECT subj, pred, obj FROM (
          SELECT subj, 'conll:WORD' AS pred, word AS obj FROM t2
          UNION ALL SELECT subj, 'rdf:type' AS pred, 'nif:Word' AS obj FROM t2
          UNION ALL SELECT subj, 'nif:nextWord' AS pred, nw AS obj FROM t2 WHERE nw IS NOT NULL) u
        ORDER BY subj, pred, obj""")
    ),
    Q(
      // Ordered detokenization per doc — select-sentence-strings semantics
      // (group_concat over the nextWord chain, SURVEY §2.4 Q6).
      "q16_detokenize",
      (s, dir) => {
        import s.implicits._
        tokens(s, dir)
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).as("n_tokens"),
            array_join(
              transform(array_sort(collect_list(struct($"tok", $"word"))),
                x => x.getField("word")),
              " ").as("sentence"))
          .orderBy($"doc_id")
      },
      Some(s"""$tokensCte SELECT doc_id, COUNT(*) AS n_tokens,
        STRING_AGG(word, ' ' ORDER BY tok) AS sentence
        FROM tk GROUP BY doc_id ORDER BY doc_id""")
    ),
    Q(
      // UPOS→POSsynt extrapolation — the NOT-EXISTS-guarded cascade of
      // examples/sparql/analyze/UPOS-to-POSsynt.sparql compiled to a
      // first-match CASE (guards make exactly one branch fire per word;
      // ADP/SCONJ produce the two-valued sets {RN,AN}/{RV,AV}).
      "q17_possynt",
      (s, dir) => {
        import s.implicits._
        val tk = tokens(s, dir).withColumn("upos", uposOf($"word"))
        tk.withColumn("possynt",
            when($"upos".rlike("NOUN|PROPN|PRON"), "N")
              .when($"upos".rlike("VERB|AUX"), "V")
              .when($"upos".rlike("ADJ|DET|NUM"), "AN")
              .when($"upos".rlike("ADV|PART"), "AV")
              .when($"upos" === "ADP", "AN,RN")
              .when($"upos" === "SCONJ", "AV,RV")
              .when($"upos" === "CONJ", "RM")
              .otherwise("X"))
          .select($"doc_id", $"tok", $"word", $"upos", $"possynt")
          .orderBy($"doc_id", $"tok")
      },
      Some(s"""$tokensCte, tagged AS (SELECT doc_id, tok, word, $uposSql AS upos FROM tk)
        SELECT doc_id, tok, word, upos,
          CASE WHEN regexp_matches(upos, 'NOUN|PROPN|PRON') THEN 'N'
               WHEN regexp_matches(upos, 'VERB|AUX') THEN 'V'
               WHEN regexp_matches(upos, 'ADJ|DET|NUM') THEN 'AN'
               WHEN regexp_matches(upos, 'ADV|PART') THEN 'AV'
               WHEN upos = 'ADP' THEN 'AN,RN'
               WHEN upos = 'SCONJ' THEN 'AV,RV'
               WHEN upos = 'CONJ' THEN 'RM'
               ELSE 'X' END AS possynt
        FROM tagged ORDER BY doc_id, tok""")
    ),
    Q(
      // Entity linking: gazetteer derived from the corpus vocabulary
      // (surface → md5-entity), mention join. The library path broadcasts
      // and salts this join (graft.link.EntityLinker).
      "q18_entity_link",
      (s, dir) => {
        import s.implicits._
        val tk = tokens(s, dir)
        val gaz = tk.select($"word".as("surface")).distinct()
          .filter(length($"surface") >= 5)
          .withColumn("entity_id", substring(md5s($"surface"), 1, 8))
        tk.join(broadcast(gaz), tk("word") === gaz("surface"))
          .select($"doc_id", $"tok", $"word", $"entity_id")
          .orderBy($"doc_id", $"tok")
      },
      Some(s"""$tokensCte, gaz AS (
          SELECT word AS surface, substring(md5(word),1,8) AS entity_id
          FROM (SELECT DISTINCT word FROM tk) v WHERE length(word) >= 5)
        SELECT doc_id, tok, word, entity_id FROM tk JOIN gaz ON word = surface
        ORDER BY doc_id, tok""")
    ),
    Q(
      // Canonicalization: connected components over adjacency co-occurrence
      // edges; component label = lexicographic min member (north_rule CC).
      "q19_canonicalize_cc",
      (s, dir) => {
        import s.implicits._
        val tk = tokens(s, dir)
        val w = Window.partitionBy($"doc_id").orderBy($"tok")
        val edges = tk.withColumn("nxt", lead($"word", 1).over(w))
          .filter($"nxt".isNotNull && length($"word") >= 6 && length($"nxt") >= 6 &&
            $"word" =!= $"nxt")
          .select($"word".as("src"), $"nxt".as("dst"))
          .distinct()
        ConnectedComponents.run(s, edges).orderBy($"node")
      },
      Some(s"""WITH RECURSIVE ${tokensCte.stripPrefix("WITH ")}, pairs AS (
          SELECT word AS src, lead(word) OVER (PARTITION BY doc_id ORDER BY tok) AS dst
          FROM tk),
        edges0 AS (
          SELECT DISTINCT src, dst FROM pairs
          WHERE dst IS NOT NULL AND length(src) >= 6 AND length(dst) >= 6 AND src <> dst),
        edges AS (
          SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        reach(node, lbl) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node, min(lbl) AS component FROM reach
        GROUP BY node ORDER BY node""")
    )
  )
}
