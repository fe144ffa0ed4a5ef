package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation operators — the steps between analysis and training:
  * deterministic stratified sampling and token-budget shard packing.
  * Both are RNG-free (md5-threshold / running-sum arithmetic) so any
  * re-run — or the DuckDB oracle — lands on the identical sample.
  */
object CurationQueries {

  val all: Seq[Q] = Seq(
    Q(
      // Stratified downsampling by language: per-stratum keep rates
      // implemented as an md5(doc_id) hex threshold (es 16/16, de 8/16,
      // en 4/16) — deterministic, shuffle-free beyond q24's one groupBy,
      // and exactly reproducible at any scale (no RNG state, no
      // sampleBy seed drift across partitions/retries).
      "q35_quality_sample",
      (s, dir) => {
        import s.implicits._
        val lang = TextQueries.tokens(s, dir)
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).as("n_words"),
            sum(when($"word".rlike("[aeiou]$"), 1L).otherwise(0L)).as("vf"),
            sum(length($"word")).as("chars"))
          .withColumn("lang_guess",
            when(round($"vf" / $"n_words", 6) > 0.4, "es")
              .when(round($"chars" / $"n_words", 6) > 4.5, "de")
              .otherwise("en"))
        val h = substring(md5($"doc_id".cast("string").cast("binary")), 1, 1)
        lang
          .withColumn("keep",
            when($"lang_guess" === "es", lit(true))
              .when($"lang_guess" === "de", h.isin("0", "1", "2", "3", "4", "5", "6", "7"))
              .otherwise(h.isin("0", "1", "2", "3")))
          .filter($"keep")
          .select($"doc_id", $"lang_guess", $"n_words")
          .orderBy($"doc_id")
      },
      Some(s"""${TextQueries.tokensCte}, lang AS (
          SELECT doc_id, COUNT(*) AS n_words,
            CASE WHEN ROUND(SUM(CASE WHEN regexp_matches(word, '[aeiou]$$') THEN 1 ELSE 0 END) / COUNT(*), 6) > 0.4 THEN 'es'
                 WHEN ROUND(SUM(length(word)) / COUNT(*), 6) > 4.5 THEN 'de'
                 ELSE 'en' END AS lang_guess
          FROM tk GROUP BY doc_id)
        SELECT doc_id, lang_guess, n_words FROM lang
        WHERE CASE WHEN lang_guess = 'es' THEN TRUE
                   WHEN lang_guess = 'de' THEN substring(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('0','1','2','3','4','5','6','7')
                   ELSE substring(md5(CAST(doc_id AS VARCHAR)),1,1) IN ('0','1','2','3') END
        ORDER BY doc_id""")
    ),
    Q(
      // Token-budget shard packing (training-shard assembly): documents
      // are packed greedily into ~2048-token shards by a running sum.
      // The parallel unit is a doc-hash bucket (32 here; executor count
      // in production): the running-sum window partitions by bucket, so
      // there is NO single global ordered window — the one shape that
      // cannot scale. Shard id = (bucket, cum_before // budget).
      "q36_shard_packing",
      (s, dir) => {
        import s.implicits._
        val budget = 2048L
        val docs = Tables.documents(s, dir)
          .select($"doc_id",
            size(split($"text", "\\s+")).cast("bigint").as("n_tokens"))
          .withColumn("bucket", pmod($"doc_id", lit(32)).cast("int"))
        val w = Window.partitionBy($"bucket").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs
          .withColumn("cum", sum($"n_tokens").over(w))
          .withColumn("shard", (($"cum" - $"n_tokens") / budget).cast("bigint"))
          .select($"doc_id", $"bucket", $"shard", $"n_tokens", $"cum")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, bucket, CAST((cum - n_tokens) // 2048 AS BIGINT) AS shard,
               n_tokens, cum FROM (
          SELECT doc_id, CAST(doc_id % 32 AS INT) AS bucket,
            CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
            CAST(SUM(CAST(len(string_split_regex(text, '\s+')) AS BIGINT))
              OVER (PARTITION BY doc_id % 32 ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM documents) t ORDER BY doc_id""")
    ),
    Q(
      // PII-style scrubbing: long digit runs (ids, phone-ish numbers)
      // replaced by a <NUM> sentinel — the redaction stage every
      // training-data pipeline runs before tokenization. Narrow map;
      // the redacted text is fingerprinted so the oracle compares
      // content without hauling full text through the hash gate.
      // The word-only driver corpus contains NO digits, so redaction
      // was an identity rewrite at every SF (VERDICT r7 #4 gate sweep);
      // a deterministic id-derived digit run is appended to 2/3 of the
      // docs (mirrored in the oracle) so BOTH outcomes — redacted and
      // untouched — flow through the hash gate. NonVacuitySpec asserts
      // both appear.
      "q39_redact",
      (s, dir) => {
        import s.implicits._
        val withPii = Tables.documents(s, dir)
          .select($"doc_id", concat($"text",
            when(pmod($"doc_id", lit(3)) =!= 0,
              concat(lit(" ref "), ($"doc_id" + 100000L).cast("string")))
              .otherwise(lit(""))).as("text"))
        withPii
          .select($"doc_id",
            size(regexp_extract_all($"text", lit("[0-9]{4,}"), lit(0)))
              .cast("bigint").as("n_redacted"),
            md5(regexp_replace($"text", "[0-9]{4,}", "<NUM>").cast("binary")).as("fp"))
          .orderBy($"doc_id")
      },
      Some("""WITH piidocs AS (
          SELECT doc_id, text || CASE WHEN doc_id % 3 <> 0
            THEN ' ref ' || CAST(doc_id + 100000 AS VARCHAR) ELSE '' END AS text
          FROM documents)
        SELECT doc_id,
          CAST(len(regexp_extract_all(text, '[0-9]{4,}')) AS BIGINT) AS n_redacted,
          md5(regexp_replace(text, '[0-9]{4,}', '<NUM>', 'g')) AS fp
        FROM piidocs ORDER BY doc_id""")
    ),
    Q(
      // Repetition filter (the Gopher-style duplicate-n-gram rule): the
      // fraction of repeated word 3-grams per document — high values
      // flag boilerplate/spam. One window pass + one groupBy.
      "q40_repetition",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"doc_id").orderBy($"tok")
        TextQueries.tokens(s, dir)
          .withColumn("w2", lead($"word", 1).over(w))
          .withColumn("w3", lead($"word", 2).over(w))
          .filter($"w3".isNotNull)
          .select($"doc_id", concat_ws(" ", $"word", $"w2", $"w3").as("g"))
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_grams"),
            countDistinct($"g").as("n_distinct"))
          .withColumn("rep_ratio",
            round(($"n_grams" - $"n_distinct") / $"n_grams", 6))
          .orderBy($"doc_id")
      },
      Some(s"""${TextQueries.tokensCte}, g3 AS (
          SELECT doc_id, word || ' ' || w2 || ' ' || w3 AS g FROM (
            SELECT doc_id, word,
              lead(word, 1) OVER (PARTITION BY doc_id ORDER BY tok) AS w2,
              lead(word, 2) OVER (PARTITION BY doc_id ORDER BY tok) AS w3
            FROM tk) p WHERE w3 IS NOT NULL)
        SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT g) AS n_distinct,
          ROUND((COUNT(*) - COUNT(DISTINCT g)) / COUNT(*), 6) AS rep_ratio
        FROM g3 GROUP BY doc_id ORDER BY doc_id""")
    ),
    Q(
      // Benchmark decontamination (training-data hygiene): flag corpus
      // documents sharing any word n-gram with a held-out benchmark
      // set. The benchmark is a BOUNDED deterministic sample
      // (doc_id % 20 == 0 && doc_id < 2000 → ≤100 docs at ANY corpus
      // size — real benchmark suites are small and fixed); its distinct
      // n-grams broadcast-hash-join against the corpus n-gram stream
      // (narrow probe, no shuffle on the 100 TB side), one groupBy for
      // the per-doc counts, then a left join back so clean docs report
      // 0. n=4 here so the det corpus exercises both outcomes (real
      // pipelines use 8-13-grams); the plan shape is n-independent.
      "q41_decontaminate",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
          .select($"doc_id",
            split(trim(regexp_replace(lower($"text"), "\\s+", " ")), " ").as("w"))
        val isBench = ($"doc_id" % 20 === 0) && ($"doc_id" < 2000)
        val grams = docs.filter(size($"w") >= 4)
          .select($"doc_id", explode(expr(
            "transform(sequence(0, size(w)-4), i -> concat_ws(' ', slice(w, i+1, 4)))")).as("g"))
        val bench = grams.filter(isBench).select($"g").distinct()
        val hits = grams.filter(!isBench)
          .join(broadcast(bench), "g")
          .groupBy($"doc_id").agg(countDistinct($"g").as("shared"))
        docs.filter(!isBench).select($"doc_id")
          .join(hits, Seq("doc_id"), "left_outer")
          .select($"doc_id",
            coalesce($"shared", lit(0L)).as("n_shared"),
            (coalesce($"shared", lit(0L)) > 0).as("contaminated"))
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
          SELECT doc_id, string_split_regex(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS w
          FROM documents),
        grams AS (
          SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
          FROM (SELECT doc_id, w, unnest(range(1, len(w)-2)) AS i FROM tok WHERE len(w) >= 4) t),
        bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0 AND doc_id < 2000),
        hits AS (
          SELECT c.doc_id, COUNT(DISTINCT c.g) AS shared
          FROM grams c JOIN bench b ON b.g = c.g
          WHERE NOT (c.doc_id % 20 = 0 AND c.doc_id < 2000) GROUP BY c.doc_id)
        SELECT d.doc_id, COALESCE(h.shared, 0) AS n_shared,
          COALESCE(h.shared, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        WHERE NOT (d.doc_id % 20 = 0 AND d.doc_id < 2000)
        ORDER BY d.doc_id""")
    ),
    Q(
      // URL canonicalization + dedup — the web-curation step that runs
      // BEFORE content dedup at corpus scale (a crawl carries the same
      // page under scheme/case/query/fragment/trailing-slash variants).
      // The synthetic URL is constructed deterministically from
      // (source, doc_id) identically on both sides; the OPERATOR under
      // test is the normalization: strip query+fragment, lowercase the
      // scheme://host prefix (path case preserved — URL paths are
      // case-sensitive), strip one trailing slash; then one hash-groupBy
      // on the canonical form (min doc_id = survivor). No backreference
      // replacements — Java ($1) and RE2 (\1) disagree, so the prefix
      // is extracted and re-concatenated instead.
      "q46_url_canonical",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .withColumn("url",
            concat(lit("HTTPS://"), upper($"source"), lit(".Example.COM/p/"),
              pmod($"doc_id", lit(40)), lit("/?utm=feed&id="), $"doc_id", lit("#top")))
          .withColumn("noq", regexp_replace($"url", "[?#].*$", ""))
          .withColumn("sh", regexp_extract($"noq", "^[^/]*//[^/]*", 0))
          .withColumn("canonical_url",
            concat(lower($"sh"),
              regexp_replace(expr("substring(noq, length(sh) + 1)"), "/$", "")))
          .groupBy($"canonical_url")
          .agg(count(lit(1)).as("n_dups"), min($"doc_id").as("survivor"))
          .orderBy($"canonical_url")
      },
      Some("""WITH u AS (
          SELECT doc_id,
            'HTTPS://' || upper(source) || '.Example.COM/p/' || (doc_id % 40)
              || '/?utm=feed&id=' || doc_id || '#top' AS url
          FROM documents),
        c AS (
          SELECT doc_id, noq, sh,
            lower(sh) || regexp_replace(substring(noq, length(sh) + 1), '/$', '') AS canonical_url
          FROM (SELECT doc_id, noq, regexp_extract(noq, '^[^/]*//[^/]*') AS sh
                FROM (SELECT doc_id, regexp_replace(url, '[?#].*$', '') AS noq FROM u) q) p)
        SELECT canonical_url, COUNT(*) AS n_dups, MIN(doc_id) AS survivor
        FROM c GROUP BY canonical_url ORDER BY canonical_url""")
    ),
    Q(
      // Corpus-level boilerplate detection: 5-grams that appear in ≥ 3
      // DISTINCT documents (navigation chrome, license footers, cookie
      // banners at web scale). One narrow per-doc gram slice
      // (transform + array_distinct, zero shuffles — the q21/q22 shape)
      // feeding ONE map-side-combinable count; document frequency, not
      // term frequency, is the boilerplate signal, so the per-doc dedup
      // happens inside the array before the explode ever widens.
      "q47_ngram_boilerplate",
      (s, dir) => {
        import s.implicits._
        Tables.widened(s, dir, "documents")
          .withColumn("ws", split($"text", "\\s+"))
          .filter(size($"ws") >= 5)
          .select($"doc_id", explode(array_distinct(expr(
            "transform(sequence(0, size(ws)-5), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4]))"
          ))).as("gram"))
          .groupBy($"gram").agg(count(lit(1)).as("n_docs"))
          .filter($"n_docs" >= 3)
          .orderBy($"n_docs".desc, $"gram")
      },
      Some(s"""${TextQueries.tokensCte}, g5 AS (
          SELECT DISTINCT doc_id,
            word || ' ' || w2 || ' ' || w3 || ' ' || w4 || ' ' || w5 AS gram
          FROM (SELECT doc_id, word,
                  lead(word, 1) OVER w AS w2, lead(word, 2) OVER w AS w3,
                  lead(word, 3) OVER w AS w4, lead(word, 4) OVER w AS w5
                FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY tok)) p
          WHERE w5 IS NOT NULL)
        SELECT gram, COUNT(*) AS n_docs FROM g5
        GROUP BY gram HAVING COUNT(*) >= 3
        ORDER BY n_docs DESC, gram""")
    )
  )
}
