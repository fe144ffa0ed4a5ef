package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data-pipeline deduplication + text-analysis operators over the
  * `documents` table: exact dedup, MinHash signatures + LSH candidate pairs
  * with exact Jaccard verification, SimHash buckets, language-ID heuristic,
  * quality scoring, token counting, fingerprinting.
  *
  * All hashes are md5-based so DuckDB computes bit-identical values.
  * Ratios divide exact integers in IEEE double (deterministic), rounded to
  * 6 places on both sides.
  */
object DedupQueries {

  private def md5s(c: Column): Column = md5(c.cast("binary"))

  /** Fixed per-language character-bigram profiles for q44 (the classic
    * n-gram language-ID shape, Cavnar & Trenkle 1994 scaled down to a
    * deterministic 5-bigram probe per language; shared by the Spark plan
    * and the oracle VALUES table). */
  private val langProfiles: Seq[(String, String)] = Seq(
    "en" -> "th", "en" -> "he", "en" -> "in", "en" -> "er", "en" -> "an",
    "de" -> "en", "de" -> "ch", "de" -> "ei", "de" -> "de", "de" -> "te",
    "es" -> "la", "es" -> "os", "es" -> "as", "es" -> "es", "es" -> "do",
    "fr" -> "le", "fr" -> "re", "fr" -> "nt", "fr" -> "ou", "fr" -> "ai")

  /** doc_id + DISTINCT word-3-gram shingle SET, one array row per doc
    * with ≥1 shingle.
    *
    * This is the NARROW formulation of the shingle pipeline: the 3-grams
    * are sliced out of the per-doc token array with `transform(sequence)`
    * and deduped with `array_distinct`, entirely inside the scan's map
    * side — zero shuffles, where the exploded formulation paid a window
    * sort (per-doc lead×2), a multiset explode, and a global `distinct`
    * before the first useful operator. A document's shingle set is
    * bounded by its text length, so the row stays small at any corpus
    * scale (the per-DOC work is identical at 100 TB; only doc COUNT
    * grows, and that parallelizes). Token semantics are exactly
    * [[TextQueries.tokens]]'s `split(text, '\\s+')`; the DuckDB CTE
    * keeps the exploded window form, which defines the same set. */
  private def shingleSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.widened(s, dir, "documents")
      .withColumn("ws", split($"text", "\\s+"))
      .filter(size($"ws") >= 3)
      .select($"doc_id", array_distinct(expr(
        "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"
      )).as("shset"))
  }

  /** MinHash j as a narrow expression over the shingle-set array: min
    * over the set of the salted md5 — same value the grouped `MIN` agg
    * produced, with no shuffle (MIN is duplicate-invariant, so set vs
    * multiset is immaterial). */
  private def mhCol(j: Int): Column =
    expr(s"array_min(transform(shset, x -> md5(cast('$j|' || x AS binary))))")

  private val shinglesCte: String =
    s"""${TextQueries.tokensCte}, sh AS (
      SELECT doc_id, word || ' ' || w2 || ' ' || w3 AS shingle FROM (
        SELECT doc_id, word,
          lead(word, 1) OVER (PARTITION BY doc_id ORDER BY tok) AS w2,
          lead(word, 2) OVER (PARTITION BY doc_id ORDER BY tok) AS w3
        FROM tk) p WHERE w3 IS NOT NULL
    )"""

  /** 8 MinHash values: min over shingles of md5 salted per hash index.
    * Computed narrowly per document from the shingle-set array — the
    * whole signature table is one shuffle-free projection. */
  private def minhashDf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cols = (0 until 8).map(j => mhCol(j).as(s"mh$j"))
    shingleSets(s, dir).select($"doc_id" +: cols: _*)
  }

  private def minhashSelectFor(nHashes: Int): String = {
    val cols = (0 until nHashes)
      .map(j => s"min(md5('$j|' || shingle)) AS mh$j").mkString(", ")
    s"SELECT doc_id, $cols FROM sh GROUP BY doc_id"
  }

  private val minhashSelect: String = minhashSelectFor(8)

  /** LSH-verified near-dup pairs — shared by q22 (the pair listing), q34
    * (cluster resolution) and q43 (the r=2 banding). Scale notes on the
    * persist + bucket cap in the q22 entry comment.
    *
    * Banding is the standard b-band × r-row scheme: band j's bucket key
    * ANDs r consecutive minhashes (md5 of their '|'-join), so a pair
    * becomes a candidate iff ALL r rows agree in SOME band —
    * P(candidate | jaccard=s) = 1-(1-s^r)^b. r=1 is the maximum-recall /
    * maximum-candidate setting; real 100 TB dedup raises r to cut
    * candidate volume at its chosen similarity threshold (r=2 with b=4
    * halves the hash budget's collision odds for dissimilar pairs while
    * keeping ~97% recall at s=0.8). */
  private def lshJaccardPairs(
      s: SparkSession, dir: String,
      nBands: Int = 8, nRows: Int = 1): DataFrame = {
    import s.implicits._
    // ONE narrow shingle-set table feeds everything: the banding keys
    // (via the per-doc minhash expressions), the set sizes (`size`), and
    // the exact-Jaccard verification (`array_intersect`). Persisted once;
    // everything before the band-bucket window is shuffle-free (the r5
    // formulation paid a window sort + a global distinct + a grouped
    // minhash agg — three corpus-wide shuffles — before its first
    // candidate). Shuffles that remain are the ones candidate generation
    // inherently needs: the bucket-width window + band self-join, the
    // candidate distinct, and the two pair→set hash joins.
    val sets = shingleSets(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one struct per band, exploded in a single pass (no nBands-way
    // self-union of the signature table)
    val bandStructs = (0 until nBands).map { j =>
      val key =
        if (nRows == 1) mhCol(j)
        else md5s(concat_ws("|",
          (0 until nRows).map(k => mhCol(j * nRows + k)): _*))
      struct(lit(j).as("band"), key.as("bucket"))
    }
    val wB = Window.partitionBy($"band", $"bucket")
    // measured-width exchanges (r9, Tables.byteWidth): the bucket window
    // and the band self-join share one explicit (band,bucket) exchange
    // sized from the source bytes, and the candidate dedup rides an
    // explicit (a,b) exchange at the same width (the runStar dedup
    // pattern — the aggregate sees its clustering satisfied and inserts
    // no session-width shuffle). Banding rows are strictly narrower than
    // the source text, so the session default scheduled core-count-wide
    // shuffles for kilobytes of keys; p <= 0 (conf-disabled) keeps the
    // implicit session-width shape.
    val p = Tables.byteWidth(s, dir, "documents")
    val banded0 = sets
      .select($"doc_id", explode(array(bandStructs: _*)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.bucket".as("bucket"))
    val banded = (if (p > 0) banded0.repartition(p, $"band", $"bucket") else banded0)
      .withColumn("bn", count(lit(1)).over(wB))
      .filter($"bn" <= 100)
      .drop("bn")
    val cand0 = banded
      .alias("l").join(banded.alias("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
    val candidates =
      if (p > 0) cand0.repartition(p, $"a", $"b").dropDuplicates()
      else cand0.distinct()
    // exact verification: set intersection as a narrow array op on the
    // joined pair row — replaces the explode-join-regroup (two wide
    // joins + an aggregation) of the exploded formulation
    candidates
      .join(sets.select($"doc_id".as("a"), $"shset".as("sa")), "a")
      .join(sets.select($"doc_id".as("b"), $"shset".as("sb")), "b")
      .withColumn("inter", size(array_intersect($"sa", $"sb")).cast("bigint"))
      .withColumn("jaccard",
        round($"inter" / (size($"sa") + size($"sb") - $"inter"), 6))
      .select($"a", $"b", $"inter", $"jaccard")
  }

  /** The same pairs as a DuckDB CTE chain ending in `dup_pairs`,
    * parameterized by the b×r banding (mirrors lshJaccardPairs). */
  private def lshPairsCteFor(nBands: Int, nRows: Int): String = {
    val bandRows = (0 until nBands).map { j =>
      val key =
        if (nRows == 1) s"mh$j"
        else "md5(" + (0 until nRows)
          .map(k => s"mh${j * nRows + k}").mkString(" || '|' || ") + ")"
      if (j == 0) s"SELECT doc_id, 0 AS band, $key AS bucket FROM mh"
      else s"SELECT doc_id, $j, $key FROM mh"
    }.mkString("\n      UNION ALL ")
    s"""$shinglesCte, mh AS (${minhashSelectFor(nBands * nRows)}),
    bands AS (
      $bandRows),
    bandsf AS (
      SELECT doc_id, band, bucket FROM (
        SELECT doc_id, band, bucket,
               COUNT(*) OVER (PARTITION BY band, bucket) AS bn
        FROM bands) b WHERE bn <= 100),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM bandsf l
      JOIN bandsf r ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
    dsets AS (SELECT DISTINCT doc_id, shingle FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM dsets GROUP BY doc_id),
    inter AS (
      SELECT c.a, c.b, COUNT(*) AS inter FROM cand c
      JOIN dsets x ON x.doc_id = c.a
      JOIN dsets y ON y.doc_id = c.b AND y.shingle = x.shingle
      GROUP BY c.a, c.b),
    dup_pairs AS (
      SELECT c.a, c.b, COALESCE(i.inter, 0) AS inter,
        ROUND(COALESCE(i.inter, 0) / (sa.n + sb.n - COALESCE(i.inter, 0)), 6) AS jaccard
      FROM cand c
      LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
      JOIN sizes sa ON sa.doc_id = c.a
      JOIN sizes sb ON sb.doc_id = c.b)"""
  }

  private val lshPairsCte: String = lshPairsCteFor(8, 1)

  val all: Seq[Q] = Seq(
    Q(
      // Exact dedup: content-hash grouping; group_size > 1 = duplicate set.
      // Every 50th document is re-planted under a shifted id (mirrored in
      // the oracle), so multi-member duplicate groups exist at EVERY SF —
      // the driver corpus has no exact text dups below sf0.1, which left
      // this gate trivially satisfied (all group_size = 1) at the
      // driver's sf0.01 correctness scale (VERDICT r7 #4 gate sweep).
      // NonVacuitySpec asserts the planted groups resolve.
      "q20_dedup_exact",
      (s, dir) => {
        import s.implicits._
        val base = Tables.documents(s, dir).select($"doc_id", $"text")
        val planted = base.filter(pmod($"doc_id", lit(50)) === 0)
          .select(($"doc_id" + 10000000L).as("doc_id"), $"text")
        base.unionByName(planted)
          .select($"doc_id", md5s($"text").as("fingerprint"))
          .withColumn("group_size",
            count(lit(1)).over(Window.partitionBy($"fingerprint")))
          .orderBy($"doc_id")
      },
      Some("""WITH docs2 AS (
          SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 50 = 0)
        SELECT doc_id, md5(text) AS fingerprint,
        COUNT(*) OVER (PARTITION BY md5(text)) AS group_size
        FROM docs2 ORDER BY doc_id""")
    ),
    Q(
      "q21_minhash_sigs",
      (s, dir) => {
        import s.implicits._
        minhashDf(s, dir).orderBy($"doc_id")
      },
      Some(s"$shinglesCte $minhashSelect ORDER BY doc_id")
    ),
    Q(
      // MinHash-LSH near-dup detection: 8 bands of 1 row → candidate pairs
      // sharing any minhash, then exact shingle-set Jaccard verification.
      // Scale hardening (VERDICT r1 #5 + q22 audit): the narrow per-doc
      // shingle-set table feeds its three consumers (banding keys, sizes,
      // exact verify) from one persist — everything before the bucket
      // window is shuffle-free (see lshJaccardPairs);
      // and buckets holding > 100 docs are skipped as degenerate (a pile
      // of identical docs makes the band self-join quadratic in the
      // bucket — exact-dup clusters belong to q20's hash pass). The cap
      // is mirrored in the oracle SQL.
      "q22_lsh_jaccard",
      (s, dir) => {
        import s.implicits._
        lshJaccardPairs(s, dir).orderBy($"a", $"b")
      },
      Some(s"$lshPairsCte SELECT a, b, inter, jaccard FROM dup_pairs ORDER BY a, b")
    ),
    Q(
      // Dedup RESOLUTION — what a pipeline runs AFTER pair finding: the
      // LSH-verified near-dup pairs (exact Jaccard >= 0.5) resolved into
      // clusters via distributed connected components; component = min
      // doc_id = the canonical survivor per cluster. Near-dup chains are
      // the HIGH-diameter CC case (a…b…c…: each link is a pair, so chain
      // length — hence min-label round count — grows with the corpus;
      // measured 5.25× time for 10× docs in the r5 scale sweep), so this
      // uses the large-star/small-star variant: O(log n) rounds
      // regardless of diameter, exact two-sided anti-join convergence,
      // and the label read-off verified as an exact fixpoint against the
      // input edges (VERDICT r5 #1/#2). Same labels as min-label (both
      // are component = min node id) — the oracle hash is unchanged.
      "q34_dup_clusters",
      (s, dir) => {
        import s.implicits._
        val edges = lshJaccardPairs(s, dir)
          .filter($"jaccard" >= 0.5)
          .select($"a".as("src"), $"b".as("dst"))
        graft.operators.ConnectedComponents.runStar(s, edges).orderBy($"node")
      },
      Some(s"""WITH RECURSIVE ${lshPairsCte.stripPrefix("WITH ")},
        edges0 AS (SELECT a AS src, b AS dst FROM dup_pairs WHERE jaccard >= 0.5),
        edges AS (SELECT src, dst FROM edges0 UNION SELECT dst, src FROM edges0),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        reach(node, lbl) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node)
        SELECT node, MIN(lbl) AS component FROM reach GROUP BY node ORDER BY node""")
    ),
    Q(
      // LSH banding at r=2 (VERDICT r4 item 5): 4 bands × 2 rows over the
      // same 8-minhash budget — a candidate must agree on BOTH minhashes
      // of some band (P = 1-(1-s²)⁴ vs r=1's 1-(1-s)⁸), the setting a
      // production 100 TB dedup runs to keep the band join's candidate
      // volume proportional to the TRUE near-dup density instead of the
      // single-hash collision rate. Same persisted-shingle-set plan, same
      // bucket cap, same exact-Jaccard verify; q22 (r=1) is unchanged.
      "q43_lsh_r2",
      (s, dir) => {
        import s.implicits._
        lshJaccardPairs(s, dir, nBands = 4, nRows = 2).orderBy($"a", $"b")
      },
      Some(s"${lshPairsCteFor(4, 2)} SELECT a, b, inter, jaccard FROM dup_pairs ORDER BY a, b")
    ),
    Q(
      // SimHash: 8-bit signature via per-hex-digit majority vote over the
      // doc's word hashes; equal signatures = near-dup bucket.
      "q23_simhash",
      (s, dir) => {
        import s.implicits._
        val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
        val tk = TextQueries.tokens(s, dir)
          .withColumn("h", md5s($"word"))
        val bitSums = (0 until 8).map(i =>
          sum(when(substring($"h", i + 1, 1).isin(hi: _*), 1L).otherwise(0L)).as(s"s$i"))
        val agg = tk.groupBy($"doc_id")
          .agg(bitSums.head, (bitSums.tail :+ count(lit(1)).as("n")): _*)
        val bits = (0 until 8).map(i =>
          when(col(s"s$i") * 2 > col("n"), "1").otherwise("0"))
        // measured-width bucket window (r9, Tables.byteWidth): one
        // signature row per doc, so the bucket-size window's exchange is
        // sized from the source bytes instead of the session default
        val p = Tables.byteWidth(s, dir, "documents")
        val sigd = agg.withColumn("simhash", concat(bits: _*))
        (if (p > 0) sigd.repartition(p, $"simhash") else sigd)
          .withColumn("bucket_size",
            count(lit(1)).over(Window.partitionBy($"simhash")))
          .select($"doc_id", $"simhash", $"bucket_size")
          .orderBy($"doc_id")
      },
      Some({
        val sums = (0 until 8).map(i =>
          s"SUM(CASE WHEN substring(md5(word),${i + 1},1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE 0 END) AS s$i")
          .mkString(", ")
        val bits = (0 until 8).map(i => s"CASE WHEN s$i * 2 > n THEN '1' ELSE '0' END").mkString(" || ")
        s"""${TextQueries.tokensCte}, agg AS (
          SELECT doc_id, $sums, COUNT(*) AS n FROM tk GROUP BY doc_id)
        SELECT doc_id, simhash,
          COUNT(*) OVER (PARTITION BY simhash) AS bucket_size FROM (
          SELECT doc_id, $bits AS simhash FROM agg) x ORDER BY doc_id"""
      })
    ),
    Q(
      // SimHash near-dup PAIRS — the Hamming-distance modality q23's
      // exact-bucket equality can't express: a 16-bit signature (md5
      // hex-digit majority votes), banded 4×4 for candidate generation
      // (pigeonhole: ≤ 2 differing bits can touch at most 2 of the 4
      // bands, so near-dups always share a band — recall is exact),
      // the q22 per-band bucket cap against degenerate piles, then
      // exact Hamming ≤ 2 verification. Pure joins + codegen'd ops.
      "q37_simhash_hamming",
      (s, dir) => {
        import s.implicits._
        val hi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
        val tk = TextQueries.tokens(s, dir).withColumn("h", md5s($"word"))
        val bitSums = (0 until 16).map(i =>
          sum(when(substring($"h", i + 1, 1).isin(hi: _*), 1L).otherwise(0L)).as(s"s$i"))
        val agg = tk.groupBy($"doc_id")
          .agg(bitSums.head, (bitSums.tail :+ count(lit(1)).as("n")): _*)
        val bits = (0 until 16).map(i =>
          when(col(s"s$i") * 2 > col("n"), "1").otherwise("0"))
        val sigs = agg.select($"doc_id", concat(bits: _*).as("sig"))
        // NOT rewritten to the q22 explode(array(struct)) banding (r9
        // negative result): measured 1.24 s floor vs 1.16 s for this
        // union form — runtime exchange reuse already deduplicates the
        // 4 branches (r8 audit: 4 unique + 4 reused), so the explode
        // only changed plan text, not work. Kept as the audited shape.
        val bands = (0 until 4).map(b =>
          sigs.select($"doc_id", $"sig", lit(b).as("band"),
            substring($"sig", b * 4 + 1, 4).as("bucket")))
        // measured-width exchanges (r9, Tables.byteWidth — the
        // lshJaccardPairs pattern): bucket window + band self-join share
        // one explicit (band,bucket) exchange; the candidate dedup rides
        // an explicit (a,b) exchange ((a,b) ⊆ the dedup keys, so the
        // aggregate's clustering is satisfied with no further shuffle).
        // Same-window interleaved pair at sf0.1: 1.80 → 1.38 s floor.
        val p = Tables.byteWidth(s, dir, "documents")
        val banded0 = bands.reduce(_ unionByName _)
        val banded = (if (p > 0) banded0.repartition(p, $"band", $"bucket") else banded0)
          .withColumn("bn",
            count(lit(1)).over(Window.partitionBy($"band", $"bucket")))
          .filter($"bn" <= 100)
          .drop("bn")
        val cand0 = banded.alias("l")
          .join(banded.alias("r"),
            col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
              col("l.doc_id") < col("r.doc_id"))
          .select(col("l.doc_id").as("a"), col("l.sig").as("sa"),
            col("r.doc_id").as("b"), col("r.sig").as("sb"))
        val cand =
          if (p > 0) cand0.repartition(p, $"a", $"b").dropDuplicates()
          else cand0.distinct()
        val hamming = (0 until 16).map(i =>
          when(substring($"sa", i + 1, 1) =!= substring($"sb", i + 1, 1), 1L)
            .otherwise(0L)).reduce(_ + _)
        cand.withColumn("hamming", hamming)
          .filter($"hamming" <= 2)
          .select($"a", $"b", $"hamming")
          .orderBy($"a", $"b")
      },
      Some({
        val sums = (0 until 16).map(i =>
          s"SUM(CASE WHEN substring(md5(word),${i + 1},1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE 0 END) AS s$i")
          .mkString(", ")
        val bits = (0 until 16)
          .map(i => s"CASE WHEN s$i * 2 > n THEN '1' ELSE '0' END").mkString(" || ")
        val bandRows = (0 until 4)
          .map(b => s"SELECT doc_id, sig, $b AS band, substring(sig, ${b * 4 + 1}, 4) AS bucket FROM sigs")
          .mkString(" UNION ALL ")
        val ham = (0 until 16)
          .map(i => s"CASE WHEN substring(sa,${i + 1},1) <> substring(sb,${i + 1},1) THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""${TextQueries.tokensCte}, agg AS (
          SELECT doc_id, $sums, COUNT(*) AS n FROM tk GROUP BY doc_id),
        sigs AS (SELECT doc_id, $bits AS sig FROM agg),
        bands AS ($bandRows),
        bandsf AS (
          SELECT doc_id, sig, band, bucket FROM (
            SELECT doc_id, sig, band, bucket,
                   COUNT(*) OVER (PARTITION BY band, bucket) AS bn
            FROM bands) b WHERE bn <= 100),
        cand AS (
          SELECT DISTINCT l.doc_id AS a, l.sig AS sa, r.doc_id AS b, r.sig AS sb
          FROM bandsf l JOIN bandsf r
            ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id)
        SELECT a, b, CAST($ham AS BIGINT) AS hamming FROM cand
        WHERE $ham <= 2 ORDER BY a, b"""
      })
    ),
    Q(
      // Language-ID heuristic: vowel-final ratio + mean word length (n-gram
      // heuristic stand-in; deterministic, no model).
      "q24_langid",
      (s, dir) => {
        import s.implicits._
        TextQueries.tokens(s, dir)
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).as("n"),
            sum(when($"word".rlike("[aeiou]$"), 1L).otherwise(0L)).as("vf"),
            sum(length($"word")).as("chars"))
          .withColumn("vowel_ratio", round($"vf" / $"n", 6))
          .withColumn("avg_len", round($"chars" / $"n", 6))
          .withColumn("lang_guess",
            when($"vowel_ratio" > 0.4, "es")
              .when($"avg_len" > 4.5, "de")
              .otherwise("en"))
          .select($"doc_id", $"vowel_ratio", $"avg_len", $"lang_guess")
          .orderBy($"doc_id")
      },
      Some(s"""${TextQueries.tokensCte}
        SELECT doc_id, vowel_ratio, avg_len,
          CASE WHEN vowel_ratio > 0.4 THEN 'es'
               WHEN avg_len > 4.5 THEN 'de' ELSE 'en' END AS lang_guess
        FROM (
          SELECT doc_id,
            ROUND(SUM(CASE WHEN regexp_matches(word, '[aeiou]$$') THEN 1 ELSE 0 END) / COUNT(*), 6) AS vowel_ratio,
            ROUND(SUM(length(word)) / COUNT(*), 6) AS avg_len
          FROM tk GROUP BY doc_id) a ORDER BY doc_id""")
    ),
    Q(
      // Language-ID, the REAL n-gram way (q24 is the cheap length/vowel
      // heuristic): a fixed per-language character-bigram profile table
      // is broadcast against the exploded bigram stream of each document;
      // score(lang) = profile-hit frequency / total bigrams, winner =
      // argmax with a deterministic lexicographic tiebreak. Plan shape:
      // narrow explode (~len-1 rows per doc) → broadcast join on the
      // 20-row profile → one groupBy — the bigram stream never shuffles
      // wider than (doc, lang) partials, so the op is linear in corpus
      // bytes at 100 TB. Profiles are tiny here (5 bigrams/lang); a
      // production table with 10^4 bigrams × 100 languages still
      // broadcasts.
      "q44_langid_bigram",
      (s, dir) => {
        import s.implicits._
        // NARROW formulation (r9, guide §2.4/§2.3): the old plan exploded
        // one row per character position, broadcast-joined the profile,
        // re-grouped (doc, lang) partials, left-joined a per-doc lang
        // grid and ran a per-doc window for the argmax — 5 exchanges and
        // 3 broadcasts to score 4 fixed profiles against each document.
        // Per-lang hit counts are a per-ROW computation (the q21/q22
        // shingle lesson): slice the bigram array once with
        // transform(sequence), count profile membership per language with
        // size(filter(...)), and take the argmax with one array_min over
        // (−score, lang, hits) structs — exactly row_number()'s
        // (score DESC, lang ASC) order, ties included. Zero joins, zero
        // windows, zero corpus shuffles before the output sort; per-doc
        // work is identical at 100 TB and parallelizes with the scan.
        // Results are bit-identical: hits = COUNT of matching positions,
        // score = round(hits/n, 6) computed from the same long/bigint
        // division (the winner's score is recomputed from its hits, not
        // un-negated, so 0.0 can never surface as -0.0).
        val langs = langProfiles.map(_._1).distinct.sorted
        val inSet: Map[String, String] = langs.map { l =>
          l -> langProfiles.filter(_._1 == l).map("'" + _._2 + "'").mkString("(", ",", ")")
        }.toMap
        val hitCols = langs.map { l =>
          expr(s"cast(size(filter(bg, x -> x in ${inSet(l)})) as bigint)").as(s"h_$l")
        }
        val docs = Tables.widened(s, dir, "documents")
          .select($"doc_id", lower($"text").as("t"))
          .filter(length($"t") >= 2)
          .select($"doc_id", (length($"t") - 1).cast("bigint").as("n"),
            expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))").as("bg"))
          .select($"doc_id" +: $"n" +: hitCols: _*)
        val winner = array_min(array(langs.map { l =>
          struct((-round(col(s"h_$l") / $"n", 6)).as("negs"), lit(l).as("lang"),
            col(s"h_$l").as("hits"))
        }: _*))
        docs.select($"doc_id", $"n", winner.as("w"))
          .select($"doc_id", $"w.lang".as("lang_guess"), $"w.hits".as("hits"),
            round($"w.hits" / $"n", 6).as("score"))
          .orderBy($"doc_id")
      },
      Some({
        val vals = langProfiles
          .map { case (l, b) => s"('$l','$b')" }.mkString(", ")
        s"""WITH prof(lang, bigram) AS (VALUES $vals),
        docs AS (
          SELECT doc_id, lower(text) AS t,
                 CAST(length(lower(text)) - 1 AS BIGINT) AS n
          FROM documents WHERE length(lower(text)) >= 2),
        bg AS (
          SELECT doc_id, n, substring(t, CAST(i AS INT), 2) AS bigram
          FROM (SELECT doc_id, n, t, unnest(range(1, length(t))) AS i FROM docs) x),
        hits AS (
          SELECT b.doc_id, b.n, p.lang, COUNT(*) AS hits
          FROM bg b JOIN prof p ON p.bigram = b.bigram
          GROUP BY b.doc_id, b.n, p.lang),
        scored AS (
          SELECT d.doc_id, l.lang, COALESCE(h.hits, 0) AS hits,
                 ROUND(COALESCE(h.hits, 0) / d.n, 6) AS score
          FROM docs d
          CROSS JOIN (SELECT DISTINCT lang FROM prof) l
          LEFT JOIN hits h ON h.doc_id = d.doc_id AND h.lang = l.lang)
        SELECT doc_id, lang AS lang_guess, hits, score FROM (
          SELECT doc_id, lang, hits, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, lang ASC) AS rk
          FROM scored) r WHERE rk = 1 ORDER BY doc_id"""
      })
    ),
    Q(
      // Quality scoring: stopword ratio, type/token ratio, length stats.
      "q25_quality",
      (s, dir) => {
        import s.implicits._
        val stop = Seq("the", "a", "of", "and", "in", "to")
        TextQueries.tokens(s, dir)
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).as("n_words"),
            countDistinct($"word").as("n_types"),
            sum(when($"word".isin(stop: _*), 1L).otherwise(0L)).as("n_stop"))
          .withColumn("stop_ratio", round($"n_stop" / $"n_words", 6))
          .withColumn("ttr", round($"n_types" / $"n_words", 6))
          .select($"doc_id", $"n_words", $"n_types", $"stop_ratio", $"ttr")
          .orderBy($"doc_id")
      },
      Some(s"""${TextQueries.tokensCte}
        SELECT doc_id, COUNT(*) AS n_words, COUNT(DISTINCT word) AS n_types,
          ROUND(SUM(CASE WHEN word IN ('the','a','of','and','in','to') THEN 1 ELSE 0 END) / COUNT(*), 6) AS stop_ratio,
          ROUND(COUNT(DISTINCT word) / COUNT(*), 6) AS ttr
        FROM tk GROUP BY doc_id ORDER BY doc_id""")
    ),
    Q(
      // Token counting: whitespace split vs. regex extraction.
      "q26_tokcount",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select($"doc_id",
            size(split($"text", "\\s+")).cast("bigint").as("n_ws"),
            size(regexp_extract_all($"text", lit("[a-z]+"), lit(0))).cast("bigint").as("n_re"),
            $"n_chars")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
        len(string_split_regex(text, '\s+')) AS n_ws,
        len(regexp_extract_all(text, '[a-z]+')) AS n_re,
        n_chars FROM documents ORDER BY doc_id""")
    ),
    Q(
      // Embedding-cosine near-dup detection — the last dedup modality:
      // LSH-bucketed candidate generation (12 md5-seeded ±1 hyperplanes,
      // exact-decimal signs → engine-independent buckets) + exact cosine
      // verification ≥ 0.95. The corpus has no natural near-dups (max
      // pairwise cosine 0.51), so every 20th vector gets a deterministic
      // perturbed clone (dimension 1 zeroed, id + 1e6) derived from the
      // same table on BOTH engines; the op then has real positives to
      // find. Plan shape: narrow augment + per-row bucketing (zero
      // shuffle), bucket self-join (the q22 band-join shape) with the
      // q22 per-bucket cap (bn <= 100, oracle-mirrored) so the join's
      // output stays bounded when the corpus outgrows the fixed 4096-
      // bucket key space (VERDICT r2 wrong-item 2), per-pair decimal
      // cosine. Recall < 100% by design — that's LSH.
      "q32_embed_neardup",
      (s, dir) => {
        import s.implicits._
        val planes: Array[Array[Double]] = Array.tabulate(12, 64) { (p, i) =>
          if ("01234567".indexOf(
            graft.functions.Hashing.md5hex(s"${p}_${i + 1}").charAt(0)) >= 0) 1.0 else -1.0
        }
        val pB = s.sparkContext.broadcast(planes)
        val base = Tables.widened(s, dir, "embeddings")
          .select($"vec_id", $"embedding").as[(Long, Array[Float])]
        val aug = base.flatMap { case (id, v) =>
          if (id % 20 == 0) {
            val c = v.clone(); c(0) = 0.0f
            Seq((id, v), (id + 1000000L, c))
          } else Seq((id, v))
        }
        val bucketed0 = aug.map { case (id, v) =>
          val ps = pB.value
          var bits = 0
          var p = 0
          while (p < ps.length) {
            var acc = java.math.BigDecimal.ZERO
            var i = 0
            while (i < v.length) {
              acc = acc.add(DecimalDot.d18(v(i).toDouble * ps(p)(i)))
              i += 1
            }
            if (acc.signum > 0) bits |= (1 << p)
            p += 1
          }
          (id, bits, v)
        }.toDF("vec_id", "bucket", "emb")
        // measured-width bucket exchange (r9, Tables.byteWidth): the cap
        // window and the bucket self-join below share it
        val p = Tables.byteWidth(s, dir, "embeddings")
        val bucketed = (if (p > 0) bucketed0.repartition(p, $"bucket") else bucketed0)
          .withColumn("bn", count(lit(1)).over(Window.partitionBy($"bucket")))
          .filter($"bn" <= 100)
          .drop("bn")
        val l = bucketed.select($"vec_id".as("a"), $"bucket", $"emb".as("ea"))
        val r = bucketed.select($"vec_id".as("b"), $"bucket", $"emb".as("eb"))
        l.join(r, Seq("bucket")).filter($"a" < $"b")
          .select($"a", $"ea", $"b", $"eb")
          .as[(Long, Array[Float], Long, Array[Float])]
          .map { case (a, ea, b, eb) =>
            (a, b, DecimalDot.cosine(
              DecimalDot.dot(ea, eb), DecimalDot.normSq(ea), DecimalDot.normSq(eb)))
          }.toDF("a", "b", "sim")
          .filter($"sim" > 0.95)
          .select($"a", $"b", round($"sim", 6).as("sim"))
          .orderBy($"a", $"b")
      },
      Some({
        val hv = "('0','1','2','3','4','5','6','7')"
        val sums = (0 until 12).map(p =>
          s"SUM(CAST(x * (CASE WHEN substring(md5('${p}_' || CAST(i AS VARCHAR)),1,1) IN $hv THEN 1.0 ELSE -1.0 END) AS DECIMAL(38,18))) AS p$p")
          .mkString(", ")
        val bits = (0 until 12).map(p =>
          s"CASE WHEN p$p > 0 THEN ${1 << p} ELSE 0 END").mkString(" + ")
        s"""WITH ex0 AS MATERIALIZED (
          SELECT vec_id, CAST(i AS INT) AS i, CAST(x AS DOUBLE) AS x FROM (
            SELECT vec_id, unnest(embedding) AS x,
                   unnest(range(1, len(embedding)+1)) AS i FROM embeddings) t),
        aug AS MATERIALIZED (
          SELECT vec_id, i, x FROM ex0
          UNION ALL
          SELECT vec_id + 1000000, i, CASE WHEN i = 1 THEN 0.0 ELSE x END
          FROM ex0 WHERE vec_id % 20 = 0),
        agg AS (SELECT vec_id, $sums FROM aug GROUP BY vec_id),
        bkt0 AS MATERIALIZED (SELECT vec_id, $bits AS bucket FROM agg),
        bkt AS MATERIALIZED (
          SELECT vec_id, bucket FROM (
            SELECT vec_id, bucket, COUNT(*) OVER (PARTITION BY bucket) AS bn
            FROM bkt0) b WHERE bn <= 100),
        nrm AS MATERIALIZED (
          SELECT vec_id, SUM(CAST(x*x AS DECIMAL(38,18))) AS nsq FROM aug GROUP BY vec_id),
        pairs AS (
          SELECT l.vec_id AS a, r.vec_id AS b FROM bkt l
          JOIN bkt r ON l.bucket = r.bucket AND l.vec_id < r.vec_id),
        sims AS (
          SELECT p.a, p.b,
            CAST(SUM(CAST(x1.x*x2.x AS DECIMAL(38,18))) AS DOUBLE)
              / sqrt(CAST(na.nsq AS DOUBLE) * CAST(nb.nsq AS DOUBLE)) AS sim
          FROM pairs p
          JOIN aug x1 ON x1.vec_id = p.a
          JOIN aug x2 ON x2.vec_id = p.b AND x2.i = x1.i
          JOIN nrm na ON na.vec_id = p.a
          JOIN nrm nb ON nb.vec_id = p.b
          GROUP BY p.a, p.b, na.nsq, nb.nsq)
        SELECT a, b, ROUND(sim, 6) AS sim FROM sims WHERE sim > 0.95 ORDER BY a, b"""
      })
    ),
    Q(
      // Content-defined chunking (rolling-hash fingerprinting for
      // PARTIAL-duplicate detection): a chunk boundary opens wherever the
      // hash of the 3-gram window ending at a token starts with hex '0'
      // (expected chunk length 16 tokens), so an insertion early in a
      // document shifts only the chunk it lands in — unlike q27's
      // whole-doc hash. Output: one fingerprint row per chunk. Window +
      // running-sum + one groupBy; no joins.
      "q33_cdc_chunks",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"doc_id").orderBy($"tok")
        val grams = TextQueries.tokens(s, dir)
          .withColumn("w2", lag($"word", 2).over(w))
          .withColumn("w1", lag($"word", 1).over(w))
          .withColumn("boundary",
            when($"tok" === 1, 1L).otherwise(
              when(substring(md5s(concat_ws(" ",
                coalesce($"w2", lit("")), coalesce($"w1", lit("")), $"word")), 1, 1) === "0",
                1L).otherwise(0L)))
          .withColumn("chunk_id", sum($"boundary").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        grams.groupBy($"doc_id", $"chunk_id")
          .agg(
            count(lit(1)).as("n_tokens"),
            md5s(array_join(
              transform(array_sort(collect_list(struct($"tok", $"word"))),
                x => x.getField("word")),
              " ")).as("chunk_fp"))
          .orderBy($"doc_id", $"chunk_id")
      },
      Some(s"""${TextQueries.tokensCte}, grams AS (
          SELECT doc_id, tok, word,
            CASE WHEN tok = 1 THEN 1
                 WHEN substring(md5(COALESCE(lag(word, 2) OVER w, '') || ' ' ||
                                    COALESCE(lag(word, 1) OVER w, '') || ' ' || word), 1, 1) = '0'
                 THEN 1 ELSE 0 END AS boundary
          FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY tok)),
        chunks AS (
          SELECT doc_id, tok, word,
            CAST(SUM(boundary) OVER (PARTITION BY doc_id ORDER BY tok
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS chunk_id
          FROM grams)
        SELECT doc_id, chunk_id, COUNT(*) AS n_tokens,
               md5(string_agg(word, ' ' ORDER BY tok)) AS chunk_fp
        FROM chunks GROUP BY doc_id, chunk_id ORDER BY doc_id, chunk_id""")
    ),
    Q(
      // Document fingerprint: md5 over whitespace-normalized lowercase text.
      "q27_fingerprint",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select($"doc_id",
            md5s(trim(regexp_replace(lower($"text"), "\\s+", " "))).as("fp"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        FROM documents ORDER BY doc_id""")
    )
  )
}
