package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Anti-vacuity gate (VERDICT r7 item 4): kg_entity_canonical passed the
  * driver's rows+schema+hash compare for FOUR rounds while its CC merged
  * nothing — an identity-passing oracle looks exactly like a working one,
  * because the oracle mirrors the same trivially-satisfied closed form.
  * This spec pins, per det entry, the intermediate cardinality that makes
  * the gated semantics NON-TRIVIAL on the driver testdata: clusters that
  * actually merge, dedup groups with actual duplicates, redactions that
  * actually fire, candidate sets that are actually non-empty. A data or
  * code change that silently returns any gate to vacuity fails here, the
  * same day.
  *
  * Run at sf0.01 — the driver's correctness SF, i.e. the scale at which
  * vacuity would actually hollow out CORRECTNESS_r{N}.json.
  */
class NonVacuitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private def run(name: String): DataFrame = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.persist()
    df.count()
    df
  }
  private def done(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("kg_entity_canonical: sameAs edges non-empty AND the rewrite merges entities") {
    val (_, edges) = graft.queries.KgQueries.entityCanonicalInputs(spark, dir)
    val n = edges.count()
    assert(n > 0, s"sameAs edge set is EMPTY ($n) — the CC gate is vacuous again (r3–r7 regression class)")
    val canon = run("kg_entity_canonical")
    val link = SparkEntry.queries("kg_pipeline_link")(spark, dir)
    val before = link.filter(col("pred") === "conll:ENTITY").select("obj").distinct().count()
    val after = canon.filter(col("pred") === "conll:ENTITY").select("obj").distinct().count()
    assert(after < before,
      s"canonicalization is an identity rewrite: $before entities before, $after after")
    done(canon)
  }

  test("q20_dedup_exact: duplicate groups with >1 member exist") {
    val df = run("q20_dedup_exact")
    assert(df.filter(col("group_size") > 1).count() > 0,
      "no multi-member dup group — exact dedup never grouped anything")
    done(df)
  }

  test("q39_redact: both redacted and untouched documents flow through the gate") {
    val df = run("q39_redact")
    assert(df.filter(col("n_redacted") > 0).count() > 0, "redaction never fired (identity rewrite)")
    assert(df.filter(col("n_redacted") === 0).count() > 0, "no clean docs — the 0-redaction branch is untested")
    done(df)
  }

  test("q19_canonicalize_cc: components actually merge nodes") {
    val df = run("q19_canonicalize_cc")
    val nodes = df.count()
    val comps = df.select("component").distinct().count()
    assert(comps < nodes, s"CC merged nothing: $nodes nodes, $comps components")
    done(df)
  }

  test("q34_dup_clusters: multi-node duplicate clusters exist") {
    val df = run("q34_dup_clusters")
    val nodes = df.count()
    val comps = df.select("component").distinct().count()
    assert(comps < nodes, s"no multi-node cluster: $nodes nodes, $comps components")
    done(df)
  }

  test("q42_cc_chain: provenance components span multiple docs") {
    val df = run("q42_cc_chain")
    val multi = df.groupBy("component").count().filter(col("count") > 1).count()
    assert(multi > 0, "every provenance component is a singleton — the chain join matched nothing")
    done(df)
  }

  test("q30_tree_depth: closure walks past depth 1") {
    val df = run("q30_tree_depth")
    val maxDepth = df.agg(max(col("depth").cast("long"))).head().getLong(0)
    assert(maxDepth > 1, s"max depth $maxDepth — the iterative closure never iterated")
    done(df)
  }

  test("candidate-pair generators are non-empty (q22/q43/q32/q37)") {
    Seq("q22_lsh_jaccard", "q43_lsh_r2", "q32_embed_neardup", "q37_simhash_hamming").foreach { n =>
      val df = run(n)
      assert(df.count() > 0, s"$n produced ZERO candidate pairs — banding/probing found nothing")
      done(df)
    }
  }

  test("q23_simhash: multi-doc buckets exist") {
    val df = run("q23_simhash")
    assert(df.filter(col("bucket_size") > 1).count() > 0,
      "every simhash bucket is a singleton — banding collides nothing")
    done(df)
  }

  test("q41_decontaminate: both contaminated and clean docs present") {
    val df = run("q41_decontaminate")
    assert(df.filter(col("contaminated")).count() > 0, "decontamination flagged nothing")
    assert(df.filter(!col("contaminated")).count() > 0, "everything flagged — the clean branch is untested")
    done(df)
  }

  test("q44_langid_bigram: more than one language is ever assigned") {
    val df = run("q44_langid_bigram")
    assert(df.select("lang_guess").distinct().count() > 1,
      "argmax picked one language for every doc — profiles are not discriminating")
    done(df)
  }

  test("q46_url_canonical: canonicalization actually collapses URL variants") {
    val df = run("q46_url_canonical")
    assert(df.filter(col("n_dups") > 1).count() > 0,
      "no canonical group has >1 member — URL rewriting collapsed nothing")
    done(df)
  }

  test("q18_entity_link: the gazetteer join links mentions") {
    val df = run("q18_entity_link")
    assert(df.count() > 0, "zero entity links")
    done(df)
  }

  test("q04_customers_no_orders: the anti-join excludes someone") {
    val df = run("q04_customers_no_orders")
    assert(df.count() > 0, "anti-join returned nothing — NOT EXISTS semantics unexercised")
    done(df)
  }

  test("kg context windows match (antecedent + cataphora)") {
    Seq("kg_context_antecedent", "kg_context_cataphora").foreach { n =>
      val df = run(n)
      assert(df.count() > 0, s"$n matched zero contexts — lookback/lookahead unexercised")
      done(df)
    }
  }

  test("kg_srl_args: argument roles are actually attached") {
    val df = run("kg_srl_args")
    assert(df.filter(col("pred").isin("conll:A0", "conll:A1", "conll:A2")).count() > 0,
      "no ARG triples — the SRL column expansion emitted nothing")
    done(df)
  }

  test("q47_ngram_boilerplate: boilerplate n-grams cross the threshold") {
    val df = run("q47_ngram_boilerplate")
    assert(df.count() > 0, "no n-gram passed the boilerplate threshold")
    done(df)
  }
}
