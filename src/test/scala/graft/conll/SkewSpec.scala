package graft.conll

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Skew handling for the gazetteer join (north_rule: "salted-join skew
  * handling for hot predicates and high-degree entities"). */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("salted join spreads a Zipf-hot surface over multiple key groups") {
    import spark.implicits._
    // Zipf-ish mentions: 'the' dominates (~50% of all mentions)
    val words = (1 to 2000).map(i =>
      if (i % 2 == 0) "the" else s"w${i % 37}")
    val triples = words.zipWithIndex.map { case (w, i) =>
      TripleRow("d1", 1L + i / 40, s":s${1 + i / 40}_${i % 40 + 1}", "conll:WORD", w, false)
    }.toDS.toDF()
    val gaz = EntityLinker.gazetteerFromVocab(
      words.distinct.toDF("word"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join regime (the case salting exists for)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = EntityLinker.linkSalted(triples, gaz, saltBuckets = 8)
      // correctness: identical to the broadcast result
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      val reference = EntityLinker.linkBroadcast(triples, gaz)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(salted.exceptAll(reference).isEmpty && reference.exceptAll(salted).isEmpty)
      // the hot key's mentions are spread across >1 salt bucket, so no
      // single reducer sees all of 'the' (the join key is (surface, salt))
      val hotSalts = triples.filter($"obj" === "the")
        .select(pmod(xxhash64($"subj"), lit(8)).as("salt"))
        .distinct().count()
      assert(hotSalts > 4, s"hot key only reached $hotSalts salt buckets")
      // and the physical join is a shuffle join on the salted key
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle join, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("linkUnioned: fused broadcast pass ≡ union(t, broadcastJoin(t)); salted fallback kicks in") {
    import spark.implicits._
    val words = (1 to 200).map(i => s"word${i % 11}")
    val triples = words.zipWithIndex.flatMap { case (w, i) =>
      Seq(
        TripleRow("d1", 1L, s":s1_${i + 1}", "conll:WORD", w, false),
        TripleRow("d1", 1L, s":s1_${i + 1}", "rdf:type", "nif:Word", true))
    }.toDS
    val gaz = EntityLinker.gazetteerFromVocab(words.distinct.toDF("word"))
    val fused = EntityLinker.linkUnioned(triples, gaz)
    val reference = triples.toDF().unionByName(
      EntityLinker.linkBroadcast(triples.toDF(), gaz))
    assert(fused.exceptAll(reference).isEmpty && reference.exceptAll(fused).isEmpty)
    // broadcastMax below the gazetteer size → the salted-union regime,
    // same result set
    val salted = EntityLinker.linkUnioned(triples, gaz, broadcastMax = 3)
    assert(salted.exceptAll(reference).isEmpty && reference.exceptAll(salted).isEmpty)
  }
}
