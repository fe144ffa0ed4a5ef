package graft.conll

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("docs → parse → rewrite → triples end to end") {
    import spark.implicits._
    val docs = DocGen.docs(spark, 20)
    val metrics = Pipeline.newMetrics(spark, Pipeline.analyzeCascade)
    val sents = Pipeline.rewrite(
      Pipeline.parse(docs, DocGen.columns), Pipeline.analyzeCascade, Some(metrics))
    val t = Pipeline.triples(sents).cache()
    assert(t.count() > 0)
    // analyze outputs present
    assert(t.filter($"pred" === "conll:POSsynt_match").count() > 0)
    // every word carries a match flag
    val words = t.filter($"pred" === "rdf:type" && $"obj" === "nif:Word")
      .select($"subj", $"doc_id").distinct.count()
    val flags = t.filter($"pred" === "conll:POSsynt_match").select($"subj", $"doc_id").distinct.count()
    assert(words == flags)
    val m = metrics.toDf(spark).collect()
    assert(m.nonEmpty && m.forall(_.getAs[Long]("iterations") > 0))
    t.unpersist()
  }

  test("span-sequence invariant: docsOut preserves (kind,text,media_ref,order) per row") {
    import spark.implicits._
    val docs = DocGen.docs(spark, 15)
    val out = Pipeline.docsOut(docs, DocGen.columns, Pipeline.analyzeCascade)
    val in = docs.toDF().select($"doc_id", $"spans".as("spans_in"))
    val joined = out.join(in, "doc_id")
    assert(joined.filter(not($"spans" <=> $"spans_in")).count() == 0)
    assert(out.filter($"n_triples".isNull || $"n_triples" === 0).count() == 0)
  }

  test("entity linking: broadcast and salted joins produce identical links") {
    import spark.implicits._
    val docs = DocGen.docs(spark, 10)
    val t = Pipeline.triples(Pipeline.parse(docs, DocGen.columns)).toDF().cache()
    val vocab = t.filter($"pred" === "conll:WORD").select($"obj".as("word"))
    val gaz = EntityLinker.gazetteerFromVocab(vocab).cache()
    val a = EntityLinker.linkBroadcast(t, gaz)
    val b = EntityLinker.linkSalted(t, gaz, saltBuckets = 4)
    assert(a.count() > 0)
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
    t.unpersist(); gaz.unpersist()
  }

  test("canonicalization rewrites linked entities to component minimum") {
    import spark.implicits._
    val linked = Seq(
      ("d1", 1L, ":s1_1", "conll:ENTITY", "ent:b", true),
      ("d1", 1L, ":s1_2", "conll:ENTITY", "ent:c", true),
      ("d1", 1L, ":s1_3", "conll:ENTITY", "ent:z", true)
    ).toDF("doc_id", "sent", "subj", "pred", "obj", "obj_is_uri")
    val sameAs = Seq(("ent:a", "ent:b"), ("ent:b", "ent:c")).toDF("src", "dst")
    val canon = EntityLinker.canonicalize(spark, linked, sameAs)
    val objs = canon.select($"subj", $"obj").as[(String, String)].collect().toMap
    assert(objs(":s1_1") == "ent:a")
    assert(objs(":s1_2") == "ent:a")
    assert(objs(":s1_3") == "ent:z") // not in any component → unchanged
  }

  test("checkpoint runner resumes: completed buckets are skipped, output identical") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val docs = DocGen.docs(spark, 12)
    val full = CheckpointRunner.run(spark, docs, DocGen.columns, Pipeline.analyzeCascade, dir, nBuckets = 4)
    val n1 = full.count()
    assert(CheckpointRunner.lineage(spark, dir).count() == 4)
    // simulate partial failure: remove one marker + its output
    val manifest = new java.io.File(s"$dir/_manifest/bucket-2.json")
    assert(manifest.exists()); manifest.delete()
    val resumed = CheckpointRunner.run(spark, docs, DocGen.columns, Pipeline.analyzeCascade, dir, nBuckets = 4)
    assert(resumed.count() == n1)
    val lin = CheckpointRunner.lineage(spark, dir)
    assert(lin.filter($"status" === "done").count() == 4)
  }

  test("checkpoint resume is hash-identical to straight-through on the det corpus") {
    import spark.implicits._
    // Registry-adjacent proof (BASELINE kill-and-resume target): the SAME
    // det corpus + cascade the driver gates as kg_pipeline_analyze, run
    // once straight through and once interrupted-then-resumed; the full
    // sorted triple tables must be equal row-for-row.
    val docs = graft.queries.KgOracle.detDocs(spark, "/root/testdata/sf0.001")
    val cols = graft.queries.KgOracle.detCols
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"sent", $"subj", $"pred", $"obj", $"obj_is_uri")
        .as[(String, Long, String, String, String, Boolean)].collect().sorted
    val dirA = java.nio.file.Files.createTempDirectory("graft-ckpt-straight").toString
    val expected = sortedRows(
      CheckpointRunner.run(spark, docs, cols, Pipeline.analyzeCascade, dirA, nBuckets = 4))
    assert(expected.nonEmpty)

    val dirB = java.nio.file.Files.createTempDirectory("graft-ckpt-resume").toString
    CheckpointRunner.run(spark, docs, cols, Pipeline.analyzeCascade, dirB, nBuckets = 4)
    // crash scenario 1: bucket 1 never completed (output + marker gone)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$dirB/bucket=1"))
    new java.io.File(s"$dirB/_manifest/bucket-1.json").delete()
    // crash scenario 2: bucket 3 died between parquet commit and marker
    // write (output present, marker missing) — must safely re-run
    new java.io.File(s"$dirB/_manifest/bucket-3.json").delete()
    val resumed = CheckpointRunner.run(spark, docs, cols, Pipeline.analyzeCascade, dirB, nBuckets = 4)
    assert(sortedRows(resumed).sameElements(expected))
    assert(CheckpointRunner.lineage(spark, dirB).filter($"status" === "done").count() == 4)
  }
}
