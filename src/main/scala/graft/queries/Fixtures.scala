package graft.queries

import org.apache.spark.sql.SparkSession
import graft.conll.InputDoc

/** Write-once /tmp fixtures backing the file-ingest, manager and
  * streaming registry entries. Each is keyed by the source table's
  * content fingerprint ([[Tables.srcTag]]) plus a v-tag bumped on
  * generator changes, so a regenerated testdata table or an older build
  * can never satisfy the marker check.
  *
  * Extracted from the entry bodies (ADVICE r5) so the bench harness can
  * materialize them OUTSIDE the timed region: a fresh host's first
  * kg_file_ingest / kg_stream_* timing otherwise includes one-time
  * fixture generation, inflating cold numbers and cold scale ratios
  * relative to entries without cached fixtures. The entries still call
  * these on their own path (correctness never depends on the bench
  * having run first).
  */
object Fixtures {

  /** Det spans table as parquet (the north-rule Iceberg-shaped input:
    * doc_id + array<struct<kind,text,media_ref,offset>>) — shared by the
    * K7 manager and the lifted-pipeline streaming entry. */
  def detSpansParquet(s: SparkSession, dir: String): String = {
    val p = s"/tmp/graft-manager-dets-v1-${new java.io.File(dir).getName}-${Tables.srcTag(dir, "documents")}"
    if (!new java.io.File(p, "_SUCCESS").exists())
      KgOracle.detDocs(s, dir).write.mode("overwrite").parquet(p)
    p
  }

  /** The det corpus rendered to ONE .conllu.gz FILE PER DOCUMENT
    * (distributed, executor-side — the layout a migrating corpus actually
    * has on disk), for the S4 raw-file ingest gate. */
  def fileIngestCorpus(s: SparkSession, dir: String): java.io.File = {
    val outDir = new java.io.File(
      s"/tmp/graft-file-ingest-v1-${new java.io.File(dir).getName}-${Tables.srcTag(dir, "documents")}")
    if (!new java.io.File(outDir, "_SUCCESS").exists()) {
      outDir.mkdirs()
      val base = outDir.getAbsolutePath
      KgOracle.detDocs(s, dir).foreachPartition {
        (it: Iterator[InputDoc]) =>
          it.foreach { d =>
            val os = new java.util.zip.GZIPOutputStream(
              new java.io.FileOutputStream(
                new java.io.File(base, s"${d.doc_id}.conllu.gz")))
            try os.write(d.spans.map(_.text).mkString("\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally os.close()
          }
      }
      new java.io.File(outDir, "_SUCCESS").createNewFile()
    }
    outDir
  }

  /** Per-span fragment rows (closed by a doc_end marker) for the stateful
    * cross-batch assembly gate; returns the entry's base dir (input under
    * `base/in`, sink/checkpoint under `base/out|cp`). */
  def streamFrags(s: SparkSession, dir: String): String = {
    import s.implicits._
    val base = s"/tmp/graft-stream-frags-v1-${new java.io.File(dir).getName}-${Tables.srcTag(dir, "documents")}"
    val in = s"$base/in"
    if (!new java.io.File(in, "_SUCCESS").exists())
      KgOracle.detDocs(s, dir).flatMap { d =>
        d.spans.map(sp =>
          graft.streaming.StreamingPipeline.SpanFrag(
            d.doc_id, sp.kind, sp.text, sp.media_ref, sp.offset)) :+
          graft.streaming.StreamingPipeline.SpanFrag(d.doc_id, "doc_end", "", "",
            d.spans.map(_.offset).maxOption.getOrElse(0) + 1)
      }.write.mode("overwrite").parquet(in)
    base
  }

  /** Events table copied to a stream-source directory for the
    * watermarked-window gate; returns the entry's base dir. */
  def streamEvents(s: SparkSession, dir: String): String = {
    val base = s"/tmp/graft-stream-events-${new java.io.File(dir).getName}-${Tables.srcTag(dir, "events")}"
    val in = s"$base/in"
    if (!new java.io.File(in, "_SUCCESS").exists())
      Tables.events(s, dir).write.mode("overwrite").parquet(in)
    base
  }

  /** Materialize every fixture for one SF dir (bench pre-pass). */
  def ensureAll(s: SparkSession, dir: String): Unit = {
    detSpansParquet(s, dir)
    fileIngestCorpus(s, dir)
    streamFrags(s, dir)
    streamEvents(s, dir)
  }
}
