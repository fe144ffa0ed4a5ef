package graft.tools

import org.apache.spark.sql.SparkSession

/** Where does kg_file_ingest's floor go beyond kg_pipeline_analyze's?
  * Times (a) the det span synthesis the analyze entry reads, (b) the
  * raw gz-file ingest (TsvIngest.readFiles) alone, (c) the full ingest
  * entry — so the read-side delta is measured, not guessed.
  * Usage: runMain graft.tools.IngestProbe <sfDir> <n>
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val n = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Fixtures.ensureAll(spark, sfDir)
    val outDir = graft.queries.Fixtures.fileIngestCorpus(spark, sfDir)
    val (r, w, d) = HostGauge.ioCanary()
    println(f"[ingestprobe] io canary read ${r}%8.1f MB/s write ${w}%8.1f MB/s direct=$d")
    def floor(tag: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[ingestprobe] $tag%-26s min ${ts.min}%6.3f runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    floor("detDocs.count")(graft.queries.KgOracle.detDocs(spark, sfDir).count())
    floor("readFiles.count")(
      graft.conll.TsvIngest.readFiles(spark, s"$outDir/*.conllu.gz").count())
    floor("readFiles.spans.agg")(
      graft.conll.TsvIngest.readFiles(spark, s"$outDir/*.conllu.gz")
        .toDF().selectExpr("sum(size(spans))").count())
    // inline variant of readFiles' executor loop with java.nio reads for
    // file: URIs (no per-file Hadoop FileSystem/ChecksumFileSystem
    // machinery) — same listing, same partitioning, same span building
    def readFilesNio(path: String): org.apache.spark.sql.Dataset[graft.conll.InputDoc] = {
      import spark.implicits._
      val hadoopConf = spark.sparkContext.hadoopConfiguration
      val hp = new org.apache.hadoop.fs.Path(path)
      val fs = hp.getFileSystem(hadoopConf)
      val files = Option(fs.globStatus(hp)).getOrElse(Array.empty)
        .filter(_.isFile).map(_.getPath.toUri.toString)
      val par = math.max(1, math.min(files.length, spark.sparkContext.defaultParallelism * 4))
      spark.createDataset(files.toSeq.sorted)
        .repartition(par)
        .mapPartitions { it =>
          it.map { p =>
            val uri = new java.net.URI(p)
            val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(uri))
            val bytes = if (p.endsWith(".gz")) {
              val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(raw))
              try in.readAllBytes() finally in.close()
            } else raw
            require(graft.conll.Pipeline.isValidUtf8(bytes), s"non-UTF-8 input file: $p")
            graft.conll.InputDoc(graft.conll.TsvIngest.docIdOf(p),
              graft.conll.TsvIngest.toSpans(
                new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
          }
        }
    }
    floor("readFilesNio.count")(readFilesNio(s"$outDir/*.conllu.gz").count())
    // interleaved same-window pair
    val ha = scala.collection.mutable.ArrayBuffer[Double]()
    val ni = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to n) {
      var t0 = System.nanoTime()
      graft.conll.TsvIngest.readFiles(spark, s"$outDir/*.conllu.gz").count()
      ha += (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      readFilesNio(s"$outDir/*.conllu.gz").count()
      ni += (System.nanoTime() - t0) / 1e9
    }
    println(f"[ingestprobe] PAIR hadoop min ${ha.min}%6.3f runs ${ha.map(t => f"$t%.3f").mkString(" ")}")
    println(f"[ingestprobe] PAIR nio    min ${ni.min}%6.3f runs ${ni.map(t => f"$t%.3f").mkString(" ")}")
    val fn = graft.SparkEntry.queries("kg_file_ingest")
    floor("kg_file_ingest")(fn(spark, sfDir).count())
    val fa = graft.SparkEntry.queries("kg_pipeline_analyze")
    floor("kg_pipeline_analyze")(fa(spark, sfDir).count())
    val (r2, w2, d2) = HostGauge.ioCanary()
    println(f"[ingestprobe] io canary read ${r2}%8.1f MB/s write ${w2}%8.1f MB/s direct=$d2")
    spark.stop()
  }
}
