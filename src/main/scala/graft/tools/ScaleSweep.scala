package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.Hashing

/** Third-decade scale evidence (VERDICT r4 item 4): the committed
  * two-SF bench curves cover one measured decade (sf0.01 → sf0.1); this
  * tool adds sf0.1 → sf1-equivalent by generating a deterministic
  * synthetic corpus with the SAME generator at two sizes (5k docs — the
  * sf0.1 shape — and 50k docs) and timing the most expensive registry
  * entries at both. Using one generator for both sizes is what makes the
  * ratio meaningful; the absolute numbers are not comparable with the
  * driver testdata runs (different corpus), the RATIOS are the evidence.
  *
  * The corpus mirrors the driver testdata's measured shape: 30-word
  * uniform vocabulary, doc length 10–100 (avg ~55), 20 round-robin
  * sources (→ q42's provenance chains grow 10× in diameter), ~4%
  * planted near-dup clones (every 10th word substituted → LSH/Jaccard
  * work scales with N) and 0.5% exact dups, embeddings at 0.4 vecs/doc,
  * 64-dim, labels 0–9. Everything derives from md5(id …) — no RNG, no
  * external data.
  */
object ScaleSweep {

  private val vocab = Vector(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch")

  // floorMod keeps the value in [0, 2^31): .toInt.abs would return a
  // NEGATIVE number when the truncated bits equal Int.MinValue
  private def h(s: String): Int =
    java.lang.Math.floorMod(
      java.lang.Long.parseLong(Hashing.md5hex(s).substring(0, 12), 16),
      Int.MaxValue.toLong).toInt

  private def baseWords(id: Long): Array[String] = {
    val n = 10 + h(s"len|$id") % 91
    Array.tabulate(n)(i => vocab(h(s"w|$id|$i") % vocab.size))
  }

  def docText(id: Long): String =
    if (id % 200 == 199) docText(id - 1) // exact dup of the predecessor
    else if (id % 25 == 24) {            // near-dup: every 10th word swapped
      val w = baseWords(id - 1)
      w.indices.foreach(i =>
        if (i % 10 == 9) w(i) = vocab(h(s"p|$id|$i") % vocab.size))
      w.mkString(" ")
    } else baseWords(id).mkString(" ")

  def embedding(id: Long): Array[Float] =
    Array.tabulate(64)(i => ((h(s"e|$id|$i") % 2001) - 1000) / 1000.0f)

  private val langs = Vector("en", "en", "en", "en", "en", "en", "en", "en",
    "de", "de", "de", "zh", "zh", "zh", "fr", "fr", "fr", "es", "es", "es")

  def generate(spark: SparkSession, dir: String, nDocs: Long): Unit = {
    import spark.implicits._
    if (new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists()) return
    spark.range(0, nDocs, 1, 64).map { id =>
      val text = docText(id)
      (id, text, langs((id % 20).toInt), s"src${id % 20}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.range(0, nDocs * 2 / 5, 1, 64).map { id =>
      (id, embedding(id), (id % 10).toInt)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** The per-round cost leaders of BENCH_r04 plus the two bounded
    * embedding ops — the entries whose 100 TB claims lean on caps,
    * banding, and O(log n) round counts. */
  private val entries = Seq(
    "q22_lsh_jaccard", "q34_dup_clusters", "q43_lsh_r2", "q42_cc_chain",
    "q30_tree_depth", "q31_ann_ivf", "q32_embed_neardup",
    "kg_pipeline_parse", "kg_pipeline_link", "kg_entity_canonical",
    "kg_eval_possynt", "kg_brackets_spanuri", "kg_tenten",
    "q44_langid_bigram", "kg_file_ingest", "kg_stream_analyze")

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/scale_sweep.json"
    // v-tag: bump when the generator changes (v2: floorMod hash) so a
    // stale /tmp corpus can never satisfy the _SUCCESS check
    val dirA = "/tmp/graft-scale-1x-v2"
    val dirB = "/tmp/graft-scale-10x-v2"
    val nA = 5000L // the sf0.1 shape
    val nB = 50000L // the sf1 shape

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, dirA, nA)
    generate(spark, dirB, nB)

    // min-of-2 per (entry, size) — the warm floor, per the bench
    // methodology (cold first executions swing 2-3× on this host)
    def time(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val rows = entries.map { name =>
      val tA = time(name, dirA)
      val tB = time(name, dirB)
      System.err.println(f"[scale] $name%-22s ${tA}%6.2f s -> ${tB}%6.2f s  ratio ${tB / tA}%5.2f")
      (name, tA, tB)
    }
    val json = rows.map { case (n, a, b) =>
      f""""$n":{"t_5k":$a%.3f,"t_50k":$b%.3f,"ratio":${b / a}%.3f}"""
    }.mkString(
      s"""{"n_docs_small":$nA,"n_docs_large":$nB,"entries":{""",
      ",",
      "}}")
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
  }
}
