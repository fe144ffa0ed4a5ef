package graft.tools

import org.apache.spark.sql.SparkSession
import graft.conll._

/** Robustness sweep: the reference's full bundled en-ud-train corpus
  * through parse + analyze (real-data edge cases beyond DocGen). */
object UdTrainCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val src = scala.io.Source.fromInputStream(
      new java.util.zip.GZIPInputStream(new java.io.FileInputStream(
        "/root/reference/data/ud/UD_English-master/en-ud-train.conllu.gz")), "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    // split into ~200 pseudo-docs at sentence boundaries for parallelism
    val docs = scala.collection.mutable.ArrayBuffer[InputDoc]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    var sentCount = 0
    for (l <- lines) {
      cur += l
      if (l.trim.isEmpty) { sentCount += 1
        if (sentCount % 60 == 0) {
          docs += InputDoc(s"t${docs.size}", cur.toSeq.zipWithIndex.map { case (x, i) =>
            Span(if (x.trim.isEmpty) "sentence_break" else if (x.startsWith("#")) "comment" else "token", x, "", i) })
          cur = scala.collection.mutable.ArrayBuffer[String]()
        }
      }
    }
    if (cur.nonEmpty) docs += InputDoc(s"t${docs.size}", cur.toSeq.zipWithIndex.map { case (x, i) =>
      Span(if (x.trim.isEmpty) "sentence_break" else if (x.startsWith("#")) "comment" else "token", x, "", i) })
    val ds = s.createDataset(docs.toSeq).repartition(32)
    val t0 = System.nanoTime()
    val triples = Pipeline.rewriteTriples(
      Pipeline.parse(ds, DocGen.columns), Pipeline.analyzeCascade)
    val n = triples.count()
    val words = triples.filter(t => t.pred == "rdf:type" && t.obj == "nif:Word").count()
    val matched = triples.filter(_.pred == "conll:POSsynt_match").count()
    val pos = triples.filter(t => t.pred == "conll:POSsynt_match" && t.obj == "1").count()
    println(f"UDTRAIN triples=$n words=$words match_flags=$matched agree=${pos * 100.0 / matched}%.1f%% t=${(System.nanoTime()-t0)/1e9}%.1fs")
    s.stop()
  }
}
