package graft.tools

import org.apache.spark.sql.SparkSession
import graft.conll.{DocGen, Pipeline, InputDoc}

/** Per-stage cost breakdown of the KG pipeline at a fixed thread count. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val threads = args.lift(1).map(_.toInt).getOrElse(16)
    val path = s"/tmp/graft-probe-docs-$nDocs"
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    if (!new java.io.File(path, "_SUCCESS").exists())
      s.range(0, nDocs, 1, 64).map(id => DocGen.genDoc(42L, id))
        .write.mode("overwrite").parquet(path)

    def time(name: String)(f: => Long): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"STAGE $name%-28s min=${ts.map(_._1).min}%.2fs rows=${ts.head._2}")
    }
    def docs = s.read.parquet(path).as[InputDoc]
    time("read-only")(docs.count())
    time("read+parse")(Pipeline.parse(docs, DocGen.columns).count())
    time("read+parse+triples")(Pipeline.triples(Pipeline.parse(docs, DocGen.columns)).count())
    time("read+parse+rewrite")(
      Pipeline.rewrite(Pipeline.parse(docs, DocGen.columns), Pipeline.analyzeCascade).count())
    time("full")(Pipeline.triples(
      Pipeline.rewrite(Pipeline.parse(docs, DocGen.columns), Pipeline.analyzeCascade)).count())
    s.stop()
  }
}
