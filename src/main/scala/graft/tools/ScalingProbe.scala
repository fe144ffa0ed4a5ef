package graft.tools

import org.apache.spark.sql.SparkSession
import graft.conll.{DocGen, Pipeline}

/** Scratch harness for diagnosing parallel scaling of the KG pipeline. */
object ScalingProbe {
  private def session(threads: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$threads]")
      .appName(s"probe-$threads")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def run(spark: SparkSession, path: String): (Double, Long) = {
    import spark.implicits._
    val docs = spark.read.parquet(path).as[graft.conll.InputDoc]
    val t0 = System.nanoTime()
    val n = Pipeline.rewriteTriples(
      Pipeline.parse(docs, DocGen.columns), Pipeline.analyzeCascade).count()
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(30000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val levels = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(8, 32, 8, 32)
    val path = s"/tmp/graft-probe-docs-$nDocs"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      val s = session(32)
      s.sparkContext.setLogLevel("ERROR")
      import s.implicits._
      s.range(0, nDocs, 1, 64).map(id => DocGen.genDoc(42L, id))
        .write.mode("overwrite").parquet(path)
      s.stop()
    }
    for (threads <- levels) {
      val s = session(threads)
      s.sparkContext.setLogLevel("ERROR")
      run(s, path) // warmup
      val times = (1 to reps).map { _ =>
        val (t, n) = run(s, path)
        println(f"PROBE threads=$threads%2d nDocs=$nDocs t=$t%.2fs triples=$n rate=${n / t}%.0f/s")
        t
      }
      println(f"PROBE-BEST threads=$threads%2d min=${times.min}%.2fs")
      s.stop()
    }
  }
}
