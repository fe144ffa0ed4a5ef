package graft.tools

import org.apache.spark.sql.SparkSession
import graft.conll.{DocGen, Pipeline}

/** Dev probe: parse-vs-rewrite split of the core KG pipeline on the bench
  * corpus (pre-materialized parquet at /tmp/graft-bench-docs-N). */
object CoreProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft-bench-docs-200000")
    val threads = args.lift(1).getOrElse("8").toInt
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = spark.read.parquet(path).as[graft.conll.InputDoc]
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"CORE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s ($n)")
    }
    for (round <- 1 to 3) {
      t(s"read+count r$round")(docs.count())
      t(s"parse r$round")(Pipeline.parse(docs, DocGen.columns).count())
      t(s"parse+triples r$round")(Pipeline.triples(Pipeline.parse(docs, DocGen.columns)).count())
      t(s"full r$round")(Pipeline.rewriteTriples(
        Pipeline.parse(docs, DocGen.columns), Pipeline.analyzeCascade).count())
    }
    spark.stop()
  }
}
