package graft.tools

import org.apache.spark.sql.SparkSession
import graft.queries.Tables

/** VERDICT r5 item 7 measurement: what does `df.rdd.getNumPartitions`
  * inside `Tables.widened` cost per call on the scans it guards?
  * Prints per-call micros for the plan-materializing probe vs the
  * proposed cached lookup, on both guarded tables, over 200 calls.
  */
object WidenProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("widen-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def bench(tag: String)(body: => Unit): Unit = {
      (1 to 20).foreach(_ => body) // warm JIT + FileIndex caches
      val t0 = System.nanoTime()
      (1 to 200).foreach(_ => body)
      val us = (System.nanoTime() - t0) / 1000.0 / 200
      println(f"[widen-probe] $tag%-28s ${us}%9.1f us/call")
    }

    bench("documents rdd.getNumParts") {
      Tables.documents(spark, dir).rdd.getNumPartitions: Unit
    }
    bench("embeddings rdd.getNumParts") {
      Tables.embeddings(spark, dir).rdd.getNumPartitions: Unit
    }
    bench("documents srcTag (cache key)") {
      Tables.srcTag(dir, "documents"): Unit
    }
    bench("documents full widened()") {
      Tables.widened(spark, dir, "documents"): Unit
    }
    spark.stop()
  }
}
