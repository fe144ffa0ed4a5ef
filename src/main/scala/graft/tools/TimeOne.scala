package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm-vs-warm single-entry timing (memory: only warm comparisons are
  * meaningful on this box): runs one registry entry N times. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[timeone] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // same between-run hygiene as Bench/Verify: drop cached plans AND
      // checkpoint/persist blocks so runs don't accumulate executor memory
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
