package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual registry queries (count() action) at a given
  * sf dir. Usage: runMain graft.tools.TimeQueries <sfDir> <name> [name...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // collect_list/collect_set aggs: keep ObjectHashAggregate hashing
      // instead of its 128-group sort-based fallback (measured ~5-10% on
      // the pivot-based exports; the big object-agg hotspot was removed
      // outright in evalPossyntSelect)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    for (n <- names; fn <- qs.get(n)) {
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"TIMED $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($rows rows)")
    }
    spark.stop()
  }
}
