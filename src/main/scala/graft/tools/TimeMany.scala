package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm-floor timing of several registry entries in ONE session (Bench's
  * config + between-entry hygiene): each entry runs `n` times, min is the
  * warm floor. Usage: runMain graft.tools.TimeMany <sfDir> <n> <name,...>
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args(2).split(",").toSeq
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
    val qs = graft.SparkEntry.queries
    for (name <- names; fn <- qs.get(name)) {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timemany] $name%-24s min ${ts.min}%7.3f  runs ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
