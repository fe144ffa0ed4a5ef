package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-window A/B of the r9 measured-width exchanges
  * (Tables.byteWidth): times each named registry entry alternating
  * spark.graft.sql.targetPartitionBytes between the shipped default
  * (explicit measured-width repartitions) and -1 (disabled — the
  * pre-r9 implicit session-width shape), in ONE session so the pair
  * shares a window. Usage:
  * runMain graft.tools.WidthAB <sfDir> <n> <name,...>
  */
object WidthAB {
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
    val (r, w, d) = HostGauge.ioCanary()
    println(f"[widthab] io canary read ${r}%8.1f MB/s write ${w}%8.1f MB/s direct=$d")
    val key = "spark.graft.sql.targetPartitionBytes"
    val qs = graft.SparkEntry.queries
    for (name <- names; fn <- qs.get(name)) {
      def once(disabled: Boolean): Double = {
        if (disabled) spark.conf.set(key, "-1") else spark.conf.unset(key)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        (System.nanoTime() - t0) / 1e9
      }
      once(true); once(false) // warm both shapes
      val off = scala.collection.mutable.ArrayBuffer[Double]()
      val on = scala.collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to n) { off += once(true); on += once(false) }
      spark.conf.unset(key)
      println(f"[widthab] $name%-24s off(min) ${off.min}%6.3f  on(min) ${on.min}%6.3f  " +
        f"off ${off.map(t => f"$t%.3f").mkString(" ")}  on ${on.map(t => f"$t%.3f").mkString(" ")}")
    }
    val (r2, w2, d2) = HostGauge.ioCanary()
    println(f"[widthab] io canary read ${r2}%8.1f MB/s write ${w2}%8.1f MB/s direct=$d2")
    spark.stop()
  }
}
