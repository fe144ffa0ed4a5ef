package graft.tools

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` output of registry entries to files —
  * the committed plan evidence for optimization rounds
  * (plans/r<NN>/<entry>_<tag>.txt). Session config mirrors Bench
  * (local[$SPARK_GRAFT_CPUS], shuffle width = threads, AQE on) so the
  * captured static plan is the one the bench compiles.
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <tag> <sfDir> <name>[,name...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = args(2)
    val names = args(3).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // GRAFT_EXTRA_CONF=k=v[,k=v...]: extra session confs — lets a
    // "before" dump pin an A/B lever (e.g.
    // spark.graft.sql.targetPartitionBytes=-1 for the pre-r9
    // implicit-width shape)
    sys.env.get("GRAFT_EXTRA_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"), txt)
      println(s"[explaindump] wrote $outDir/${n}_$tag.txt (${txt.length} chars)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
