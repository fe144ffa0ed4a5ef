package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for q34 (r9): where does the entry's time beyond q22's
  * LSH chain go? Times (a) the q22-equivalent pair count, (b) the edge
  * set's localCheckpoint materialization, (c) runStar, (d) the entry
  * tail. Usage: runMain graft.tools.Q34Probe [sfDir] [reps]
  */
object Q34Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
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
    import spark.implicits._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q34probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    for (i <- 1 to reps) {
      println(s"[q34probe] --- rep $i ---")
      val pairsQ22 = graft.SparkEntry.queries("q22_lsh_jaccard")(spark, sfDir)
      t("q22 count (1 traversal)")(pairsQ22.count())
      hygiene()
      // q34 phase by phase (edges via the q22 entry = same pair plan)
      def edges = graft.SparkEntry.queries("q22_lsh_jaccard")(spark, sfDir)
        .filter($"jaccard" >= 0.5)
        .select($"a".as("src"), $"b".as("dst"))
      t("edges plain count")(edges.count()); hygiene()
      t("edges collect")(edges.collect()); hygiene()
      t("edges distinct count")(
        edges.select($"src".as("u"), $"dst".as("v"))
          .filter($"u" =!= $"v").distinct().count()); hygiene()
      val e = t("edges distinct+localCheckpoint")(
        edges.select($"src".as("u"), $"dst".as("v"))
          .filter($"u" =!= $"v").distinct().localCheckpoint())
      t("count+collect on checkpoint") { e.count(); e.collect() }
      hygiene()
      val q = graft.SparkEntry.queries("q34_dup_clusters")
      t("q34 entry count (end to end)")(q(spark, sfDir).count())
      hygiene()
    }
    spark.stop()
  }
}
