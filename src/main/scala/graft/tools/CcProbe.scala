package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for the q34 resolution path: separates the LSH pair
  * chain's cost from the CC rounds, and reports runStar's round count on
  * the real near-dup graph (the VERDICT r5 #2 evidence). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[cc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    (1 to 3).foreach { k =>
      System.err.println(s"[cc] --- pass $k (cache warm after pass 1) ---")
      val pairsDf = t("lsh chain -> checkpoint") {
        graft.SparkEntry.queries("q22_lsh_jaccard")(spark, dir)
          .filter($"jaccard" >= 0.5)
          .select($"a".as("src"), $"b".as("dst"))
          .localCheckpoint()
      }
      val (outStar, rounds) = t("runStar (ckpt input)") {
        val r = graft.operators.ConnectedComponents.runStarStats(spark, pairsDf)
        r._1.count(); r
      }
      System.err.println(s"[cc] rounds: $rounds")
      t("orderBy+count tail") { outStar.orderBy($"node").count() }
      t("run (min-label, ckpt)") {
        graft.operators.ConnectedComponents.run(spark, pairsDf).count()
      }
      t("q34 entry end-to-end") {
        graft.SparkEntry.queries("q34_dup_clusters")(spark, dir).count()
      }
    }
    spark.stop()
  }
}
