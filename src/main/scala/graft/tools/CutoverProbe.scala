package graft.tools

import org.apache.spark.sql.SparkSession

/** r9 cutover scale evidence: time the iterative entries at 50k and
  * 500k docs under BOTH regimes — shipped defaults (driver cutover
  * armed) and cutover disabled (pure distributed loops) — so the claim
  * "the cutover only removes fixed overhead; the distributed path is
  * intact and is what runs over the bound" carries measurements, not
  * an argument. At 500k docs q30's 27M-edge BFS and q48's ~1M-edge
  * rank loop exceed the default bound and run distributed EVEN in the
  * shipped regime; q42's ~500k-edge chain sits at the boundary.
  * Usage: runMain graft.tools.CutoverProbe [out.json]
  */
object CutoverProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("docs/cutover_scale_r9.json")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirB = "/tmp/graft-scale-10x-v2"
    val dirC = "/tmp/graft-scale-100x-v2"
    ScaleSweep.generate(spark, dirB, 50000L)
    ScaleSweep.generate(spark, dirC, 500000L)
    val cutoverConfs = Seq("spark.graft.cc.localMaxEdges",
      "spark.graft.bfs.localMaxEdges", "spark.graft.pr.localMaxEdges")
    def withRegime[A](off: Boolean)(f: => A): A = {
      if (off) cutoverConfs.foreach(k => spark.conf.set(k, "0"))
      try f finally cutoverConfs.foreach(spark.conf.unset)
    }
    def timeOnce(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (System.nanoTime() - t0) / 1e9
    }
    val plan = Seq(
      ("q42_cc_chain", dirB), ("q42_cc_chain", dirC),
      ("q30_tree_depth", dirB), ("q30_tree_depth", dirC),
      ("q48_pagerank", dirB), ("q48_pagerank", dirC),
      ("q34_dup_clusters", dirB))
    val results = plan.flatMap { case (name, dir) =>
      // distributed_only first so the shipped pass runs on equal-or-warmer JIT
      Seq(true, false).map { off =>
        val samples = withRegime(off) {
          (1 to 2).map { _ =>
            val (t, steal) = HostGauge.stealWindow(timeOnce(name, dir))
            (t, steal)
          }
        }
        val tag = if (dir == dirC) "500k" else "50k"
        val regime = if (off) "distributed_only" else "shipped"
        val min = samples.map(_._1).min
        val clean = samples.count(s => HostGauge.isClean(s._2))
        System.err.println(f"[cutover] $name%-18s $tag%-5s $regime%-16s min $min%7.2f s (clean $clean/2)")
        f""""${name}_${tag}_$regime":{"min_s":$min%.3f,""" +
          s""""samples":[${samples.map(s => f"${s._1}%.3f").mkString(",")}],""" +
          s""""steal_clean":$clean}"""
      }
    }
    val json = results.mkString("{", ",\n ", "}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[cutover] wrote $out")
    spark.stop()
  }
}
