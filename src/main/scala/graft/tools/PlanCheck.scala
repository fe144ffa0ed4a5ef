package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints exchange/scan statistics for a registry entry's physical plan
  * — the `.explain` audit as a greppable one-liner per entry. Used to
  * verify that a rewrite's plan has exactly the shuffles its design
  * claims (e.g. the round-6 narrow LSH chain: bucket window + band
  * self-join + candidate distinct + two pair→set joins, nothing
  * corpus-wide before the window). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q22_lsh_jaccard", "q21_minhash_sigs")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // execute df's OWN physical plan (df.count() would finalize the
      // count's separate QueryExecution and leave this one
      // isFinalPlan=false, hiding AQE's runtime SMJ→BHJ conversions —
      // the r8 find: the old counts were of the pre-execution tree)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // finalized AQE toString appends the initial tree too — count the final section only
      def count(p: String) = p.r.findAllIn(plan).length
      println(f"[plan] $name%-22s shuffles=${count("Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition")}" +
        f" reused=${count("ReusedExchange")}" +
        f" broadcasts=${count("BroadcastExchange")}" +
        f" filescans=${count("FileScan|BatchScan")}" +
        f" cachedscans=${count("InMemoryTableScan|TableCacheQueryStage")}" +
        f" codegen=${count("\\*\\(\\d+\\)")}")
      if (args.contains("--full")) println(plan)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
