package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one registry entry — the plan
  * audit loop ("`.explain("formatted")` … iterate until it's the plan
  * you'd want"). Usage: ExplainOne <entry> [sfDir] [--aqe].
  *
  * By default prints the static plan (AQE off, no execution). With
  * `--aqe` it enables adaptive execution, RUNS the query (count), and
  * prints the FINAL adaptive plan — the one the bench actually executes,
  * where SMJ→BHJ conversions and coalesced shuffle reads are visible.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = if (positional.length > 1) positional(1) else "/root/testdata/sf0.01"
    val aqe = args.contains("--aqe")
    val builder = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false")
    // GRAFT_EXTRA_CONF=k=v[,k=v...]: extra session confs — lets the plan
    // dumps pin A/B levers (e.g. spark.graft.sql.targetPartitionBytes=-1
    // for the pre-r9 implicit-width shape)
    sys.env.get("GRAFT_EXTRA_CONF").foreach(_.split(",").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (aqe) {
      // df.count() would finalize the COUNT's own QueryExecution, not
      // df's — execute df's physical plan directly so executedPlan
      // prints `AdaptiveSparkPlan isFinalPlan=true` with the runtime
      // tree (SMJ→BHJ conversions, coalesced shuffle reads)
      df.queryExecution.toRdd.count()
      println(df.queryExecution.executedPlan.toString)
    } else df.explain("formatted")
    spark.stop()
  }
}
