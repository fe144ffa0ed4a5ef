package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of one registry entry — the plan
  * audit loop ("`.explain("formatted")` … iterate until it's the plan
  * you'd want"). Usage: ExplainOne <entry> [sfDir]. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
