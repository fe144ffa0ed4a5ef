package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected registry queries so scan
  * pushdown (PushedFilters / ReadSchema) and codegen spans can be audited.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSet else
      Set("q01_pricing_summary", "q03_part_type_topk", "q07_top_orders_per_cust",
        "q15_conll_triples", "q22_lsh_jaccard", "q28_ann_topk")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1) if names(name)) {
      println(s"\n===== $name =====")
      fn(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
