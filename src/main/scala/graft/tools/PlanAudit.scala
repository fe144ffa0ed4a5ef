package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-3 plan audit: print the formatted physical plans of the newest
  * registry entries so shuffle/codegen shapes can be reviewed by eye
  * (the r2 audit practice, kept as a runnable tool). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet
      else Set("kg_pipeline_parse", "kg_brackets_roundtrip",
        "kg_xmltsv_emptyword", "kg_context_cataphora", "q31_ann_ivf", "q32_embed_neardup")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- graft.SparkEntry.queries if names.contains(name)) {
      println(s"\n===== $name =====")
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.take(40).mkString("\n"))
    }
    spark.stop()
  }
}
