package graft

import org.apache.spark.sql.SparkSession
import graft.conll._

/** spark-submit entry point (north_rule: "submitted via spark-submit on a
  * multi-executor cluster"):
  *
  *   spark-submit --class graft.Main app.jar \
  *     --input <spans parquet dir | gen:<nDocs>> \
  *     --output <dir> \
  *     --cascade analyze|parse|link \
  *     [--buckets 64] [--config <pipeline.json>]
  *
  * Runs the KG-construction pipeline checkpoint-resumably (bucket
  * manifest + lineage, CheckpointRunner) and writes the metrics table
  * next to the output. In local mode, pass --master local[N] to
  * spark-submit as usual; the session here inherits it.
  */
object Main {

  private def arg(args: Array[String], name: String): Option[String] =
    args.sliding(2).collectFirst { case Array(k, v) if k == s"--$name" => v }

  def main(args: Array[String]): Unit = {
    val input = arg(args, "input").getOrElse("gen:10000")
    val output = arg(args, "output").getOrElse("/tmp/graft-out")
    val cascadeName = arg(args, "cascade").getOrElse("analyze")
    val buckets = arg(args, "buckets").map(_.toInt).getOrElse(64)
    val config = arg(args, "config")

    val builder = SparkSession.builder()
      .appName(s"graft-$cascadeName")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // spark-submit injects the master; default for bare JVM launches
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(s"local[${Runtime.getRuntime.availableProcessors}]"))
      .getOrCreate()
    import spark.implicits._

    config match {
      case Some(path) =>
        val json = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
        PipelineManager.run(spark, json).write.mode("overwrite").parquet(output)
      case None =>
        val docs = if (input.startsWith("gen:"))
          DocGen.docs(spark, input.stripPrefix("gen:").toLong)
        else spark.read.parquet(input).as[InputDoc]
        val cascade = cascadeName match {
          case "parse" => Pipeline.parseCascade
          case "link" => Pipeline.linkCascade
          case _ => Pipeline.analyzeCascade
        }
        val metrics = Pipeline.newMetrics(spark, cascade)
        CheckpointRunner.run(spark, docs, DocGen.columns, cascade, output, buckets, Some(metrics))
        metrics.toDf(spark).write.mode("overwrite").parquet(s"$output/_metrics")
        CheckpointRunner.lineage(spark, output).show(buckets, truncate = false)
    }
    spark.stop()
  }
}
