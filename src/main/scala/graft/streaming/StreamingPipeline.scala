package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import graft.conll.{DocGen, InputDoc, Pipeline}
import graft.conll.Rules.Script

/** Structured Streaming surface — beyond the reference (SURVEY §2.8: the
  * reference is batch-semantics over Unix pipes, no event time), provided
  * because a production ingest of 10^12 documents arrives incrementally.
  *
  * The KG pipeline is a purely narrow transformation (parse + rewrite are
  * per-document maps), so it lifts to streaming unchanged: readStream over
  * a spans-table directory → same Pipeline.rewrite → append-mode sink.
  * No state, no watermark needed — each micro-batch is embarrassingly
  * parallel, and exactly-once comes from the file-source + checkpoint
  * contract.
  */
object StreamingPipeline {

  /** Streaming triples from a parquet spans-table directory. */
  def streamTriples(
      spark: SparkSession,
      inputDir: String,
      cols: Seq[String] = DocGen.columns,
      scripts: Seq[(Script, Int)] = Pipeline.analyzeCascade
  ): DataFrame = {
    import spark.implicits._
    val docs = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[InputDoc]].schema)
      .parquet(inputDir)
      .as[InputDoc]
    Pipeline.triples(Pipeline.rewrite(Pipeline.parse(docs, cols), scripts)).toDF
  }

  /** Windowed event aggregation with watermarking (late-data handling) —
    * the streaming analog of q13_sessionize's gap analysis. */
  def windowedEventCounts(events: DataFrame, window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      // event time must be TIMESTAMP (with zone); parquet written by other
      // engines may carry TIMESTAMP_NTZ
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))

  /** Convenience: drive a streaming query synchronously over whatever is
    * in the input dir (test/bench harness). */
  def runOnce(df: DataFrame, queryName: String): Unit = {
    val q: DataStreamWriter[Row] = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("append")
    val started = q.start()
    started.processAllAvailable()
    started.stop()
  }
}
