package graft.queries

import org.apache.spark.sql.functions._

/** Structured-Streaming registry entries (driver-gated; the stream==batch
  * unit suites live in MultimodalStreamingSpec). */
object StreamQueries {

  val all: Seq[Q] = Seq(
    Q(
      // Watermarked event-time windowed aggregation end-to-end (the
      // brief's "watermarks + windowed aggs", unit-only before): the
      // events table is consumed as a file-source STREAM, aggregated by
      // 5-minute event-time windows under a 10-minute watermark in
      // APPEND mode, and landed in an exactly-once parquet sink
      // (Trigger.AvailableNow + checkpoint). Append-mode semantics are
      // part of the gate: a window is emitted only once the watermark
      // (max event time − 10 min, ms-truncated) passes its END, so the
      // stream's tail windows are withheld — the oracle mirrors the
      // eviction predicate exactly (HAVING window_end ≤ watermark).
      // Window starts are epoch-aligned in BOTH engines (DuckDB's
      // time_bucket origin 2000-01-03 is a multiple of 5 min past the
      // epoch), and the value sum takes the DECIMAL(18,6) route on both
      // sides.
      "q45_stream_window",
      (s, dir) => {
        val base = s"/tmp/graft-stream-events-${new java.io.File(dir).getName}"
        val in = s"$base/in"
        if (!new java.io.File(in, "_SUCCESS").exists())
          Tables.events(s, dir).write.mode("overwrite").parquet(in)
        val outP = s"$base/out"
        val cp = s"$base/cp"
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outP))
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(cp))
        val schema = Tables.events(s, dir).schema
        val stream = s.readStream.schema(schema).parquet(in)
        val q = graft.streaming.StreamingPipeline
          .windowedEventCounts(stream)
          .select(
            unix_timestamp(col("window.start")).as("ws"),
            unix_timestamp(col("window.end")).as("we"),
            col("event_type"), col("n"), col("v"))
          .writeStream
          .format("parquet")
          .option("path", outP)
          .option("checkpointLocation", cp)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(outP).orderBy(col("ws"), col("event_type"))
      },
      Some("""WITH e AS (
          SELECT time_bucket(INTERVAL '5 minutes', ts) AS wstart, event_type, value
          FROM events),
        mx AS (SELECT epoch_ms(MAX(ts)) - 600000 AS wm FROM events)
        SELECT CAST(epoch_ms(wstart) // 1000 AS BIGINT) AS ws,
               CAST(epoch_ms(wstart + INTERVAL '5 minutes') // 1000 AS BIGINT) AS we,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM e, mx
        GROUP BY wstart, event_type, wm
        HAVING epoch_ms(wstart + INTERVAL '5 minutes') <= wm
        ORDER BY ws, event_type""")
    )
  )
}
