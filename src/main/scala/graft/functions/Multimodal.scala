package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.conll.InputDoc

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time.
  *
  * The input_hint span table carries `media_ref` pointers; this module
  * materializes the media table, decodes, extracts features, and samples
  * frames. The DECODE STEP IS A STUB (this container ships no image/audio
  * codecs): `stubDecode` derives deterministic pseudo-metadata from the
  * payload bytes. Everything around it — schema, binary handling,
  * partition-parallel batched execution via mapPartitions (the Scala
  * analog of mapInPandas: one iterator per partition, amortized per-batch
  * setup), explode-shaped frame sampling — is real and tested, so a real
  * codec drops in by replacing one function.
  */
object Multimodal {

  final case class MediaRow(media_ref: String, kind: String, bytes: Array[Byte])
  final case class MediaMeta(
      media_ref: String, kind: String, n_bytes: Long,
      width: Int, height: Int, duration_ms: Long, ok: Boolean)
  final case class Frame(media_ref: String, frame_idx: Int, ts_ms: Long, phash: Long)

  /** STUB decode — deterministic metadata from a rolling hash of the
    * payload. Replace with a codec (javax.imageio / ffmpeg bindings) in a
    * real deployment; the signature is the contract. */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Long) = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    val w = 64 + (Math.floorMod(h, 16L) * 32L).toInt
    val ht = 64 + (Math.floorMod(h >> 8, 16L) * 32L).toInt
    val dur = 1000L + Math.floorMod(h >> 16, 30000L)
    (w, ht, dur)
  }

  /** Deterministic fake payload for a media_ref (test/bench input).
    * Seeded by the asset name (after the last '/'), so the same asset
    * referenced from different documents yields identical bytes — giving
    * the dedup path genuine duplicates to find. */
  def fakePayload(mediaRef: String): Array[Byte] = {
    val asset = mediaRef.substring(mediaRef.lastIndexOf('/') + 1)
    val seed = asset.hashCode.toLong & 0xffffffffL
    val n = 256 + (seed % 1024).toInt
    val out = new Array[Byte](n)
    var x = seed | 1L
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = (x >>> 56).toByte
      i += 1
    }
    out
  }

  /** Media table from the span table's media spans. Binary payloads are
    * synthesized here; in production this is the object-store fetch,
    * partitioned by media_ref hash so one hot document cannot skew a
    * partition. */
  def mediaTable(docs: Dataset[InputDoc]): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.flatMap(d => d.spans.filter(_.kind == "media").map { s =>
      MediaRow(s.media_ref, "image", fakePayload(s.media_ref))
    }).dropDuplicates("media_ref")
  }

  /** Batched decode + feature extraction: one stub-decode call per row,
    * iterator-shaped per partition (mapPartitions) so real codecs can
    * amortize native-context setup per batch, exactly like mapInPandas
    * batches. Narrow — no shuffle. */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would open the codec context here (stubbed)
      it.map { m =>
        val (w, h, dur) = stubDecode(m.bytes)
        MediaMeta(m.media_ref, m.kind, m.bytes.length.toLong, w, h, dur, ok = true)
      }
    }
  }

  /** Frame sampling: every `stepMs` up to the decoded duration — the
    * explode-shaped generator (one row in, many out). phash is the stub
    * per-frame fingerprint. */
  def sampleFrames(media: Dataset[MediaRow], stepMs: Long = 5000L): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val (_, _, dur) = stubDecode(m.bytes)
      val n = math.max(1L, dur / stepMs).toInt
      (0 until n).map { i =>
        val ts = i * stepMs
        var h = 1125899906842597L ^ ts
        var j = 0
        while (j < m.bytes.length && j < 64) { h = 31 * h + m.bytes(j); j += 1 }
        Frame(m.media_ref, i, ts, h)
      }
    }
  }

  /** Near-dup frames across media: exact phash bucket join (the SimHash
    * hamming-bucket variant lives in the dedup module). */
  def dupFrames(frames: Dataset[Frame]): DataFrame = {
    frames.toDF
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n"), collect_set(col("media_ref")).as("refs"))
      .filter(col("n") > 1)
  }
}
