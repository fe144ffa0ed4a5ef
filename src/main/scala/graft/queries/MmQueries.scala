package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Multimodal

/** Multimodal registry entries, driver-hash-checked: the media table is
  * derived from `documents` (doc_id-md5 gating + a 256-asset pool), so the
  * stub decode's metadata and frame fingerprints are DuckDB-expressible
  * while the Spark side still pushes real binary payloads through the
  * batched mapPartitions decode path.
  */
object MmQueries {

  private val HV = "(strpos('0123456789abcdef', substring(ah,%d,1)) - 1)"
  private def hv(i: Int) = HV.format(i)

  /** media_ref + asset + asset md5 for every media-carrying doc. */
  private val mediaCte: String =
    """WITH m AS (
      SELECT 'media://d' || id || '/img_' || substring(h,1,2) AS media_ref,
             'img_' || substring(h,1,2) AS asset
      FROM (SELECT CAST(doc_id AS VARCHAR) AS id, md5(CAST(doc_id AS VARCHAR)) AS h
            FROM documents) t
      WHERE substring(h,3,1) IN ('0','1','2','3','4','5','6','7')
    ), meta AS (SELECT media_ref, asset, md5(asset) AS ah FROM m)"""

  private val durSql =
    s"CAST(1000 + (${hv(5)}*256 + ${hv(6)}*16 + ${hv(7)})*7 AS BIGINT)"

  val all: Seq[Q] = Seq(
    Q(
      // media table → batched stub decode (mapPartitions over binary
      // payloads) → typed metadata
      "mm_media_meta",
      (s, dir) =>
        Multimodal.extractMeta(
            Multimodal.mediaFromDocuments(Tables.widened(s, dir, "documents"))).toDF()
          .orderBy(col("media_ref")),
      Some(s"""$mediaCte
        SELECT media_ref, 'image' AS kind,
          CAST(256 + ${hv(1)}*64 + ${hv(2)}*4 AS BIGINT) AS n_bytes,
          CAST(64 + ${hv(3)}*32 AS INT) AS width,
          CAST(64 + ${hv(4)}*32 AS INT) AS height,
          $durSql AS duration_ms,
          TRUE AS ok
        FROM meta ORDER BY media_ref""")
    ),
    Q(
      // frame sampling (explode-shaped generator) + duplicate-frame
      // buckets; refs is a sorted comma-joined scalar
      "mm_frame_dups",
      (s, dir) =>
        Multimodal.dupFrames(
            Multimodal.sampleFrames(
              Multimodal.mediaFromDocuments(Tables.widened(s, dir, "documents"))))
          .orderBy(col("phash")),
      Some(s"""$mediaCte, fr AS (
          SELECT media_ref, asset, $durSql AS dur FROM meta
        ), frames AS (
          SELECT media_ref, asset,
                 unnest(range(0, greatest(CAST(1 AS BIGINT), dur // 5000))) AS idx
          FROM fr
        ), ph AS (
          SELECT media_ref,
                 substring(md5(asset || ':' || CAST(idx AS VARCHAR)), 1, 16) AS phash
          FROM frames)
        SELECT phash, COUNT(*) AS n,
               string_agg(media_ref, ',' ORDER BY media_ref) AS refs
        FROM ph GROUP BY phash HAVING COUNT(*) > 1 ORDER BY phash""")
    )
  )
}
