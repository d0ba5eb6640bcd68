package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Driver-gate coverage for the multimodal plumbing: binary payload →
  * batched (stub) decode → typed features, verified against an oracle
  * that recomputes the deterministic feature contract in SQL.
  */
object MultimodalQueries {

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    // ---- m01: REAL media decode — every doc wrapped as a valid binary
    // PPM; extractFeatures must recover width/height from the P6 header
    // it parses and hash every raster byte. The oracle recomputes the
    // payload-generation contract (not the parse) in SQL.
    "m01_media_features" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.ppmFromDocuments(s, Tables(s, dir, "documents"))
      Multimodal.extractFeatures(media)
        .toDF()
        // floor-scale, not round: w/h can land exactly on a .xxxx5
        // boundary (e.g. 9/160) where engine round modes diverge
        .withColumn("aspect",
          floor($"width" / $"height".cast("double") * 10000) / 10000)
        .orderBy($"doc_id")
    },

    // ---- m02: video-style frame sampling (every other 64B frame) ---------
    "m02_frame_sample" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(s, Tables(s, dir, "documents"))
      Multimodal.sampleFrames(media).toDF().orderBy($"doc_id", $"frame_idx")
    },

    // ---- m03: resize/downsample plumbing ---------------------------------
    "m03_media_resize" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(s, Tables(s, dir, "documents"))
      Multimodal.resize(media).toDF().orderBy($"doc_id")
    })

  val oracleSql: ListMap[String, String] = ListMap(
    // mirrors ppmFromDocuments' generation contract: w = 8 + doc_id%9,
    // h = ceil(len/3w) (>=1), raster = text '.'-padded to w*h*3; the
    // ENGINE's numbers come from parsing the P6 header it wrote. ahash
    // is the integer-exact perceptual average-hash: per-pixel ITU-601
    // luma (×1000), 8×8 grid cells, bit set iff S_cell*N > T*n_cell
    // (cross-multiplied integers — DuckDB's sum() is HUGEINT, so the
    // products are exact like the engine's BigInt compare), assembled
    // as an unsigned HUGEINT then mapped to the signed 64-bit value.
    "m01_media_features" ->
      """WITH g AS (
           SELECT doc_id, text, CAST(8 + doc_id % 9 AS INTEGER) AS w,
             CAST(greatest(1, (length(text) + 3 * (8 + doc_id % 9) - 1)
                  // (3 * (8 + doc_id % 9))) AS INTEGER) AS h
           FROM documents),
         p AS (
           SELECT doc_id, w, h,
             'P6' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10) AS header,
             rpad(text, w * h * 3, '.') AS raster
           FROM g),
         px AS (
           SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM p),
         lum AS (
           SELECT px.doc_id, (i % px.w) AS x, (i // px.w) AS y, px.w, px.h,
             299 * ascii(substr(p.raster, 3*i + 1, 1))
             + 587 * ascii(substr(p.raster, 3*i + 2, 1))
             + 114 * ascii(substr(p.raster, 3*i + 3, 1)) AS luma
           FROM px JOIN p ON p.doc_id = px.doc_id),
         cells AS (
           SELECT doc_id, ((y*8) // h)*8 + ((x*8) // w) AS cell,
             sum(luma) AS s, count(*) AS n,
             sum(sum(luma)) OVER (PARTITION BY doc_id) AS t,
             sum(count(*)) OVER (PARTITION BY doc_id) AS nn
           FROM lum GROUP BY doc_id, ((y*8) // h)*8 + ((x*8) // w)),
         bits AS (
           SELECT doc_id,
             sum(CASE WHEN s * nn > t * n
                 THEN CAST(1 AS HUGEINT) << cell
                 ELSE CAST(0 AS HUGEINT) END) AS ub
           FROM cells GROUP BY doc_id)
         SELECT p.doc_id,
           CAST(length(header) + length(raster) AS BIGINT) AS n_bytes,
           w AS width, h AS height,
           substr(md5(raster), 1, 8) AS phash,
           CAST(CASE WHEN ub >= CAST(9223372036854775808 AS HUGEINT)
                THEN ub - CAST(18446744073709551616 AS HUGEINT)
                ELSE ub END AS BIGINT) AS ahash,
           floor(w / CAST(h AS DOUBLE) * 10000) / 10000 AS aspect
         FROM p JOIN bits ON bits.doc_id = p.doc_id ORDER BY p.doc_id""",
    // the corpus is pure ASCII (verified), so character slices in SQL are
    // byte slices of the UTF-8 payload the engine frames/downsamples;
    // the range bounds ARE the operator's MaxFrames/MaxSamples caps
    "m02_frame_sample" ->
      s"""WITH f AS (
            SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
              substr(text, 1 + i * ${Multimodal.FrameStride},
                ${Multimodal.FrameSize}) AS frame
            FROM documents,
              (SELECT unnest(range(0, ${Multimodal.MaxFrames})) AS i) idx
            WHERE 1 + i * ${Multimodal.FrameStride} <= length(text))
          SELECT doc_id, frame_idx,
            CAST(length(frame) AS BIGINT) AS frame_bytes, md5(frame) AS fhash
          FROM f ORDER BY doc_id, frame_idx""",
    "m03_media_resize" ->
      s"""WITH s AS (
            SELECT doc_id,
              string_agg(substr(text, 1 + i * ${Multimodal.ResampleStride}, 1),
                '' ORDER BY i) AS sampled
            FROM documents,
              (SELECT unnest(range(0, ${Multimodal.MaxSamples})) AS i) idx
            WHERE 1 + i * ${Multimodal.ResampleStride} <= length(text)
            GROUP BY doc_id)
          SELECT d.doc_id, CAST(length(coalesce(s.sampled, '')) AS BIGINT) AS r_bytes,
            CAST((16 + (ascii(substr(md5(d.text), 1, 1)) % 16)) // 2 AS INTEGER) AS r_width,
            CAST((16 + (ascii(substr(md5(d.text), 2, 1)) % 16)) // 2 AS INTEGER) AS r_height,
            md5(coalesce(s.sampled, '')) AS rhash
          FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
          ORDER BY d.doc_id""")
}
