package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` media payloads with typed
  * metadata, batched feature extraction over partitions.
  *
  * The decode step is a STUB — image/audio codecs are not in this
  * container — but everything Spark-cares-about is real: the binary
  * column schema, the case-class Encoders, the mapPartitions batch shape
  * (fixed-size groups, the way a vectorized decoder would consume them),
  * and the deterministic feature contract that lets the DuckDB oracle
  * verify the plumbing end-to-end.
  *
  * Scale design: decode runs per-partition with zero shuffle; the wide
  * binary column is projected away immediately after feature extraction,
  * so downstream stages shuffle only the narrow feature rows.
  */
object Multimodal {

  /** One media object: payload + minimal typed metadata. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte], mime: String)

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, phash: String)

  /** One sampled frame's features (video-style decode output). */
  final case class FrameFeatures(
      doc_id: Long, frame_idx: Long, frame_bytes: Long, fhash: String)

  /** A resized (downsampled) media object's summary. */
  final case class ResizedMedia(
      doc_id: Long, r_bytes: Long, r_width: Int, r_height: Int, rhash: String)

  /** Frame geometry for `sampleFrames`: a 64-byte "frame" every 128
    * payload bytes (sample every other frame — the fps-decimation shape
    * a video pipeline uses), capped at MaxFrames per object (real
    * pipelines bound frames-per-video; the cap is part of the operator
    * contract and the oracle mirrors it). */
  val FrameSize = 64
  val FrameStride = 128
  val MaxFrames = 64

  /** Nearest-neighbor-style downsample stride for `resize`, with the
    * matching output-size cap (MaxSamples bytes kept per object). */
  val ResampleStride = 4
  val MaxSamples = 4096

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString

  /** STUB decoder: a real implementation would parse the codec here.
    * Deterministic fake: dimensions + perceptual-hash stand-in derived
    * from the payload's md5, so the oracle can recompute them in SQL. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val hex = md5hex(bytes)
    val width = 16 + (hex.charAt(0).toInt % 16)
    val height = 16 + (hex.charAt(1).toInt % 16)
    (width, height, hex.substring(0, 8))
  }

  /** Batched per-partition feature extraction (the decode hot loop). The
    * `grouped(64)` batch shape mirrors a vectorized decoder's input
    * buffer; decoding never leaves the partition. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.map { r =>
          val (w, h, ph) = decodeStub(r.media)
          MediaFeatures(r.doc_id, r.media.length.toLong, w, h, ph)
        }
      }
    }
  }

  /** Frame sampling (the video-decode analog): slice each payload into
    * FrameSize-byte frames at FrameStride intervals — every other frame,
    * fps decimation — and extract per-frame features. Like
    * extractFeatures, the loop is batched per partition and never
    * shuffles the payload; only the narrow (doc_id, idx, hash) rows leave
    * the decode stage. A real decoder would replace the slice+md5 body
    * with codec frame extraction; the batch shape is what it would sit in. */
  def sampleFrames(ds: Dataset[MediaRecord]): Dataset[FrameFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.flatMap { r =>
          (0 until math.min(r.media.length, FrameStride * MaxFrames) by FrameStride)
            .map { off =>
              val frame = r.media.slice(off, math.min(off + FrameSize, r.media.length))
              FrameFeatures(r.doc_id, (off / FrameStride).toLong,
                frame.length.toLong, md5hex(frame))
            }
        }
      }
    }
  }

  /** Resize (downsample) plumbing: keep every ResampleStride-th payload
    * byte (the nearest-neighbor-resample shape), halve the decoded
    * dimensions, and fingerprint the downsampled payload. Zero-shuffle,
    * batched, binary-in/binary-derived-out — swap the body for a real
    * resampler without touching the plan. */
  def resize(ds: Dataset[MediaRecord]): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.map { r =>
          val sampled =
            (0 until math.min(r.media.length, ResampleStride * MaxSamples) by ResampleStride)
              .map(r.media).toArray
          val (w, h, _) = decodeStub(r.media)
          ResizedMedia(r.doc_id, sampled.length.toLong, w / 2, h / 2,
            md5hex(sampled))
        }
      }
    }
  }

  /** Documents table → media records (text payload as stand-in bytes). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("mime")).as[MediaRecord]
  }
}
