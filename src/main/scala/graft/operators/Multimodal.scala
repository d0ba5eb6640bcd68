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

  /** STUB decoder: a real implementation would parse the codec here.
    * Deterministic fake: dimensions + perceptual-hash stand-in derived
    * from the payload's md5, so the oracle can recompute them in SQL. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
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

  /** Documents table → media records (text payload as stand-in bytes). */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"),
      lit("text/plain").as("mime")).as[MediaRecord]
  }
}
