package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` media payloads with typed
  * metadata, batched feature extraction over partitions.
  *
  * The decode step is REAL for the two formats a decoder can be written
  * for without a codec library: binary PPM (P6) and uncompressed 24-bit
  * BMP — header fields parsed byte-by-byte, raster length validated,
  * malformed media rejected loudly. Payloads that aren't media (no
  * recognizable magic) take a documented deterministic md5 fallback so
  * the same operator runs over arbitrary binary columns. Everything
  * Spark-cares-about is equally real: the binary column schema, the
  * case-class Encoders, the mapPartitions batch shape (fixed-size
  * groups, the way a vectorized decoder consumes its input buffer).
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

  /** Fallback for payloads with no media magic (documents-as-bytes, blob
    * columns): dimensions + hash stand-in derived from the payload's md5,
    * so the oracle can recompute them in SQL. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) = {
    val hex = md5hex(bytes)
    val width = 16 + (hex.charAt(0).toInt % 16)
    val height = 16 + (hex.charAt(1).toInt % 16)
    (width, height, hex.substring(0, 8))
  }

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed media payload: $msg")

  /** Real binary-PPM (P6) decode: tokenized header (whitespace- and
    * `#`-comment-tolerant, per the netpbm spec), exactly one whitespace
    * byte after maxval, then a w*h*3 raster that must account for every
    * remaining payload byte. Returns (width, height, hash-of-raster) —
    * the dimensions come from the HEADER, and the hash touches every
    * raster byte (reference analog: s3logs/src/utils.rs:1110-1119 runs
    * the whole payload through its pipeline the same way). */
  def decodePpm(bytes: Array[Byte]): (Int, Int, String) = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') bad("not P6")
    var i = 2
    def skipSpaceAndComments(): Unit = {
      var moved = true
      while (moved) {
        moved = false
        while (i < bytes.length && Character.isWhitespace(bytes(i))) { i += 1; moved = true }
        if (i < bytes.length && bytes(i) == '#') {
          while (i < bytes.length && bytes(i) != '\n') i += 1
          moved = true
        }
      }
    }
    def int(what: String): Int = {
      skipSpaceAndComments()
      val start = i
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') i += 1
      if (i == start) bad(s"PPM header: missing $what")
      val v = new String(bytes, start, i - start, "US-ASCII").toLong
      if (v > Int.MaxValue) bad(s"PPM header: $what overflows")
      v.toInt
    }
    val w = int("width"); val h = int("height"); val maxval = int("maxval")
    if (w <= 0 || h <= 0) bad(s"PPM header: non-positive dims ${w}x$h")
    if (maxval <= 0 || maxval > 255) bad(s"PPM maxval $maxval unsupported")
    // exactly one whitespace byte separates maxval from the raster
    if (i >= bytes.length || !Character.isWhitespace(bytes(i))) bad("PPM: no raster separator")
    i += 1
    val expected = w.toLong * h * 3
    if (bytes.length - i != expected)
      bad(s"PPM raster: ${bytes.length - i} bytes, expected $expected")
    (w, h, md5hex(java.util.Arrays.copyOfRange(bytes, i, bytes.length)).substring(0, 8))
  }

  /** Real BMP decode (uncompressed 24bpp, the format every BMP writer can
    * emit): little-endian header fields, 4-byte-aligned row stride,
    * raster bounds validated against the declared data offset. Top-down
    * bitmaps (negative height) are normalized to positive dims. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, String) = {
    def le32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (bytes.length < 54) bad("BMP: shorter than its fixed headers")
    if (bytes(0) != 'B' || bytes(1) != 'M') bad("not BM")
    val dataOffset = le32(10)
    val dibSize = le32(14)
    if (dibSize < 40) bad(s"BMP DIB header size $dibSize unsupported")
    val w = le32(18)
    val hRaw = le32(22)
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) bad(s"BMP: bad dims ${w}x$hRaw")
    if (le16(26) != 1) bad("BMP: planes != 1")
    if (le16(28) != 24) bad(s"BMP: ${le16(28)}bpp unsupported (need 24)")
    if (le32(30) != 0) bad("BMP: compressed payloads unsupported")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val rasterEnd = dataOffset.toLong + rowSize.toLong * h
    if (dataOffset < 54 || rasterEnd > bytes.length)
      bad(s"BMP raster out of bounds: [$dataOffset, $rasterEnd) of ${bytes.length}")
    (w, h, md5hex(java.util.Arrays.copyOfRange(bytes, dataOffset, rasterEnd.toInt))
      .substring(0, 8))
  }

  /** Format dispatch: real decoders for recognized media magic (which
    * REJECT malformed payloads loudly — a corrupt header must never
    * silently fall through to the stand-in), md5 fallback otherwise. */
  def decode(bytes: Array[Byte]): (Int, Int, String) =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else decodeStub(bytes)

  /** Average-hash: a REAL perceptual hash over a decoded RGB raster —
    * 8x8 block-mean luma grid thresholded at the global mean, one bit per
    * cell. Near-identical images land within a few bits; unrelated
    * images ~32 bits apart. Spec-verified (no SQL oracle: the fixed-point
    * block geometry has no reasonable SQL expression). */
  def averageHash(w: Int, h: Int, raster: Array[Byte]): Long = {
    require(raster.length == w * h * 3, "raster is not w*h RGB triplets")
    val cells = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val cx = x * 8 / w
        val p = (y * w + x) * 3
        // integer luma (ITU-R 601 weights scaled by 1000)
        val luma = 299L * (raster(p) & 0xff) + 587L * (raster(p + 1) & 0xff) +
          114L * (raster(p + 2) & 0xff)
        cells(cy * 8 + cx) += luma
        counts(cy * 8 + cx) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(i => if (counts(i) == 0) 0.0 else cells(i).toDouble / counts(i))
    val global = means.sum / 64
    means.zipWithIndex.foldLeft(0L) { case (acc, (m, i)) =>
      if (m > global) acc | (1L << i) else acc
    }
  }

  /** Batched per-partition feature extraction (the decode hot loop). The
    * `grouped(64)` batch shape mirrors a vectorized decoder's input
    * buffer; decoding never leaves the partition. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.map { r =>
          val (w, h, ph) = decode(r.media)
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
          val (w, h, _) = decode(r.media)
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

  /** Documents table → VALID binary-PPM payloads: each text becomes the
    * raster of a real P6 image (width varies per doc, '.'-padded to a
    * whole number of RGB rows) behind a real header. This is the media
    * fixture for the m01 gate — the engine's decodePpm must recover the
    * dimensions from the HEADER it wrote here, and hash every raster
    * byte; the oracle recomputes the same generation contract in SQL.
    * All computed columns are codegen'd string/arithmetic ops — the
    * payload never exists on the driver. */
  def ppmFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs
      .withColumn("w", (lit(8) + pmod(col("doc_id"), lit(9))).cast("int"))
      .withColumn("h",
        greatest(lit(1),
          expr("(length(text) + 3*w - 1) div (3*w)")).cast("int"))
      .select(col("doc_id"),
        encode(concat(
          concat(lit("P6\n"), col("w"), lit(" "), col("h"), lit("\n255\n")),
          expr("rpad(text, w * h * 3, '.')")), "UTF-8").as("media"),
        lit("image/x-portable-pixmap").as("mime"))
      .as[MediaRecord]
  }
}
