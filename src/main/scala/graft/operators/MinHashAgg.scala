package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as a typed `Aggregator` (the UDAF surface reserved
  * in SURVEY §2.2): input = one shingle hash, buffer = K running minima,
  * merge = elementwise min.
  *
  * This is the shuffle-friendly formulation for 100 TB: the aggregate is
  * associative/commutative, so Spark runs a map-side partial pass and
  * only (doc_id × K longs) partial buffers ever cross the wire — raw
  * shingles stay in their input partition. Semantically identical to the
  * single-pass HOF expression in TextHash.sparkMinhash (asserted by
  * OperatorsSpec); use this form when shingles arrive already exploded
  * (e.g. out of a shingle inverted index), the HOF form when the document
  * is in hand.
  */
object MinHashAgg extends Aggregator[Long, Array[Long], Array[Long]] {
  import TextHash.{aCoef, bCoef, K, P}

  override def zero: Array[Long] = Array.fill(K)(P)

  override def reduce(buf: Array[Long], sh: Long): Array[Long] = {
    var j = 0
    while (j < K) {
      val h = (aCoef(j) * sh + bCoef(j)) % P
      if (h < buf(j)) buf(j) = h
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < K) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // primitive long-array codec on both sides (no Java serialization)
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
