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
    "m01_media_features" -> { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(s, Tables(s, dir, "documents"))
      Multimodal.extractFeatures(media)
        .toDF()
        .withColumn("aspect", round($"width" / $"height".cast("double"), 4))
        .orderBy($"doc_id")
    })

  val oracleSql: ListMap[String, String] = ListMap(
    "m01_media_features" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(16 + (ascii(substr(md5(text), 1, 1)) % 16) AS INTEGER) AS width,
         CAST(16 + (ascii(substr(md5(text), 2, 1)) % 16) AS INTEGER) AS height,
         substr(md5(text), 1, 8) AS phash,
         round((16 + (ascii(substr(md5(text), 1, 1)) % 16))
               / CAST(16 + (ascii(substr(md5(text), 2, 1)) % 16) AS DOUBLE), 4) AS aspect
         FROM documents ORDER BY doc_id""")
}
