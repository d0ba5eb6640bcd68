package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The 26-column S3 server-access-log schema.
  *
  * Mirrors the reference's file-declared parquet message type
  * (s3logs/config/parquet.schema:1-28): every field is a UTF8 string —
  * type refinement is deferred to a typed view, exactly as the reference
  * defers it to Athena/Hive readers (SURVEY.md §1.2).
  */
object AccessLogSchema {

  /** Field names, in log-line order. */
  val fieldNames: Seq[String] = Seq(
    "BucketOwner", "Bucket", "Time", "RemoteIP", "Requester", "RequestID",
    "Operation", "Key", "RequestURI", "HTTPStatus", "ErrorCode", "BytesSent",
    "ObjectSize", "TotalTime", "TurnAroundTime", "Referer", "UserAgent",
    "VersionId", "HostId", "SignatureVersion", "CipherSuite",
    "AuthenticationType", "HostHeader", "TLSVersion", "AccessPointARN",
    "AclRequired")

  val width: Int = fieldNames.length // 26

  /** All-string base schema (+ ExtraFields overflow, SURVEY §1.2 W1:
    * instead of the reference's two-pass rescan with ExtraFieldN columns,
    * overflow fields ride in one array column in a single pass). */
  val schema: StructType = StructType(
    fieldNames.map(StructField(_, StringType, nullable = true)) :+
      StructField("ExtraFields", ArrayType(StringType), nullable = true))

  /** Log-line timestamp format (field 3, `[06/Feb/2019:00:00:38 +0000]`). */
  val timeFormat = "dd/MMM/yyyy:HH:mm:ss Z"

  /** Typed-view casts over the string table (SURVEY §1.3): numeric and
    * temporal refinement the reference never does in-engine. `-` (the S3
    * null marker) casts to NULL via nullif. */
  def typedView(df: DataFrame): DataFrame = {
    def num(c: String, t: String): Column =
      nullif(col(c), lit("-")).try_cast(t).as(c)
    df.select(
      col("BucketOwner"), col("Bucket"),
      try_to_timestamp(col("Time"), lit(timeFormat)).as("ts"),
      col("RemoteIP"), col("Requester"), col("RequestID"), col("Operation"),
      col("Key"), col("RequestURI"),
      num("HTTPStatus", "int"), col("ErrorCode"),
      num("BytesSent", "long"), num("ObjectSize", "long"),
      num("TotalTime", "long"), num("TurnAroundTime", "long"),
      col("Referer"), col("UserAgent"), col("VersionId"), col("HostId"),
      col("SignatureVersion"), col("CipherSuite"), col("AuthenticationType"),
      col("HostHeader"), col("TLSVersion"), col("AccessPointARN"),
      col("AclRequired"), col("ExtraFields"))
  }

  /** W1 parity projection: materialize the overflow array as ExtraField27..
    * ExtraField{26+n} nullable string columns — the same LOGICAL columns
    * the reference's widened schema exposes (s3logs/src/utils.rs:1217-1222),
    * but derived in one pass from the array column. */
  def widened(df: DataFrame, extraCols: Int): DataFrame =
    (1 to extraCols).foldLeft(df) { (d, i) =>
      // try_element_at, not getItem: rows without overflow have a shorter
      // (or empty) array, which must widen to NULL — not an ANSI
      // out-of-bounds error.
      d.withColumn(s"ExtraField${width + i}",
        try_element_at(col("ExtraFields"), lit(i)))
    }.drop("ExtraFields")
}
