package graft
import org.apache.spark.sql.functions._
import graft.etl._
object SaltDebug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(appName = "salt-debug")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("salt-dbg").toString
    val in = s"$tmp/in"
    LogGen.lines(2000, seed = 77).toDF("value").coalesce(2).write.text(in)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    val lines = spark.read.textFile(in).toDF("value")
    val parsed = AccessLogParser.parse(lines, dropMalformed = false, keepRaw = true)
    val cfg = EtlConfig(sinkSaltBuckets = 8)
    val deduped = Transform.bucketAndDedup(parsed.filter(col("ts").isNotNull).drop("_raw"), cfg)
    val local = timestamp_seconds(unix_timestamp(col("ts")))
    val withParts = deduped
      .withColumn("year", date_format(local, "yyyy"))
      .withColumn("month", date_format(local, "MM"))
      .withColumn("day", date_format(local, "dd"))
      .withColumn("hour", date_format(local, "HH"))
    val sinkKey = Seq(col("year"), col("month"), col("day"), col("hour"),
      pmod(hash(col("RequestID")), lit(8)))
    val rep = withParts.repartition(sinkKey: _*).sortWithinPartitions(col("ts")).drop("ts", "agg_ts")
    rep.write.mode("append").option("maxRecordsPerFile", 10000000L)
      .partitionBy("year","month","day","hour").parquet(s"$tmp/out")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.getName.startsWith("hour=")) Seq(f)
      else f.listFiles.toSeq.filter(_.isDirectory).flatMap(walk)
    val hd = walk(new java.io.File(s"$tmp/out"))
    System.err.println("[dbg] HOURDIRS=" + hd.size + " FILES=" +
      hd.head.listFiles.count(_.getName.endsWith(".parquet")))
    val n = rep.count()
    System.err.println("[dbg] rows=" + n)
    System.err.println("[dbg] plan:\n" + rep.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
