package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{Compact, EtlConfig, LogGen, Transform}
import graft.operators.{MinHashAgg, TextHash}
import graft.streaming.Metrics

/** Lake-maintenance + UDAF + metrics coverage. */
class MaintenanceSpec extends SparkSpec {

  test("MinHashAgg (typed Aggregator) equals the HOF signature exactly") {
    import spark.implicits._
    val docs = Tables(spark, sfSmoke, "documents").limit(100)
      .withColumn("th", expr(TextHash.sparkTokenHashes("text")))
      .withColumn("sh", expr(TextHash.sparkShingles("th")))
    val viaHof = docs
      .select($"doc_id", expr(TextHash.sparkMinhash("sh")).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // exploded shingles → partial-aggregating UDAF (map-side combine)
    val agg = org.apache.spark.sql.functions.udaf(MinHashAgg)
    val viaUdaf = docs
      .select($"doc_id", explode($"sh").as("sh1"))
      .groupBy($"doc_id").agg(agg($"sh1").as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // UDAF path must cover every doc that HAS shingles (empty-shingle
    // docs produce the sentinel signature in the HOF path and no row at
    // all after explode — none exist in this corpus, but don't let a
    // row-dropping regression hide behind a subset check)
    val expected = viaHof.filter(_._2.exists(_ != TextHash.P)).keySet
    assert(viaUdaf.keySet == expected)
    viaUdaf.foreach { case (k, v) => assert(v == viaHof(k), s"doc $k") }
  }

  test("compaction merges small files and conserves rows") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"
    LogGen.lines(2000, seed = 51).toDF("value").repartition(8).write.text(in)
    // force many tiny files per partition
    Transform.run(spark, Seq(in), out, EtlConfig(maxRecordsPerFile = 50))
    val stats = Compact.run(spark, out, Seq("year", "month", "day", "hour"))
    assert(stats.rows == 2000)
    assert(stats.files1 < stats.files0,
      s"expected fewer files, got ${stats.files0} -> ${stats.files1}")
    assert(spark.read.parquet(out).count() == 2000)
  }

  test("streaming metrics listener records per-batch throughput (M1)") {
    import java.nio.file.Paths
    import org.apache.spark.sql.streaming.Trigger
    import graft.etl.StreamingTransform
    val tmp = Files.createTempDirectory("graft-mon").toString
    val landing = s"$tmp/landing"
    Files.createDirectories(Paths.get(landing))
    Files.writeString(Paths.get(landing, "b1.log"),
      LogGen.lines(500, seed = 52).mkString("", "\n", "\n"))
    val m = Metrics.attach(spark)
    try {
      val q = StreamingTransform.stream(spark, landing)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 30000
      while (m.snapshot.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(m.snapshot.nonEmpty)
      assert(m.snapshot.map(_.inputRows).sum == 500)
    } finally spark.streams.removeListener(m)
  }
}
