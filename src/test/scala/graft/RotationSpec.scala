package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.etl.{LogGen, StreamingTransform}
import graft.streaming.Rotation

/** ST4 Reason-machine semantics via flatMapGroupsWithState: line-count
  * rotation within a partition, idle close on watermark passage, state
  * carried across query restarts.
  */
class RotationSpec extends SparkSpec {

  private def writeBatch(dir: String, name: String, lines: Seq[String]): Unit = {
    val tmp = Paths.get(dir, s".$name.tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, Paths.get(dir, name))
  }

  test("rotation events: MaxLinesReached then idle MaxTimeReached across restarts") {
    val tmp = Files.createTempDirectory("graft-rot").toString
    val landing = s"$tmp/landing"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    Files.createDirectories(Paths.get(landing))

    val t0 = 1700000000L // day 1
    val run = () => {
      val parsed = StreamingTransform.stream(spark, landing,
        watermarkDelay = "10 minutes")
      val q = Rotation.rotationEvents(parsed, thresholdLines = 100,
          idleMs = 30 * 60 * 1000L)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }

    // run 1: 250 lines in one day-partition -> two full files of 100
    writeBatch(landing, "b1.log",
      LogGen.entries(250, t0 = t0, rangeSec = 60, seed = 41).map(_.line))
    run()
    val afterRun1 = spark.read.parquet(out)
    val full = afterRun1.filter("reason = 'MaxLinesReached'")
    assert(full.count() == 2)
    assert(full.select("lines").collect().forall(_.getLong(0) == 100L))

    // run 2: events a day later -> watermark passes day-1 idle timeout,
    // the residual 50-line file closes as MaxTimeReached
    writeBatch(landing, "b2.log",
      LogGen.entries(10, t0 = t0 + 86400, rangeSec = 60, seed = 42).map(_.line))
    run()
    val events = spark.read.parquet(out)
    val idle = events.filter("reason = 'MaxTimeReached'").collect()
    assert(idle.length == 1, events.collect().mkString("\n"))
    assert(idle.head.getAs[Long]("lines") == 50L)
    assert(idle.head.getAs[Int]("fileSeq") == 2)
  }
}
