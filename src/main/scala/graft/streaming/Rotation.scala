package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST4's per-partition writer "Reason machine" as custom streaming state.
  *
  * The reference keeps one task per open output partition that rotates
  * the parquet file at `threshold_lines` and closes the channel after
  * `threshold_maxidle` with a Reason enum. Spark's parquet
  * sink already rotates via maxRecordsPerFile, so the engine doesn't need
  * this to write data — but the OBSERVABLE rotation protocol (which
  * partition closed a file, when, and why) is faithfully reproducible as
  * a keyed state machine over `flatMapGroupsWithState`:
  *
  *   - MaxLinesReached: a partition accumulated `thresholdLines` rows
  *   - MaxTimeReached:  the watermark passed last-event + idle timeout
  *     (the partition went idle and its state was evicted)
  *
  * State per key is two numbers — bounded, watermark-evicted, shuffled
  * only by key: the shape that scales to millions of open partitions.
  */
object Rotation {

  final case class RotationEvent(
      bucket: String, dt: String, fileSeq: Int, lines: Long, reason: String)

  /** keyed state: file sequence + lines in the open file + last event ms
    * (public: Spark's state encoder generates constructor calls). */
  final case class Acc(fileSeq: Int, linesInFile: Long, lastMs: Long)

  /** `parsed` must carry Bucket + an event-time `ts` WITH a watermark
    * already applied (the idle timeout rides on it). */
  def rotationEvents(
      parsed: DataFrame, thresholdLines: Long = 10000000L,
      idleMs: Long = 60000L): Dataset[RotationEvent] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed
      .select(col("Bucket").as[String],
        date_format(col("ts"), "yyyyMMdd").as[String],
        col("ts").as[Timestamp])
      .groupByKey { case (bucket, dt, _) => (bucket, dt) }
      .flatMapGroupsWithState[Acc, RotationEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((bucket, dt), rows, state: GroupState[Acc]) =>
          if (state.hasTimedOut) {
            // idle close: emit the partial file and drop the channel (ST5)
            val acc = state.get
            state.remove()
            if (acc.linesInFile > 0)
              Iterator(RotationEvent(bucket, dt, acc.fileSeq, acc.linesInFile,
                "MaxTimeReached"))
            else Iterator(RotationEvent(bucket, dt, acc.fileSeq, 0,
              "MaxTimeReachedEmpty"))
          } else {
            var acc = state.getOption.getOrElse(Acc(0, 0L, 0L))
            var lastMs = acc.lastMs
            var n = acc.linesInFile
            val out = Seq.newBuilder[RotationEvent]
            rows.foreach { case (_, _, ts) =>
              lastMs = math.max(lastMs, ts.getTime)
              n += 1
              if (n >= thresholdLines) {
                out += RotationEvent(bucket, dt, acc.fileSeq, n, "MaxLinesReached")
                acc = Acc(acc.fileSeq + 1, 0L, lastMs)
                n = 0
              }
            }
            state.update(Acc(acc.fileSeq, n, lastMs))
            state.setTimeoutTimestamp(lastMs + idleMs)
            out.result().iterator
          }
      }
  }
}
