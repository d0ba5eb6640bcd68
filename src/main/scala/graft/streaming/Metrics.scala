package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** M1 parity: the reference's mon task keeps 1-min ring buffers of
  * lines/s and process latency and logs rolling averages (mon.rs). Under
  * Structured Streaming the engine already emits those numbers per micro-
  * batch; this listener collects them and exposes rolling averages.
  */
final class Metrics extends StreamingQueryListener {

  final case class Point(batchId: Long, inputRows: Long,
      rowsPerSec: Double, durationMs: Long)

  private val points = new ConcurrentLinkedQueue[Point]()
  private val keep = 15 // ring size, like the reference's 15×1-min buffer

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    points.add(Point(p.batchId, p.numInputRows,
      p.inputRowsPerSecond, p.batchDuration))
    while (points.size > keep) points.poll()
  }

  def snapshot: Seq[Point] = {
    val it = points.iterator()
    val b = Seq.newBuilder[Point]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** rolling average lines/s over the retained window */
  def avgRowsPerSec: Double = {
    val s = snapshot.filterNot(_.rowsPerSec.isNaN)
    if (s.isEmpty) 0.0 else s.map(_.rowsPerSec).sum / s.size
  }
}

object Metrics {
  /** attach a fresh listener to the session; returns it for inspection */
  def attach(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.streams.addListener(m)
    m
  }
}
