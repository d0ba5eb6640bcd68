package graft.sources

import java.util

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset,
  ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 micro-batch source over a [[NotificationQueue]] — the RUNNABLE
  * form of the ST1 queue-connector contract (reference: s3logd's SQS
  * poll loop, s3logd/src/main.rs:29-207): checkpoint commit IS message
  * deletion, so the delivery guarantee is exactly the reference's —
  * at-least-once, effectively-once behind the pipeline's dedup stage.
  *
  *   spark.readStream.format("graft-queue")
  *     .option("queue", name)                // QueueRegistry key
  *     .option("maxMessagesPerTrigger", 10)  // max_sqs_messages analog
  *     .option("visibilityHeartbeatSeconds", 300)
  *     .load()
  *
  * Semantics, mapped to the engine's offset/commit protocol:
  *   - `latestOffset` (driver-side, per trigger) first HEARTBEATS every
  *     in-flight lease ([[NotificationQueue.extendVisibility]] — the
  *     reference's visibility-extension loop for long batches), then
  *     receives up to `maxMessagesPerTrigger`; each non-empty receive is
  *     one batch. Notifications are metadata (bucket/key pointers), so
  *     the driver-side receive is bounded the same way the reference's
  *     poll is.
  *   - DELETION is sink-side: rows carry `receipt_handle`, and the
  *     consumer acks each batch AFTER its work lands (the reference
  *     deletes each message only after staging completes,
  *     s3log-lambda-aggregator/src/main.rs:68-109) — see
  *     [[graft.etl.StreamingTransform.queueNotificationPipeline]].
  *     `commit(end)` additionally deletes any still-undeleted receipts
  *     of committed batches as a backstop (receipt-scoped deletes make
  *     the double-ack a no-op). Sink-side acking is load-bearing, not a
  *     style choice: the engine commits source offsets LAZILY (batch N's
  *     commit fires when batch N+1 starts), so the final batch of a
  *     drain would otherwise never delete in-process.
  *   - Restart before ack: leased-but-undeleted messages reappear after
  *     their visibility timeout and are redelivered as NEW batches. A
  *     replayed uncommitted offset range therefore plans EMPTY (a
  *     queue, unlike a log, cannot re-read a delivery); this is the
  *     standard queue-source recovery shape and exactly SQS's contract —
  *     at-least-once, effectively-once behind the pipeline's dedup.
  *   - Trigger.AvailableNow drains: `prepareForTriggerAvailableNow`
  *     receives until the queue is visibly empty, pins the end offset,
  *     and the run stops there.
  */
class QueueSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-queue"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QueueSourceProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new QueueTable
}

object QueueSourceProvider {
  /** message_id/receipt_handle/receive_count mirror SQS MessageId /
    * ReceiptHandle / ApproximateReceiveCount; `sent_ts` is the enqueue
    * time. The notification BODY is one column — the pipeline parses it
    * as S3 event JSON downstream — and the receipt rides the row so the
    * consumer can ack after its work lands (sink-side deletion). */
  val schema: StructType = StructType(Seq(
    StructField("message_id", StringType, nullable = false),
    StructField("receipt_handle", StringType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("receive_count", IntegerType, nullable = false),
    StructField("sent_ts", TimestampType, nullable = false)))
}

private[sources] class QueueTable extends Table with SupportsRead {
  override def name(): String = "graft-queue"
  override def schema(): StructType = QueueSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = QueueSourceProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new QueueMicroBatchStream(
            options.get("queue"),
            Option(options.get("maxMessagesPerTrigger")).map(_.toInt).getOrElse(10),
            Option(options.get("visibilityHeartbeatSeconds")).map(_.toLong)
              .getOrElse(300L))
      }
    }
}

/** Offset = number of batches this stream has produced (a high-watermark;
  * batch ids are 0-based). */
private[sources] case class QueueOffset(batches: Long) extends Offset {
  override def json(): String = batches.toString
}

private[sources] class QueueMicroBatchStream(
    queueName: String, maxPerTrigger: Int, heartbeatSeconds: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  require(queueName != null,
    "graft-queue needs .option(\"queue\", <QueueRegistry name>)")
  private val queue = QueueRegistry.lookup(queueName)
  // observability: receives/redeliveries/heartbeats surface through
  // graft.streaming.QueueMetrics (mon-task parity for the queue path)
  private val metrics = graft.streaming.QueueMetrics.of(queueName)

  // driver-side state, guarded by this: batches received but not yet
  // committed (batch id -> messages of that delivery)
  private val pending = mutable.TreeMap.empty[Long, Seq[QueueMessage]]
  private var produced = 0L
  private var aligned = false
  // AvailableNow: deliveries drained in prepare, awaiting batch ids (ids
  // can only be assigned once `start` aligns the watermark), and the
  // pinned end offset once they have them
  private var preparedDrain: Option[List[Seq[QueueMessage]]] = None
  private var drainEnd: Option[Long] = None

  override def initialOffset(): Offset = QueueOffset(0L)
  override def deserializeOffset(json: String): Offset = QueueOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxPerTrigger)

  /** Batch ids continue across restarts: a fresh instance numbers its
    * first batch at the CHECKPOINTED watermark (the `start` the engine
    * hands to latestOffset), never at zero — otherwise a restarted
    * query's new deliveries would land inside the already-committed
    * offset range and be planned as empty. */
  private def align(start: Long): Unit =
    if (!aligned) { produced = math.max(produced, start); aligned = true }

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    // drain: receive until nothing is visible; ids are assigned at the
    // first latestOffset call, once the start watermark is known
    val batches = List.newBuilder[Seq[QueueMessage]]
    var got = queue.receive(maxPerTrigger)
    while (got.nonEmpty) {
      metrics.recordReceive(got.map(_.receiveCount))
      batches += got
      got = queue.receive(maxPerTrigger)
    }
    preparedDrain = Some(batches.result())
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    synchronized {
      val s = start.asInstanceOf[QueueOffset].batches
      align(s)
      // heartbeat every in-flight delivery BEFORE anything else — in
      // BOTH modes. A long drain leases the whole backlog up front, so
      // its tail would otherwise sit leased far past the visibility
      // timeout and become receivable by a second consumer mid-drain;
      // already-acked receipts no-op (stale token / missing lease).
      val inFlight = pending.values.flatten.map(_.receiptHandle).toSeq
      if (inFlight.nonEmpty) {
        queue.extendVisibility(inFlight, heartbeatSeconds)
        metrics.leaseExtensions.addAndGet(inFlight.size.toLong)
      }
      preparedDrain match {
        case Some(batches) => // AvailableNow: pin the end once...
          if (drainEnd.isEmpty) {
            batches.foreach { b => pending.put(produced, b); produced += 1 }
            drainEnd = Some(produced)
          }
          // ...but release ONE pending delivery per trigger: returning
          // drainEnd directly would plan the entire backlog as a single
          // micro-batch, and maxMessagesPerTrigger would bound nothing
          // during exactly the drain that needs it most. The run still
          // terminates: once start reaches drainEnd the offset stops
          // advancing.
          QueueOffset(math.min(s + 1, drainEnd.get))
        case None =>
          // honor the ENGINE-side admission control when it is row-based
          // (today it echoes getDefaultReadLimit, but a user-composed
          // limit must not be silently ignored); anything non-row-based
          // falls back to the configured per-trigger cap
          val cap = limit match {
            case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
              math.min(r.maxRows(), maxPerTrigger.toLong).toInt
            case _ => maxPerTrigger
          }
          val got = queue.receive(cap)
          if (got.nonEmpty) {
            metrics.recordReceive(got.map(_.receiveCount))
            pending.put(produced, got)
            produced += 1
          }
          QueueOffset(produced)
      }
    }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used (SupportsAdmissionControl)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val (s, e) = (start.asInstanceOf[QueueOffset].batches,
        end.asInstanceOf[QueueOffset].batches)
      // a replayed range from BEFORE this incarnation (restart with an
      // uncommitted batch) has no cached delivery: plan empty — the
      // queue redelivers those messages as new batches after their
      // visibility timeout (at-least-once, SQS semantics)
      val msgs = (s until e).flatMap(id => pending.getOrElse(id, Nil))
      if (msgs.isEmpty) Array.empty
      else Array(QueueInputPartition(
        msgs.map(m => (m.messageId, m.receiptHandle, m.body, m.receiveCount,
          m.sentTsMillis)).toArray))
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new QueueReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[QueueOffset].batches
    val done = pending.rangeUntil(e).toSeq
    val receipts = done.flatMap(_._2).map(_.receiptHandle)
    if (receipts.nonEmpty) queue.delete(receipts)
    done.foreach { case (id, _) => pending.remove(id) }
  }

  override def stop(): Unit = ()
}

private[sources] case class QueueInputPartition(
    msgs: Array[(String, String, String, Int, Long)]) extends InputPartition

private[sources] class QueueReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val msgs = p.asInstanceOf[QueueInputPartition].msgs
      private var i = -1
      override def next(): Boolean = { i += 1; i < msgs.length }
      override def get(): InternalRow = {
        val (id, receipt, body, count, tsMillis) = msgs(i)
        InternalRow(UTF8String.fromString(id), UTF8String.fromString(receipt),
          UTF8String.fromString(body), count,
          tsMillis * 1000L) // TimestampType is micros
      }
      override def close(): Unit = ()
    }
}
