package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** The notification-queue contract the reference's streaming daemon
  * consumes (SQS semantics, public API surface: s3logd polls with a
  * visibility timeout sized to cover processing, deletes each message
  * only after its work commits, and relies on redelivery for crashed
  * consumers — s3logd/src/main.rs:29-207,
  * s3log-lambda-aggregator/src/main.rs:68-109):
  *
  *   - [[receive]] leases up to `max` invisible-elsewhere messages for
  *     `visibilityTimeout`; an unreceipted message becomes receivable
  *     again when its lease expires (at-least-once delivery);
  *   - [[delete]] acknowledges by RECEIPT (one receipt per delivery, not
  *     per message — a stale receipt from a previous delivery must not
  *     delete a message someone else now holds);
  *   - [[extendVisibility]] renews in-flight leases (the reference's
  *     visibility-extension heartbeat for long batches).
  *
  * [[graft.sources.QueueSourceProvider]] turns any implementation into a
  * Structured Streaming source whose checkpoint commit IS the delete —
  * the runnable form of the connector contract documented at
  * [[graft.etl.StreamingTransform.notificationPipeline]].
  */
trait NotificationQueue {
  def receive(max: Int): Seq[QueueMessage]
  def delete(receiptHandles: Seq[String]): Unit
  def extendVisibility(receiptHandles: Seq[String], seconds: Long): Unit
}

/** One delivery: `receiptHandle` identifies THIS delivery (it changes on
  * redelivery); `receiveCount` mirrors SQS ApproximateReceiveCount. */
final case class QueueMessage(
    messageId: String, receiptHandle: String, body: String,
    receiveCount: Int, sentTsMillis: Long)

/** Directory-backed [[NotificationQueue]] with real lease semantics — the
  * sandbox-runnable queue (and a usable single-consumer queue on any
  * shared filesystem): each message is one `<id>.msg` file (atomic
  * tmp+move publish, like an S3 PUT), each lease one `.leases/<id>` file
  * holding `token expiryMillis count`. The token identifies the
  * DELIVERY: a redelivery mints a new token (staling old receipts), but
  * [[extendVisibility]] keeps the token and moves only the expiry — a
  * receipt stays valid across heartbeats, exactly SQS's contract
  * (ChangeMessageVisibility does not invalidate the receipt handle; a
  * heartbeat that did would break every delete issued after it). The
  * clock is injectable so specs can expire leases deterministically
  * instead of sleeping.
  *
  * Single-process consumer by design (the reference runs one s3logd per
  * queue the same way); producers may be many — publish is atomic. */
final class FileQueue(
    dir: String, visibilityTimeoutSeconds: Long = 300,
    clock: () => Long = () => System.currentTimeMillis) extends NotificationQueue {

  private val root: Path = {
    val p = Paths.get(dir)
    Files.createDirectories(p.resolve(".leases"))
    p
  }

  /** Producer side: publish one message body. */
  def enqueue(body: String): String = synchronized {
    val id = java.util.UUID.randomUUID().toString
    val tmp = root.resolve(s".$id.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, root.resolve(s"$id.msg"), StandardCopyOption.ATOMIC_MOVE)
    id
  }

  /** Messages currently receivable (no live lease) — spec/ops visibility. */
  def visibleCount: Int = synchronized { listVisible(clock()).size }

  /** All messages still in the queue, leased or not. */
  def size: Int = synchronized { listMessages().size }

  override def receive(max: Int): Seq[QueueMessage] = synchronized {
    // one clock read for the whole call: visibility filtering and lease
    // writing must agree on "now", or a lease expiring between two reads
    // races the filter
    val now = clock()
    listVisible(now).take(max).map { id =>
      val count = readLease(id).map(_.count).getOrElse(0) + 1
      val token = java.util.UUID.randomUUID().toString
      writeLease(id, Lease(token, now + visibilityTimeoutSeconds * 1000L, count))
      QueueMessage(id, s"$id:$token", body(id), count,
        Files.getLastModifiedTime(root.resolve(s"$id.msg")).toMillis)
    }
  }

  override def delete(receiptHandles: Seq[String]): Unit = synchronized {
    receiptHandles.foreach { rh =>
      val (id, token) = split(rh)
      readLease(id) match {
        case Some(l) if l.token == token =>
          Files.deleteIfExists(root.resolve(s"$id.msg"))
          Files.deleteIfExists(leasePath(id))
        case _ => // stale receipt: this delivery was superseded — the
                  // message belongs to a newer delivery, leave it
      }
    }
  }

  override def extendVisibility(receiptHandles: Seq[String], seconds: Long): Unit =
    synchronized {
      val now = clock()
      receiptHandles.foreach { rh =>
        val (id, token) = split(rh)
        readLease(id) match {
          case Some(l) if l.token == token =>
            // same token: the receipt REMAINS VALID after the heartbeat
            writeLease(id, l.copy(expiryMillis = now + seconds * 1000L))
          case _ => // stale receipt — nothing to extend
        }
      }
    }

  private final case class Lease(token: String, expiryMillis: Long, count: Int)

  private def listMessages(): Seq[String] =
    Option(root.toFile.listFiles).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".msg"))
      .map(_.getName.stripSuffix(".msg")).sorted.toSeq

  private def listVisible(now: Long): Seq[String] =
    listMessages().filter(id => readLease(id).forall(_.expiryMillis <= now))

  private def body(id: String): String =
    new String(Files.readAllBytes(root.resolve(s"$id.msg")),
      StandardCharsets.UTF_8)

  private def leasePath(id: String): Path = root.resolve(".leases").resolve(id)

  /** An unparseable lease (torn write from a kill -9 before leases were
    * written atomically, or manual tampering) reads as ABSENT — i.e. the
    * message is immediately receivable again. Failing instead would
    * wedge every queue operation behind one corrupt file, defeating the
    * crash-redelivery guarantee the queue exists to provide. */
  private def readLease(id: String): Option[Lease] =
    if (!Files.exists(leasePath(id))) None
    else new String(Files.readAllBytes(leasePath(id)),
        StandardCharsets.UTF_8).trim.split(" ") match {
      case Array(token, expiry, count)
          if expiry.forall(_.isDigit) && count.forall(_.isDigit) =>
        Some(Lease(token, expiry.toLong, count.toInt))
      case _ => None
    }

  /** tmp + ATOMIC_MOVE like enqueue: a lease file is either the full
    * previous generation or the full new one, never a torn write. */
  private def writeLease(id: String, l: Lease): Unit = {
    val tmp = root.resolve(s".lease-$id.tmp")
    Files.write(tmp,
      s"${l.token} ${l.expiryMillis} ${l.count}".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, leasePath(id), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def split(rh: String): (String, String) = {
    val i = rh.lastIndexOf(':')
    (rh.substring(0, i), rh.substring(i + 1))
  }
}

/** Process-local registry wiring queue NAMES (the DataFrame reader option)
  * to implementations: a DSv2 source is instantiated from a format string
  * + options map, so live objects must be resolved by name. A production
  * deployment registers its SQS-backed implementation at startup the same
  * way specs register a [[FileQueue]]. */
object QueueRegistry {
  private val queues =
    new java.util.concurrent.ConcurrentHashMap[String, NotificationQueue]()
  def register(name: String, q: NotificationQueue): Unit = queues.put(name, q)
  def lookup(name: String): NotificationQueue =
    Option(queues.get(name)).getOrElse(
      throw new IllegalArgumentException(
        s"no queue registered under '$name' — call QueueRegistry.register first"))
}
