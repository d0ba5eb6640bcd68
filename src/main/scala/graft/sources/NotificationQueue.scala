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
  * sandbox-runnable queue (and a usable queue on any HARD-LINK-CAPABLE
  * shared filesystem — POSIX local disks and NFS; claims fail loudly,
  * never unsafely, on mounts without link(2) — including multiple
  * consumer PROCESSES): each message is one `<id>.msg`
  * file (atomic tmp+move publish, like an S3 PUT), each delivery one
  * GENERATION-NUMBERED lease file `.leases/<id>.<gen>` holding
  * `token expiryMillis gen`. The live lease is the highest generation;
  * gen doubles as the receive count. The token identifies the DELIVERY:
  * a redelivery mints a new token (staling old receipts), but
  * [[extendVisibility]] keeps the token and moves only the expiry — a
  * receipt stays valid across heartbeats, exactly SQS's contract
  * (ChangeMessageVisibility does not invalidate the receipt handle; a
  * heartbeat that did would break every delete issued after it). The
  * clock is injectable so specs can expire leases deterministically
  * instead of sleeping.
  *
  * Cross-process single delivery: a claim of expired generation `g` is
  * an atomic CREATE of `<id>.<g+1>` via [[java.nio.file.Files.createLink]]
  * (link(2) fails if the target exists — `Files.move` without
  * REPLACE_EXISTING is NOT a safe substitute: POSIX rename(2) silently
  * replaces). Two consumers racing for the same expired delivery compute
  * the same next generation, collide on the same path, and exactly one
  * wins; the loser just skips the message. Heartbeats rewrite the SAME
  * generation in place (atomic replace), which never races a claim —
  * claims only ever create a strictly higher generation. Producers may
  * be many — publish is atomic. The in-process `synchronized` remains
  * only to keep one instance's bookkeeping coherent across threads. */
final class FileQueue(
    dir: String, visibilityTimeoutSeconds: Long = 300,
    clock: () => Long = () => System.currentTimeMillis) extends NotificationQueue {

  private val root: Path = {
    val p = Paths.get(dir)
    Files.createDirectories(p.resolve(".leases"))
    migrateLegacyLeases(p.resolve(".leases"))
    p
  }

  /** The pre-generation lease layout (one `.leases/<id>` file, no
    * suffix) migrates in place on construction: the recorded count
    * becomes the generation, so a queue directory carried across the
    * upgrade keeps its in-flight deliveries leased (no premature
    * redelivery) and its receive counts (the maxReceives dead-letter
    * guard stays effective). Link-then-delete; two processes racing the
    * migration may link different generations from differently-parsed
    * reads, but the highest-generation rule keeps delivery single and
    * stale generations are swept on ack.
    *
    * The migration is one-shot at construction: STOP the old consumer
    * before starting a new-format one. An old binary still running
    * writes dot-less leases the new snapshot never sees, so a
    * mixed-version pair would double-deliver — no loss vs. the old
    * contract (the old layout was single-consumer-per-process and never
    * cross-process-safe to begin with), but the new invariant only
    * holds among new-format consumers. */
  private def migrateLegacyLeases(ld: Path): Unit =
    Option(ld.toFile.list()).getOrElse(Array.empty)
      .filter(n => !n.startsWith(".") && !n.contains('.'))
      .foreach { id =>
        val legacy = ld.resolve(id)
        val gen = (try new String(Files.readAllBytes(legacy),
            StandardCharsets.UTF_8).trim.split(" ")
          catch { case _: java.io.IOException => Array.empty[String] }) match {
          case Array(_, _, c)
            if c.nonEmpty && c.length <= 9 && c.forall(_.isDigit) =>
            math.max(c.toInt, 1)
          case _ => 1
        }
        val target = ld.resolve(s"$id.$gen")
        try { Files.createLink(target, legacy); Files.delete(legacy) }
        catch {
          // raced by another process's migration, or a filesystem
          // without hard links (where claims fail loudly anyway): drop
          // the legacy file only if the migrated form exists
          case _: java.io.IOException | _: UnsupportedOperationException =>
            if (Files.exists(target)) Files.deleteIfExists(legacy)
        }
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
    val all = leaseGens()
    val msgs = listMessages()
    val msgSet = msgs.toSet
    // sweep orphaned leases: a crash between a claim/ack's message
    // delete and its lease cleanup leaves generations no ack will ever
    // visit (receive iterates messages, not leases) — without the sweep
    // they accumulate forever and slow every listing. Safe to remove:
    // a lease for an id with no message file is either mid-ack (the
    // acker is deleting the same files — deleteIfExists is idempotent)
    // or a true orphan; enqueue publishes the message file before any
    // lease can exist. Listing ORDER is load-bearing: leases first,
    // messages second — a lease in the snapshot was created while its
    // message existed, so a missing message in the LATER listing proves
    // deletion (the reverse order could sweep a just-claimed live lease
    // whose message arrived between the listings; ids are never reused).
    all.filterNot(g => msgSet(g._1)).foreach { case (id, g) =>
      Files.deleteIfExists(leasePath(id, g)) }
    val gens = all.filter(g => msgSet(g._1)).groupMapReduce(_._1)(_._2)(math.max)
    val out = Seq.newBuilder[QueueMessage]
    var taken = 0
    val it = msgs.iterator
    while (it.hasNext && taken < max) {
      val id = it.next()
      val prior = gens.get(id).map(g => leaseAt(id, g))
      if (prior.forall(_.expiryMillis <= now)) {
        val gen = prior.map(_.count).getOrElse(0) + 1
        val token = java.util.UUID.randomUUID().toString
        val claimed = tryCreateLease(id, gen,
          Lease(token, now + visibilityTimeoutSeconds * 1000L, gen))
        if (claimed) {
          // the message file can vanish between the snapshot and the
          // claim (a racing delete with a then-valid receipt) — or
          // between any existence check and the reads themselves, so
          // the reads ARE the check: NoSuchFile means the vanished-
          // message case (drop the orphan lease, skip) rather than
          // failing the whole poll and killing the streaming query
          val msg = root.resolve(s"$id.msg")
          try {
            out += QueueMessage(id, s"$id:$token", body(id), gen,
              Files.getLastModifiedTime(msg).toMillis)
            taken += 1
          } catch {
            case _: java.nio.file.NoSuchFileException => deleteLeases(id)
          }
        } // else: another consumer process won this generation — skip
      }
    }
    out.result()
  }

  override def delete(receiptHandles: Seq[String]): Unit = synchronized {
    val now = clock()
    // ONE lease-dir listing for the whole batch: the per-id generation
    // files to remove are derived from the same snapshot the token check
    // reads, so a batch ack is O(listing + batch), not O(batch × listing)
    val all = leaseGens()
    val gens = all.groupMapReduce(_._1)(_._2)(math.max)
    val byId = all.groupBy(_._1)
    receiptHandles.foreach { rh =>
      split(rh).foreach { case (id, token) =>
        gens.get(id).map(g => leaseAt(id, g)) match {
          case Some(l) if l.token == token =>
            // the token check alone is check-then-act over the batch's
            // one snapshot: if THIS receipt's lease expired mid-batch,
            // another process can claim gen+1 and start processing
            // between the snapshot and this unlink — deleting then would
            // remove a message someone else now holds (LOST if that
            // consumer crashes). Claiming gen+1 ourselves through the
            // same atomic-create gate settles it: exactly one of {this
            // ack, that redelivery claim} wins gen+1, and losing means
            // the receipt is stale after all.
            val gen = gens(id)
            val claimed = tryCreateLease(id, gen + 1,
              Lease(java.util.UUID.randomUUID().toString,
                now + visibilityTimeoutSeconds * 1000L, gen + 1))
            if (claimed) {
              Files.deleteIfExists(root.resolve(s"$id.msg"))
              (byId.getOrElse(id, Nil).map(_._2) :+ (gen + 1)).foreach { g =>
                Files.deleteIfExists(leasePath(id, g)) }
            } // else: superseded between snapshot and ack — stale, leave it
          case _ => // stale receipt: this delivery was superseded — the
                    // message belongs to a newer delivery, leave it
        }
      }
    }
  }

  override def extendVisibility(receiptHandles: Seq[String], seconds: Long): Unit =
    synchronized {
      val now = clock()
      val gens = leaseSnapshot()
      receiptHandles.foreach { rh =>
        split(rh).foreach { case (id, token) =>
          gens.get(id).map(g => leaseAt(id, g)) match {
            case Some(l) if l.token == token && l.expiryMillis > now =>
              // same token, SAME generation, still live: the receipt
              // REMAINS VALID after the heartbeat, and rewriting in
              // place can never race a claim (claims only create higher
              // generations)
              overwriteLease(id, l.copy(expiryMillis = now + seconds * 1000L))
            case _ => // stale OR EXPIRED receipt — nothing to extend.
              // SQS errors on a message not in flight; silently
              // resurrecting an expired lease here would race another
              // consumer's claim (it snapshots "expired", then this
              // heartbeat rewrites "live", then its gen+1 create still
              // succeeds → two consumers both believing they hold a
              // live lease). Expired means expired: the next claim wins.
          }
        }
      }
    }

  private final case class Lease(token: String, expiryMillis: Long, count: Int)

  private def listMessages(): Seq[String] =
    Option(root.toFile.listFiles).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".msg"))
      .map(_.getName.stripSuffix(".msg")).sorted.toSeq

  private def listVisible(now: Long): Seq[String] = {
    val gens = leaseSnapshot()
    listMessages().filter(id =>
      gens.get(id).map(g => leaseAt(id, g)).forall(_.expiryMillis <= now))
  }

  private def body(id: String): String =
    new String(Files.readAllBytes(root.resolve(s"$id.msg")),
      StandardCharsets.UTF_8)

  private def leaseDir: Path = root.resolve(".leases")

  private def leasePath(id: String, gen: Int): Path =
    leaseDir.resolve(s"$id.$gen")

  /** One directory listing → every (message id, lease generation) pair
    * (ids are UUIDs, which contain no '.', so the last dot splits
    * id from generation unambiguously; tmp claim files carry a
    * non-numeric suffix and are filtered out). */
  private def leaseGens(): Seq[(String, Int)] =
    Option(leaseDir.toFile.list()).getOrElse(Array.empty).toSeq
      .flatMap { n =>
        val i = n.lastIndexOf('.')
        val g = if (i > 0) n.substring(i + 1) else ""
        if (g.nonEmpty && g.length <= 9 && g.forall(_.isDigit))
          Some(n.substring(0, i) -> g.toInt)
        else None
      }

  /** Highest lease generation per message id — the LIVE lease. */
  private def leaseSnapshot(): Map[String, Int] =
    leaseGens().groupMapReduce(_._1)(_._2)(math.max)

  /** An unparseable lease generation (manual tampering; atomic-create
    * claims cannot tear) reads as EXPIRED AT ITS GENERATION — the message
    * is immediately receivable again, but the generation counter stays
    * monotone so the re-claim still goes through the atomic-create gate
    * at gen+1. Failing instead would wedge every queue operation behind
    * one corrupt file, defeating the crash-redelivery guarantee the
    * queue exists to provide. */
  private def leaseAt(id: String, gen: Int): Lease = {
    val p = leasePath(id, gen)
    (try new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim
         .split(" ")
     catch { case _: java.io.IOException => Array.empty[String] }) match {
      case Array(token, expiry, _) if expiry.forall(_.isDigit) =>
        Lease(token, expiry.toLong, gen)
      case _ => Lease("?", 0L, gen)
    }
  }

  /** The cross-process claim: full-content tmp file, then an atomic
    * link(2) into place — fails (returns false) iff the generation was
    * already claimed by someone else. NOT `Files.move` without
    * REPLACE_EXISTING: POSIX rename silently replaces, so a move-based
    * claim would let two processes both "win". */
  private def tryCreateLease(id: String, gen: Int, l: Lease): Boolean = {
    val tmp = leaseDir.resolve(s".claim-${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp,
      s"${l.token} ${l.expiryMillis} ${l.count}".getBytes(StandardCharsets.UTF_8))
    try { Files.createLink(leasePath(id, gen), tmp); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case e: UnsupportedOperationException =>
        // fail LOUDLY, not unsafely: falling back to move-based claims
        // would silently break the cross-process single-delivery
        // invariant (POSIX rename replaces)
        throw new IllegalStateException(
          s"queue dir '$dir' is on a filesystem without hard-link " +
            "support — FileQueue's cross-process claim requires " +
            "link(2); put the queue directory on a POSIX/NFS mount",
          e)
    }
    finally Files.deleteIfExists(tmp)
  }

  /** Heartbeat rewrite of an EXISTING generation: tmp + ATOMIC_MOVE with
    * replace — a lease file is either the full previous content or the
    * full new one, never a torn write. Only ever called for a generation
    * this consumer holds the token of. */
  private def overwriteLease(id: String, l: Lease): Unit = {
    val tmp = leaseDir.resolve(s".claim-${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp,
      s"${l.token} ${l.expiryMillis} ${l.count}".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, leasePath(id, l.count), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Remove every lease generation of a deleted message (old generations
    * accumulate one file per redelivery until the message is acked). */
  private def deleteLeases(id: String): Unit =
    leaseGens().filter(_._1 == id)
      .foreach { case (_, g) => Files.deleteIfExists(leasePath(id, g)) }

  /** A receipt handle is `<id>:<token>`; a handle with no ':' cannot have
    * been issued by this queue — treat it as stale (skip) rather than
    * crash the whole batch ack (ADVICE r10). */
  private def split(rh: String): Option[(String, String)] = {
    val i = rh.lastIndexOf(':')
    if (i < 0) None else Some((rh.substring(0, i), rh.substring(i + 1)))
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
