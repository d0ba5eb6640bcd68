package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.etl.{LogGen, StreamingTransform}
import graft.sources.{FileQueue, QueueRegistry}

/** The runnable ST1 queue connector: [[graft.sources.FileQueue]] lease
  * semantics (SQS visibility/receipt contract) and the `graft-queue` DSv2
  * source end-to-end — checkpoint commit deletes messages, a crashed
  * consumer's lease redelivers after the visibility timeout.
  */
class QueueSourceSpec extends SparkSpec {

  private def event(name: String, key: String) =
    s"""{"Records":[{"eventName":"$name","awsRegion":"us-east-1",""" +
      s""""s3":{"bucket":{"name":"logs-bucket"},"object":{"key":"$key","size":123}}}]}"""

  private def writeObj(dir: String, name: String, lines: Seq[String]): Unit = {
    val tmp = Paths.get(dir, s".$name.tmp")
    Files.writeString(tmp, lines.mkString("", "\n", "\n"))
    Files.move(tmp, Paths.get(dir, name))
  }

  test("FileQueue: lease visibility, receipt-scoped delete, redelivery after expiry") {
    var now = 1000000L
    val dir = Files.createTempDirectory("graft-q").toString
    val q = new FileQueue(dir, visibilityTimeoutSeconds = 60, clock = () => now)
    q.enqueue("m1"); q.enqueue("m2"); q.enqueue("m3")
    assert(q.size == 3 && q.visibleCount == 3)
    val got = q.receive(10)
    assert(got.size == 3 && got.forall(_.receiveCount == 1))
    // leased messages are invisible to a second receive (in-flight)
    assert(q.receive(10).isEmpty && q.visibleCount == 0 && q.size == 3)
    // delete two by receipt; the third stays leased
    q.delete(got.take(2).map(_.receiptHandle))
    assert(q.size == 1)
    // lease expiry: the undeleted message is REDELIVERED, count bumped
    now += 61000
    val redelivered = q.receive(10)
    assert(redelivered.size == 1 && redelivered.head.receiveCount == 2)
    assert(redelivered.head.messageId == got.last.messageId)
    // a STALE receipt (the expired first delivery) must not delete the
    // message now held by the second delivery
    q.delete(Seq(got.last.receiptHandle))
    assert(q.size == 1)
    // the current delivery's receipt does
    q.delete(redelivered.map(_.receiptHandle))
    assert(q.size == 0)
    // extendVisibility: the heartbeat keeps a lease alive past its
    // original expiry; the extended lease still expires eventually
    q.enqueue("m4")
    val g4 = q.receive(10)
    assert(g4.size == 1)
    q.extendVisibility(g4.map(_.receiptHandle), 120)
    now += 90000 // past the original 60 s, inside the 120 s extension
    assert(q.receive(10).isEmpty)
    now += 40000 // past the extension
    assert(q.receive(10).size == 1)
  }

  test("two consumer processes on one directory: no message delivered twice while a lease is live") {
    // two FileQueue INSTANCES share nothing but the directory (separate
    // monitors — the in-process `synchronized` does not serialize them),
    // so racing them from two threads exercises exactly the cross-process
    // claim path: the atomic createLink on the generation-numbered lease
    // file must let exactly one side win each message
    val dir = Files.createTempDirectory("graft-q-xproc").toString
    val now = new java.util.concurrent.atomic.AtomicLong(1000000L)
    val qa = new FileQueue(dir, visibilityTimeoutSeconds = 600, clock = () => now.get)
    val qb = new FileQueue(dir, visibilityTimeoutSeconds = 600, clock = () => now.get)
    val n = 40
    (1 to n).foreach(i => qa.enqueue(s"m$i"))
    val seen = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
    val dups = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    def consume(q: FileQueue): Thread = {
      val t = new Thread(() => {
        start.await()
        var got = q.receive(3)
        while (got.nonEmpty) {
          got.foreach(m => if (!seen.add(m.messageId)) dups.incrementAndGet())
          got = q.receive(3)
        }
      })
      t.start(); t
    }
    val (ta, tb) = (consume(qa), consume(qb))
    start.countDown()
    ta.join(30000); tb.join(30000)
    assert(dups.get == 0,
      s"${dups.get} messages delivered to both consumers while leased")
    assert(seen.size == n, s"only ${seen.size}/$n messages delivered")
    // every message is now leased once; after expiry BOTH consumers race
    // the redelivery generation — still single delivery
    now.addAndGet(601000L)
    seen.clear()
    val (ta2, tb2) = (consume(qa), consume(qb))
    ta2.join(30000); tb2.join(30000)
    assert(dups.get == 0, "expired-lease reclaim double-delivered")
    assert(seen.size == n)
  }

  test("an expired lease cannot be resurrected by a late heartbeat") {
    // the TOCTOU this pins: consumer B snapshots an expired lease, then
    // A's delayed heartbeat rewrites it live, then B's claim succeeds →
    // both sides believe they hold a live lease. Expired must mean
    // expired: the late extendVisibility is a no-op (SQS errors on a
    // message not in flight) and the next receive wins the redelivery.
    var now = 1000000L
    val dir = Files.createTempDirectory("graft-q-late-hb").toString
    val q = new FileQueue(dir, visibilityTimeoutSeconds = 60, clock = () => now)
    q.enqueue("m")
    val got = q.receive(10)
    assert(got.size == 1)
    now += 61000 // past the visibility timeout: the lease is expired
    q.extendVisibility(got.map(_.receiptHandle), 300)
    assert(q.visibleCount == 1,
      "late heartbeat resurrected an expired lease")
    val re = q.receive(10)
    assert(re.size == 1 && re.head.receiveCount == 2)
    // the resurrection attempt also left the original receipt stale
    q.delete(got.map(_.receiptHandle))
    assert(q.size == 1, "stale receipt deleted a redelivered message")
    q.delete(re.map(_.receiptHandle))
    assert(q.size == 0)
  }

  test("pre-generation lease files migrate on construction (in-flight stays leased, counts survive)") {
    // the upgrade gap this pins: the old layout is one `.leases/<id>`
    // file holding `token expiry count`; if the new snapshot ignored it,
    // an in-flight message would redeliver immediately with its receive
    // count reset (defeating the dead-letter guard) and the orphan file
    // would sit in .leases forever
    var now = 1000000L
    val dir = Files.createTempDirectory("graft-q-migrate")
    val id = java.util.UUID.randomUUID().toString
    Files.writeString(dir.resolve(s"$id.msg"), "carried-over body")
    Files.createDirectories(dir.resolve(".leases"))
    Files.writeString(dir.resolve(".leases").resolve(id),
      s"old-token ${now + 60000} 2")
    val q = new FileQueue(dir.toString, visibilityTimeoutSeconds = 60,
      clock = () => now)
    assert(q.visibleCount == 0,
      "in-flight legacy lease was invisible: immediate redelivery")
    assert(!Files.exists(dir.resolve(".leases").resolve(id)),
      "legacy lease file not cleaned up by the migration")
    now += 61000
    val re = q.receive(10)
    assert(re.size == 1 && re.head.receiveCount == 3,
      s"receive count did not survive the migration: ${re.map(_.receiveCount)}")
    q.delete(re.map(_.receiptHandle))
    assert(q.size == 0)
  }

  test("an ack racing a redelivery claim cannot delete the other consumer's message") {
    // the check-then-act this pins: consumer A's batch ack verifies its
    // receipts against ONE snapshot; if a lease expired mid-batch,
    // consumer B can re-claim the message inside A's loop — A's delete
    // must then lose (the ack claims gen+1 through the same atomic gate
    // redelivery does), or B's in-flight message would be destroyed
    val dir = Files.createTempDirectory("graft-q-ackrace")
    val now = new java.util.concurrent.atomic.AtomicLong(1000000L)
    val qa = new FileQueue(dir.toString, visibilityTimeoutSeconds = 60,
      clock = () => now.get)
    val qb = new FileQueue(dir.toString, visibilityTimeoutSeconds = 60,
      clock = () => now.get)
    val n = 30
    (1 to n).foreach(i => qa.enqueue(s"m$i"))
    val got = qa.receive(n)
    assert(got.size == n)
    now.addAndGet(61000L) // every lease expires while A still "works"
    val bSeen = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
    val start = new java.util.concurrent.CountDownLatch(1)
    val ta = new Thread(() => {
      start.await(); qa.delete(got.map(_.receiptHandle)) })
    val tb = new Thread(() => {
      start.await()
      var more = true
      while (more) {
        val g = qb.receive(3)
        g.foreach(m => bSeen.add(m.messageId))
        more = g.nonEmpty
      }
    })
    ta.start(); tb.start(); start.countDown()
    ta.join(30000); tb.join(30000)
    // exactly B's re-claimed messages survive: one B holds was not
    // deleted, and every message B did not take was acked away
    val surviving = Option(dir.toFile.list()).getOrElse(Array.empty)
      .filter(_.endsWith(".msg")).map(_.stripSuffix(".msg")).toSet
    val bIds = { import scala.jdk.CollectionConverters._; bSeen.asScala.toSet }
    assert(surviving == bIds,
      s"ack/claim race: B re-claimed ${bIds.size}, queue kept " +
        s"${surviving.size} — a re-claimed message was deleted or an " +
        "unclaimed one survived its ack")
  }

  test("an expired-but-unreclaimed receipt still acks (SQS delete semantics)") {
    // SQS deletes on a receipt whose visibility lapsed as long as the
    // message was not received again; the atomic gen+1 supersede in
    // delete() must preserve that, not turn every late ack into a no-op
    var now = 1000000L
    val dir = Files.createTempDirectory("graft-q-lateack").toString
    val q = new FileQueue(dir, visibilityTimeoutSeconds = 60, clock = () => now)
    q.enqueue("m")
    val got = q.receive(10)
    now += 61000 // lease expired, nobody re-received
    q.delete(got.map(_.receiptHandle))
    assert(q.size == 0, "late ack of an unreclaimed message no-opped")
  }

  test("orphaned lease files (message gone, lease cleanup crashed) are swept on receive") {
    // a crash between a batch ack's message delete and its lease cleanup
    // leaves generations for an id receive() never visits (it iterates
    // messages, not leases); without the sweep they accumulate forever
    val dir = Files.createTempDirectory("graft-q-orphan")
    val q = new FileQueue(dir.toString, visibilityTimeoutSeconds = 60)
    q.enqueue("live")
    val ghost = java.util.UUID.randomUUID().toString
    Files.writeString(dir.resolve(".leases").resolve(s"$ghost.3"), "tok 99 3")
    val got = q.receive(10)
    assert(got.size == 1, "sweep interfered with live delivery")
    assert(!Files.exists(dir.resolve(".leases").resolve(s"$ghost.3")),
      "orphaned lease survived the sweep")
  }

  test("malformed receipt handles are stale, not crashes (batch ack survives)") {
    val dir = Files.createTempDirectory("graft-q-badrh").toString
    val q = new FileQueue(dir, visibilityTimeoutSeconds = 600)
    q.enqueue("keep"); val got = q.receive(10)
    // a handle with no ':' cannot have been issued by the queue — the
    // whole batch ack must still process the valid receipts around it
    q.delete(Seq("garbage-without-colon", got.head.receiptHandle))
    assert(q.size == 0, "valid receipt in the same batch as a malformed one did not delete")
    q.extendVisibility(Seq("also-garbage"), 60) // must not throw
  }

  test("a receipt stays valid across heartbeats (SQS ChangeMessageVisibility contract)") {
    // the failure this pins: if the heartbeat re-minted the receipt, every
    // delete issued AFTER a visibility extension would silently no-op and
    // the continuous-mode pipeline would never empty the queue
    var now = 5000000L
    val dir = Files.createTempDirectory("graft-q-hb").toString
    val q = new FileQueue(dir, visibilityTimeoutSeconds = 60, clock = () => now)
    q.enqueue("long batch message")
    val got = q.receive(10)
    assert(got.size == 1)
    // two heartbeats while the batch runs, then the ack with the ORIGINAL
    // receipt — it must still delete
    q.extendVisibility(got.map(_.receiptHandle), 120)
    now += 60000
    q.extendVisibility(got.map(_.receiptHandle), 120)
    q.delete(got.map(_.receiptHandle))
    assert(q.size == 0, "delete after heartbeat no-opped: receipt went stale")
  }

  test("queue-backed pipeline: batch ack empties the queue, AvailableNow drains, incremental runs") {
    val tmp = Files.createTempDirectory("graft-qe2e").toString
    val objects = s"$tmp/objects"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    Files.createDirectories(Paths.get(objects))
    writeObj(objects, "a.log", LogGen.lines(120, seed = 81))
    writeObj(objects, "b.log", LogGen.lines(80, seed = 82))
    writeObj(objects, "skip.log", LogGen.lines(40, seed = 83))
    val q = new FileQueue(s"$tmp/queue", visibilityTimeoutSeconds = 600)
    QueueRegistry.register("spec-e2e", q)
    q.enqueue(event("ObjectCreated:Put", "a.log"))
    q.enqueue(event("ObjectCreated:CompleteMultipartUpload", "b.log"))
    q.enqueue(event("ObjectRemoved:Delete", "skip.log")) // F2-gated out
    q.enqueue("not json at all") // undeserializable: warn-and-skip
    val run = () => {
      val query = StreamingTransform.queueNotificationPipeline(spark,
          "spec-e2e", out, ckpt, (_, key) => s"$objects/$key",
          maxMessagesPerTrigger = 2) // several micro-batches per drain
        .trigger(Trigger.AvailableNow()).start()
      query.awaitTermination(120000)
      query
    }
    val q1 = run()
    // gated objects landed; the deleted object never did
    assert(spark.read.parquet(out).count() == 200)
    // the drain honored maxMessagesPerTrigger: 4 messages at 2 per
    // trigger ran as >=2 data-carrying micro-batches, not one giant one
    assert(q1.recentProgress.count(_.numInputRows > 0) >= 2,
      s"drain planned as ${q1.recentProgress.count(_.numInputRows > 0)} batch(es)")
    // ST6 for real: EVERY message (processed, gated, undeserializable)
    // was acked after its batch's transform landed — the queue is empty
    assert(q.size == 0)
    // incremental: a later notification processes alone off the same
    // checkpoint (batch numbering continues across the restart)
    writeObj(objects, "c.log", LogGen.lines(50, seed = 84))
    q.enqueue(event("ObjectCreated:Put", "c.log"))
    run()
    assert(spark.read.parquet(out).count() == 250)
    assert(q.size == 0)
  }

  test("continuous-mode trigger: per-batch acks drain the queue across micro-batches") {
    // ProcessingTime is the production daemon mode: several one-message
    // micro-batches in one run, the source heartbeating in-flight leases
    // each trigger — the path where a heartbeat-staled receipt would
    // leave the queue permanently full
    val tmp = Files.createTempDirectory("graft-qcont").toString
    val objects = s"$tmp/objects"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    Files.createDirectories(Paths.get(objects))
    writeObj(objects, "a.log", LogGen.lines(30, seed = 86))
    writeObj(objects, "b.log", LogGen.lines(20, seed = 87))
    writeObj(objects, "c.log", LogGen.lines(10, seed = 88))
    val q = new FileQueue(s"$tmp/queue", visibilityTimeoutSeconds = 600)
    QueueRegistry.register("spec-cont", q)
    Seq("a.log", "b.log", "c.log")
      .foreach(k => q.enqueue(event("ObjectCreated:Put", k)))
    val query = StreamingTransform.queueNotificationPipeline(spark, "spec-cont",
        out, ckpt, (_, key) => s"$objects/$key", maxMessagesPerTrigger = 1)
      .trigger(Trigger.ProcessingTime(0)).start()
    query.processAllAvailable()
    query.stop()
    assert(spark.read.parquet(out).count() == 60)
    assert(q.size == 0)
  }

  test("a poison notification is dead-lettered and acked after maxReceives deliveries") {
    var now = 9000000L
    val tmp = Files.createTempDirectory("graft-qpoison").toString
    val objects = s"$tmp/objects"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    Files.createDirectories(Paths.get(objects))
    val q = new FileQueue(s"$tmp/queue", visibilityTimeoutSeconds = 60,
      clock = () => now)
    QueueRegistry.register("spec-poison", q)
    q.enqueue(event("ObjectCreated:Put", "ghost.log")) // object never existed
    val run = () => {
      val query = StreamingTransform.queueNotificationPipeline(spark,
          "spec-poison", out, ckpt, (_, key) => s"$objects/$key",
          maxReceives = 1)
        .trigger(Trigger.AvailableNow()).start()
      try { query.awaitTermination(120000); true }
      catch {
        case _: org.apache.spark.sql.streaming.StreamingQueryException => false
      }
    }
    // delivery 1 (receive_count = 1 <= maxReceives): the transform fails
    // on the missing object, the query crashes, the message stays queued
    assert(!run(), "expected the poison batch to fail the query")
    assert(q.size == 1)
    // lease expires -> delivery 2 (count 2 > maxReceives): dead-lettered
    // and acked instead of crash-looping forever
    now += 61000
    assert(run(), "expected the dead-letter path to complete the query")
    assert(q.size == 0)
    val dl = Option(new java.io.File(s"$ckpt/deadletter").listFiles)
      .getOrElse(Array.empty)
      .filterNot(_.getName.startsWith(".")) // local-FS .crc sidecars
    assert(dl.length == 1 && dl.head.getName.endsWith(".json"), dl.toSeq)
    // the body is preserved for inspection/replay
    assert(Files.readString(dl.head.toPath).contains("ghost.log"))
    assert(!new java.io.File(out).exists()) // the ghost produced no output
  }

  test("a crashed consumer's leased message is redelivered after the visibility timeout") {
    var now = System.currentTimeMillis()
    val tmp = Files.createTempDirectory("graft-qredeliver").toString
    val objects = s"$tmp/objects"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
    Files.createDirectories(Paths.get(objects))
    writeObj(objects, "a.log", LogGen.lines(70, seed = 85))
    val q = new FileQueue(s"$tmp/queue", visibilityTimeoutSeconds = 60,
      clock = () => now)
    QueueRegistry.register("spec-redeliver", q)
    q.enqueue(event("ObjectCreated:Put", "a.log"))
    // a consumer received the message and crashed before committing
    assert(q.receive(10).size == 1)
    val run = () => {
      val query = StreamingTransform.queueNotificationPipeline(spark,
          "spec-redeliver", out, ckpt, (_, key) => s"$objects/$key")
        .trigger(Trigger.AvailableNow()).start()
      query.awaitTermination(120000)
    }
    // while the lease is live the message is invisible: nothing lands
    run()
    assert(!new java.io.File(out).exists())
    // the lease expires -> the queue redelivers -> the pipeline processes
    now += 61000
    run()
    assert(spark.read.parquet(out).count() == 70)
    assert(q.size == 0)
  }
}
