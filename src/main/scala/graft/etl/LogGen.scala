package graft.etl

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.Locale

import scala.util.Random

/** Deterministic synthetic S3 access-log generator — the engine's test
  * fixture source, re-expressing the reference's loggen harness semantics
  * (scripts/loggen/s3loggen.py:52-89: field catalog; conf.py:10-11: lines
  * per file / time spread). Seed-stable so property tests are repeatable.
  */
object LogGen {

  private val operations = Seq(
    "REST.GET.OBJECT", "REST.PUT.OBJECT", "REST.HEAD.OBJECT",
    "REST.DELETE.OBJECT", "REST.POST.MULTI_OBJECT_DELETE",
    "REST.GET.BUCKET", "BATCH.DELETE.OBJECT")
  private val statuses = Seq("200", "200", "200", "206", "204", "403", "404", "500")
  private val errorFor = Map("403" -> "AccessDenied", "404" -> "NoSuchKey",
    "500" -> "InternalError")
  private val agents = Seq(
    "aws-sdk-java/2.20.0 Linux/5.10 OpenJDK_64-Bit_Server_VM/17",
    "aws-cli/2.13.0 Python/3.11.4 Linux/6.1 exe/x86_64",
    "Mozilla/5.0 (compatible; test agent with spaces)",
    "S3Console/0.4", "-")
  private val fmt = DateTimeFormatter
    .ofPattern("dd/MMM/yyyy:HH:mm:ss Z", Locale.US)
    .withZone(ZoneOffset.UTC)

  final case class Entry(
      bucket: String, epochSec: Long, requestId: String, operation: String,
      key: String, status: String, bytesSent: Long, agent: String,
      extraFields: Seq[String]) {

    def line: String = {
      val err = errorFor.getOrElse(status, "-")
      val time = fmt.format(Instant.ofEpochSecond(epochSec))
      val base =
        s"79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be $bucket " +
          s"[$time] 192.0.2.${math.abs(requestId.hashCode % 255)} " +
          s"arn:aws:iam::123456789012:user/tester $requestId $operation $key " +
          "\"GET /" + key + " HTTP/1.1\" " +
          s"$status $err $bytesSent ${bytesSent + 17} 42 12 " +
          "\"-\" \"" + agent + "\" - " +
          "HOSTID0123456789abcdef/example= SigV4 ECDHE-RSA-AES128-GCM-SHA256 " +
          s"AuthHeader $bucket.s3.us-east-1.amazonaws.com TLSv1.2 - Yes"
      if (extraFields.isEmpty) base else base + " " + extraFields.mkString(" ")
    }
  }

  /** `n` entries for `bucket` spread over [t0, t0+rangeSec), seed-stable.
    * `extraFrac` of entries carry overflow fields (exercises W1);
    * `dupFrac` re-emits a previous RequestID at a new position (exercises
    * D1 at-least-once redelivery, reference FAQ.md:20-22). */
  def entries(
      n: Int, bucket: String = "examplebucket", t0: Long = 1700000000L,
      rangeSec: Int = 600, seed: Long = 42L, extraFrac: Double = 0.0,
      dupFrac: Double = 0.0): Seq[Entry] = {
    val rnd = new Random(seed)
    val base = (0 until n).map { i =>
      val ts = t0 + rnd.nextInt(rangeSec)
      val status = statuses(rnd.nextInt(statuses.length))
      Entry(
        bucket = bucket, epochSec = ts,
        requestId = f"REQ${seed}%X${i}%08X",
        operation = operations(rnd.nextInt(operations.length)),
        key = f"data/part-${rnd.nextInt(1000)}%05d.bin",
        status = status,
        bytesSent = rnd.nextInt(1 << 20).toLong,
        agent = agents(rnd.nextInt(agents.length)),
        extraFields =
          if (rnd.nextDouble() < extraFrac) Seq("extraA", "extraB") else Nil)
    }
    val dups = base.filter(_ => rnd.nextDouble() < dupFrac)
    rnd.shuffle(base ++ dups)
  }

  def lines(n: Int, seed: Long = 42L, extraFrac: Double = 0.0,
      dupFrac: Double = 0.0): Seq[String] =
    entries(n, seed = seed, extraFrac = extraFrac, dupFrac = dupFrac).map(_.line)
}
