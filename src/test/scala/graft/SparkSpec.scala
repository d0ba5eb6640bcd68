package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared one-session-per-JVM base for all suites (tests fork once). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sfSmoke = "/root/testdata/sf0.001"

  /** The d13 content-hash split bucket, recomputed independently of the
    * engine (the oracle-side formula): rolling char hash mod 100. Shared
    * by every spec that engineers split-straddling fixtures — one copy,
    * so a split-formula change cannot silently drift a suite. */
  def bucketOf(text: String): Long = {
    val h = text.foldLeft(7L)((acc, c) =>
      (acc * 31 + c.toLong) % graft.operators.TextHash.P)
    (if (text.isEmpty) 7L else h) % 100
  }

  /** Engineer a near-dup pair that STRADDLES the train/test split: salt
    * the body until it lands train (bucket < 80), then tail-salt the
    * near-dup until it lands test (bucket >= 90). Deterministic given
    * the body. Returns (train-side base, test-side leak). */
  def straddlePair(body: String): (String, String) = {
    val base = (0 until 1000).iterator
      .map(i => s"$body salt$i").find(bucketOf(_) < 80).get
    val leak = (0 until 1000).iterator
      .map(i => s"$base tail$i").find(bucketOf(_) >= 90).get
    (base, leak)
  }
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local(
    cores = sys.env.getOrElse("SPARK_GRAFT_TEST_CPUS", "8"), appName = "graft-test")
}
