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

  /** Shuffle-exchange census that sees through the AQE wrapper:
    * `AdaptiveSparkPlanExec` is a LEAF to `collect()`, so a naive
    * `collect { case e: ShuffleExchangeExec }` on an adaptive plan
    * finds NOTHING — a `<= k` exchange audit passes vacuously. Unwrap
    * to the finalized inner plan and count both raw exchanges (pre-
    * execution) and the `ShuffleQueryStageExec` leaves AQE rewrites
    * them into (post-execution); reused stages count once per site,
    * which is the plan-shape question the audits ask. */
  def shuffleCount(plan: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
      QueryStageExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    plan match {
      case a: AdaptiveSparkPlanExec => shuffleCount(a.executedPlan)
      // a shuffle stage IS its exchange — count once, then descend past
      // the wrapped exchange node so it isn't counted twice
      case s: ShuffleQueryStageExec =>
        1 + s.plan.children.map(shuffleCount).sum
      case q: QueryStageExec => shuffleCount(q.plan)
      case e: ShuffleExchangeLike => 1 + e.children.map(shuffleCount).sum
      case p => p.children.map(shuffleCount).sum
    }
  }
}
