package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stall-retry trigger (round-15 driver lesson: four
  * queries carried 8–22 s one-run stall artifacts in a session the calib
  * band flagged; the retry takes ONE bounded extra run when a run
  * exceeds 5x the min of its siblings, so a transient scheduler freeze
  * cannot ride into the artifact while a genuinely slow query — all runs
  * slow, ratio near 1 — is never retried into a lie). Pure-function
  * spec: the trigger must be exercisable without timing a real stall. */
class BenchRetrySpec extends AnyFunSuite {

  test("a single stalled run among quiet siblings trips the retry") {
    assert(Bench.stallRetryNeeded(Seq(0.36, 8.49)))   // the r15 q33 shape
    assert(Bench.stallRetryNeeded(Seq(22.33, 0.36, 0.41)))
  }

  test("steady-state spreads (< 5x) do not retry — jitter is the calib " +
    "band's job, not the retry's") {
    assert(!Bench.stallRetryNeeded(Seq(0.36, 0.41)))
    assert(!Bench.stallRetryNeeded(Seq(1.0, 4.9)))
    // a uniformly slow query is SLOW, not stalled: no retry can fix it
    assert(!Bench.stallRetryNeeded(Seq(8.2, 8.5, 8.4)))
  }

  test("degenerate inputs never trip: empty, single run at any speed, " +
    "failed runs (negative sentinel)") {
    assert(!Bench.stallRetryNeeded(Seq.empty))
    assert(!Bench.stallRetryNeeded(Seq(42.0)))
    // a -1 failure sentinel must not divide into a bogus ratio
    assert(!Bench.stallRetryNeeded(Seq(-1.0, 3.0)))
  }

  test("calib normalization scales to the band midpoint: identity at " +
    "midpoint, deflates slow sessions, inflates quick ones, raw " +
    "fallback on a failed anchor (r17)") {
    // band [0.26, 0.36] -> midpoint 0.31
    assert(Bench.calibNormalized(77.0, 0.31, 0.26, 0.36) == 77.0)
    // the r16 driver session: calib 0.427 — a 100 s total reads ~72.6 s
    val slow = Bench.calibNormalized(100.0, 0.427, 0.26, 0.36)
    assert(math.abs(slow - 100.0 * 0.31 / 0.427) < 1e-12 && slow < 100.0)
    // a quicker-than-band box inflates toward comparability
    assert(Bench.calibNormalized(50.0, 0.20, 0.26, 0.36) > 50.0)
    // failed anchor (calib <= 0): raw total, never a poisoned scale
    assert(Bench.calibNormalized(42.0, -1.0, 0.26, 0.36) == 42.0)
    assert(Bench.calibNormalized(42.0, 0.0, 0.26, 0.36) == 42.0)
  }
}
