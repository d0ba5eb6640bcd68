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

  test("failed runs never enter the timings: okTimes drops them, an " +
    "all-failed query is flagged but NOT timed (VERDICT r17 #1 — the " +
    "pre-fix harness booked a dying d14 run's 30.7 s wall as a timing " +
    "with degraded:false)") {
    import Bench.{RunResult, okTimes, summarize}
    val boom = Some("org.apache.spark.SparkException: raise_error")
    assert(okTimes(Seq(RunResult(2.0, None), RunResult(30.7, boom))) == Seq(2.0))
    val s = summarize(
      Seq(
        "d14" -> Seq(RunResult(30.7, boom), RunResult(2.5, None)),
        "d99_raise_error" -> Seq(RunResult(0.4, boom), RunResult(0.4, boom)),
        "q01" -> Seq(RunResult(0.3, None), RunResult(0.29, None))),
      warm = Map("d14" -> 1.5, "q01" -> 0.2), ratio = 8.0)
    // the partially-failed query is timed from its OK run and flagged
    assert(s.mins("d14") == 2.5 && s.failed.contains("d14"))
    // the all-failed query is flagged, not timed
    assert(!s.mins.contains("d99_raise_error"))
    assert(s.failed.contains("d99_raise_error"))
    // the healthy query is neither
    assert(s.mins("q01") == 0.29 && !s.failed.contains("q01"))
    assert(s.suspects.isEmpty)
  }

  test("suspect flag: a timed min far above the query's same-session " +
    "warm-up wall is contention the session-level trips cannot see " +
    "(r17's d14: 30.7 s timed vs ~1.5 s warm in a calib-in-band session)") {
    import Bench.{RunResult, isSuspect, summarize}
    // the r17 driver-record shape: ALL runs uniformly inflated — no
    // spread, calib in-band, but 12x the warm-up wall
    assert(isSuspect(30.7, 1.5, 8.0))
    // honest SF step (warm at sf0.001, timed at sf0.1): e01's ~6x data
    // ratio stays under the flag via the floor
    assert(!isSuspect(2.52, 0.4, 8.0))
    // sub-second jitter never flags (floor)
    assert(!isSuspect(1.5, 0.1, 8.0))
    // no warm-up reference (failed/absent) -> no verdict
    assert(!isSuspect(30.7, -1.0, 8.0))
    assert(!isSuspect(30.7, 0.0, 8.0))
    val s = summarize(
      Seq("d14" -> Seq(RunResult(30.7, None), RunResult(29.9, None))),
      warm = Map("d14" -> 1.5), ratio = 8.0)
    assert(s.suspects == Seq("d14") && s.mins("d14") == 29.9)
  }

  test("passPlan: pass A = one decorrelated guard run each, pass B = " +
    "the `runs` consecutive steady-state executions (r19)") {
    val names = Seq("q01", "d06", "s04")
    val plan = Bench.passPlan(names, Set("d06"), runs = 2)
    assert(plan == Seq(
      Seq("q01", "d06", "s04"),                          // pass A
      Seq("q01", "q01", "d06", "d06", "s04", "s04")))    // pass B
    // runs=3 widens pass B uniformly
    assert(Bench.passPlan(names, Set("d06"), runs = 3)(1) ==
      Seq("q01", "q01", "q01", "d06", "d06", "d06", "s04", "s04", "s04"))
    // runs=1 (the dev fast path) keeps one run per pass — EXCEPT the
    // dedup scope, whose per-invocation caches need a consecutive pair
    // in pass B to reach their documented steady state
    assert(Bench.passPlan(names, Set("d06"), runs = 1) ==
      Seq(names, Seq("q01", "d06", "d06", "s04")))
    assert(Bench.passPlan(Seq("q01"), Set.empty, runs = 1) ==
      Seq(Seq("q01"), Seq("q01")))
  }

  test("pass decorrelation: a contention window shorter than a full " +
    "pass can no longer inflate a booked min — the r18 driver's d24 " +
    "12.01-vs-2.01 shape reproduced under a synthetic stall and caught") {
    import Bench.{RunResult, summarize}
    // 125-query sweep, the r18 shape: min-of-3 for the dedup scope
    val names = (1 to 125).map(i => f"q$i%03d")
    val scoped = Set("q024", "q016", "q046") // stand-ins for d24/d16/d46
    val plan = Bench.passPlan(names, scoped, runs = 2)
    val schedule = plan.flatten
    // the OLD layout ran all of a query's runs consecutively: any
    // 3-slot contention window covered every sample of some query. In
    // the pass layout, a query's pass-A and pass-B slots are separated
    // by a full sweep of other queries — assert the minimum gap.
    val gaps = names.map { n =>
      val idx = schedule.zipWithIndex.collect { case (`n`, i) => i }
      idx.max - idx.min
    }
    assert(gaps.min >= names.size - 1,
      s"some query's samples sit ${gaps.min} slots apart — a short " +
        "contention window could cover all of them")
    // synthetic stall: a 40-slot window (a third of a pass) inflates
    // every run inside it 6x — the exact non-uniform hit the r18 driver
    // took on d24. Under the old consecutive layout this booked 12 s
    // against a 2 s truth; under the pass layout every query keeps at
    // least one clean sample, so the booked min is clean for ALL queries.
    val window = 200 until 240 // sits inside pass B
    val truth = 2.0
    val walls = schedule.zipWithIndex.map { case (n, i) =>
      (n, RunResult(if (window.contains(i)) truth * 6 else truth, None))
    }
    val byQuery = names.map(n =>
      n -> walls.collect { case (`n`, r) => r }).toSeq
    val s = summarize(byQuery, warm = Map.empty, ratio = 8.0)
    assert(s.mins.values.forall(_ == truth),
      "a sub-pass contention window inflated a booked min")
    // and the backstop still exists for a window that DOES span the
    // session: all-samples-inflated trips the warm-wall suspect flag
    val uniform = summarize(
      Seq("q024" -> Seq(RunResult(12.01, None), RunResult(12.3, None))),
      warm = Map("q024" -> 1.2), ratio = 8.0)
    assert(uniform.suspects == Seq("q024"))
  }

  test("walls sidecar: parseable JSON with warm + per-run walls and " +
    "failed-run indices only where runs failed (r19)") {
    import Bench.{RunResult, wallsJson}
    val json = wallsJson(
      Seq(
        ("q01_pricing_summary", 0.5,
          Seq(RunResult(0.35, None), RunResult(0.82, None),
            RunResult(0.29, None))),
        ("d99_boom", -1.0,
          Seq(RunResult(0.4, Some("x")), RunResult(0.3, None)))),
      calib = 0.293, calibIo = 0.128, nPasses = 2, suspectRatio = 8.0,
      rename = _.takeWhile(_ != '_'))
    // parsed with a real JSON parser: the sidecar is a machine-read
    // artifact (flag recomputation), so "looks like JSON" is not enough
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(m.get("calib").asDouble == 0.293 && m.get("passes").asInt == 2)
    assert(m.get("suspect_ratio").asDouble == 8.0)
    val q = m.get("walls").get("q01")
    assert(q.get("warm").asDouble == 0.5)
    assert(q.get("runs").size == 3 && q.get("runs").get(1).asDouble == 0.82)
    assert(q.get("failed_runs") == null,
      "a clean query must carry no failed_runs field")
    val d = m.get("walls").get("d99")
    assert(d.get("warm").asDouble == -1.0)
    assert(d.get("failed_runs").size == 1 &&
      d.get("failed_runs").get(0).asInt == 0)
  }

  test("record line: the driver contract shape {metric,value,unit," +
    "queries,sf} is a strict prefix; extensions follow sf (r20)") {
    val line = Bench.recordLine(total = 67.968,
      queriesJson = """{"q01":0.21,"d14":2.37}""", sf = "sf0.1",
      normTotal = 53.074, calib = 0.397, calibIo = 0.111,
      degraded = false, extra = ""","calib_warn":true""")
    // the documented contract fields, contiguous, in order, FIRST — a
    // fixed-shape reader that greps exactly this prefix must match
    assert(line.startsWith("""{"metric":"total","value":67.968,""" +
      """"unit":"sec","queries":{"q01":0.21,"d14":2.37},"sf":"sf0.1""""),
      s"contract prefix broken: $line")
    // and the whole line stays real JSON a lenient reader parses
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(m.get("value").asDouble == 67.968 &&
      m.get("value_normalized").asDouble == 53.074 &&
      m.get("calib").asDouble == 0.397 && m.get("calib_warn").asBoolean &&
      m.get("queries").get("d14").asDouble == 2.37 &&
      m.get("sf").asText == "sf0.1" && !m.get("degraded").asBoolean)
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
