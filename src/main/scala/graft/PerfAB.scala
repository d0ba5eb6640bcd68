package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: same-JVM A/B harness for perf experiments. Alternates
  * SparkSessions built with one config key set to value A vs value B,
  * runs the named gate queries in each, several interleaved rounds, and
  * prints per-variant min/median. Interleaving inside ONE JVM is the
  * point: this box drifts ±30-40% between sbt sessions (SURVEY "Reading
  * BENCH files"), so cross-session deltas are unreadable — only
  * same-JVM interleaved runs count as evidence.
  *
  * {{{
  * SPARK_GRAFT_AB_KEY=spark.sql.adaptive.enabled \
  * SPARK_GRAFT_AB_A=true SPARK_GRAFT_AB_B=false \
  * sbt "runMain graft.PerfAB d14_contamination"
  * }}}
  *
  * Code-change A/Bs: gate the experimental path on a custom conf key
  * (`spark.conf.get("graft.exp.<name>", "false")`) and A/B that key. */
object PerfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val key = sys.env("SPARK_GRAFT_AB_KEY")
    val vals = Seq(sys.env("SPARK_GRAFT_AB_A"), sys.env("SPARK_GRAFT_AB_B"))
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "3").toInt
    val warm = sys.env.getOrElse("SPARK_GRAFT_AB_WARM", "2").toInt
    val queries = args.toSeq

    // the CANONICAL session with one key layered on top — never a
    // hand-copied builder, or the A/B would drift from the gate's
    // session configuration the moment GraftSession gains an extension
    def mkSession(v: String): SparkSession =
      GraftSession.local(appName = s"graft-ab-$v", extraConf = Map(key -> v))

    val acc = scala.collection.mutable.Map.empty[(String, String), List[Double]]
      .withDefaultValue(Nil)
    for (r <- 1 to rounds; v <- vals) {
      val spark = mkSession(v)
      for (q <- queries) {
        // every run — warm or timed — releases its storage AFTER the
        // clock stops, so the timed sample never executes under the
        // warm runs' inherited localCheckpoint blocks (the exact
        // storage-pressure skew Bench's per-run unpersist exists to
        // prevent; round-3 bench measured it at 3-4×)
        def runOnce(): Double = {
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          spark.catalog.clearCache()
          dt
        }
        (1 to warm).foreach(_ => runOnce()) // warm runs un-timed
        val dt = runOnce()                  // one timed run per round
        acc((q, v)) = dt :: acc((q, v))
        System.err.println(f"[ab] round $r $key=$v $q%-26s $dt%6.2f s")
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    for (q <- queries; v <- vals) {
      val ts = acc((q, v))
      // true median (mean of the middle two for even counts — upper-middle
      // alone biases the comparison high by up to the middle gap)
      val sorted = ts.sorted
      val med =
        if (sorted.size % 2 == 1) sorted(sorted.size / 2)
        else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
      System.err.println(f"[ab-summary] $key=$v%-6s $q%-26s min=${ts.min}%6.2f" +
        f" med=$med%6.2f  (${ts.reverse.map(t => f"$t%.2f").mkString(" ")})")
    }
  }
}
