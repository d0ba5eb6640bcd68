package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
/** Dev tool: time (and optionally explain) individual queries at a SF.
  * `SPARK_GRAFT_JOBS` additionally prints a per-Spark-job time breakdown
  * (job id, wall duration, first stage name) — the fastest way to see
  * which materialization inside a multi-job query owns the wall clock. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_CONF="k=v,k2=v2": extra session confs (e.g. a
    // graft.exp.* experiment key) layered on the canonical session —
    // the PerfAB injection point, available to byte/job probes too
    val extraConf = sys.env.get("SPARK_GRAFT_CONF")
      .map(_.split(",").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }.toMap).getOrElse(Map.empty[String, String])
    val spark = GraftSession.local(appName = "graft-probe",
      extraConf = extraConf)
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    if (sys.env.contains("SPARK_GRAFT_JOBS")) {
      // durations come from the EVENTS' own time fields, not a clock read
      // inside the listener callback: the listener bus is async and
      // backlogs exactly when a query fires many jobs in quick succession
      // — a bus-drain-time measurement would misattribute the wall clock
      // the flag exists to attribute
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = {
          val site = j.stageInfos.headOption.map(_.name).getOrElse("?")
          starts.put(j.jobId, (j.time, site))
        }
        override def onJobEnd(j: SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
            System.err.println(
              f"[probe-job]   #${j.jobId}%-4d ${(j.time - t0)/1e3}%7.2f s  $site")
          }
        }
      })
    }
    // SPARK_GRAFT_STORAGE: after each query, report the persistent-RDD
    // census (count + cached memory/disk bytes) — the residency view
    // behind the barrier-release audits (a query whose materialized
    // frames outlive their consumers shows up as monotone growth here).
    // SPARK_GRAFT_UNPERSIST: release all persistent RDDs after each
    // query (Bench's between-runs discipline) — A/B against the default
    // accumulate-across-queries mode to attribute storage-pressure skew.
    val storage = sys.env.contains("SPARK_GRAFT_STORAGE")
    val unpersist = sys.env.contains("SPARK_GRAFT_UNPERSIST")
    // SPARK_GRAFT_SHUFFLE: per-query total shuffle WRITE bytes/records
    // (summed over completed stages). Byte counters are data-dependent,
    // not clock-dependent, so unlike wall time they survive a contended
    // box — the honest cross-run metric for "this rewrite moves less
    // data", where wall-clock A/Bs need a quiet session.
    val shuffleAcct = sys.env.contains("SPARK_GRAFT_SHUFFLE")
    val shufBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufRecs = new java.util.concurrent.atomic.AtomicLong(0L)
    if (shuffleAcct)
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          shufBytes.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          shufRecs.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
          ()
        }
      })
    args.foreach { name =>
      shufBytes.set(0L); shufRecs.set(0L)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (explain) df.explain("formatted")
      // the shared bench action — count() prunes a projection-shaped
      // plan (d19/d51/s05 family) to a bare row-count scan, so a bare
      // count here timed nothing for exactly the plans Probe is most
      // often pointed at (the r15 bench-action lesson, applied to the
      // attribution tool too)
      val n = BenchExec.run(df)
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
      if (storage) {
        val infos = spark.sparkContext.getRDDStorageInfo
        val mem = infos.map(_.memSize).sum / 1e6
        val disk = infos.map(_.diskSize).sum / 1e6
        System.err.println(f"[probe-storage] ${infos.length}%3d cached RDDs, " +
          f"$mem%8.1f MB mem, $disk%8.1f MB disk")
      }
      if (shuffleAcct) {
        // the listener bus is async: let it drain before reading tallies
        var prev = -1L
        while (prev != shufBytes.get()) {
          prev = shufBytes.get(); Thread.sleep(200)
        }
        System.err.println(f"[probe-shuffle] ${shufBytes.get() / 1e6}%10.2f MB " +
          f"written, ${shufRecs.get()}%12d records")
      }
      if (unpersist)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
