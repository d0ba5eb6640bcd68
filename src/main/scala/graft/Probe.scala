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
    val spark = GraftSession.local(appName = "graft-probe")
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
    args.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (explain) df.explain("formatted")
      val n = df.count()
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
