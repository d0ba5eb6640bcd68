package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: time (and optionally explain) individual queries at a SF. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "graft-probe")
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
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
