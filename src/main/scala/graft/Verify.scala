package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  // Shared with [[ConfReplay]], which writes the same oracle_sql.json
  // shape for non-default QueryConf operating points.
  private[graft] def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Write `oracle` as outDir/oracle_sql.json — the shape
    * scripts/selfcheck.py (and the driver gate) consumes. */
  private[graft] def writeOracleJson(outDir: String,
      oracle: Iterable[(String, String)]): Unit = {
    val json = oracle
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional name filter (args 2+): dump only those queries — the
    // single-operator iteration loop. The driver always calls with two
    // args, so the gate path dumps everything.
    val only = args.drop(2).toSet
    val spark = GraftSession.local(appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    writeOracleJson(outDir, SparkEntry.oracleSql)
    // no_oracle.json: the oracle-less queries, each with its declared
    // design reason — so a `no_oracle` row in the correctness artifact
    // reads as "cannot be cross-engine checked (self-checks instead)",
    // not "broken". A query missing from BOTH oracleSql and the declared
    // map is recorded loudly as undeclared: that IS a gate gap.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val skipped = noOracle.toSeq.sorted.map { name =>
      val reason = SparkEntry.noOracleByDesign.getOrElse(name,
        "UNDECLARED — no oracle and no design reason; add one or the other")
      s"${jsonStr(name)}: {${jsonStr("skipped")}: " +
        s"${jsonStr("no_oracle_by_design")}, " +
        s"${jsonStr("reason")}: ${jsonStr(reason)}}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/no_oracle.json"), skipped)
    spark.stop()
  }
}
