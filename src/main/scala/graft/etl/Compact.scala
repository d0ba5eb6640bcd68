package graft.etl

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction for the partitioned parquet lake.
  *
  * Streaming ingest (ST4/ST5 semantics: rotation, idle close, late
  * arrivals) naturally leaves several small files per partition — the
  * reference accepts this (output.rs behavior); at 100 TB the lake needs
  * periodic compaction or scan planning drowns in file listings.
  *
  * One job: read, repartition by the partition columns (each output
  * partition lands in one task set), rewrite with a bounded file size,
  * swap via a staging directory + two renames.
  *
  * LOCAL-FILESYSTEM LAKE ONLY: the swap uses java.io renames, which
  * neither exist atomically on object stores nor span HDFS namenodes,
  * and there is a window between the two renames where the lake path is
  * absent. On a production object-store lake, compaction belongs to a
  * table format's metadata swap (Iceberg rewrite_data_files / Delta
  * OPTIMIZE) — this operator covers the file-lake shape the reference
  * writes.
  */
object Compact {

  final case class CompactStats(files0: Long, files1: Long, rows: Long)

  def run(spark: SparkSession, dir: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 10000000L,
      compression: String = "snappy"): CompactStats = {
    def countFiles(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(new java.io.File(p))
    }
    val before = countFiles(dir)
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val staged = dir.stripSuffix("/") + ".compact-staging"
    df.repartition(partitionCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(staged)
    // swap: the staged tree replaces the original in two renames
    val old = new java.io.File(dir)
    val retired = new java.io.File(dir.stripSuffix("/") + ".compact-old")
    require(old.renameTo(retired), s"rename $dir -> $retired failed")
    require(new java.io.File(staged).renameTo(old), s"rename $staged -> $dir failed")
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmRf); f.delete()
    }
    rmRf(retired)
    CompactStats(before, countFiles(dir), rows)
  }
}
