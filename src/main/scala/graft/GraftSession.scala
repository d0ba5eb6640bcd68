package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory for the graft engine.
  *
  * Local mode is a single JVM; shuffle partitions are sized to the core
  * count instead of the 200 default (SURVEY.md §4 "parallelism").
  * AQE stays on so skewed shuffles re-plan at runtime — the behaviour we
  * rely on at cluster scale.
  */
object GraftSession {
  def local(
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Parquet TIMESTAMP(NANOS) (the events table) is otherwise rejected
      // by Spark 4; read as long and convert in Tables().
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

/** Test-table loader: one parquet file per table under a scale-factor dir
  * (TESTDATA.md). Kept as plain `read.parquet` so filter/projection
  * pushdown reaches the scan.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // With nanosAsLong the events.ts column arrives as nano-epoch long;
    // convert to Spark's native microsecond TimestampType (truncating,
    // which matches DuckDB's epoch()-based bucketing at second grain).
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }
}
