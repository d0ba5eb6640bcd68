ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "s3logsparquetspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run/runMain output passes through RAW (r20, VERDICT r19 #1):
// sbt's default LoggedOutput prefixes every forked stdout line with
// "[info] ", so the bench's one-line JSON record has never reached the
// driver's parser as a bare JSON line (parsed: null since r01). Scoped
// to run/runMain only — test output keeps the logger (the driver's
// test-result capture reads it).
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 59 codegen'd queries overflow the JDK-17 default 240 MB JIT code
  // cache (flushing then deoptimizes hot loops mid-bench — a uniform
  // ~1.5-2x slowdown on every query once the cache fills)
  "-XX:ReservedCodeCacheSize=1g",
)
