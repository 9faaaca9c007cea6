ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// The r21 canonicalization sources carry meaningful non-ASCII literals
// (a DECOMPOSED e+U+0301 among them); pin the source charset so a
// non-UTF-8 default locale can never silently miscompile them.
ThisBuild / scalacOptions += "-encoding"
ThisBuild / scalacOptions += "UTF-8"
name := "mysqltoclickhousespark"
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
// Forked `run` output normally passes through sbt's logger, which prefixes
// every line with "[info] " — that prefix is exactly what has kept the
// driver's JSON parse of Bench's one-line stdout contract null since r8.
// StdoutOutput hands the forked JVM sbt's RAW stdout instead: Bench's JSON
// line reaches the driver unprefixed (Spark/log4j chatter already goes to
// stderr).
run / outputStrategy := Some(StdoutOutput)
// The second half of the same contract: after the forked run exits, sbt
// prints "[success] Total time: …" to stdout, so the driver's last-line
// parse of Bench's JSON has stayed null even with StdoutOutput. Suppress
// the epilogue banner so the JSON line is the LAST stdout line.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
)
