ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gcdetlspark"
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
// Forked runMain output goes RAW to stdout/stderr instead of through
// sbt's logger: the driver json-parses the Bench line, and sbt's
// `[info] ` prefix made it unparseable in rounds 1-2 (BENCH parsed:null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Drop the trailing "[success] Total time ..." line so the Bench JSON
// line stays the last thing in the driver's bounded output tail.
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
  // 24g, not 8g (r19, guide §5): the round bench runs 200+ gates in one
  // local[32] JVM that is driver AND all executors; at 8g the unified
  // heap starved as localCheckpoint blocks and shuffle state accumulated
  // — the CPU canary degraded 1.44→1.88 (+30%) within a run, and every
  // late-running gate paid it (the q91/q92/q111 "regressions" r18
  // ordered rechecked were exactly this). At 24g (~19% of the 128 GiB
  // box) the end-of-run canary equals the start (1.505→1.533) and the
  // same code ran 573→430 s. Still env-overridable for smaller boxes.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
