ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ue_big_data_projectspark"
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
// The forked JVM's stdout normally routes through sbt's logger, which
// wraps every line in "[info] " — that prefix is why the driver's
// last-parseable-line bench parser returned null for three rounds even
// though the JSON itself was intact in the captured tail. StdoutOutput
// bypasses the logger so Bench's JSON lines reach stdout bare.
run / outputStrategy := Some(StdoutOutput)
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
  // Insurance against JIT code-cache exhaustion as the query suite
  // grows (60+ queries of whole-stage-codegen classes in one JVM).
  // Measured round 3: NOT the cause of round-2's in-suite q43/q44
  // inflation — the full-suite total is identical with and without
  // these flags (55.9 vs 55.3 s). Kept because a larger suite will
  // eventually hit the default 240 MB cap, and flushing degrades
  // gracefully where exhaustion silently disables compilation.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
)
