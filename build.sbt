ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "daskawkwardspark"
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
// Driver contract: graft.Bench must end stdout with ONE parseable JSON
// line. Two sbt behaviors break that — the logger's "[info] " prefix on
// forked-process output, and the trailing "[success] Total time: ..."
// line. Pass forked stdout through raw and drop the success banner.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not a task — silence the
// unused-key lint false positive
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
  // Whole-stage codegen emits fresh classes per query; a 70+-query run in
  // one JVM overflows the default 240 MB JIT code cache, after which the
  // compiler shuts off and later queries run interpreted (10-70x slower,
  // and WHICH queries degrade depends on run order — the round-1 bench
  // variance). Size it so the full suite stays JIT-compiled.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("GRAFT_JAVA_OPTS").map(_.split(" ").toSeq).getOrElse(Nil)
