ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mmedsmetaspark"
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
// Pass the forked main's stdout through UNPREFIXED: harnesses parse the
// one-line JSON that Bench/Verify print, and sbt's default logger would
// wrap it as "[info] {...}", breaking any strict json parse of the line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Local-mode Spark holds shuffle + localCheckpoint blocks on the one
  // JVM heap; an 86-query bench/verify sweep at sf0.1 accumulates
  // several GB, and a small cap turns the tail queries into GC thrash
  // (measured 4x on the minhash pipelines at 8g). The box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // A 130-query sweep generates thousands of codegen classes; the JDK 17
  // default 240m code cache fills mid-sweep, the JIT stops compiling, and
  // late compute-heavy queries run interpreted (measured 5-6x: qe16
  // 5.2 s standalone vs 34 s late in a sweep). The box has 128 GiB.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_GCLOG").map(f => s"-Xlog:gc*,safepoint*:file=$f:time,uptime").toSeq
