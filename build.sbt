ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamsurferspark"
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
// Forked run/runMain output goes straight to this JVM's stdout instead of
// through sbt's logger: Bench/Verify print machine-parsed JSON lines, and
// the logger's "[info] " prefix is what broke the driver's bench parse
// (r8 verdict item 4). The LAST stdout line of Bench is the canonical
// parse target (see Bench.scala).
outputStrategy := Some(StdoutOutput)
// ...and suppress sbt's trailing "[success] Total time: ..." stdout line
// so Bench's short summary is genuinely the last line a tail capture sees.
ThisBuild / showSuccess := false
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
  // JVM default TZ pinned too: tests build java.sql.Timestamps via
  // Timestamp.valueOf (JVM-zone-dependent) and assert UTC-rendered window
  // labels — on a non-UTC machine every such assertion would shift.
  "-Duser.timezone=UTC",
  // 24g: at ~75 bench keys an 8g heap GC-thrashes — broadcast/shuffle
  // state is reclaimed via weak refs (ContextCleaner), so a tight heap
  // turns random queries 5-7x slower as full GCs pile up. The machine
  // has 128 GiB; the driver JVM is the only tenant during bench/verify.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 150 query executions generate hundreds of codegen classes; when the
  // default 240 MB JIT code cache fills, HotSpot flushes/stops compiling
  // and random heavy keys intermittently read 5-7x slower (q_cast_types
  // 2.6 s warm in isolation vs 17.9 s mid-bench).
  "-XX:ReservedCodeCacheSize=1g",
)
