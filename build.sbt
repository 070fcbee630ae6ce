ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "skdistspark"
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
// Forked run output goes STRAIGHT to stdout — without this, sbt routes it
// through its logger and prefixes every line with "[info] ", which breaks
// machine parsing of graft.Bench's single JSON line.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Xms = Xmx: with a floating Xms, G1 uncommits heap after every big
  // shuffle and the next run re-faults gigabytes of zeroed pages back in
  // — measured as 60-94% SYSTEM time and erratic 3-10x per-run swings
  // (q38 at sf10: 9-140 s for identical plan/cache/GC states). A pinned
  // heap keeps the pages committed; bench runs stabilize.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ (
  // SPARK_GRAFT_GCLOG=1: GC log to stderr for adjudicating whether an
  // erratic bench reading is collector thrash vs real plan cost.
  if (sys.env.get("SPARK_GRAFT_GCLOG").contains("1"))
    Seq("-Xlog:gc*=info:stderr:time,uptime")
  else Seq.empty
) ++ (
  // SPARK_GRAFT_JVM_EXTRA: space-separated extra flags for the forked
  // JVM — the A/B hook for JIT/code-cache experiments
  // (e.g. "-XX:ReservedCodeCacheSize=1g").
  sys.env.get("SPARK_GRAFT_JVM_EXTRA")
    .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
    .getOrElse(Seq.empty)
)
